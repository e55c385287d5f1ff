"""Keyframe insertion + map-point spawning + point refresh (one jit).

Covers the reference's createNewKeyFrame point spawning
(visualOdometry.cpp:463-517), KeyFrame construction (keyframe.cpp:9-32),
LocalMapping::processNewKeyFrame observation attachment
(localMapping.cpp:100-130), MapPoint::updateNormalAndDepth /
computeDescriptor (mappoint.cpp:86-179) and KeyFrame::updateConnections
covisibility/spanning-tree bookkeeping (keyframe.cpp:69-152) — as dense
masked array updates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import lie
from ..camera import Camera
from ..frontend.frame import FrameFeatures
from ..ops import hamming
from .map_state import MapCaps, MapState, add_observations, covis_row_for


def allocate_point_slots(m: MapState, want: jnp.ndarray) -> jnp.ndarray:
    """want [n] bool -> point slot ids [n] (-1 when the map is full).

    The r-th requested slot gets the r-th invalid row — culled rows are
    recycled (the reference's map is unbounded with erase protocols,
    mappoint.cpp:214-381; fixed shapes recycle instead). Row P-1 stays
    reserved as the scatter dump target."""
    P = m.pt_valid.shape[0]
    n = want.shape[0]
    free = (~m.pt_valid).at[P - 1].set(False)
    fpos = jnp.cumsum(free.astype(jnp.int32)) - 1
    table = (
        jnp.full((n + 1,), -1, jnp.int32)
        .at[jnp.where(free & (fpos < n), fpos, n)]
        .set(jnp.arange(P, dtype=jnp.int32))[:n]
    )
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    ids = table[jnp.clip(rank, 0, n - 1)]
    return jnp.where(want, ids, -1)


def spawn_mask_depth_sorted(feats: FrameFeatures, already_real: jnp.ndarray, th_depth) -> jnp.ndarray:
    """Which keypoints spawn new map points at KF creation.

    Reference rule (visualOdometry.cpp:479-515): walk keypoints by ascending
    depth; spawn when the slot has no real (observed) map point; stop once
    depth > thDepth and at least 100 points were spawned.
    """
    d = feats.depth
    can = (d > 0) & feats.valid & ~already_real
    key = jnp.where(can, d, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.empty_like(order).at[order].set(jnp.arange(order.shape[0]))
    # rank <= 100 keeps 101: the reference's `if (d > threshold &&
    # point_cnt > 100) break` runs AFTER spawning, so the 101st far point
    # spawns before the loop exits (visualOdometry.cpp:510-511)
    return can & ((d <= th_depth) | (rank <= 100))


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def insert_keyframe(
    m: MapState,
    caps: MapCaps,
    feats: FrameFeatures,
    T_c_w: jnp.ndarray,
    timestamp,
    frame_id,
    assign: jnp.ndarray,       # [N] i32 real map-point id per keypoint (-1 none)
    create_mask: jnp.ndarray,  # [N] bool spawn-new-point slots (disjoint from assign)
    cam: Camera,
    scale_factors: jnp.ndarray,  # [L]
    words: jnp.ndarray = None,       # [N] i32 BoW word per keypoint (-1)
    bow_word: jnp.ndarray = None,    # [N] i32 sorted unique words
    bow_weight: jnp.ndarray = None,  # [N] f32 normalized weights
    do: jnp.ndarray | None = None,   # device bool: False = provable no-op
) -> Tuple[MapState, jnp.ndarray]:
    """Returns (new map, kf_id); kf_id = -1 (map untouched) when every slot
    is live — argmax(~kf_valid) would otherwise silently overwrite slot 0,
    the gauge keyframe, if a future call site forgot the capacity gate.

    `do` gates the insert through lax.cond: a False `do` returns the map
    untouched. An earlier revision value-masked every write instead of
    branching (predication), betting that the cond's not-taken identity
    branch copied the big map arrays each frame — measured the opposite:
    predication runs the whole spawn/observation/covis/refresh_points
    chain (a [2048,O,O] Hamming sort among it) on EVERY frame,
    +5 ms/frame device, while the cond's identity branch on donated
    buffers is nearly free (455df7b 447 ms vs d876a54 667 ms per 40-frame
    chunk trace). Keyframe frames pay the insert either way."""
    can = (m.n_kf < m.kf_valid.shape[0]) | jnp.any(~m.kf_valid)
    do = can if do is None else (can & do)
    return jax.lax.cond(
        do,
        lambda m: _insert_keyframe(
            m, caps, feats, T_c_w, timestamp, frame_id, assign, create_mask,
            cam, scale_factors, words, bow_word, bow_weight,
        ),
        lambda m: (m, jnp.asarray(-1, jnp.int32)),
        m,
    )


def _insert_keyframe(
    m, caps, feats, T_c_w, timestamp, frame_id, assign, create_mask,
    cam, scale_factors, words, bow_word, bow_weight,
):
    N = caps.n_feat
    P = caps.max_pt
    K = m.kf_valid.shape[0]
    # slot lifecycle: bump-allocate until the capacity high-water mark, then
    # reuse the lowest culled slot (the reference map is unbounded,
    # map.h:16-17; fixed shapes recycle instead). kf_gen disambiguates
    # reused slots for trajectory recovery.
    first_free = jnp.argmax(~m.kf_valid).astype(jnp.int32)
    kf_id = jnp.where(m.n_kf < K, jnp.minimum(m.n_kf, K - 1), first_free)

    # ---- keyframe record ---------------------------------------------------
    m = m.replace(
        kf_pose=m.kf_pose.at[kf_id].set(T_c_w),
        kf_valid=m.kf_valid.at[kf_id].set(True),
        kf_gen=m.kf_gen.at[kf_id].add(1),
        kf_seq=m.kf_seq.at[kf_id].set(m.n_kf_ever),
        n_kf_ever=m.n_kf_ever + 1,
        loop_edges=m.loop_edges.at[kf_id, :].set(False).at[:, kf_id].set(False),
        kf_timestamp=m.kf_timestamp.at[kf_id].set(timestamp),
        kf_frame_id=m.kf_frame_id.at[kf_id].set(frame_id),
        kf_uv_und=m.kf_uv_und.at[kf_id].set(feats.uv_und),
        kf_octave=m.kf_octave.at[kf_id].set(feats.octave),
        kf_angle=m.kf_angle.at[kf_id].set(feats.angle),
        kf_depth=m.kf_depth.at[kf_id].set(feats.depth),
        kf_u_right=m.kf_u_right.at[kf_id].set(feats.u_right),
        kf_desc=m.kf_desc.at[kf_id].set(feats.desc),
        kf_kp_valid=m.kf_kp_valid.at[kf_id].set(feats.valid),
    )
    if words is not None:
        m = m.replace(
            kf_word=m.kf_word.at[kf_id].set(words),
            kf_bow_word=m.kf_bow_word.at[kf_id].set(bow_word),
            kf_bow_weight=m.kf_bow_weight.at[kf_id].set(bow_weight),
        )

    # ---- spawn new points --------------------------------------------------
    create = create_mask & feats.valid & (assign < 0)
    new_ids = allocate_point_slots(m, create)
    in_cap = create & (new_ids >= 0)
    new_ids_safe = jnp.where(in_cap, new_ids, P - 1)

    T_w_c = lie.se3_inverse(T_c_w)
    ow = T_w_c[:3, 3]
    depth_safe = jnp.where(feats.depth > 0, feats.depth, 1.0)
    pw = cam.pixel2world(feats.uv_und, depth_safe, T_c_w)  # [N,3]
    line = pw - ow
    dist = jnp.linalg.norm(line, axis=-1)
    normal = line / jnp.maximum(dist, 1e-9)[:, None]
    lvl_scale = scale_factors[feats.octave]
    max_d = dist * lvl_scale                       # mappoint.cpp:112
    min_d = max_d / scale_factors[-1]

    def scatter(arr, vals):
        return arr.at[new_ids_safe].set(jnp.where(in_cap[..., None] if vals.ndim > 1 else in_cap, vals, arr[new_ids_safe]))

    m = m.replace(
        pt_pos=m.pt_pos.at[new_ids_safe].set(jnp.where(in_cap[:, None], pw, m.pt_pos[new_ids_safe])),
        pt_normal=m.pt_normal.at[new_ids_safe].set(jnp.where(in_cap[:, None], normal, m.pt_normal[new_ids_safe])),
        pt_desc=m.pt_desc.at[new_ids_safe].set(jnp.where(in_cap[:, None], feats.desc, m.pt_desc[new_ids_safe])),
        pt_min_dist=m.pt_min_dist.at[new_ids_safe].set(jnp.where(in_cap, min_d, m.pt_min_dist[new_ids_safe])),
        pt_max_dist=m.pt_max_dist.at[new_ids_safe].set(jnp.where(in_cap, max_d, m.pt_max_dist[new_ids_safe])),
        pt_ref_kf=m.pt_ref_kf.at[new_ids_safe].set(jnp.where(in_cap, kf_id, m.pt_ref_kf[new_ids_safe])),
        pt_valid=m.pt_valid.at[new_ids_safe].set(jnp.where(in_cap, True, m.pt_valid[new_ids_safe])),
        pt_gen=m.pt_gen.at[new_ids_safe].add(in_cap.astype(jnp.int32)),
        pt_found=m.pt_found.at[new_ids_safe].set(jnp.where(in_cap, 1, m.pt_found[new_ids_safe])),
        pt_visible=m.pt_visible.at[new_ids_safe].set(jnp.where(in_cap, 1, m.pt_visible[new_ids_safe])),
        n_pt=jnp.minimum(m.n_pt + jnp.sum(in_cap.astype(jnp.int32)), P),
    )

    # ---- kf_mp row + observations -----------------------------------------
    row = jnp.where(assign >= 0, assign, jnp.where(in_cap, new_ids_safe, -1))
    m = m.replace(kf_mp=m.kf_mp.at[kf_id].set(row))
    kp_ids = jnp.arange(N, dtype=jnp.int32)
    m = add_observations(m, jnp.maximum(row, 0), kf_id, kp_ids, row >= 0)

    # ---- covisibility + spanning tree -------------------------------------
    member = jnp.zeros((P,), bool).at[jnp.maximum(row, 0)].max(row >= 0)
    w = covis_row_for(m, member)
    w = w.at[kf_id].set(0)
    m = m.replace(covis=m.covis.at[kf_id, :].set(w).at[:, kf_id].set(w))
    best = jnp.argmax(w).astype(jnp.int32)
    parent = jnp.where((w[best] > 0) & (kf_id > 0), best, -1)
    m = m.replace(
        parent=m.parent.at[kf_id].set(parent),
        n_kf=jnp.minimum(m.n_kf + 1, jnp.int32(m.kf_valid.shape[0])),
    )

    # ---- refresh normals/depth/descriptor of touched pre-existing points --
    touched = jnp.zeros((P,), bool).at[jnp.maximum(assign, 0)].max(assign >= 0)
    m = refresh_points(m, touched, scale_factors)
    return m, kf_id


MAX_REFRESH = 2048  # touched points per refresh call (a KF touches <= ~1k)


def refresh_points(m: MapState, mask: jnp.ndarray, scale_factors: jnp.ndarray) -> MapState:
    """updateNormalAndDepth + computeDescriptor for masked points.

    normal = mean of unit rays from observing camera centers
    (mappoint.cpp:86-116); distances from the ref-KF observation; the
    representative descriptor minimizes the median Hamming distance to the
    other observations (mappoint.cpp:118-179).

    Works on a compacted subset (<= MAX_REFRESH masked points): the gathers
    over [points, O] observer data dominate the mapping-chain profile when
    run over the whole point table.
    """
    P, O = m.pt_obs_kf.shape
    sel_mask = mask & m.pt_valid
    pos = jnp.cumsum(sel_mask.astype(jnp.int32)) - 1
    slot = jnp.where(sel_mask & (pos < MAX_REFRESH), pos, MAX_REFRESH)
    ids = (
        jnp.full((MAX_REFRESH + 1,), P - 1, jnp.int32)
        .at[slot]
        .set(jnp.arange(P, dtype=jnp.int32))[:MAX_REFRESH]
    )
    live = (
        jnp.zeros((MAX_REFRESH + 1,), bool).at[slot].set(sel_mask)[:MAX_REFRESH]
    )

    obs_kf = m.pt_obs_kf[ids]       # [S,O]
    obs_kp = m.pt_obs_kp[ids]
    pt_pos = m.pt_pos[ids]
    pt_ref = m.pt_ref_kf[ids]
    obs_valid = obs_kf >= 0
    safe_kf = jnp.maximum(obs_kf, 0)
    # camera centers of observers
    poses = m.kf_pose[safe_kf]      # [S,O,4,4]
    Rt = jnp.swapaxes(poses[..., :3, :3], -1, -2)
    centers = -jnp.einsum("poij,poj->poi", Rt, poses[..., :3, 3])
    rays = pt_pos[:, None, :] - centers
    ray_norm = jnp.maximum(jnp.linalg.norm(rays, axis=-1), 1e-9)
    unit = rays / ray_norm[..., None]
    cnt = jnp.maximum(jnp.sum(obs_valid.astype(jnp.float32), axis=1), 1.0)
    normal = jnp.sum(jnp.where(obs_valid[..., None], unit, 0.0), axis=1) / cnt[:, None]

    # ref-KF distance + octave -> scale band
    is_ref = obs_kf == pt_ref[:, None]
    ref_slot = jnp.argmax(is_ref, axis=1)
    has_ref = jnp.any(is_ref, axis=1)
    ref_dist = jnp.take_along_axis(ray_norm, ref_slot[:, None], axis=1)[:, 0]
    ref_kp = jnp.take_along_axis(obs_kp, ref_slot[:, None], axis=1)[:, 0]
    ref_oct = m.kf_octave[jnp.maximum(pt_ref, 0), jnp.maximum(ref_kp, 0)]
    max_d = ref_dist * scale_factors[ref_oct]
    min_d = max_d / scale_factors[-1]

    # representative descriptor: min median pairwise distance
    descs = m.kf_desc[safe_kf, jnp.maximum(obs_kp, 0)]  # [S,O,8]
    D = jnp.sum(
        hamming.popcount_u32(descs[:, :, None, :] ^ descs[:, None, :, :]), axis=-1
    )  # [S,O,O]
    pair_ok = obs_valid[:, :, None] & obs_valid[:, None, :]
    D = jnp.where(pair_ok, D, 1 << 14)
    Ds = jnp.sort(D, axis=-1)  # invalid large values sort to the end
    n_obs = jnp.sum(obs_valid.astype(jnp.int32), axis=1)
    mid_idx = jnp.clip((0.5 * (n_obs[:, None] - 1)).astype(jnp.int32), 0, O - 1)
    med = jnp.take_along_axis(Ds, jnp.broadcast_to(mid_idx[:, :, None], Ds.shape[:2] + (1,)), axis=2)[:, :, 0]
    med = jnp.where(obs_valid, med, 1 << 14)
    best_row = jnp.argmin(med, axis=1)
    best_desc = jnp.take_along_axis(descs, best_row[:, None, None].repeat(8, 2), axis=1)[:, 0, :]

    upd = live & (n_obs > 0)
    rows = jnp.where(upd, ids, P - 1)
    keepv = lambda new, old: jnp.where(upd[:, None] if new.ndim > 1 else upd, new, old)
    return m.replace(
        pt_normal=m.pt_normal.at[rows].set(keepv(normal, m.pt_normal[rows])),
        pt_max_dist=m.pt_max_dist.at[rows].set(jnp.where(upd & has_ref, max_d, m.pt_max_dist[rows])),
        pt_min_dist=m.pt_min_dist.at[rows].set(jnp.where(upd & has_ref, min_d, m.pt_min_dist[rows])),
        pt_desc=m.pt_desc.at[rows].set(keepv(best_desc, m.pt_desc[rows])),
    )
