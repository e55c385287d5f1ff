"""trackLocalMap as fixed-shape device programs.

Covers the reference's local-keyframe/point selection
(visualOdometry.cpp:595-724), Frame::isInFrame frustum-distance-viewcos
culling with scale prediction (frame.cpp:145-190, mappoint.cpp:182-199), and
the local-map projection matcher with second-best ratio gating
(matcher.cpp:274-353) — inverted into dense masked matrix ops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import lie
from ..camera import Camera
from ..ops import match_pallas
from .map_state import MapState, covis_row_for

MAX_LOCAL_PTS = 4096
TH_HIGH = 100


def local_keyframe_mask(m: MapState, assign: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """assign: [N] i32 map-point id matched per current-frame keypoint (-1).

    Returns (local_kf_mask [K] bool, ref_kf i32) — seed KFs observing any
    matched point, each seed's best covisible neighbor, spanning parent, and
    one child (visualOdometry.cpp:598-693; the reference's first-unvisited
    iteration order is approximated by argmax selections).

    The per-KF shared-point counts come from the matched points' observer
    lists (the reference's keyframe_counter loop, :598-612) — a [N,O]
    gather instead of scanning the whole [K,N] binding table.
    """
    K = m.kf_valid.shape[0]
    has = assign >= 0
    obs = m.pt_obs_kf[jnp.maximum(assign, 0)]          # [N,O]
    ok = has[:, None] & (obs >= 0)
    counts = (
        jnp.zeros((K + 1,), jnp.int32)
        .at[jnp.where(ok, obs, K).reshape(-1)]
        .add(ok.reshape(-1).astype(jnp.int32))[:K]
    )
    counts = counts * m.kf_valid.astype(jnp.int32)
    seeds = counts > 0
    ref_kf = jnp.argmax(counts).astype(jnp.int32)

    K = counts.shape[0]
    valid = m.kf_valid
    covis = jnp.where(valid[None, :], m.covis, 0)
    # best covisible neighbor of each seed
    best_nb = jnp.argmax(covis, axis=1)
    nb_ok = jnp.take_along_axis(covis, best_nb[:, None], axis=1)[:, 0] > 0
    nb_mask = jnp.zeros((K,), bool).at[jnp.where(seeds & nb_ok, best_nb, K - 1)].max(seeds & nb_ok)
    # parent of each seed
    par = m.parent
    par_ok = seeds & (par >= 0)
    par_mask = jnp.zeros((K,), bool).at[jnp.where(par_ok, par, K - 1)].max(par_ok)
    # one child of each seed (lowest id whose parent is the seed)
    kf_ids = jnp.arange(K, dtype=jnp.int32)
    child_of = jnp.where((par >= 0) & valid, par, -1)
    is_child = (child_of[None, :] == kf_ids[:, None]) & seeds[:, None]  # [K seeds, K kids]
    first_child = jnp.argmax(is_child, axis=1)
    has_child = jnp.any(is_child, axis=1)
    ch_mask = jnp.zeros((K,), bool).at[jnp.where(has_child, first_child, K - 1)].max(has_child)

    local = (seeds | nb_mask | par_mask | ch_mask) & valid
    return local, ref_kf


def local_point_mask(m: MapState, local_kf: jnp.ndarray) -> jnp.ndarray:
    """[P] bool: points observed by any local keyframe.

    Row-gathers the bindings of <= 96 compacted local keyframes (the
    reference caps the local window at 80, visualOdometry.cpp:643) instead
    of scanning the whole [K,N] table.
    """
    P = m.pt_valid.shape[0]
    K = m.kf_valid.shape[0]
    C = min(96, K)
    pos = jnp.cumsum(local_kf.astype(jnp.int32)) - 1
    slot = jnp.where(local_kf & (pos < C), pos, C)
    ids = jnp.full((C + 1,), -1, jnp.int32).at[slot].set(jnp.arange(K, dtype=jnp.int32))[:C]
    rows = m.kf_mp[jnp.maximum(ids, 0)]            # [C,N] row gather
    on = (ids >= 0)[:, None] & (rows >= 0)
    mask = jnp.zeros((P,), bool).at[jnp.where(on, rows, P - 1).reshape(-1)].max(on.reshape(-1))
    return mask & m.pt_valid


class FrustumInfo(NamedTuple):
    in_frame: jnp.ndarray   # [P] bool (isInFrame result)
    u: jnp.ndarray          # [P] projected u
    v: jnp.ndarray
    ur: jnp.ndarray         # [P] predicted right u
    pred_level: jnp.ndarray  # [P] i32
    view_cos: jnp.ndarray   # [P]


def frustum_check(
    m: MapState, T_c_w: jnp.ndarray, cam: Camera, scale_factors: jnp.ndarray
) -> FrustumInfo:
    """Frame::isInFrame over every map point (frame.cpp:145-190)."""
    R = T_c_w[:3, :3]
    t = T_c_w[:3, 3]
    pc = m.pt_pos @ R.T + t
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[:, 0] / safe_z + cam.cx
    v = cam.fy * pc[:, 1] / safe_z + cam.cy
    ow = -R.T @ t
    line = m.pt_pos - ow
    dist = jnp.linalg.norm(line, axis=-1)
    view_cos = jnp.sum(line * m.pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = (
        (z > 0)
        & (u >= 0) & (u <= cam.width)
        & (v >= 0) & (v <= cam.height)
        # scale-invariance band with the reference's 0.8/1.2 slack
        # (mappoint.cpp:391-401 getMin/MaxDistanceThreshold) — without it
        # an octave-0 point (max_d == spawn distance exactly) goes
        # invisible the moment the camera backs away at all, and new
        # points never collect a 3rd observation (round-5 root cause of
        # the binding-decay collapse)
        & (dist >= 0.8 * m.pt_min_dist) & (dist <= 1.2 * m.pt_max_dist)
        & (view_cos >= 0.5)
        & m.pt_valid
    )
    # predictScale (mappoint.cpp:182-199): ceil(log(maxDist/d)/log(scale))
    ratio = m.pt_max_dist / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factors[1])).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, scale_factors.shape[0] - 1)
    ur = u - cam.bf / safe_z
    return FrustumInfo(in_frame=ok, u=u, v=v, ur=ur, pred_level=lvl, view_cos=view_cos)


class LocalMatch(NamedTuple):
    assign: jnp.ndarray      # [N_kp] i32 map-point id (-1 none)
    n_matches: jnp.ndarray   # i32
    visible_mask: jnp.ndarray  # [P] bool — points that passed isInFrame (addVisible)


def search_local_points(
    m: MapState,
    T_c_w: jnp.ndarray,            # [4,4] current pose estimate
    candidate_mask: jnp.ndarray,   # [P] bool: local & not already matched
    tgt_uv_und: jnp.ndarray,
    tgt_u_right: jnp.ndarray,
    tgt_octave: jnp.ndarray,
    tgt_desc: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    tgt_blocked: jnp.ndarray,      # [N] already bound to a real map point
    scale_factors: jnp.ndarray,
    th_radius,
    cam: Camera = None,
    ratio: float = 0.8,
) -> LocalMatch:
    """matcher.cpp:274-353 as a compacted [MAX_LOCAL_PTS x N] matrix search.

    The frustum check (Frame::isInFrame, frame.cpp:145-190) runs only on
    the compacted LOCAL candidates, not the whole point table — the
    reference also frustum-culls only the local set
    (visualOdometry.cpp:726-774)."""
    P = m.pt_valid.shape[0]
    N = tgt_valid.shape[0]

    R = T_c_w[:3, :3]
    t = T_c_w[:3, 3]

    # cheap whole-table frustum pre-gate (z>0, inside the image) BEFORE
    # compaction: when local candidates exceed MAX_LOCAL_PTS, out-of-view
    # points must not occupy compacted slots and displace in-frame ones
    # (and visible_mask must count in-frame points, not slot survivors).
    # One [P,3] matmul — negligible next to the Hamming matrix below.
    pc_all = m.pt_pos @ R.T + t
    z_all = pc_all[:, 2]
    sz_all = jnp.where(jnp.abs(z_all) < 1e-9, 1e-9, z_all)
    u_all = cam.fx * pc_all[:, 0] / sz_all + cam.cx
    v_all = cam.fy * pc_all[:, 1] / sz_all + cam.cy
    candidate_mask = candidate_mask & (
        (z_all > 0)
        & (u_all >= 0) & (u_all <= cam.width)
        & (v_all >= 0) & (v_all <= cam.height)
    )

    # compact the candidate set, then run the full isInFrame on those rows
    pos = jnp.cumsum(candidate_mask.astype(jnp.int32)) - 1
    slot = jnp.where(candidate_mask & (pos < MAX_LOCAL_PTS), pos, MAX_LOCAL_PTS)
    pt_ids = jnp.arange(P, dtype=jnp.int32)

    def compact(vsrc, fill):
        out = jnp.full((MAX_LOCAL_PTS + 1,) + vsrc.shape[1:], fill, vsrc.dtype)
        return out.at[slot].set(vsrc)[:MAX_LOCAL_PTS]

    c_id = compact(pt_ids, -1)
    c_pos = compact(m.pt_pos, 0.0)
    c_norm = compact(m.pt_normal, 0.0)
    c_min = compact(m.pt_min_dist, 0.0)
    c_max = compact(m.pt_max_dist, 0.0)
    c_desc = compact(m.pt_desc, jnp.uint32(0))

    R = T_c_w[:3, :3]
    t = T_c_w[:3, 3]
    pc = c_pos @ R.T + t
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    c_u = cam.fx * pc[:, 0] / safe_z + cam.cx
    c_v = cam.fy * pc[:, 1] / safe_z + cam.cy
    c_ur = c_u - cam.bf / safe_z
    ow = -R.T @ t
    line = c_pos - ow
    dist = jnp.linalg.norm(line, axis=-1)
    c_cos = jnp.sum(line * c_norm, axis=-1) / jnp.maximum(dist, 1e-9)
    in_frame = (
        (z > 0)
        & (c_u >= 0) & (c_u <= cam.width)
        & (c_v >= 0) & (c_v <= cam.height)
        # 0.8/1.2 invariance slack (mappoint.cpp:391-401)
        & (dist >= 0.8 * c_min) & (dist <= 1.2 * c_max)
        & (c_cos >= 0.5)
    )
    ratio_d = c_max / jnp.maximum(dist, 1e-9)
    c_lvl = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio_d, 1e-9)) / jnp.log(scale_factors[1])
                 ).astype(jnp.int32),
        0, scale_factors.shape[0] - 1,
    )
    c_ok = (c_id >= 0) & in_frame

    r_base = jnp.where(c_cos > 0.998, 2.5, 4.0) * th_radius
    r_scale = r_base * scale_factors[c_lvl]  # [M]

    # fused masked-Hamming top-2 (Pallas on TPU): the geometric gates, the
    # [MAX_LOCAL_PTS, N] distance matrix and both reductions never leave
    # VMEM — see ops/match_pallas.py for the layout discipline
    BIG = jnp.int32(match_pallas.BIG)
    best, best_d, second, second_d = match_pallas.masked_top2(
        c_desc, tgt_desc,
        c_u, c_v, r_scale, c_ur, r_scale,
        c_lvl - 1, c_lvl, c_ok,
        tgt_uv_und[:, 0], tgt_uv_und[:, 1], tgt_u_right, tgt_octave,
        tgt_valid & ~tgt_blocked,
    )
    lvl_best = tgt_octave[best]
    lvl_second = tgt_octave[second]

    matched = best_d <= TH_HIGH
    ratio_fail = (lvl_best == lvl_second) & (
        best_d.astype(jnp.float32) > ratio * second_d.astype(jnp.float32)
    ) & (second_d < BIG)
    matched &= ~ratio_fail

    # per-target dedup: later source wins (reference assignment order)
    src_ids = jnp.arange(MAX_LOCAL_PTS, dtype=jnp.int32)
    tgt_slot = jnp.where(matched, best, N)
    winner = (
        jnp.full((N + 1,), -1, jnp.int32).at[tgt_slot].max(jnp.where(matched, src_ids, -1))[:N]
    )
    assign = jnp.where(winner >= 0, c_id[jnp.maximum(winner, 0)], -1)
    visible = (
        jnp.zeros((P,), bool)
        .at[jnp.where(c_ok, c_id, P - 1)]
        .max(c_ok)
        .at[P - 1]
        .set(False)
    )
    return LocalMatch(
        assign=assign,
        n_matches=jnp.sum(matched.astype(jnp.int32)),
        visible_mask=visible & candidate_mask,
    )
