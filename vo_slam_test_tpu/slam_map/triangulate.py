"""New map-point creation by epipolar triangulation (one jit).

Covers LocalMapping::createNewMapPoints (reference: localMapping.cpp:132-361)
and Matcher::searchForTriangulation + checkEpipolarConstrain
(matcher.cpp:867-1010, 1306-1324):

- candidates = unmatched keypoints of the new KF vs its 10 best covisible
  neighbors (baseline > b gate, localMapping.cpp:172-174);
- the reference prunes candidate pairs to shared BoW words before the
  Hamming test — a CPU optimization; the TPU form searches the full masked
  distance matrix (TH_LOW=50, epipolar 3.84 sigma^2 gate, epipole-proximity
  gate for mono-mono pairs) which is a superset of the BoW-bucketed search;
- parallax arbitration between ray angle and virtual-stereo depth
  (localMapping.cpp:215-262): SVD homogeneous triangulation when the ray
  parallax is reliable, otherwise depth back-projection from whichever view
  has the closer stereo depth;
- chi2 reprojection gates in both views (5.991/7.815) and the
  scale-consistency band (1.5x ratio, localMapping.cpp:330-341);
- each new keypoint binds at most one new point: the reference walks
  neighbors sequentially and marks keypoints taken; the TPU form matches
  all neighbors in parallel and keeps each kp's first (best-covisible)
  valid pair.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import lie
from ..camera import Camera
from ..matching.rotation import rotation_bins, rotation_consistency_mask
from ..ops import match_pallas
from .map_state import MapCaps, MapState, add_observations, covis_row_for
from .insert import refresh_points

N_NEIGHBORS = 10
TH_LOW = 50


def _f12(T1, T2, K):
    """Fundamental matrix between cam1 and cam2 (localMapping.cpp:526-536):
    F12 = K^-T [t12]_x R12 K^-1 with T12 = T1 * T2^-1."""
    T12 = T1 @ lie.se3_inverse(T2)
    R12 = T12[:3, :3]
    t12 = T12[:3, 3]
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ lie.hat(t12) @ R12 @ Kinv


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def create_new_map_points(
    m: MapState,
    kf_id: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    bow_group_div: jnp.ndarray | None = None,
) -> MapState:
    """bow_group_div: k^levels_up of the loaded vocabulary (device i32;
    0/None disables). When set, candidate pairs are restricted to the same
    featVec bucket (word id // div) exactly like the reference's
    searchForTriangulation lockstep node walk (matcher.cpp:903-965 iterates
    featVec nodes at levelsup=3; frame.cpp:249-254). Keypoints without a
    word (or no vocabulary) stay unrestricted — the full epipolar-gated
    search is the documented superset fallback."""
    K_cap = m.kf_valid.shape[0]
    P = caps.max_pt
    N = caps.n_feat
    K_mat = cam.K
    if bow_group_div is None:
        bow_group_div = jnp.asarray(0, jnp.int32)
    safe_div = jnp.maximum(bow_group_div, 1)

    def groups_of(words):
        return jnp.where((words >= 0) & (bow_group_div > 0), words // safe_div, -1)

    # ---- neighbor selection (top-10 covisible, localMapping.cpp:136) ------
    w_row = m.covis[kf_id] * m.kf_valid.astype(jnp.int32)
    order = jnp.argsort(-w_row)
    nb_ids = jnp.where(w_row[order][:N_NEIGHBORS] > 0, order[:N_NEIGHBORS], -1).astype(jnp.int32)

    T1 = m.kf_pose[kf_id]
    ow1 = lie.se3_inverse(T1)[:3, 3]
    free1 = (m.kf_mp[kf_id] < 0) & m.kf_kp_valid[kf_id]          # unmatched kps
    uv1 = m.kf_uv_und[kf_id]
    oct1 = m.kf_octave[kf_id]
    ang1 = m.kf_angle[kf_id]
    ur1 = m.kf_u_right[kf_id]
    d1 = m.kf_depth[kf_id]
    desc1 = m.kf_desc[kf_id]
    pc1 = jnp.stack(
        [(uv1[:, 0] - cam.cx) / cam.fx, (uv1[:, 1] - cam.cy) / cam.fy, jnp.ones((N,))], -1
    )
    ray1 = pc1 @ T1[:3, :3]            # R1^T * pc1 (world ray)

    def per_neighbor(nbs, T2):
        # nbs is a valid neighbor id with baseline > b (gated by the cond)
        F12 = _f12(T1, T2, K_mat)

        free2 = (m.kf_mp[nbs] < 0) & m.kf_kp_valid[nbs]
        uv2 = m.kf_uv_und[nbs]
        oct2 = m.kf_octave[nbs]
        ur2 = m.kf_u_right[nbs]

        # epipole of cam1 in image 2 (matcher.cpp:888-892)
        C2 = lie.transform_point(T2, ow1)
        e_uv = cam.camera2pixel(C2)
        dist_e2 = jnp.sum((uv2 - e_uv[None, :]) ** 2, axis=-1)  # [N2]
        # epipolar line of each kp1 in image 2 (matcher.cpp:1306-1324)
        p1h = jnp.concatenate([uv1, jnp.ones((N, 1))], -1)
        l2 = p1h @ F12                                         # [N,3]
        den = l2[:, 0] ** 2 + l2[:, 1] ** 2
        sigma2_2 = scale_factors[oct2] ** 2

        # featVec bucket restriction (searchForTriangulation's lockstep
        # node walk); unknown words escape the gate
        g1 = groups_of(m.kf_word[kf_id])
        g2 = groups_of(m.kf_word[nbs])

        # fused masked-Hamming top-1 with the epipolar gate in PRODUCT form
        # num^2 < den*thr (ops/match_pallas.py) — identical to the division
        # form except on exactly-degenerate zero lines, which it rejects
        best2, best_d = match_pallas.masked_top1_epi(
            desc1, m.kf_desc[nbs],
            l2, den, g1, free1, ur1 < 0,
            uv2[:, 0], uv2[:, 1], 3.84 * sigma2_2, g2, free2,
            (ur2 < 0) & (dist_e2 < 100.0 * scale_factors[oct2]),
        )
        has = best_d <= TH_LOW
        # rotation consistency (searchForTriangulation checkRot default)
        bins = rotation_bins(ang1, m.kf_angle[nbs][best2])
        has = rotation_consistency_mask(bins, has)
        # per-kp2 dedup: earliest kp1 wins (greedy order, matcher.cpp:954-956)
        kp1_ids = jnp.arange(N, dtype=jnp.int32)
        claim = (
            jnp.full((N + 1,), N, jnp.int32)
            .at[jnp.where(has, best2, N)]
            .min(jnp.where(has, kp1_ids, N))[:N]
        )
        has = has & (claim[jnp.maximum(best2, 0)] == kp1_ids)
        return has, best2

    # fori + cond instead of vmap: most neighbor slots are empty (or fail
    # the baseline gate) for small maps, and the cond skips the whole
    # [N,N] search for them — the same gating that made fuse 13 ms cheaper.
    def nb_step(i, acc):
        has_acc, best2_acc = acc
        nb = nb_ids[i]
        nbs = jnp.maximum(nb, 0)
        T2 = m.kf_pose[nbs]
        ow2 = lie.se3_inverse(T2)[:3, 3]
        gate = (nb >= 0) & (jnp.linalg.norm(ow2 - ow1) > cam.b)
        has, best2 = jax.lax.cond(
            gate,
            lambda: per_neighbor(nbs, T2),
            lambda: (jnp.zeros((N,), bool), jnp.zeros((N,), jnp.int32)),
        )
        return has_acc.at[i].set(has), best2_acc.at[i].set(best2)

    has_arr, best2_arr = jax.lax.fori_loop(
        0, N_NEIGHBORS, nb_step,
        (jnp.zeros((N_NEIGHBORS, N), bool), jnp.zeros((N_NEIGHBORS, N), jnp.int32)),
    )
    nb_arr = nb_ids

    # each kp1 keeps its first valid neighbor (covisibility order)
    first_nb = jnp.argmax(has_arr, axis=0)                      # [N]
    any_nb = jnp.any(has_arr, axis=0)
    nb_sel = nb_arr[first_nb]                                   # neighbor kf id
    kp2_sel = jnp.take_along_axis(best2_arr, first_nb[None, :], axis=0)[0]

    # ---- triangulate selected pairs ---------------------------------------
    nbs = jnp.maximum(nb_sel, 0)
    T2 = m.kf_pose[nbs]                                         # [N,4,4]
    uv2 = m.kf_uv_und[nbs, kp2_sel]
    oct2 = m.kf_octave[nbs, kp2_sel]
    ur2 = m.kf_u_right[nbs, kp2_sel]
    d2 = m.kf_depth[nbs, kp2_sel]
    ow2 = jax.vmap(lie.se3_inverse)(T2)[:, :3, 3]

    pc2 = jnp.stack(
        [(uv2[:, 0] - cam.cx) / cam.fx, (uv2[:, 1] - cam.cy) / cam.fy, jnp.ones((N,))], -1
    )
    ray2 = jnp.einsum("nij,nj->ni", jnp.swapaxes(T2[:, :3, :3], 1, 2), pc2)
    cos_ray = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12
    )
    stereo1 = ur1 >= 0
    stereo2 = ur2 >= 0
    cos_d1 = jnp.where(stereo1, jnp.cos(2.0 * jnp.arctan2(0.5 * cam.b, jnp.maximum(d1, 1e-6))), 2.0)
    cos_d2 = jnp.where(~stereo1 & stereo2, jnp.cos(2.0 * jnp.arctan2(0.5 * cam.b, jnp.maximum(d2, 1e-6))), 2.0)
    cos_depth = jnp.minimum(cos_d1, cos_d2)

    use_svd = (cos_ray > 0) & (cos_ray < cos_depth) & (stereo1 | stereo2 | (cos_ray < 0.9998))

    # homogeneous DLT rows (localMapping.cpp:236-252)
    P1 = T1[:3, :4]
    P2 = T2[:, :3, :4]
    A = jnp.stack(
        [
            pc1[:, 0, None] * P1[None, 2] - P1[None, 0],
            pc1[:, 1, None] * P1[None, 2] - P1[None, 1],
            pc2[:, 0, None] * P2[:, 2] - P2[:, 0],
            pc2[:, 1, None] * P2[:, 2] - P2[:, 1],
        ],
        axis=1,
    )  # [N,4,4]
    # null vector via smallest right singular vector
    _, _, vt = jnp.linalg.svd(A)
    xh = vt[:, 3, :]
    w_ok = jnp.abs(xh[:, 3]) > 1e-8
    p_svd = xh[:, :3] / jnp.where(w_ok, xh[:, 3], 1.0)[:, None]

    p_d1 = cam.pixel2world(uv1, jnp.maximum(d1, 1e-6), T1)
    T2_sel = T2
    p_d2 = jax.vmap(lambda uv, d, T: cam.pixel2world(uv, d, T))(uv2, jnp.maximum(d2, 1e-6), T2_sel)

    use_d1 = ~use_svd & stereo1 & (cos_d1 < cos_d2)
    use_d2 = ~use_svd & stereo2 & (cos_d2 < cos_d1)
    p3d = jnp.where(use_svd[:, None], p_svd, jnp.where(use_d1[:, None], p_d1, p_d2))
    ok = any_nb & (use_svd & w_ok | use_d1 | use_d2)

    # chi2 reprojection gates in both views (localMapping.cpp:270-321)
    def reproj_gate(T, uv, ur, octv, p):
        pc = jnp.einsum("nij,nj->ni", T[:, :3, :3], p) + T[:, :3, 3]
        z = pc[:, 2]
        pos = z > 0
        invz = 1.0 / jnp.where(pos, z, 1.0)
        u = cam.fx * pc[:, 0] * invz + cam.cx
        v = cam.fy * pc[:, 1] * invz + cam.cy
        e2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inv_s2 = 1.0 / scale_factors[octv] ** 2
        st = ur >= 0
        e2s = e2 + jnp.where(st, (u - cam.bf * invz - ur) ** 2, 0.0)
        chi = jnp.where(st, e2s, e2) * inv_s2
        gate = jnp.where(st, 7.815, 5.991)
        return pos & (chi <= gate)

    T1b = jnp.broadcast_to(T1, (N, 4, 4))
    ok &= reproj_gate(T1b, uv1, ur1, oct1, p3d)
    ok &= reproj_gate(T2, uv2, ur2, oct2, p3d)

    # scale consistency (localMapping.cpp:330-341)
    dist1 = jnp.linalg.norm(p3d - ow1[None], axis=-1)
    dist2 = jnp.linalg.norm(p3d - ow2, axis=-1)
    ok &= (dist1 > 1e-6) & (dist2 > 1e-6)
    ratio_d = dist2 / jnp.maximum(dist1, 1e-9)
    ratio_s = scale_factors[oct1] / scale_factors[oct2]
    sf = 1.5 * scale_factors[1]
    ok &= ~((ratio_d * sf < ratio_s) | (ratio_d > ratio_s * sf))

    # ---- allocate + write new points (recycling culled slots) -------------
    from .insert import allocate_point_slots

    new_ids = allocate_point_slots(m, ok)
    in_cap = ok & (new_ids >= 0)
    rows = jnp.where(in_cap, new_ids, P - 1)

    line = p3d - ow1[None]
    dist = jnp.linalg.norm(line, axis=-1)
    normal = line / jnp.maximum(dist, 1e-9)[:, None]
    max_d = dist * scale_factors[oct1]
    min_d = max_d / scale_factors[-1]
    m = m.replace(
        pt_pos=m.pt_pos.at[rows].set(jnp.where(in_cap[:, None], p3d, m.pt_pos[rows])),
        pt_normal=m.pt_normal.at[rows].set(jnp.where(in_cap[:, None], normal, m.pt_normal[rows])),
        pt_desc=m.pt_desc.at[rows].set(jnp.where(in_cap[:, None], desc1, m.pt_desc[rows])),
        pt_min_dist=m.pt_min_dist.at[rows].set(jnp.where(in_cap, min_d, m.pt_min_dist[rows])),
        pt_max_dist=m.pt_max_dist.at[rows].set(jnp.where(in_cap, max_d, m.pt_max_dist[rows])),
        pt_ref_kf=m.pt_ref_kf.at[rows].set(jnp.where(in_cap, kf_id, m.pt_ref_kf[rows])),
        pt_valid=m.pt_valid.at[rows].set(jnp.where(in_cap, True, m.pt_valid[rows])),
        pt_gen=m.pt_gen.at[rows].add(in_cap.astype(jnp.int32)),
        pt_found=m.pt_found.at[rows].set(jnp.where(in_cap, 1, m.pt_found[rows])),
        pt_visible=m.pt_visible.at[rows].set(jnp.where(in_cap, 1, m.pt_visible[rows])),
        n_pt=jnp.minimum(m.n_pt + jnp.sum(in_cap.astype(jnp.int32)), P),
    )

    # bind keypoints in both keyframes + observations
    kp1_ids = jnp.arange(N, dtype=jnp.int32)
    m = m.replace(
        kf_mp=m.kf_mp.at[kf_id, kp1_ids].max(jnp.where(in_cap, rows, -1))
    )
    m = add_observations(m, rows, kf_id, kp1_ids, in_cap)
    # neighbor side: scatter (nb, kp2) -> point (unique by the kp2 dedup)
    nb_w = jnp.where(in_cap, nb_sel, K_cap - 1)
    kp2_w = jnp.where(in_cap, kp2_sel, N - 1)
    m = m.replace(
        kf_mp=m.kf_mp.at[nb_w, kp2_w].set(jnp.where(in_cap, rows, m.kf_mp[nb_w, kp2_w]))
    )
    # per-point neighbor observation (one per point; points are unique rows)
    O = m.pt_obs_kf.shape[1]
    free = m.pt_obs_kf[rows] < 0
    slot = jnp.argmax(free, axis=1)
    can = in_cap & jnp.any(free, axis=1)
    pr = jnp.where(can, rows, P - 1)
    pcol = jnp.where(can, slot, O - 1)
    m = m.replace(
        pt_obs_kf=m.pt_obs_kf.at[pr, pcol].set(jnp.where(can, nb_sel, m.pt_obs_kf[pr, pcol])),
        pt_obs_kp=m.pt_obs_kp.at[pr, pcol].set(jnp.where(can, kp2_sel, m.pt_obs_kp[pr, pcol])),
        pt_obs_cnt=m.pt_obs_cnt.at[jnp.where(can, rows, P - 1)].add(jnp.where(can, 1, 0)),
    )

    # refresh stats of the new points; update covisibility row of kf_id
    touched = jnp.zeros((P,), bool).at[rows].max(in_cap)
    m = refresh_points(m, touched, scale_factors)
    member = jnp.zeros((P,), bool).at[jnp.maximum(m.kf_mp[kf_id], 0)].max(m.kf_mp[kf_id] >= 0)
    w = covis_row_for(m, member).at[kf_id].set(0)
    m = m.replace(covis=m.covis.at[kf_id, :].set(w).at[:, kf_id].set(w))
    return m
