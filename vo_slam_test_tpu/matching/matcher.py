"""Data association as dense masked Hamming-distance matrices.

The reference's matchers walk per-point grid buckets with scalar Hamming
distances (matcher.cpp). On TPU the whole candidate structure inverts: one
popcount distance matrix over all (source, target) pairs on the MXU/VPU,
spatial windows and octave gates as boolean masks, argmin + threshold +
rotation-consistency as reductions. Thresholds and gate constants are kept
bit-identical to the reference (TH_HIGH=100, TH_LOW=50, matcher.cpp:11-14).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming, match_pallas
from . import rotation

TH_HIGH = 100
TH_LOW = 50
BIG = jnp.int32(1 << 20)


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # [N_src] i32: matched target index, -1 if none
    dist: jnp.ndarray   # [N_src] i32: Hamming distance of the match
    count: jnp.ndarray  # i32 scalar: number of matches


@functools.partial(jax.jit, static_argnames=("check_rot",))
def search_by_projection_frame(
    # source = last frame's tracked points
    p_world: jnp.ndarray,      # [N, 3] world positions of last-frame points
    src_desc: jnp.ndarray,     # [N, 8] u32 (map point representative desc)
    src_octave: jnp.ndarray,   # [N] i32 (last-frame keypoint octave)
    src_angle: jnp.ndarray,    # [N] f32
    src_valid: jnp.ndarray,    # [N] bool (has point, not outlier)
    # target = current frame
    tgt_uv_und: jnp.ndarray,   # [M, 2]
    tgt_u_right: jnp.ndarray,  # [M]
    tgt_octave: jnp.ndarray,   # [M] i32
    tgt_angle: jnp.ndarray,    # [M] f32
    tgt_desc: jnp.ndarray,     # [M, 8] u32
    tgt_valid: jnp.ndarray,    # [M] bool
    tgt_blocked: jnp.ndarray,  # [M] bool: already bound to a real map point
    # geometry
    T_c_w: jnp.ndarray,        # [4, 4] current pose estimate
    T_l_w: jnp.ndarray,        # [4, 4] last frame pose
    scale_factors: jnp.ndarray,  # [L] f32
    fx, fy, cx, cy, bf, b,
    width: float, height: float,
    radius: float,
    check_rot: bool = True,
) -> MatchResult:
    """Frame-to-last-frame projection search (matcher.cpp:18-148).

    Forward/backward octave windows from the relative z-translation, square
    spatial window of radius * scale[src_octave], virtual-stereo consistency
    check, best-Hamming <= TH_HIGH, optional rotation-consistency filter.
    """
    R = T_c_w[:3, :3]
    t = T_c_w[:3, 3]
    pc = p_world @ R.T + t
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    invz = 1.0 / safe_z
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy

    in_img = (z > 0) & (u >= 0) & (u <= width) & (v >= 0) & (v <= height)
    src_ok = src_valid & in_img

    # forward/backward from T_last_curr translation z (matcher.cpp:36-40)
    T_l_c = T_l_w @ jnp.linalg.inv(T_c_w)
    tz = T_l_c[2, 3]
    forward = tz > b
    backward = -tz > b

    r_scale = radius * scale_factors[src_octave]  # [N]

    # octave window per source point (matcher.cpp:68-74)
    lo_f, hi_f = src_octave, jnp.full_like(src_octave, 10_000)
    lo_b, hi_b = jnp.zeros_like(src_octave), src_octave
    lo_n, hi_n = src_octave - 1, src_octave + 1
    lo = jnp.where(forward, lo_f, jnp.where(backward, lo_b, lo_n))
    hi = jnp.where(forward, hi_f, jnp.where(backward, hi_b, hi_n))

    # virtual-stereo consistency (matcher.cpp:88-95) + spatial window +
    # octave band, fused with the Hamming top-1 into one VMEM-resident
    # Pallas kernel on TPU (ops/match_pallas.py)
    ur_pred = u - bf * invz
    best, best_d, _, _ = match_pallas.masked_top2(
        src_desc, tgt_desc,
        u, v, r_scale, ur_pred, r_scale,
        lo, hi, src_ok,
        tgt_uv_und[:, 0], tgt_uv_und[:, 1], tgt_u_right, tgt_octave,
        tgt_valid & ~tgt_blocked,
    )
    matched = best_d <= TH_HIGH

    if check_rot:
        bins = rotation.rotation_bins(src_angle, tgt_angle[best])
        matched = rotation.rotation_consistency_mask(bins, matched)

    idx = jnp.where(matched, best, -1)
    return MatchResult(idx=idx, dist=best_d.astype(jnp.int32), count=jnp.sum(matched.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("check_rot",))
def search_by_projection_kf(
    # source: a keyframe's bound map points
    p_world: jnp.ndarray,      # [N,3] current positions of the KF's points
    src_desc: jnp.ndarray,     # [N,8] representative descriptors
    src_angle: jnp.ndarray,    # [N] source keypoint angles
    src_min_dist: jnp.ndarray,  # [N] scale-band bounds
    src_max_dist: jnp.ndarray,
    src_pt: jnp.ndarray,       # [N] i32 map point ids (-1 none)
    src_valid: jnp.ndarray,    # [N] bool (has live point, not in `found`)
    # target frame
    tgt_uv_und: jnp.ndarray,
    tgt_angle: jnp.ndarray,
    tgt_octave: jnp.ndarray,
    tgt_desc: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    tgt_blocked: jnp.ndarray,  # already matched slots
    T_c_w: jnp.ndarray,
    scale_factors: jnp.ndarray,
    fx, fy, cx, cy,
    width: float, height: float,
    radius: float,
    dist_threshold: float,     # 100 (first top-up) or 60 (second)
    check_rot: bool = True,
) -> MatchResult:
    """Relocalization top-up search (matcher.cpp:150-272): project the
    candidate keyframe's map points into the frame, distance-band gate,
    predicted-scale window [pred-1, pred+1], best-Hamming <= dist_threshold."""
    R = T_c_w[:3, :3]
    t = T_c_w[:3, 3]
    pc = p_world @ R.T + t
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * pc[:, 0] / safe_z + cx
    v = fy * pc[:, 1] / safe_z + cy
    ow = -R.T @ t
    dist = jnp.linalg.norm(p_world - ow, axis=-1)
    src_ok = (
        src_valid & (z > 0)
        & (u >= 0) & (u <= width) & (v >= 0) & (v <= height)
        # 0.8/1.2 invariance slack (mappoint.cpp:391-401)
        & (dist >= 0.8 * src_min_dist) & (dist <= 1.2 * src_max_dist)
    )
    # predictScale (mappoint.cpp:182-199)
    ratio = src_max_dist / jnp.maximum(dist, 1e-9)
    pred = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factors[1])).astype(jnp.int32)
    pred = jnp.clip(pred, 0, scale_factors.shape[0] - 1)
    r_scale = radius * scale_factors[pred]

    du = jnp.abs(tgt_uv_und[None, :, 0] - u[:, None])
    dv = jnp.abs(tgt_uv_und[None, :, 1] - v[:, None])
    window = (du < r_scale[:, None]) & (dv < r_scale[:, None])
    oct_ok = (tgt_octave[None, :] >= (pred - 1)[:, None]) & (tgt_octave[None, :] <= (pred + 1)[:, None])
    allowed = window & oct_ok & src_ok[:, None] & tgt_valid[None, :] & ~tgt_blocked[None, :]

    D = hamming.distance_matrix(src_desc, tgt_desc)
    D = jnp.where(allowed, D, BIG)
    best = jnp.argmin(D, axis=1).astype(jnp.int32)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    matched = best_d <= dist_threshold

    if check_rot:
        bins = rotation.rotation_bins(src_angle, tgt_angle[best])
        matched = rotation.rotation_consistency_mask(bins, matched)

    idx = jnp.where(matched, best, -1)
    return MatchResult(idx=idx, dist=best_d.astype(jnp.int32), count=jnp.sum(matched.astype(jnp.int32)))
