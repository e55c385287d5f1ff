"""BoW-bucketed keyframe<->frame descriptor matching.

Matcher::searchByBoW (reference: matcher.cpp:449-559): candidates are
restricted to keypoints under the same vocabulary node (featVec bucket at
tree level 3), the keyframe side must carry a map point, the frame side must
be free; gates: best <= TH_LOW and best < ratio * second-best, plus the
rotation-consistency histogram.

TPU form: one dense masked distance matrix where the bucket restriction is a
group-id equality mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming
from . import rotation

TH_LOW = 50
BIG = jnp.int32(1 << 20)


class BowMatchResult(NamedTuple):
    assign: jnp.ndarray   # [N_frame] i32 map-point id (-1 none)
    count: jnp.ndarray    # i32
    src_kp: jnp.ndarray   # [N_frame] i32 matched keyframe keypoint (-1 none)


@functools.partial(jax.jit, static_argnames=("check_rot",))
def search_by_bow_kf_frame(
    kf_desc: jnp.ndarray,      # [N,8] keyframe descriptors
    kf_groups: jnp.ndarray     # [N] i32 level-3 node id (-1 invalid)
    ,
    kf_mp: jnp.ndarray,        # [N] i32 map point per keyframe kp (-1 none)
    kf_angle: jnp.ndarray,
    kf_pt_valid: jnp.ndarray,  # [N] bool: the bound map point is alive
    f_desc: jnp.ndarray,       # [M,8] frame descriptors
    f_groups: jnp.ndarray,     # [M] i32
    f_angle: jnp.ndarray,
    f_valid: jnp.ndarray,      # [M]
    ratio: float,
    check_rot: bool = True,
) -> BowMatchResult:
    src_ok = (kf_mp >= 0) & kf_pt_valid & (kf_groups >= 0)
    tgt_ok = f_valid & (f_groups >= 0)
    same_group = kf_groups[:, None] == f_groups[None, :]
    allowed = same_group & src_ok[:, None] & tgt_ok[None, :]

    D = jnp.where(allowed, hamming.distance_matrix(kf_desc, f_desc), BIG)
    best = jnp.argmin(D, axis=1).astype(jnp.int32)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    D2 = D.at[jnp.arange(D.shape[0]), best].set(BIG)
    second_d = jnp.min(D2, axis=1)
    matched = (best_d <= TH_LOW) & (
        best_d.astype(jnp.float32) < ratio * second_d.astype(jnp.float32)
    )

    if check_rot:
        bins = rotation.rotation_bins(kf_angle, f_angle[best])
        matched = rotation.rotation_consistency_mask(bins, matched)

    # one source per frame keypoint: last writer wins (reference overwrite)
    n_src = kf_desc.shape[0]
    n_tgt = f_desc.shape[0]
    src_ids = jnp.arange(n_src, dtype=jnp.int32)
    winner = (
        jnp.full((n_tgt + 1,), -1, jnp.int32)
        .at[jnp.where(matched, best, n_tgt)]
        .max(jnp.where(matched, src_ids, -1))[:n_tgt]
    )
    assign = jnp.where(winner >= 0, kf_mp[jnp.maximum(winner, 0)], -1)
    return BowMatchResult(
        assign=assign,
        count=jnp.sum(matched.astype(jnp.int32)),
        src_kp=winner,
    )
