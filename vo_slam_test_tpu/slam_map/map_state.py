"""Device-resident SLAM map as padded struct-of-arrays.

Replaces the reference's pointer-graph map (KeyFrame*/MapPoint* objects with
per-object mutexes; reference: keyframe.h, mappoint.h, map.h) with fixed-
capacity masked arrays living on device. All mutation is pure jitted
functions returning a new MapState (XLA aliases buffers via donation at the
call sites that dominate), and the host pipeline swaps the reference
atomically — which removes the reference's lock discipline by construction
(SURVEY.md §5 race-detection row).

Capacities are static (jit-stable); growth beyond capacity drops the oldest
erase candidates first (the reference's own culling keeps both counts well
below these bounds on the TUM sequences).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import lie
from ..camera import Camera
from ..frontend.frame import MAX_FEATURES, FrameFeatures


@dataclasses.dataclass(frozen=True)
class MapCaps:
    """Static capacities (hashable; a jit static argument)."""

    max_kf: int = 256
    max_pt: int = 24576
    max_obs: int = 24           # per-point observer slots
    n_feat: int = MAX_FEATURES  # keypoints per keyframe


@struct.dataclass
class MapState:
    # -- keyframes ----------------------------------------------------------
    kf_pose: jnp.ndarray       # [K,4,4] T_c_w
    kf_valid: jnp.ndarray      # [K] bool (inserted and not culled)
    kf_timestamp: jnp.ndarray  # [K] f32
    kf_frame_id: jnp.ndarray   # [K] i32 source frame id
    # per-keyframe feature snapshot (frame.h:19-53 equivalents)
    kf_uv_und: jnp.ndarray     # [K,N,2]
    kf_octave: jnp.ndarray     # [K,N] i32
    kf_angle: jnp.ndarray      # [K,N] f32
    kf_depth: jnp.ndarray      # [K,N] f32 (-1 none)
    kf_u_right: jnp.ndarray    # [K,N] f32 (-1 none)
    kf_desc: jnp.ndarray       # [K,N,8] u32
    kf_kp_valid: jnp.ndarray   # [K,N] bool
    kf_mp: jnp.ndarray         # [K,N] i32 map-point id per keypoint (-1 none)
    # -- bag of words (DBoW3 BowVector/FeatureVector roles, frame.h:47-49) --
    kf_word: jnp.ndarray       # [K,N] i32 vocabulary word per keypoint (-1)
    kf_bow_word: jnp.ndarray   # [K,N] i32 sorted unique words (PAD_WORD pad)
    kf_bow_weight: jnp.ndarray  # [K,N] f32 L1-normalized tf-idf weights
    # -- covisibility / spanning tree (keyframe.h:34-43) --------------------
    covis: jnp.ndarray         # [K,K] i32 shared-point counts
    parent: jnp.ndarray        # [K] i32 spanning-tree parent (-1 root)
    kf_tcp: jnp.ndarray        # [K,4,4] pose relative to parent at cull time
                               # (keyframe.cpp:486 Tcp backup for recovery;
                               # NOT reset on slot reuse — it archives the
                               # last culled generation for trajectory
                               # recovery)
    cull_parent: jnp.ndarray   # [K] i32 spanning-tree parent at cull time
                               # (paired with kf_tcp; survives slot reuse)
    kf_gen: jnp.ndarray        # [K] i32 slot generation (bumped on insert;
                               # distinguishes a reused slot from the
                               # keyframe a frame originally referenced)
    kf_seq: jnp.ndarray        # [K] i32 monotonic insertion sequence number
                               # (the reference's KeyFrame::id_ — slot ids
                               # stop being creation-ordered once recycling
                               # starts, but loop cadence and "recent KF"
                               # logic need creation order)
    cull_parent_gen: jnp.ndarray  # [K] i32 kf_gen of cull_parent at cull
                               # time; trajectory recovery must refuse to
                               # compose through a parent slot that was
                               # itself culled and reused since
    cull_gen: jnp.ndarray      # [K] i32 kf_gen of the generation the
                               # (kf_tcp, cull_parent) archive describes —
                               # the archive holds only the most recent
                               # culled generation per slot
    loop_edges: jnp.ndarray    # [K,K] bool loop-closure edges (keyframe.cpp:528-533)
    # -- map points (mappoint.h:13-94) --------------------------------------
    pt_pos: jnp.ndarray        # [P,3] f32
    pt_normal: jnp.ndarray     # [P,3] f32
    pt_desc: jnp.ndarray       # [P,8] u32 representative descriptor
    pt_min_dist: jnp.ndarray   # [P] f32
    pt_max_dist: jnp.ndarray   # [P] f32
    pt_ref_kf: jnp.ndarray     # [P] i32
    pt_obs_kf: jnp.ndarray     # [P,O] i32 observing keyframe ids (-1 empty)
    pt_obs_kp: jnp.ndarray     # [P,O] i32 keypoint index within that KF
    pt_obs_cnt: jnp.ndarray    # [P] i32
    pt_found: jnp.ndarray      # [P] i32 (mappoint.cpp:269-279)
    pt_visible: jnp.ndarray    # [P] i32
    pt_valid: jnp.ndarray      # [P] bool
    pt_gen: jnp.ndarray        # [P] i32 slot generation (bumped on spawn;
                               # a recycled slot must not silently rebind a
                               # stale reference to a different landmark)
    # -- allocators ---------------------------------------------------------
    n_kf: jnp.ndarray          # i32 scalar
    n_pt: jnp.ndarray          # i32 scalar
    n_kf_ever: jnp.ndarray     # i32 scalar: next kf_seq to assign


def empty_map(caps: MapCaps) -> MapState:
    K, P, O, N = caps.max_kf, caps.max_pt, caps.max_obs, caps.n_feat
    f = jnp.zeros
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
        kf_valid=f((K,), bool),
        kf_timestamp=f((K,)),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_uv_und=f((K, N, 2)),
        kf_octave=f((K, N), jnp.int32),
        kf_angle=f((K, N)),
        kf_depth=jnp.full((K, N), -1.0),
        kf_u_right=jnp.full((K, N), -1.0),
        kf_desc=f((K, N, 8), jnp.uint32),
        kf_kp_valid=f((K, N), bool),
        kf_mp=jnp.full((K, N), -1, jnp.int32),
        kf_word=jnp.full((K, N), -1, jnp.int32),
        kf_bow_word=jnp.full((K, N), 1 << 30, jnp.int32),
        kf_bow_weight=f((K, N)),
        covis=f((K, K), jnp.int32),
        parent=jnp.full((K,), -1, jnp.int32),
        kf_tcp=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
        cull_parent=jnp.full((K,), -1, jnp.int32),
        cull_parent_gen=jnp.full((K,), -1, jnp.int32),
        cull_gen=jnp.full((K,), -1, jnp.int32),
        kf_gen=f((K,), jnp.int32),
        kf_seq=jnp.full((K,), -1, jnp.int32),
        loop_edges=f((K, K), bool),
        pt_pos=f((P, 3)),
        pt_normal=f((P, 3)),
        pt_desc=f((P, 8), jnp.uint32),
        pt_min_dist=f((P,)),
        pt_max_dist=f((P,)),
        pt_ref_kf=jnp.full((P,), -1, jnp.int32),
        pt_obs_kf=jnp.full((P, O), -1, jnp.int32),
        pt_obs_kp=jnp.full((P, O), -1, jnp.int32),
        pt_obs_cnt=f((P,), jnp.int32),
        pt_found=f((P,), jnp.int32),
        pt_visible=f((P,), jnp.int32),
        pt_valid=f((P,), bool),
        pt_gen=f((P,), jnp.int32),
        n_kf=jnp.asarray(0, jnp.int32),
        n_pt=jnp.asarray(0, jnp.int32),
        n_kf_ever=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# primitive update helpers (pure; used by the bigger jitted ops)
# ---------------------------------------------------------------------------


def add_observations(
    m: MapState, pt_ids: jnp.ndarray, kf_id, kp_ids: jnp.ndarray, mask: jnp.ndarray
) -> MapState:
    """Append (kf_id, kp) to each point's observer list (mappoint addObservation).

    pt_ids/kp_ids/mask: [n], at most one new observation per point per call
    (true for keyframe insertion). The first free slot (obs_kf < 0) is used,
    so lists tolerate holes left by BA observation erasure; observations
    beyond the slot cap are dropped (the count still increments so
    obs-based gates stay faithful).
    """
    P, O = m.pt_obs_kf.shape
    safe_pt = jnp.where(mask, pt_ids, P - 1)
    free = m.pt_obs_kf[safe_pt] < 0  # [n, O]
    slot = jnp.argmax(free, axis=1).astype(jnp.int32)
    in_cap = mask & jnp.any(free, axis=1)
    # route dropped writes to a scratch coordinate (last point, last slot)
    row = jnp.where(in_cap, safe_pt, P - 1)
    col = jnp.where(in_cap, slot, O - 1)
    obs_kf = m.pt_obs_kf.at[row, col].set(
        jnp.where(in_cap, jnp.asarray(kf_id, jnp.int32), m.pt_obs_kf[row, col])
    )
    obs_kp = m.pt_obs_kp.at[row, col].set(
        jnp.where(in_cap, kp_ids.astype(jnp.int32), m.pt_obs_kp[row, col])
    )
    cnt = m.pt_obs_cnt.at[safe_pt].add(mask.astype(jnp.int32))
    return m.replace(pt_obs_kf=obs_kf, pt_obs_kp=obs_kp, pt_obs_cnt=cnt)


def covis_row_for(m: MapState, pt_member: jnp.ndarray) -> jnp.ndarray:
    """[P] bool membership -> [K] shared-point counts against every KF.

    The covisibility weight of updateConnections (keyframe.cpp:69-152) as a
    dense gather-reduce over the kf_mp table.
    """
    safe = jnp.maximum(m.kf_mp, 0)
    shared = pt_member[safe] & (m.kf_mp >= 0)  # [K,N]
    return jnp.sum(shared.astype(jnp.int32), axis=1) * m.kf_valid.astype(jnp.int32)
