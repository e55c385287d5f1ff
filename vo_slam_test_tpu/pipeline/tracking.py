"""Frame-to-frame visual odometry (Milestone A: the fr1_xyz slice).

Implements the reference's constant-velocity motion tracking loop
(reference: visualOdometry.cpp:225-255 trackWithMotion, :544-593
updateLastFrame) without a persistent map: every frame spawns temporary 3D
points from its RGB-D depth (closest-100-or-thDepth rule), the next frame
matches against them by projection (r=15, retry 2r, >=20 matches) and runs
the two-round pose-only solve (>=10 inliers).

The full VO state machine (keyframes, local map tracking, relocalization)
builds on top of this in pipeline/system.py.

Host/device split: extraction (2 jits + host quadtree), then ONE jitted
track step per radius attempt; the only host branches read back two scalars
(match count, inlier count) — mirroring the reference's integer gates.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flax import struct

from .. import lie
from ..camera import Camera
from ..config import SlamConfig
from ..frontend.extractor import OrbExtractor, extract_fused
from ..frontend.frame import FrameFeatures
from ..matching import matcher
from ..solvers import pose_only


@functools.partial(jax.jit, static_argnames=())
def _spawn_temp_points(
    feats: FrameFeatures, T_c_w: jnp.ndarray, cam: Camera
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project keypoints with depth into world points.

    Valid set follows updateLastFrame (visualOdometry.cpp:565-593): take
    points sorted by increasing depth until depth > thDepth AND count > 100.
    Returns (p_world [N,3], valid [N]).
    """
    d = feats.depth
    has_d = (d > 0) & feats.valid
    pw = cam.pixel2world(feats.uv_und, jnp.where(has_d, d, 1.0), T_c_w)
    # rank among valid-depth points, ascending depth
    key = jnp.where(has_d, d, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.empty_like(order).at[order].set(jnp.arange(order.shape[0]))
    # rank <= 100 keeps 101 points: the reference breaks AFTER spawning the
    # point that makes point_cnt > 100 (visualOdometry.cpp:590-592), so
    # ranks 0..100 all spawn — this is exact, not an off-by-one
    valid = has_d & ((d <= cam.th_depth) | (rank <= 100))
    return pw, valid


@functools.partial(jax.jit, static_argnames=("check_rot",))
def _match_and_solve(
    curr: FrameFeatures,
    last: FrameFeatures,
    last_points: jnp.ndarray,
    last_pt_valid: jnp.ndarray,
    T_pred: jnp.ndarray,
    T_last: jnp.ndarray,
    scale_factors: jnp.ndarray,
    inv_level_sigma2: jnp.ndarray,
    cam: Camera,
    radius: float,
    check_rot: bool = True,
):
    """One projection-search + pose-solve attempt at the given radius."""
    res = matcher.search_by_projection_frame(
        p_world=last_points,
        src_desc=last.desc,
        src_octave=last.octave,
        src_angle=last.angle,
        src_valid=last_pt_valid,
        tgt_uv_und=curr.uv_und,
        tgt_u_right=curr.u_right,
        tgt_octave=curr.octave,
        tgt_angle=curr.angle,
        tgt_desc=curr.desc,
        tgt_valid=curr.valid,
        tgt_blocked=jnp.zeros(curr.valid.shape, bool),
        T_c_w=T_pred,
        T_l_w=T_last,
        scale_factors=scale_factors,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf, b=cam.b,
        width=float(cam.width), height=float(cam.height),
        radius=radius,
        check_rot=check_rot,
    )

    # resolve duplicate targets: reference overwrites in src-index order, so
    # the largest src index wins (matcher.cpp:108-110 assignment semantics)
    n_src = res.idx.shape[0]
    n_tgt = curr.valid.shape[0]
    matched = res.idx >= 0
    tgt = jnp.where(matched, res.idx, n_tgt)  # invalid rows scatter to a dump slot
    src_ids = jnp.arange(n_src, dtype=jnp.int32)
    assign = (
        jnp.full((n_tgt + 1,), -1, jnp.int32)
        .at[tgt]
        .max(jnp.where(matched, src_ids, -1))[:n_tgt]
    )

    has_pt = assign >= 0
    src_safe = jnp.maximum(assign, 0)
    obs = pose_only.PoseObs(
        p_world=last_points[src_safe],
        uv=curr.uv_und,
        u_right=jnp.where(has_pt, curr.u_right, -1.0),
        inv_sigma2=inv_level_sigma2[curr.octave],
        valid=has_pt,
    )
    T_new, inlier_mask, n_inliers = pose_only.solve_pose_only(
        T_pred, obs, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, fast=True
    )
    return T_new, inlier_mask, n_inliers, res.count, assign


@dataclasses.dataclass
class TrackStats:
    n_features: int = 0
    n_matches: int = 0
    n_inliers: int = 0
    ok: bool = False


class FrameToFrameTracker:
    """Milestone-A visual odometry over an RGB-D stream."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.camera = Camera.from_config(cfg)
        self.extractor = OrbExtractor(
            self.camera,
            n_features=cfg.num_of_features,
            scale_factor=cfg.scale_factor,
            n_levels=cfg.level_pyramid,
            fast_hi=cfg.ini_fast_threshold,
            fast_lo=cfg.min_fast_threshold,
        )
        spec = self.extractor.spec
        self.scale_factors = jnp.asarray(spec.scales)
        self.inv_level_sigma2 = jnp.asarray(spec.inv_level_sigma2)

        self.last_feats: Optional[FrameFeatures] = None
        self.T_last = jnp.eye(4, dtype=jnp.float32)   # T_c_w of last frame
        self.T_cl = jnp.eye(4, dtype=jnp.float32)     # motion model
        self.motion_valid = False
        self.trajectory: List[np.ndarray] = []        # T_w_c per frame
        self.timestamps: List[float] = []
        self.states: List[bool] = []
        self.stats: List[TrackStats] = []

    def track(self, gray: np.ndarray, depth: np.ndarray, timestamp: float) -> TrackStats:
        feats = self.extractor(gray, depth)
        st = TrackStats(n_features=int(np.asarray(feats.valid).sum()))

        if self.last_feats is None:
            T = jnp.eye(4, dtype=jnp.float32)
            st.ok = True
        else:
            T_pred = (self.T_cl @ self.T_last) if self.motion_valid else self.T_last
            last_points, last_valid = _spawn_temp_points(self.last_feats, self.T_last, self.camera)
            T, inl, n_inl, n_match, _ = _match_and_solve(
                feats, self.last_feats, last_points, last_valid,
                T_pred, self.T_last, self.scale_factors, self.inv_level_sigma2,
                self.camera, 15.0,
            )
            n_match_i = int(n_match)
            if n_match_i < 20:  # widen the window (visualOdometry.cpp:242-246)
                T, inl, n_inl, n_match, _ = _match_and_solve(
                    feats, self.last_feats, last_points, last_valid,
                    T_pred, self.T_last, self.scale_factors, self.inv_level_sigma2,
                    self.camera, 30.0,
                )
                n_match_i = int(n_match)
            st.n_matches = n_match_i
            st.n_inliers = int(n_inl)
            st.ok = n_match_i >= 20 and st.n_inliers >= 10
            if not st.ok:
                T = T_pred  # hold the prediction; milestone A has no reloc

        if self.last_feats is not None:
            self.T_cl = T @ lie.se3_inverse(self.T_last)
            self.motion_valid = st.ok
        self.T_last = T
        self.last_feats = feats
        self.trajectory.append(np.asarray(lie.se3_inverse(T)))
        self.timestamps.append(timestamp)
        self.states.append(st.ok)
        self.stats.append(st)
        return st


# ---------------------------------------------------------------------------
# Fully fused, device-resident tracking (the TPU-native fast path)
# ---------------------------------------------------------------------------


@struct.dataclass
class TrackState:
    """All tracking state lives on device; the host never syncs mid-stream."""

    feats: FrameFeatures          # last frame's features
    T_c_w: jnp.ndarray            # [4,4] last pose
    T_cl: jnp.ndarray             # [4,4] motion model (curr<-last)
    motion_valid: jnp.ndarray     # bool scalar
    initialized: jnp.ndarray      # bool scalar


@struct.dataclass
class TrackOut:
    T_c_w: jnp.ndarray
    ok: jnp.ndarray
    n_features: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("spec", "budgets"))
def track_step(
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    state: TrackState,
    cam: Camera,
    spec,
    budgets,
    scale_factors: jnp.ndarray,
    inv_level_sigma2: jnp.ndarray,
    fast_hi: float,
    fast_lo: float,
):
    """One frame of VO as a single device program: extract + (cond) match at
    r=15 with a r=30 retry + two-round pose solve + motion-model update.

    The only data-dependent control flow is lax.cond on device scalars — the
    exact integer gates of the reference (>=20 matches, >=10 inliers,
    visualOdometry.cpp:242-254) with zero host readbacks.
    """
    feats = extract_fused(gray, depth_img, cam, spec, budgets, fast_hi, fast_lo)
    n_feats = jnp.sum(feats.valid.astype(jnp.int32))

    def init_branch(_):
        T = jnp.eye(4, dtype=jnp.float32)
        return T, jnp.asarray(True), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)

    def track_branch(_):
        T_last = state.T_c_w
        T_pred = jnp.where(state.motion_valid, state.T_cl @ T_last, T_last)
        last_pts, last_valid = _spawn_temp_points(state.feats, T_last, cam)

        def attempt(radius):
            return _match_and_solve(
                feats, state.feats, last_pts, last_valid,
                T_pred, T_last, scale_factors, inv_level_sigma2, cam, radius,
            )

        T1, _, n_inl1, n_m1, _ = attempt(15.0)

        def retry(_):
            T2, _, n_inl2, n_m2, _ = attempt(30.0)
            return T2, n_inl2, n_m2

        T, n_inl, n_m = jax.lax.cond(
            n_m1 < 20, retry, lambda _: (T1, n_inl1, n_m1), None
        )
        ok = (n_m >= 20) & (n_inl >= 10)
        T = jnp.where(ok, T, T_pred)
        return T, ok, n_m, n_inl

    T_new, ok, n_m, n_inl = jax.lax.cond(state.initialized, track_branch, init_branch, None)

    T_cl = jnp.where(ok & state.initialized, T_new @ lie.se3_inverse(state.T_c_w), jnp.eye(4, dtype=jnp.float32))
    new_state = TrackState(
        feats=feats,
        T_c_w=T_new,
        T_cl=T_cl,
        motion_valid=ok & state.initialized,
        initialized=jnp.asarray(True),
    )
    out = TrackOut(T_c_w=T_new, ok=ok, n_features=n_feats, n_matches=n_m, n_inliers=n_inl)
    return new_state, out


class FusedTracker:
    """Milestone-A VO with one dispatch per frame and async host loop.

    The host enqueues track_step calls back to back; device arrays for
    poses/stats are only materialized when results() is called, so steady
    throughput equals device compute time rather than tunnel round trips.
    """

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.camera = Camera.from_config(cfg)
        ext = OrbExtractor(
            self.camera,
            n_features=cfg.num_of_features,
            scale_factor=cfg.scale_factor,
            n_levels=cfg.level_pyramid,
        )
        self.spec = ext.spec
        self.budgets = ext.budget
        self.scale_factors = jnp.asarray(self.spec.scales)
        self.inv_level_sigma2 = jnp.asarray(self.spec.inv_level_sigma2)
        self.fast_hi = float(cfg.ini_fast_threshold)
        self.fast_lo = float(cfg.min_fast_threshold)
        self._state = self._empty_state()
        self._outs: List[TrackOut] = []
        self.timestamps: List[float] = []

    def _empty_state(self) -> TrackState:
        from ..frontend.frame import MAX_FEATURES

        N = MAX_FEATURES
        z = jnp.zeros
        feats = FrameFeatures(
            uv=z((N, 2)), uv_und=z((N, 2)), response=z((N,)), angle=z((N,)),
            octave=z((N,), jnp.int32), depth=z((N,)), u_right=z((N,)),
            desc=z((N, 8), jnp.uint32), valid=z((N,), bool),
        )
        return TrackState(
            feats=feats,
            T_c_w=jnp.eye(4, dtype=jnp.float32),
            T_cl=jnp.eye(4, dtype=jnp.float32),
            motion_valid=jnp.asarray(False),
            initialized=jnp.asarray(False),
        )

    def track(self, gray: np.ndarray, depth: np.ndarray, timestamp: float) -> None:
        gray_d = jax.device_put(jnp.asarray(gray))
        depth_d = jax.device_put(jnp.asarray(depth, dtype=jnp.float32))
        self._state, out = track_step(
            gray_d, depth_d, self._state, self.camera, self.spec, self.budgets,
            self.scale_factors, self.inv_level_sigma2, self.fast_hi, self.fast_lo,
        )
        self._outs.append(out)
        self.timestamps.append(timestamp)

    def results(self):
        """Blocks and returns (trajectory T_w_c [F,4,4], stats list)."""
        outs = jax.device_get(self._outs)
        traj = []
        stats = []
        for o in outs:
            T_c_w = np.asarray(o.T_c_w)
            traj.append(np.linalg.inv(T_c_w))
            stats.append(
                TrackStats(
                    n_features=int(o.n_features),
                    n_matches=int(o.n_matches),
                    n_inliers=int(o.n_inliers),
                    ok=bool(o.ok),
                )
            )
        return np.stack(traj), stats
