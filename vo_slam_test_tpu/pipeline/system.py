"""Full tracking-with-map SLAM step (Milestone B).

One device program per frame implementing the reference's tracking role
(visualOdometry.cpp run():38-142):

  extract -> trackWithMotion (temp points + projection match + pose solve,
  :225-255) -> trackLocalMap (local KF/point selection, frustum cull,
  projection match with ratio gate, second pose solve, :279-311,595-774) ->
  keyframe policy (:397-461) -> conditional keyframe insertion + point
  spawning (:463-517) — all under jit with lax.cond, zero host sync.

Local mapping currently runs "lite" and synchronously: keyframe insertion
attaches observations, maintains covisibility/spanning tree and refreshes
point statistics; windowed local BA and epipolar triangulation are layered
on in slam_map/local_ba.py / slam_map/triangulate.py and invoked from the
same conditional branch.

Trajectory bookkeeping follows the reference's relative-pose DB (Tcr +
reference keyframe per frame, vo_run.cpp:187-232): poses are reconstructed
against the *final* keyframe poses so later BA/loop corrections propagate
into the exported trajectory.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import lie
from ..camera import Camera
from ..config import SlamConfig
from ..frontend.extractor import OrbExtractor, extract_fused
from ..frontend.frame import MAX_FEATURES, FrameFeatures
from ..matching import matcher
from ..slam_map import culling, triangulate
from ..slam_map import insert as map_insert
from ..slam_map import local_map
from ..solvers import local_ba
from ..slam_map.map_state import MapCaps, MapState, empty_map
from ..solvers import pose_only
from .tracking import TrackStats, _spawn_temp_points


@struct.dataclass
class SlamTrackState:
    feats: FrameFeatures        # last frame features
    assign_real: jnp.ndarray    # [N] i32 map-point id per last-frame kp (-1)
    T_cr: jnp.ndarray           # [4,4] last frame pose relative to its ref KF
    ref_kf: jnp.ndarray         # i32 ref keyframe of the last frame
    T_cl: jnp.ndarray           # [4,4] motion model
    motion_valid: jnp.ndarray   # bool
    initialized: jnp.ndarray    # bool
    last_kf_frame: jnp.ndarray  # i32 frame id of the last inserted KF
    last_was_kf: jnp.ndarray    # bool — last frame became a keyframe


@struct.dataclass
class SlamOut:
    T_c_w: jnp.ndarray
    T_cr: jnp.ndarray
    ref_kf: jnp.ndarray
    ok: jnp.ndarray
    n_features: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray      # observed (map) inliers, the >=30 gate value
    made_kf: jnp.ndarray


def _observed(m: MapState, assign: jnp.ndarray) -> jnp.ndarray:
    """obs_cnt > 0 per assigned slot (false for -1)."""
    return (assign >= 0) & (m.pt_obs_cnt[jnp.maximum(assign, 0)] > 0)


@functools.partial(jax.jit, static_argnames=("caps", "spec", "budgets"), donate_argnums=(1,))
def slam_step(
    state: SlamTrackState,
    m: MapState,
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    timestamp,
    frame_id,
    cam: Camera,
    caps: MapCaps,
    spec,
    budgets,
    scale_factors: jnp.ndarray,
    inv_level_sigma2: jnp.ndarray,
    fast_hi: float,
    fast_lo: float,
    max_frame_gap: int,
):
    feats = extract_fused(gray, depth_img, cam, spec, budgets, fast_hi, fast_lo)
    n_feats = jnp.sum(feats.valid.astype(jnp.int32))
    N = caps.n_feat
    P = caps.max_pt
    eye = jnp.eye(4, dtype=jnp.float32)

    # ======================== INIT BRANCH ==================================
    def init_branch(m):
        create = (feats.depth > 0) & feats.valid  # all depth points (init, :178-200)
        m2, kf_id = map_insert.insert_keyframe(
            m, caps, feats, eye, timestamp, frame_id,
            jnp.full((N,), -1, jnp.int32), create, cam, scale_factors,
        )
        assign = m2.kf_mp[kf_id]
        st = SlamTrackState(
            feats=feats, assign_real=assign, T_cr=eye,
            ref_kf=kf_id, T_cl=eye,
            motion_valid=jnp.asarray(False), initialized=jnp.asarray(True),
            last_kf_frame=jnp.asarray(frame_id, jnp.int32),
            last_was_kf=jnp.asarray(True),
        )
        out = SlamOut(
            T_c_w=eye, T_cr=eye, ref_kf=kf_id, ok=jnp.asarray(True),
            n_features=n_feats, n_matches=jnp.asarray(0, jnp.int32),
            n_inliers=jnp.asarray(0, jnp.int32), made_kf=jnp.asarray(True),
        )
        return st, m2, out

    # ======================== TRACK BRANCH =================================
    def track_branch(m):
        # -- last frame pose re-anchored to its (possibly BA-moved) ref KF --
        T_last = state.T_cr @ m.kf_pose[state.ref_kf]

        # -- temp points for unmatched last-frame slots (updateLastFrame) ---
        real_last = state.assign_real >= 0
        temp_pw_all, temp_valid = _spawn_temp_points(state.feats, T_last, cam)
        temp_valid &= ~real_last & ~state.last_was_kf  # KF frames spawn none
        last_pw = jnp.where(
            real_last[:, None], m.pt_pos[jnp.maximum(state.assign_real, 0)], temp_pw_all
        )
        last_has = real_last | temp_valid
        src_desc = jnp.where(
            real_last[:, None], m.pt_desc[jnp.maximum(state.assign_real, 0)], state.feats.desc
        )

        T_pred = jnp.where(state.motion_valid, state.T_cl @ T_last, T_last)

        # -- motion search + first pose solve (trackWithMotion) -------------
        def motion_attempt(radius):
            res = matcher.search_by_projection_frame(
                p_world=last_pw, src_desc=src_desc, src_octave=state.feats.octave,
                src_angle=state.feats.angle, src_valid=last_has,
                tgt_uv_und=feats.uv_und, tgt_u_right=feats.u_right,
                tgt_octave=feats.octave, tgt_angle=feats.angle, tgt_desc=feats.desc,
                tgt_valid=feats.valid, tgt_blocked=jnp.zeros((N,), bool),
                T_c_w=T_pred, T_l_w=T_last, scale_factors=scale_factors,
                fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf, b=cam.b,
                width=float(cam.width), height=float(cam.height), radius=radius,
            )
            return res

        res = motion_attempt(15.0)
        res = jax.lax.cond(res.count < 20, lambda: motion_attempt(30.0), lambda: res)

        # per-target winner (largest src index wins, reference overwrite order)
        matched = res.idx >= 0
        tgt = jnp.where(matched, res.idx, N)
        src_ids = jnp.arange(N, dtype=jnp.int32)
        winner = (
            jnp.full((N + 1,), -1, jnp.int32).at[tgt].max(jnp.where(matched, src_ids, -1))[:N]
        )
        has_m = winner >= 0
        w_safe = jnp.maximum(winner, 0)
        kp_pt = jnp.where(has_m, state.assign_real[w_safe], -1)         # real pt id
        kp_temp = has_m & (kp_pt < 0)                                    # temp match
        kp_pw = last_pw[w_safe]

        obs1 = pose_only.PoseObs(
            p_world=kp_pw, uv=feats.uv_und,
            u_right=jnp.where(has_m, feats.u_right, -1.0),
            inv_sigma2=inv_level_sigma2[feats.octave], valid=has_m,
        )
        T1, inl1, _n1 = pose_only.solve_pose_only(
            T_pred, obs1, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
        )
        # cullingOutliersBeforeLocalMap: drop outliers, count observed inliers
        kp_pt = jnp.where(inl1, kp_pt, -1)
        kp_temp = kp_temp & inl1
        observed_inl1 = jnp.sum(_observed(m, kp_pt).astype(jnp.int32))
        motion_ok = (res.count >= 20) & (observed_inl1 >= 10)

        # -- trackLocalMap ---------------------------------------------------
        member = jnp.zeros((P,), bool).at[jnp.maximum(kp_pt, 0)].max(kp_pt >= 0)
        local_kf, ref_kf = local_map.local_keyframe_mask(m, member)
        cand = local_map.local_point_mask(m, local_kf) & ~member
        fr = local_map.frustum_check(m, T1, cam, scale_factors)
        blocked = _observed(m, kp_pt)
        lm = local_map.search_local_points(
            m, fr, cand, feats.uv_und, feats.u_right, feats.octave, feats.desc,
            feats.valid, blocked, scale_factors, 3.0,
        )
        # local match overwrites temp/empty slots
        kp_pt2 = jnp.where(lm.assign >= 0, lm.assign, kp_pt)
        kp_temp2 = kp_temp & (lm.assign < 0)
        kp_pw2 = jnp.where(
            (kp_pt2 >= 0)[:, None], m.pt_pos[jnp.maximum(kp_pt2, 0)], kp_pw
        )
        has2 = (kp_pt2 >= 0) | kp_temp2

        obs2 = pose_only.PoseObs(
            p_world=kp_pw2, uv=feats.uv_und,
            u_right=jnp.where(has2, feats.u_right, -1.0),
            inv_sigma2=inv_level_sigma2[feats.octave], valid=has2,
        )
        T2, inl2, _n2 = pose_only.solve_pose_only(
            T1, obs2, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
        )

        real2 = kp_pt2 >= 0
        inlier_real = real2 & inl2
        observed_inliers = jnp.sum(
            (inlier_real & (m.pt_obs_cnt[jnp.maximum(kp_pt2, 0)] > 0)).astype(jnp.int32)
        )
        ok = motion_ok & (observed_inliers >= 30)

        # found/visible bookkeeping (mappoint.cpp:269-331; VO :598-612,:744-751)
        vis_pts = jnp.zeros((P,), bool).at[jnp.maximum(kp_pt2, 0)].max(real2)
        vis_pts = vis_pts | lm.visible_mask
        found_pts = jnp.zeros((P,), bool).at[jnp.maximum(kp_pt2, 0)].max(inlier_real)
        m = m.replace(
            pt_visible=m.pt_visible + vis_pts.astype(jnp.int32),
            pt_found=m.pt_found + found_pts.astype(jnp.int32),
        )

        T_new = jnp.where(ok, T2, T_pred)
        assign_final = jnp.where(inlier_real, kp_pt2, -1)  # culling outliers+temp

        # -- keyframe policy (needNewKeyFrame, :397-461) --------------------
        kf_cnt = jnp.sum(m.kf_valid.astype(jnp.int32))
        min_obs = jnp.where(kf_cnt <= 2, 2, 3)
        ref_row = m.kf_mp[ref_kf]
        ref_obs = m.pt_obs_cnt[jnp.maximum(ref_row, 0)]
        ref_matches = jnp.sum(((ref_row >= 0) & (ref_obs >= min_obs)).astype(jnp.int32))
        ref_ratio = observed_inliers.astype(jnp.float32) / jnp.maximum(ref_matches, 1).astype(jnp.float32)
        ref_weak = (ref_ratio < 0.25) | (ref_matches < 100)

        close = (feats.depth > 0) & (feats.depth < cam.th_depth) & feats.valid
        total_cnt = jnp.sum(close.astype(jnp.int32))
        map_cnt = jnp.sum((close & _observed(m, assign_final)).astype(jnp.int32))
        map_ratio = map_cnt.astype(jnp.float32) / (total_cnt.astype(jnp.float32) + 1e-5)
        map_threshold = jnp.where(observed_inliers > 300, 0.20, 0.35)
        track_weak = map_ratio < 0.3
        ref_threshold = jnp.where(kf_cnt < 2, 0.40, 0.75)
        track_gap = frame_id >= state.last_kf_frame + max_frame_gap
        track_gap = track_gap | True  # synchronous mapper always accepts
        track_verify = (ref_ratio < ref_threshold) | (map_ratio < map_threshold)
        need_kf = ok & (track_weak | ref_weak | (track_gap & track_verify))
        need_kf &= m.n_kf < caps.max_kf

        # -- conditional keyframe insertion ---------------------------------
        def do_insert(m):
            already = _observed(m, assign_final)
            create = map_insert.spawn_mask_depth_sorted(feats, already, cam.th_depth)
            m2, kf_id = map_insert.insert_keyframe(
                m, caps, feats, T_new, timestamp, frame_id,
                assign_final, create, cam, scale_factors,
            )
            return m2, kf_id

        m, new_kf = jax.lax.cond(
            need_kf, do_insert, lambda m: (m, jnp.asarray(-1, jnp.int32)), m
        )
        ref_kf_out = jnp.where(need_kf, new_kf, ref_kf)
        # keyframe slots bind their own kp->point row
        assign_out = jnp.where(need_kf, m.kf_mp[jnp.maximum(new_kf, 0)], assign_final)

        T_cr = T_new @ lie.se3_inverse(m.kf_pose[jnp.maximum(ref_kf_out, 0)])
        T_cl = jnp.where(ok, T_new @ lie.se3_inverse(T_last), eye)

        st = SlamTrackState(
            feats=feats, assign_real=assign_out, T_cr=T_cr, ref_kf=ref_kf_out,
            T_cl=T_cl, motion_valid=ok, initialized=jnp.asarray(True),
            last_kf_frame=jnp.where(need_kf, frame_id, state.last_kf_frame),
            last_was_kf=need_kf,
        )
        out = SlamOut(
            T_c_w=T_new, T_cr=T_cr, ref_kf=ref_kf_out, ok=ok,
            n_features=n_feats, n_matches=res.count,
            n_inliers=observed_inliers, made_kf=need_kf,
        )
        return st, m, out

    return jax.lax.cond(state.initialized, track_branch, init_branch, m)


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def mapping_step(
    m: MapState,
    did_kf: jnp.ndarray,
    kf_id: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
):
    """The local-mapping chain for one new keyframe, dispatched every frame
    with a no-op branch (so the host never syncs on the made_kf flag).

    Order mirrors LocalMapping::run (localMapping.cpp:16-66):
    cullingMapPoints -> createNewMapPoints -> local BA -> cullingKeyFrames.
    """

    def work(m):
        kid = jnp.maximum(kf_id, 0)
        m = culling.cull_map_points(m, kid, caps)
        m = triangulate.create_new_map_points(m, kid, caps, cam, scale_factors)
        m = local_ba.local_bundle_adjust(m, kid, caps, cam)
        m = culling.cull_keyframes(m, kid, caps, cam)
        return m

    return jax.lax.cond(did_kf & (kf_id >= 0), work, lambda m: m, m)


class SlamSystem:
    """Tracking + (synchronous lite) mapping over an RGB-D stream."""

    def __init__(self, cfg: SlamConfig, caps: MapCaps = MapCaps()):
        self.cfg = cfg
        self.caps = caps
        self.camera = Camera.from_config(cfg)
        ext = OrbExtractor(
            self.camera, n_features=cfg.num_of_features,
            scale_factor=cfg.scale_factor, n_levels=cfg.level_pyramid,
        )
        self.spec = ext.spec
        self.budgets = ext.budget
        self.scale_factors = jnp.asarray(self.spec.scales)
        self.inv_level_sigma2 = jnp.asarray(self.spec.inv_level_sigma2)
        self.fast_hi = float(cfg.ini_fast_threshold)
        self.fast_lo = float(cfg.min_fast_threshold)
        self.max_frame_gap = int(cfg.camera_fps)

        self.map = empty_map(caps)
        self.state = self._empty_state()
        self._outs: List[SlamOut] = []
        self.timestamps: List[float] = []
        self._frame_id = 0

    def _empty_state(self) -> SlamTrackState:
        N = self.caps.n_feat
        z = jnp.zeros
        feats = FrameFeatures(
            uv=z((N, 2)), uv_und=z((N, 2)), response=z((N,)), angle=z((N,)),
            octave=z((N,), jnp.int32), depth=z((N,)), u_right=z((N,)),
            desc=z((N, 8), jnp.uint32), valid=z((N,), bool),
        )
        eye = jnp.eye(4, dtype=jnp.float32)
        return SlamTrackState(
            feats=feats, assign_real=jnp.full((N,), -1, jnp.int32),
            T_cr=eye, ref_kf=jnp.asarray(0, jnp.int32), T_cl=eye,
            motion_valid=jnp.asarray(False), initialized=jnp.asarray(False),
            last_kf_frame=jnp.asarray(-10_000, jnp.int32),
            last_was_kf=jnp.asarray(False),
        )

    def track(self, gray: np.ndarray, depth: np.ndarray, timestamp: float) -> None:
        gray_d = jax.device_put(jnp.asarray(gray))
        depth_d = jax.device_put(jnp.asarray(depth, dtype=jnp.float32))
        self.state, self.map, out = slam_step(
            self.state, self.map, gray_d, depth_d,
            jnp.asarray(timestamp, jnp.float32), jnp.asarray(self._frame_id, jnp.int32),
            self.camera, self.caps, self.spec, self.budgets,
            self.scale_factors, self.inv_level_sigma2,
            self.fast_hi, self.fast_lo, self.max_frame_gap,
        )
        self.map = mapping_step(
            self.map, out.made_kf, out.ref_kf, self.caps, self.camera, self.scale_factors
        )
        self._outs.append(out)
        self.timestamps.append(timestamp)
        self._frame_id += 1

    def results(self):
        """Blocks; returns (trajectory T_w_c [F,4,4], stats, kf_traj)."""
        outs = jax.device_get(self._outs)
        kf_pose = np.asarray(self.map.kf_pose)
        kf_valid = np.asarray(self.map.kf_valid)
        traj, stats = [], []
        for o in outs:
            ref = int(o.ref_kf)
            # reconstruct against final keyframe poses (vo_run.cpp:187-232)
            T_c_w = np.asarray(o.T_cr) @ kf_pose[ref] if kf_valid[ref] else np.asarray(o.T_c_w)
            traj.append(np.linalg.inv(T_c_w))
            stats.append(
                TrackStats(
                    n_features=int(o.n_features), n_matches=int(o.n_matches),
                    n_inliers=int(o.n_inliers), ok=bool(o.ok),
                )
            )
        kf_traj = [
            (float(np.asarray(self.map.kf_timestamp)[k]), np.linalg.inv(kf_pose[k]))
            for k in range(kf_pose.shape[0]) if kf_valid[k]
        ]
        return np.stack(traj), stats, kf_traj

    @property
    def n_keyframes(self) -> int:
        return int(np.asarray(self.map.kf_valid).sum())

    @property
    def n_points(self) -> int:
        return int(np.asarray(self.map.pt_valid).sum())
