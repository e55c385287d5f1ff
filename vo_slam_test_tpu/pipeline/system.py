"""Full tracking-with-map SLAM step (Milestones B + C).

One device program per frame implementing the reference's tracking role
(visualOdometry.cpp run():38-142) with the complete state machine:

  extract -> [OK] trackWithMotion (:225-255) -> fallback trackRefKeyFrame
  (BoW vs reference KF, :257-277) -> fallback relocalization (BoW candidate
  retrieval + RANSAC absolute pose + projection top-ups, :313-395) ->
  trackLocalMap (:279-311) -> keyframe policy (:397-461) -> conditional
  keyframe insertion (:463-517) — all under jit with lax.cond, zero host
  sync. [LOST] goes straight to relocalization.

Deviations from the reference (documented):
- relocalization evaluates the top RELOC_K BoW candidates as one batched
  vmap and keeps the best-scoring success, instead of iterating all
  candidates sequentially and stopping at the first >=50
  (visualOdometry.cpp:313-395);
- the absolute pose is batched Horn 3D-3D RANSAC on RGB-D depth when >=50%
  of the BoW matches carry depth, and batched EPnP 2D-3D (solvers/epnp.py,
  the reference's cv::solvePnPRansac role) otherwise; same 8 px inlier
  gate and >=10 / >=50 accept thresholds.

The local-mapping chain (culling, triangulation, local BA) runs as a second
conditional program per frame (mapping_step). Trajectory bookkeeping keeps
per-frame (Tcr, refKF) like the reference's trajectory DB (vo_run.cpp:
187-232) and reconstructs against final keyframe poses, with culled-KF
recovery through the Tcp parent chain.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import lie
from ..bow import retrieval as bow_ret
from ..bow import vocabulary as bow_voc
from ..camera import Camera
from ..config import SlamConfig
from ..frontend.extractor import OrbExtractor, extract_fused
from ..frontend.frame import MAX_FEATURES, FrameFeatures
from ..matching import bow_match, matcher
from ..slam_map import culling, fuse, triangulate
from ..slam_map import insert as map_insert
from ..slam_map import local_map
from ..slam_map.map_state import MapCaps, MapState, empty_map
from ..solvers import local_ba, pose_only, ransac
from . import loop_closing
from .tracking import TrackStats, _spawn_temp_points

RELOC_K = 3     # BoW relocalization candidates evaluated per lost frame
RELOC_PARITY_K = 8  # candidate cap in reloc parity mode (the reference
                    # iterates ALL candidates, visualOdometry.cpp:313-395;
                    # fixed shapes need a cap — 8 by BoW score, evaluated
                    # first-success in keyframe-insertion order)
DRAIN_CHUNK = 8  # frames between loop-candidate readbacks (host sync cost)


@struct.dataclass
class SlamTrackState:
    frame_id: jnp.ndarray       # i32 device-resident frame counter (avoids a
                                # per-frame host->device scalar transfer)
    feats: FrameFeatures        # last frame features
    assign_real: jnp.ndarray    # [N] i32 map-point id per last-frame kp (-1)
    assign_gen: jnp.ndarray     # [N] i32 pt_gen at bind time — a culled +
                                # recycled slot must not silently rebind to
                                # a different landmark next frame
    T_cr: jnp.ndarray           # [4,4] last frame pose relative to its ref KF
    ref_kf: jnp.ndarray         # i32 ref keyframe of the last frame
    T_cl: jnp.ndarray           # [4,4] motion model
    motion_valid: jnp.ndarray   # bool
    initialized: jnp.ndarray    # bool
    lost: jnp.ndarray           # bool — state LOST (visualOdometry.h:18-22)
    last_kf_frame: jnp.ndarray  # i32 frame id of the last inserted KF
    last_was_kf: jnp.ndarray    # bool
    last_reloc_frame: jnp.ndarray  # i32 (-10000 = never)


@struct.dataclass
class SlamOut:
    T_c_w: jnp.ndarray
    T_cr: jnp.ndarray
    ref_kf: jnp.ndarray
    ref_gen: jnp.ndarray        # kf_gen of ref_kf at track time (slot reuse)
    ok: jnp.ndarray
    n_features: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    made_kf: jnp.ndarray
    relocalized: jnp.ndarray
    kp_uv: jnp.ndarray          # [N,2] raw pixel coords (HUD overlay)
    kp_state: jnp.ndarray       # [N] i32: 0 untracked, 1 map-tracked,
                                # 2 VO-tracked (drawer.cpp:430-459 flags)


@struct.dataclass
class _Attempt:
    """Uniform result of a tracking attempt."""

    T: jnp.ndarray          # [4,4]
    kp_pt: jnp.ndarray      # [N] i32 map point per curr kp (inliers only)
    kp_temp: jnp.ndarray    # [N] bool temp match (inlier)
    kp_pw: jnp.ndarray      # [N,3] point position per kp
    n_match: jnp.ndarray    # i32
    ok: jnp.ndarray         # bool


def _observed(m: MapState, assign: jnp.ndarray) -> jnp.ndarray:
    return (assign >= 0) & (m.pt_obs_cnt[jnp.maximum(assign, 0)] > 0)


def reloc_topup_cascade(topup1, topup2, T_in, kp_in, n_in):
    """The relocalization projection-top-up gate structure, a literal
    transcription of visualOdometry.cpp:352-384:

      if n0 < 50 is the caller's gate; then
      add1 <- searchByProjection(r=10, th=100); if n0 + add1 >= 50:
        n1 <- solvePoseOnly (post-top-up state adopted)
        if 30 < n1 < 50:
          add2 <- searchByProjection(r=3, th=60); if n1 + add2 >= 50:
            n2 <- solvePoseOnly (second top-up adopted)
      anything else keeps the previous stage's state.

    topup1/topup2: (T, kp) -> (T', kp', n', add) — projection search plus
    the follow-up pose-only solve, returning the post-solve observed-inlier
    count n' and the number of newly added matches add. Factored out so the
    branch conditions are property-testable against the reference
    transcription with stubbed top-ups (tests/test_reloc.py)."""
    T_a, kp_a, n_a, add1 = topup1(T_in, kp_in)
    use_a = (n_in + add1) >= 50

    def second(args2):
        T_b, kp_b, n_b = args2
        T_c2, kp_c2, n_c2, add2 = topup2(T_b, kp_b)
        use_b = (n_b + add2) >= 50
        return jax.tree.map(
            lambda x, y: jnp.where(use_b, x, y),
            (T_c2, kp_c2, n_c2), (T_b, kp_b, n_b),
        )

    T_f, kp_f, n_f = jax.lax.cond(
        use_a & (n_a > 30) & (n_a < 50),
        second,
        lambda a: a,
        (T_a, kp_a, n_a),
    )
    return jax.tree.map(
        lambda x, y: jnp.where(use_a, x, y),
        (T_f, kp_f, n_f), (T_in, kp_in, n_in),
    )


def _solve_and_cull(m, feats, T_init, kp_pt, kp_temp, kp_pw, inv_level_sigma2, cam):
    """Pose-only solve + outlier culling + observed-inlier count."""
    has = (kp_pt >= 0) | kp_temp
    obs = pose_only.PoseObs(
        p_world=kp_pw, uv=feats.uv_und,
        u_right=jnp.where(has, feats.u_right, -1.0),
        inv_sigma2=inv_level_sigma2[feats.octave], valid=has,
    )
    T, inl, _ = pose_only.solve_pose_only(
        T_init, obs, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, fast=True
    )
    kp_pt = jnp.where(inl, kp_pt, -1)
    kp_temp = kp_temp & inl
    n_obs = jnp.sum(_observed(m, kp_pt).astype(jnp.int32))
    return T, kp_pt, kp_temp, n_obs


def _slam_step(
    state: SlamTrackState,
    m: MapState,
    gray: jnp.ndarray,
    depth_raw: jnp.ndarray,
    timestamp,
    depth_scale,
    cam: Camera,
    caps: MapCaps,
    spec,
    budgets,
    scale_factors: jnp.ndarray,
    inv_level_sigma2: jnp.ndarray,
    fast_hi: float,
    fast_lo: float,
    max_frame_gap: int,
    voc: Optional[bow_voc.Vocabulary],
    use_bow: bool,
    reloc_parity: bool = False,
):
    frame_id = state.frame_id
    # u16 depth uploads at half the f32 bytes; metric scaling happens here
    if jnp.issubdtype(depth_raw.dtype, jnp.integer):
        depth_img = depth_raw.astype(jnp.float32) * (1.0 / depth_scale)
    else:
        depth_img = depth_raw
    feats = extract_fused(gray, depth_img, cam, spec, budgets, fast_hi, fast_lo)
    n_feats = jnp.sum(feats.valid.astype(jnp.int32))
    N = caps.n_feat
    P = caps.max_pt
    eye = jnp.eye(4, dtype=jnp.float32)

    if use_bow:
        words_c = bow_voc.transform(voc, feats.desc, feats.valid)
        uniq_c, wgt_c = bow_ret.bow_vector(words_c, voc.idf)
        groups_c = bow_voc.feature_groups(voc, words_c)
    else:
        words_c = jnp.full((N,), -1, jnp.int32)
        uniq_c = jnp.full((N,), bow_ret.PAD_WORD, jnp.int32)
        wgt_c = jnp.zeros((N,))
        groups_c = words_c

    def insert_kf(m, T, assign, do=None):
        already = _observed(m, assign)
        create = map_insert.spawn_mask_depth_sorted(feats, already, cam.th_depth)
        return map_insert.insert_keyframe(
            m, caps, feats, T, timestamp, frame_id, assign, create, cam,
            scale_factors, words_c, uniq_c, wgt_c, do=do,
        )

    # The first frame initializes the map instead of tracking. This is NOT
    # a lax.cond: the not-taken branch of a map-returning cond makes XLA
    # materialize copies of every map array each frame (~ms/frame on v5e).
    # The track computation runs unconditionally — on the empty frame-0 map
    # all attempts fail benignly (no valid features/points to match) — and
    # `init` overrides merge the initialization semantics at the tail.
    init = ~state.initialized

    # ======================== TRACK (+ predicated init) ====================
    def track_branch(m):
        T_last = state.T_cr @ m.kf_pose[state.ref_kf]
        no_pw = jnp.zeros((N, 3))
        no_pt = jnp.full((N,), -1, jnp.int32)
        no_tmp = jnp.zeros((N,), bool)
        fail = _Attempt(T=T_last, kp_pt=no_pt, kp_temp=no_tmp, kp_pw=no_pw,
                        n_match=jnp.asarray(0, jnp.int32), ok=jnp.asarray(False))

        # ---------------- attempt 1: trackWithMotion -----------------------
        def attempt_motion(_):
            safe_last = jnp.maximum(state.assign_real, 0)
            real_last = (
                (state.assign_real >= 0)
                & m.pt_valid[safe_last]
                & (m.pt_gen[safe_last] == state.assign_gen)
            )
            temp_pw_all, temp_valid = _spawn_temp_points(state.feats, T_last, cam)
            temp_valid &= ~real_last & ~state.last_was_kf
            last_pw = jnp.where(
                real_last[:, None], m.pt_pos[jnp.maximum(state.assign_real, 0)], temp_pw_all
            )
            last_has = real_last | temp_valid
            src_desc = jnp.where(
                real_last[:, None], m.pt_desc[jnp.maximum(state.assign_real, 0)], state.feats.desc
            )
            T_pred = jnp.where(state.motion_valid, state.T_cl @ T_last, T_last)

            def search(radius):
                return matcher.search_by_projection_frame(
                    p_world=last_pw, src_desc=src_desc, src_octave=state.feats.octave,
                    src_angle=state.feats.angle, src_valid=last_has,
                    tgt_uv_und=feats.uv_und, tgt_u_right=feats.u_right,
                    tgt_octave=feats.octave, tgt_angle=feats.angle, tgt_desc=feats.desc,
                    tgt_valid=feats.valid, tgt_blocked=jnp.zeros((N,), bool),
                    T_c_w=T_pred, T_l_w=T_last, scale_factors=scale_factors,
                    fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf, b=cam.b,
                    width=float(cam.width), height=float(cam.height), radius=radius,
                )

            res = search(15.0)
            res = jax.lax.cond(res.count < 20, lambda: search(30.0), lambda: res)
            matched = res.idx >= 0
            tgt = jnp.where(matched, res.idx, N)
            src_ids = jnp.arange(N, dtype=jnp.int32)
            winner = (
                jnp.full((N + 1,), -1, jnp.int32).at[tgt].max(jnp.where(matched, src_ids, -1))[:N]
            )
            has_m = winner >= 0
            w_safe = jnp.maximum(winner, 0)
            kp_pt = jnp.where(has_m, state.assign_real[w_safe], -1)
            kp_temp = has_m & (kp_pt < 0)
            kp_pw = last_pw[w_safe]
            T1, kp_pt, kp_temp, n_obs = _solve_and_cull(
                m, feats, T_pred, kp_pt, kp_temp, kp_pw, inv_level_sigma2, cam
            )
            ok = (res.count >= 20) & (n_obs >= 10)
            return _Attempt(T=T1, kp_pt=kp_pt, kp_temp=kp_temp, kp_pw=kp_pw,
                            n_match=res.count, ok=ok)

        # the reference gates trackWithMotion on an armed motion model and
        # falls back to BoW ref-KF tracking (visualOdometry.cpp:227-231);
        # without a vocabulary there is no fallback, so attempt motion
        # tracking from T_last directly (T_pred handles the cold model)
        motion_armed = state.motion_valid if use_bow else jnp.asarray(True)
        can_motion = (
            ~state.lost & motion_armed
            & (frame_id >= state.last_reloc_frame + 2)
        )
        a1 = jax.lax.cond(can_motion, attempt_motion, lambda _: fail, None)

        # ---------------- attempt 2: trackRefKeyFrame ----------------------
        def attempt_ref(_):
            kf = state.ref_kf
            row = m.kf_mp[kf]
            pt_live = m.pt_valid[jnp.maximum(row, 0)]
            res = bow_match.search_by_bow_kf_frame(
                kf_desc=m.kf_desc[kf],
                kf_groups=bow_voc.feature_groups(voc, m.kf_word[kf]),
                kf_mp=row, kf_angle=m.kf_angle[kf], kf_pt_valid=pt_live,
                f_desc=feats.desc, f_groups=groups_c, f_angle=feats.angle,
                f_valid=feats.valid, ratio=0.7,
            )
            kp_pt = res.assign
            kp_pw = m.pt_pos[jnp.maximum(kp_pt, 0)]
            T2, kp_pt2, _, n_obs = _solve_and_cull(
                m, feats, T_last, kp_pt, jnp.zeros((N,), bool), kp_pw, inv_level_sigma2, cam
            )
            ok = (res.count >= 15) & (n_obs >= 10)
            return _Attempt(T=T2, kp_pt=kp_pt2, kp_temp=jnp.zeros((N,), bool),
                            kp_pw=kp_pw, n_match=res.count, ok=ok)

        if use_bow:
            a2 = jax.lax.cond(~a1.ok & ~state.lost, attempt_ref, lambda _: fail, None)

            # ------------- attempt 3: relocalization -----------------------
            def attempt_reloc(_):
                score, shared = bow_ret.scores_vs_keyframes(
                    uniq_c, wgt_c, m.kf_bow_word, m.kf_bow_weight,
                    m.kf_valid.astype(jnp.float32),
                )
                cand = bow_ret.reloc_candidates(score, shared, m.covis, m.kf_valid)
                any_cand = jnp.any(cand)
                # the reference iterates ALL BoW candidates per lost frame
                # (visualOdometry.cpp:313-395). Default mode: the top RELOC_K
                # evaluate as one batched vmap and the best-scoring success
                # wins. Parity mode (reloc_parity=True): up to RELOC_PARITY_K
                # candidates, each run through the FULL reference chain
                # (always-EPnP + per-candidate projection top-up cascade,
                # visualOdometry.cpp:313-395 + :806), and the first >=50
                # success in keyframe-insertion order is accepted — the
                # reference's first-success iteration semantics.
                n_cand_k = RELOC_PARITY_K if reloc_parity else RELOC_K
                c_scores, c_kfs = jax.lax.top_k(
                    jnp.where(cand, score, -jnp.inf), n_cand_k
                )
                c_ok = jnp.isfinite(c_scores)
                c_kfs = c_kfs.astype(jnp.int32)

                # projection top-ups to reach >=50 (visualOdometry.cpp:330-389)
                def topup(kf, row, pt_live, T_in, kp_in, radius, th):
                    in_set = jnp.zeros((P,), bool).at[jnp.maximum(kp_in, 0)].max(kp_in >= 0)
                    src_ok = (row >= 0) & pt_live & ~in_set[jnp.maximum(row, 0)]
                    res2 = matcher.search_by_projection_kf(
                        p_world=m.pt_pos[jnp.maximum(row, 0)],
                        src_desc=m.pt_desc[jnp.maximum(row, 0)],
                        src_angle=m.kf_angle[kf],
                        src_min_dist=0.8 * m.pt_min_dist[jnp.maximum(row, 0)],
                        src_max_dist=1.2 * m.pt_max_dist[jnp.maximum(row, 0)],
                        src_pt=row, src_valid=src_ok,
                        tgt_uv_und=feats.uv_und, tgt_angle=feats.angle,
                        tgt_octave=feats.octave, tgt_desc=feats.desc,
                        tgt_valid=feats.valid, tgt_blocked=kp_in >= 0,
                        T_c_w=T_in, scale_factors=scale_factors,
                        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                        width=float(cam.width), height=float(cam.height),
                        radius=radius, dist_threshold=th,
                    )
                    matched = res2.idx >= 0
                    tgt = jnp.where(matched, res2.idx, N)
                    src_ids = jnp.arange(N, dtype=jnp.int32)
                    winner = (
                        jnp.full((N + 1,), -1, jnp.int32)
                        .at[tgt].max(jnp.where(matched, src_ids, -1))[:N]
                    )
                    add_pt = jnp.where(winner >= 0, row[jnp.maximum(winner, 0)], -1)
                    kp_new = jnp.where(kp_in >= 0, kp_in, add_pt)
                    T_out, kp_out, _, n_out = _solve_and_cull(
                        m, feats, T_in, kp_new, jnp.zeros((N,), bool),
                        m.pt_pos[jnp.maximum(kp_new, 0)], inv_level_sigma2, cam
                    )
                    return T_out, kp_out, n_out, res2.count

                def topup_cascade(kf, row, pt_live, T3_, kp3_, n_obs_):
                    def do_topups(args):
                        T_in, kp_in, n_in = args
                        return reloc_topup_cascade(
                            lambda T, kp: topup(kf, row, pt_live, T, kp, 10.0, 100.0),
                            lambda T, kp: topup(kf, row, pt_live, T, kp, 3.0, 60.0),
                            T_in, kp_in, n_in,
                        )

                    return jax.lax.cond(
                        n_obs_ < 50, do_topups, lambda a: a, (T3_, kp3_, n_obs_)
                    )

                def per_candidate(kf, seed):
                    row_ = m.kf_mp[kf]
                    live_ = m.pt_valid[jnp.maximum(row_, 0)]
                    res_ = bow_match.search_by_bow_kf_frame(
                        kf_desc=m.kf_desc[kf],
                        kf_groups=bow_voc.feature_groups(voc, m.kf_word[kf]),
                        kf_mp=row_, kf_angle=m.kf_angle[kf], kf_pt_valid=live_,
                        f_desc=feats.desc, f_groups=groups_c, f_angle=feats.angle,
                        f_valid=feats.valid, ratio=0.75,
                    )
                    kp_pt_ = res_.assign
                    has_ = kp_pt_ >= 0
                    p_world = m.pt_pos[jnp.maximum(kp_pt_, 0)]

                    def pnp(_):
                        from ..solvers import epnp

                        key = jax.random.PRNGKey(seed.astype(jnp.uint32))
                        return epnp.ransac_pnp(
                            key, p_world, feats.uv_und, has_,
                            inv_level_sigma2[feats.octave], cam,
                        )

                    if reloc_parity:
                        # the reference ALWAYS solves EPnP 2D-3D
                        # (visualOdometry.cpp:806-826)
                        Tr_, _, n_ransac_ = pnp(None)
                    else:
                        # default: Horn 3D-3D when the matches carry depth —
                        # RGB-D frames nearly always do, and the closed-form
                        # Horn alignment is cheaper and tighter on TPU
                        with_d = has_ & (feats.depth > 0)
                        n_has = jnp.sum(has_.astype(jnp.int32))
                        n_d = jnp.sum(with_d.astype(jnp.int32))
                        depth_rich = 2 * n_d >= n_has

                        def horn(_):
                            p_cam = cam.pixel2camera(
                                feats.uv_und, jnp.maximum(feats.depth, 1e-3)
                            )
                            return ransac.ransac_pose_3d3d(
                                p_world, p_cam, feats.uv_und, with_d, has_,
                                cam.fx, cam.fy, cam.cx, cam.cy, seed,
                            )

                        Tr_, _, n_ransac_ = jax.lax.cond(depth_rich, horn, pnp, None)
                    T3_, kp3_, _, n_obs_ = _solve_and_cull(
                        m, feats, Tr_, kp_pt_, jnp.zeros((N,), bool),
                        p_world, inv_level_sigma2, cam
                    )
                    if reloc_parity:
                        # per-candidate top-up cascade, as the reference runs
                        # it inside the candidate loop (visualOdometry.cpp:
                        # 330-389) — the >=50 verdict is per candidate
                        T3_, kp3_, n_obs_ = topup_cascade(
                            kf, row_, live_, T3_, kp3_, n_obs_
                        )
                    return T3_, kp3_, n_obs_, res_.count, n_ransac_

                seeds = frame_id * n_cand_k + jnp.arange(n_cand_k, dtype=jnp.int32)
                cT, cKp, cObs, cBow, cRansac = jax.vmap(per_candidate)(c_kfs, seeds)
                c_pass = c_ok & (cBow >= 15) & (cRansac >= 10)
                if reloc_parity:
                    # first success in insertion order; candidates already
                    # carry the full per-candidate chain incl. top-ups
                    c_pass &= cObs >= 50
                    order = jnp.where(c_pass, m.kf_seq[c_kfs], jnp.iinfo(jnp.int32).max)
                    win = jnp.argmin(order).astype(jnp.int32)
                else:
                    rank_key = jnp.where(c_pass, cObs, -1)
                    win = jnp.argmax(rank_key).astype(jnp.int32)
                kf = c_kfs[win]
                T3 = cT[win]
                kp_pt3 = cKp[win]
                n_obs = cObs[win]
                n_bow = cBow[win]
                n_ransac = cRansac[win]

                if reloc_parity:
                    T4, kp_pt4, n_obs4 = T3, kp_pt3, n_obs
                else:
                    # top-up only the winner (one cascade instead of K)
                    row = m.kf_mp[kf]
                    pt_live = m.pt_valid[jnp.maximum(row, 0)]
                    T4, kp_pt4, n_obs4 = topup_cascade(
                        kf, row, pt_live, T3, kp_pt3, n_obs
                    )
                ok = any_cand & (n_bow >= 15) & (n_ransac >= 10) & (n_obs4 >= 50)
                return _Attempt(
                    T=T4, kp_pt=jnp.where(ok, kp_pt4, -1),
                    kp_temp=jnp.zeros((N,), bool),
                    kp_pw=m.pt_pos[jnp.maximum(kp_pt4, 0)],
                    n_match=n_bow, ok=ok,
                )

            a3 = jax.lax.cond(~a1.ok & ~a2.ok, attempt_reloc, lambda _: fail, None)
        else:
            a2 = fail
            a3 = fail

        pick2 = jax.tree.map(lambda x, y: jnp.where(a1.ok, x, y), a1, a2)
        att = jax.tree.map(lambda x, y: jnp.where(pick2.ok, x, y), pick2, a3)
        relocalized = a3.ok & ~a1.ok & ~a2.ok
        reloc_frame = jnp.where(relocalized, frame_id, state.last_reloc_frame)
        track_pre = att.ok
        kp_pw_cur = jnp.where(
            (att.kp_pt >= 0)[:, None], m.pt_pos[jnp.maximum(att.kp_pt, 0)], att.kp_pw
        )

        # ---------------- trackLocalMap ------------------------------------
        member = jnp.zeros((P,), bool).at[jnp.maximum(att.kp_pt, 0)].max(att.kp_pt >= 0)
        local_kf, ref_kf = local_map.local_keyframe_mask(m, att.kp_pt)
        ref_kf = jnp.where(jnp.any(att.kp_pt >= 0), ref_kf, state.ref_kf)
        cand_pts = local_map.local_point_mask(m, local_kf) & ~member
        blocked = _observed(m, att.kp_pt)
        th_rad = jnp.where(frame_id < reloc_frame + 2, 5.0, 3.0)
        lm = local_map.search_local_points(
            m, att.T, cand_pts, feats.uv_und, feats.u_right, feats.octave, feats.desc,
            feats.valid, blocked, scale_factors, th_rad, cam=cam,
        )
        kp_pt2 = jnp.where(lm.assign >= 0, lm.assign, att.kp_pt)
        kp_temp2 = att.kp_temp & (lm.assign < 0)
        kp_pw2 = jnp.where((kp_pt2 >= 0)[:, None], m.pt_pos[jnp.maximum(kp_pt2, 0)], kp_pw_cur)

        has2 = (kp_pt2 >= 0) | kp_temp2
        obs2 = pose_only.PoseObs(
            p_world=kp_pw2, uv=feats.uv_und,
            u_right=jnp.where(has2, feats.u_right, -1.0),
            inv_sigma2=inv_level_sigma2[feats.octave], valid=has2,
        )
        T2, inl2, _ = pose_only.solve_pose_only(
            att.T, obs2, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, fast=True
        )
        real2 = kp_pt2 >= 0
        inlier_real = real2 & inl2
        observed_inliers = jnp.sum(
            (inlier_real & (m.pt_obs_cnt[jnp.maximum(kp_pt2, 0)] > 0)).astype(jnp.int32)
        )
        gate = jnp.where(frame_id < reloc_frame + max_frame_gap, 50, 30)
        ok = track_pre & (observed_inliers >= gate)

        vis_pts = jnp.zeros((P,), bool).at[jnp.maximum(kp_pt2, 0)].max(real2)
        vis_pts = (vis_pts | lm.visible_mask) & ~init
        found_pts = (
            jnp.zeros((P,), bool).at[jnp.maximum(kp_pt2, 0)].max(inlier_real)
            & ~init
        )
        m = m.replace(
            pt_visible=m.pt_visible + vis_pts.astype(jnp.int32),
            pt_found=m.pt_found + found_pts.astype(jnp.int32),
        )

        T_new = jnp.where(ok, T2, att.T)
        assign_final = jnp.where(inlier_real, kp_pt2, -1)

        # ---------------- keyframe policy ----------------------------------
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
        track_verify = (ref_ratio < ref_threshold) | (map_ratio < map_threshold)
        need_kf = ok & (track_weak | ref_weak | track_verify)
        need_kf &= ~((frame_id < reloc_frame + max_frame_gap) & (kf_cnt > max_frame_gap))
        # capacity: bump allocation until the high-water mark, then slot
        # reuse — culling keeps freeing rows, so insertion never stops
        # permanently (the round-1 cap froze KF creation at max_kf inserts)
        need_kf &= (m.n_kf < caps.max_kf) | jnp.any(~m.kf_valid)

        # predicated insert, not lax.cond (see `init` note above); the
        # first frame always inserts with identity pose and no bindings
        do_ins = init | need_kf
        T_out = jnp.where(init, eye, T_new)
        assign_ins = jnp.where(init, -1, assign_final)
        m, new_kf = insert_kf(m, T_out, assign_ins, do=do_ins)
        made = do_ins & (new_kf >= 0)
        ref_kf_out = jnp.where(made, new_kf, ref_kf)
        assign_out = jnp.where(made, m.kf_mp[jnp.maximum(new_kf, 0)], assign_final)

        T_cr = T_out @ lie.se3_inverse(m.kf_pose[jnp.maximum(ref_kf_out, 0)])
        T_cl = jnp.where(ok & ~init, T_new @ lie.se3_inverse(T_last), eye)

        st = SlamTrackState(
            frame_id=frame_id + 1,
            feats=feats, assign_real=assign_out,
            assign_gen=jnp.where(
                assign_out >= 0, m.pt_gen[jnp.maximum(assign_out, 0)], -1
            ),
            T_cr=T_cr, ref_kf=ref_kf_out,
            T_cl=T_cl, motion_valid=ok & ~init, initialized=jnp.asarray(True),
            lost=~ok & ~init,
            last_kf_frame=jnp.where(made, frame_id, state.last_kf_frame),
            last_was_kf=made,
            last_reloc_frame=reloc_frame,
        )
        # HUD flags (drawer.cpp:430-459): a tracked-inlier keypoint is
        # map-tracked when its point has observers, VO-tracked when it is
        # a fresh/temp point with none; only in state OK (INITIALIZING and
        # LOST draw nothing)
        hud_observed = m.pt_obs_cnt[jnp.maximum(kp_pt2, 0)] > 0
        hud_map = inlier_real & hud_observed
        hud_vo = (inlier_real & ~hud_observed) | (kp_temp2 & inl2)
        kp_state = jnp.where(
            ok & ~init & feats.valid,
            jnp.where(hud_map, 1, jnp.where(hud_vo, 2, 0)),
            0,
        ).astype(jnp.int32)
        out = SlamOut(
            T_c_w=T_out, T_cr=T_cr, ref_kf=ref_kf_out,
            ref_gen=m.kf_gen[jnp.maximum(ref_kf_out, 0)], ok=ok | init,
            n_features=n_feats, n_matches=att.n_match,
            n_inliers=observed_inliers, made_kf=made, relocalized=relocalized,
            kp_uv=feats.uv, kp_state=kp_state,
        )
        return st, m, out

    return track_branch(m)


slam_step = functools.partial(
    jax.jit,
    static_argnames=("caps", "spec", "budgets", "use_bow", "reloc_parity"),
    donate_argnums=(1,),
)(_slam_step)


def _mapping_step(
    m: MapState,
    did_kf: jnp.ndarray,
    kf_id: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    interrupt_ba: jnp.ndarray | None = None,
    bow_group_div: jnp.ndarray | None = None,
):
    """The local-mapping chain for one new keyframe, dispatched every frame
    with a no-op branch (so the host never syncs on the made_kf flag).

    Order mirrors LocalMapping::run (localMapping.cpp:16-66):
    cullingMapPoints -> createNewMapPoints -> searchInNeighbors (fuse) ->
    local BA -> cullingKeyFrames.

    interrupt_ba: the reference's interruptBA flag (localMapping.cpp:
    538-541) — bounds the BA to one iteration per pass when the worker is
    backlogged; see local_bundle_adjust.
    """

    def work(m):
        kid = jnp.maximum(kf_id, 0)
        m = culling.cull_map_points(m, kid, caps)
        m = triangulate.create_new_map_points(
            m, kid, caps, cam, scale_factors, bow_group_div=bow_group_div
        )
        m = fuse.search_in_neighbors(m, kid, caps, cam, scale_factors)
        m, n1, n2 = local_ba.local_bundle_adjust_iters(
            m, kid, caps, cam, 1.0 / (scale_factors * scale_factors),
            stop=interrupt_ba,
        )
        m = culling.cull_keyframes(m, kid, caps, cam)
        return m, n1, n2

    zero = jnp.asarray(0, jnp.int32)
    return jax.lax.cond(
        did_kf & (kf_id >= 0), work, lambda m: (m, zero, zero), m)


mapping_step = functools.partial(
    jax.jit, static_argnames=("caps",), donate_argnums=(0,)
)(_mapping_step)


def _background_one(
    m, loop_state, did_kf, kf_id, interrupt_ba, bow_group_div, caps, cam,
    scale_factors, with_loop: bool, inline_close: bool,
):
    """One frame of background work: the LocalMapping chain, LoopClosing
    detection, and (inline_close) the full Sim3 verification + correction
    for confirmed candidates — all ON-DEVICE, serially after detection,
    exactly the reference's LoopClosing thread order (loopClosing.cpp:
    17-37 pops a keyframe, detects, computeSim3s, corrects, then moves to
    the next). Serial detect->close means the loop keyframe is verified
    BEFORE later culling can decimate its bindings — the property the
    reference enforces with setNotEraseLoopDetectingKF (keyframe.cpp:
    401-415, 531-556); a host-drained close (the pre-inline design) ran
    8-16 frames late and measured live-binding decay killed real loops.

    Returns (m, loop_state, cand, cand_gen, closed, which, ba_n1, ba_n2)
    — the last two are the LM iteration counts local BA actually ran
    (0/0 on non-KF frames), a per-event load diagnostic."""
    m, ba_n1, ba_n2 = _mapping_step(
        m, did_kf, kf_id, caps, cam, scale_factors, interrupt_ba=interrupt_ba,
        bow_group_div=bow_group_div,
    )
    if with_loop:
        loop_state, cand, cand_gen = loop_closing.detect_step(
            m, loop_state, did_kf, kf_id, caps
        )
    else:
        cand = jnp.full((loop_closing.MAX_CANDS,), -1, jnp.int32)
        cand_gen = cand
    closed = jnp.asarray(False)
    which = jnp.asarray(-1, jnp.int32)
    if with_loop and inline_close:
        kf = jnp.maximum(kf_id, 0)

        def do_close(args):
            mm, ls = args
            return loop_closing._close_multi(
                mm, ls, kf, mm.kf_valid[kf], cand, cand_gen,
                bow_group_div, caps, cam, scale_factors,
            )

        m, loop_state, closed, which = jax.lax.cond(
            cand[0] >= 0,
            do_close,
            lambda args: (args[0], args[1], jnp.asarray(False),
                          jnp.asarray(-1, jnp.int32)),
            (m, loop_state),
        )
    return m, loop_state, cand, cand_gen, closed, which, ba_n1, ba_n2


@functools.partial(
    jax.jit, static_argnames=("caps", "with_loop", "inline_close"),
    donate_argnums=(0, 1),
)
def background_step(
    m: MapState,
    loop_state,
    did_kf: jnp.ndarray,
    kf_id: jnp.ndarray,
    interrupt_ba: jnp.ndarray,
    bow_group_div: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    with_loop: bool,
    inline_close: bool = True,
):
    """Everything the reference runs OFF the tracking thread — the
    LocalMapping chain and the complete LoopClosing pass (vo_run.cpp:72,95
    spawn these as their own threads) — as one dispatch, issued
    asynchronously after each frame's tracking dispatch. The host never
    blocks on it, so tracking latency is structurally independent of the
    mapping chain; on hardware where mapping has its own resources (the
    reference's extra CPU cores, or a dedicated second chip) it leaves the
    tracking path entirely."""
    m, loop_state, cand, cand_gen, closed, which, ba_n1, ba_n2 = _background_one(
        m, loop_state, did_kf, kf_id, interrupt_ba, bow_group_div, caps,
        cam, scale_factors, with_loop, inline_close,
    )
    packed = jnp.stack(
        [closed.astype(jnp.int32), which, (cand[0] >= 0).astype(jnp.int32),
         ba_n1, ba_n2, did_kf.astype(jnp.int32)]
    )  # [6]
    return m, loop_state, cand, cand_gen, closed, which, packed


@functools.partial(
    jax.jit,
    static_argnames=("caps", "spec", "budgets", "use_bow", "reloc_parity"),
    # only the map is donated: empty-state pytrees legitimately alias
    # buffers between fields (e.g. identity poses), which XLA rejects as
    # double donation
    donate_argnums=(1,),
)
def track_chunk(
    state: SlamTrackState,
    m: MapState,
    grays: jnp.ndarray,       # [K,H,W] u8
    depths: jnp.ndarray,      # [K,H,W] u16 raw or f32 meters
    timestamps: jnp.ndarray,  # [K] f32
    depth_scale,
    cam: Camera,
    caps: MapCaps,
    spec,
    budgets,
    scale_factors: jnp.ndarray,
    inv_level_sigma2: jnp.ndarray,
    fast_hi: float,
    fast_lo: float,
    max_frame_gap: int,
    voc,
    use_bow: bool,
    reloc_parity: bool = False,
):
    """K frames of tracking as ONE device program (lax.scan over slam_step).

    Per-frame dispatch pays the host-runtime round trip K times; on a
    tunneled runtime that overhead (~15-17 ms/frame measured: pytree
    flatten + RPC + upload) exceeds the device compute itself. Chunking
    amortizes it K-fold. Tracking is inherently sequential (frame n+1
    starts from frame n's pose and bindings) — the scan keeps that exact
    data flow on device. The mapping chain is NOT in here: it runs as the
    separate background_chunk program, so tracking throughput stays
    structurally independent of mapping (the reference's thread split),
    and mapping results reach tracking with up to K frames of lag — the
    same staleness the reference's queue-fed LocalMapping thread exhibits
    (localMapping.cpp:16-66 drains a queue the tracker never waits on)."""
    # frames may arrive as a tuple of per-frame device arrays: the stack
    # then happens INSIDE this program — two fewer device dispatches per
    # chunk on the tunneled runtime, where every program launch pays RTT
    if isinstance(grays, (tuple, list)):
        grays = jnp.stack(grays)
    if isinstance(depths, (tuple, list)):
        depths = jnp.stack(depths)
    if isinstance(timestamps, (tuple, list)):
        timestamps = jnp.stack(timestamps)

    def body(carry, xs):
        st, mm = carry
        g, d, ts = xs
        st, mm, out = _slam_step(
            st, mm, g, d, ts, depth_scale, cam, caps, spec, budgets,
            scale_factors, inv_level_sigma2, fast_hi, fast_lo,
            max_frame_gap, voc, use_bow, reloc_parity,
        )
        return (st, mm), (out, st.feats.desc, st.feats.valid)

    (state, m), (outs, descs, desc_valids) = jax.lax.scan(
        body, (state, m), (grays, depths, timestamps)
    )
    return state, m, outs, descs, desc_valids


@functools.partial(
    jax.jit, static_argnames=("caps", "with_loop", "inline_close"),
    donate_argnums=(0, 1),
)
def background_chunk(
    m: MapState,
    loop_state,
    did_kf: jnp.ndarray,      # [K] bool — made_kf per chunk frame
    kf_id: jnp.ndarray,       # [K] i32 — ref_kf per chunk frame
    interrupt_ba: jnp.ndarray,
    bow_group_div: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    with_loop: bool,
    inline_close: bool = True,
):
    """The background work for one tracked chunk: the mapping chain + the
    complete LoopClosing pass (detect -> Sim3 verify -> correct, serial —
    see _background_one) for every keyframe the chunk created, in creation
    order, as one dispatch (scan; non-KF frames fall through the no-op
    branch)."""

    # per-event interruptBA (localMapping.cpp:538-541): the reference
    # aborts a keyframe's local BA when another keyframe is already
    # waiting in the queue — within a chunk, event k's BA is skipped iff a
    # LATER frame of the same chunk also created a keyframe (the later KF
    # "arrives" while event k's BA would run, since the chunk processes
    # events serially). The host-side flag still ORs in (tests force it).
    stops = chunk_ba_stops(did_kf) | interrupt_ba

    def body(carry, xs):
        mm, ls = carry
        did, kid, stop = xs
        mm, ls, cand, cand_gen, closed, which, ba_n1, ba_n2 = _background_one(
            mm, ls, did, kid, stop, bow_group_div, caps, cam,
            scale_factors, with_loop, inline_close,
        )
        return (mm, ls), (cand, cand_gen, closed, which, ba_n1, ba_n2)

    (m, loop_state), (cands, cand_gens, closeds, whichs, ba_n1s, ba_n2s) = jax.lax.scan(
        body, (m, loop_state), (did_kf, kf_id, stops)
    )
    # inline-close outcome rows + local-BA iteration counts + the KF flag
    # (distinguishes an interrupt-skipped BA (did=1, n1=n2=0) from a non-KF
    # frame), packed HERE so the host can queue the async readback without
    # dispatching a separate packing program
    packed = jnp.stack(
        [closeds.astype(jnp.int32), whichs, (cands[:, 0] >= 0).astype(jnp.int32),
         ba_n1s, ba_n2s, did_kf.astype(jnp.int32)],
        axis=1,
    )  # [K,6]
    return m, loop_state, cands, cand_gens, closeds, whichs, packed


def chunk_ba_stops(did_kf: jnp.ndarray) -> jnp.ndarray:
    """[K] bool — event k must skip its local BA because a later frame of
    the same chunk created a keyframe (the reference's interruptBA raised
    by a queued new keyframe, localMapping.cpp:538-541 + the entry check
    optimizer_ceres.cpp:594)."""
    d = did_kf.astype(jnp.int32)
    later_incl = jnp.flip(jnp.cumsum(jnp.flip(d)), 0)  # KFs at index >= k
    return (later_incl - d) > 0


def recover_frame_pose(
    ref: int, gen: int, T_cr: np.ndarray, T_c_w_raw: np.ndarray,
    kf_pose, kf_valid, kf_gen, cull_parent, cull_parent_gen, cull_gen, kf_tcp,
) -> np.ndarray:
    """Per-frame pose from (T_cr, ref KF), walking the Tcp parent chain
    through culled keyframes (vo_run.cpp:207-226).

    Every hop carries the EXPECTED generation of the slot it lands on: a
    live slot must match kf_gen, a culled slot must match cull_gen (the
    archive only describes the most recent culled generation per slot).
    Any mismatch means the chain was severed by slot reuse — return the
    raw tracked pose rather than composing transforms that belong to a
    different keyframe's generation."""
    T_rp = np.eye(4, dtype=np.float32)
    hops = 0
    while ref >= 0 and hops < 64:
        if kf_valid[ref] and kf_gen[ref] == gen:
            return T_cr @ T_rp @ kf_pose[ref]
        if cull_gen[ref] != gen:
            break  # archive overwritten by a later generation's cull
        T_rp = T_rp @ kf_tcp[ref]
        gen = int(cull_parent_gen[ref])
        ref = int(cull_parent[ref])
        hops += 1
    return T_c_w_raw


class SlamSystem:
    """Tracking + (synchronous lite) mapping over an RGB-D stream."""

    def __init__(
        self,
        cfg: SlamConfig,
        caps: MapCaps = MapCaps(),
        vocabulary: Optional[bow_voc.Vocabulary] = None,
        enable_global_ba: bool = False,
        chunk: int = 1,
        drain_chunk: int = DRAIN_CHUNK,
        reloc_parity: bool = False,
    ):
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
        self.voc = vocabulary
        self.use_bow = vocabulary is not None
        # reference-semantics relocalization (VERDICT r3 #4): all-candidate
        # first-success iteration with always-EPnP — see attempt_reloc
        self.reloc_parity = bool(reloc_parity)
        self._depth_scale = jnp.asarray(cfg.camera_depthScale, jnp.float32)

        self.map = empty_map(caps)
        self.state = self._empty_state()
        self.loop_state = loop_closing.empty_loop_state(caps)
        self.enable_loop_closing = self.use_bow
        # upstream ORB-SLAM2 runs a global BA after each accepted loop
        # closure; the reference stops at the essential graph (SURVEY §2),
        # so this stays opt-in for behavioral parity by default.
        self.enable_global_ba = enable_global_ba
        # chunk>1: buffer frames and track them as one scanned device
        # program (track_chunk) — the offline/throughput mode; chunk=1 is
        # the per-frame latency mode
        self.chunk = int(chunk)
        self._chunk_buf: List = []      # buffered (gray, depth, timestamp)
        self._pending_loop: List = []   # (frame_ids, packed [B, 2C+2] device)
        # frames between loop-candidate readbacks: batching amortizes the
        # host round trip (throughput mode), but every batched frame delays
        # close_step past detection — a candidate or current KF culled in
        # the interim is then (correctly) rejected by the generation guard.
        # The reference's LoopClosing thread drains within ~a frame
        # (loopClosing.cpp:17-37); tests that assert closure use 1.
        self._drain_every = max(1, int(drain_chunk))
        # interruptBA analogue (localMapping.cpp:538-541): the reference
        # aborts local BA whenever a new keyframe is queued while BA runs —
        # freshness beats convergence under load. Round-5 production rule:
        # IN-CHUNK and per-event (chunk_ba_stops): event k skips its BA iff
        # a LATER frame of the same chunk created a keyframe, mirroring the
        # serial queue — and the skip is the reference's entry-check
        # `if (stopFlag) return;` (optimizer_ceres.cpp:594), not a
        # truncated solve. The host flag below only ORs in a forced value
        # (tests/stress). Both flag values are pre-staged device scalars
        # (a fresh per-dispatch transfer stalls the tunnel).
        self._interrupt_false = jnp.asarray(False)
        self._interrupt_true = jnp.asarray(True)
        self._force_interrupt_ba = None  # forced value for tests; None = auto
        self._bg_refs: List = []         # recent background output refs
        self.n_ba_interrupts = 0         # diagnostics
        # per-KF-event local-BA LM iteration counts (frame_idx, n_pass1,
        # n_pass2) — folded from the packed rows at results() time; the
        # load diagnostic behind the adaptive-iteration evidence
        self.ba_iters: List[Tuple[int, int, int]] = []
        # featVec bucket divisor for searchForTriangulation parity
        # (matcher.cpp:903-965): word // k^levels_up at levels_up=3
        self._bow_group_div = jnp.asarray(
            vocabulary.k ** min(3, vocabulary.levels) if vocabulary else 0,
            jnp.int32,
        )
        self._frame_desc: List = []     # per-frame (desc, valid) device refs
        self._desc_archive_cap = 4096   # ~32 KB/frame of HBM
        self.loop_closures: List[int] = []
        # every Sim3-verification attempt: (frame_idx, cand_kf, accepted) —
        # diagnostics for scenario tuning and closure-rate tests; with
        # VO_LOOP_DIAG=1 each tuple also carries the 20/20/20/40 gate values
        self.loop_attempts: List[Tuple[int, int, bool]] = []
        self._loop_diag = bool(int(os.environ.get("VO_LOOP_DIAG", "0")))
        # normal mode closes loops INLINE in the background program (serial
        # detect->verify->correct, the reference's LoopClosing thread
        # order); the host-drained per-candidate path survives only for
        # VO_LOOP_DIAG gate diagnostics
        self._inline_close = not self._loop_diag
        self._close_results: List = []  # (frame_ids, [B,3] device)
        self._inflight_drain: List = []  # [(frame_ids, device array)] FIFO
        self._outs: List[SlamOut] = []
        self.timestamps: List[float] = []
        self._frame_id = 0

    def _ba_interrupt(self) -> jnp.ndarray:
        """Host-side interruptBA override for the NEXT background dispatch.

        Round-5 revision: the production trigger is IN-CHUNK and
        per-event (chunk_ba_stops — a later keyframe in the same chunk
        skips the earlier event's BA, the reference's queued-new-keyframe
        abort). The old host heuristic (>=2 unfinished background
        dispatches) measured DISPATCH pipelining, which is permanently
        backlogged in steady state, and starved every BA to nothing —
        28/45 kfdense events interrupted where the reference's duty cycle
        completes most BAs. This hook now only serves the forced value
        (tests / stress runs)."""
        if self._force_interrupt_ba is not None:
            return (self._interrupt_true if self._force_interrupt_ba
                    else self._interrupt_false)
        return self._interrupt_false

    def _note_bg_dispatch(self, ref) -> None:
        self._bg_refs.append(ref)
        if len(self._bg_refs) > 8:  # bound the scan; old refs are ready
            self._bg_refs = self._bg_refs[-8:]

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
            frame_id=jnp.asarray(0, jnp.int32),
            feats=feats, assign_real=jnp.full((N,), -1, jnp.int32),
            assign_gen=jnp.full((N,), -1, jnp.int32),
            T_cr=eye, ref_kf=jnp.asarray(0, jnp.int32), T_cl=eye,
            motion_valid=jnp.asarray(False), initialized=jnp.asarray(False),
            lost=jnp.asarray(False),
            last_kf_frame=jnp.asarray(-10_000, jnp.int32),
            last_was_kf=jnp.asarray(False),
            last_reloc_frame=jnp.asarray(-10_000, jnp.int32),
        )

    def track(self, gray: np.ndarray, depth: np.ndarray, timestamp: float) -> None:
        """depth: f32 meters OR u16 raw (scaled by depth_scale on device —
        halves the per-frame upload). All per-frame inputs go straight into
        the jit dispatch (no eager converts); the frame counter lives in
        device state.

        Two asynchronous dispatches per frame, mirroring the reference's
        thread split (vo_run.cpp:72,95): the TRACKING program (slam_step),
        whose latency is the per-frame metric, and the BACKGROUND program
        (mapping chain + loop detection), which the host fires without ever
        blocking on it — the tracking path does not wait for mapping.

        chunk>1 buffers frames and runs both programs once per chunk
        (scanned over the buffered frames) — same data flow, K-fold fewer
        host round trips."""
        if self.chunk > 1:
            # upload each frame the moment it arrives: the H2D copy then
            # overlaps the device's work on the previous chunk instead of
            # bunching at dispatch time (the tunnel makes bulk uploads at
            # dispatch visible on the critical path). Frames that are
            # ALREADY device arrays (pre-staged by the caller, or re-fed by
            # _flush) pass through untouched — np.ascontiguousarray on a
            # device array would be a blocking device->host round trip.
            g = gray if isinstance(gray, jax.Array) else jax.device_put(
                np.ascontiguousarray(gray))
            d = depth if isinstance(depth, jax.Array) else jax.device_put(depth)
            # the timestamp rides up asynchronously too: uploading it at
            # dispatch time was one more serialized tunnel op per chunk
            t = (timestamp if isinstance(timestamp, jax.Array)
                 else jax.device_put(np.float32(timestamp)))
            self._chunk_buf.append((g, d, timestamp, t))
            if len(self._chunk_buf) >= self.chunk:
                self._dispatch_chunk()
            return
        self.state, self.map, out = slam_step(
            self.state, self.map,
            # pre-staged device arrays pass through (ascontiguousarray on
            # a device array is a blocking D2H round trip)
            gray if isinstance(gray, jax.Array) else np.ascontiguousarray(gray),
            depth,
            jnp.asarray(timestamp, jnp.float32), self._depth_scale,
            self.camera, self.caps, self.spec, self.budgets,
            self.scale_factors, self.inv_level_sigma2,
            self.fast_hi, self.fast_lo, self.max_frame_gap,
            self.voc, self.use_bow, self.reloc_parity,
        )
        self.map, self.loop_state, cand, cand_gen, closed, which, packed = background_step(
            self.map, self.loop_state, out.made_kf, out.ref_kf,
            self._ba_interrupt(), self._bow_group_div, self.caps, self.camera,
            self.scale_factors, self.enable_loop_closing,
            inline_close=self._inline_close,
        )
        self._note_bg_dispatch(cand)
        if self.enable_loop_closing:
            if self._inline_close:
                self._queue_close_results([self._frame_id], packed[None])
            else:
                self._queue_loop(
                    [self._frame_id],
                    cand[None], cand_gen[None],
                    out.ref_kf[None], out.ref_gen[None],
                )
        # archive per-frame descriptor refs (device-resident, no sync):
        # create_vocabulary includes the LOST frames' descriptors like the
        # reference (map.cpp:79-83, visualOdometry.cpp:115-121); whether a
        # frame was lost is only read back lazily at vocabulary time
        if len(self._frame_desc) < self._desc_archive_cap:
            self._frame_desc.append((self.state.feats.desc, self.state.feats.valid))
        self._outs.append(out)
        self.timestamps.append(timestamp)
        self._frame_id += 1

    def _dispatch_chunk(self) -> None:
        """Track + background the buffered frames as two scanned dispatches."""
        buf, self._chunk_buf = self._chunk_buf, []
        # per-frame device arrays pass through as tuples; track_chunk
        # stacks them INSIDE its program (no separate stack/upload
        # dispatches — every eager op here is a serialized tunnel round
        # trip of device idle, ~20-30 ms each, measured round 4)
        grays = tuple(g for g, _, _, _ in buf)
        depths = tuple(d for _, d, _, _ in buf)
        ts_dev = tuple(t for _, _, _, t in buf)
        self.state, self.map, outs, descs, desc_valids = track_chunk(
            self.state, self.map, grays, depths, ts_dev,
            self._depth_scale, self.camera, self.caps, self.spec,
            self.budgets, self.scale_factors, self.inv_level_sigma2,
            self.fast_hi, self.fast_lo, self.max_frame_gap,
            self.voc, self.use_bow, self.reloc_parity,
        )
        self.map, self.loop_state, cands, cand_gens, closeds, whichs, packed = background_chunk(
            self.map, self.loop_state, outs.made_kf, outs.ref_kf,
            self._ba_interrupt(), self._bow_group_div, self.caps, self.camera,
            self.scale_factors, self.enable_loop_closing,
            inline_close=self._inline_close,
        )
        self._note_bg_dispatch(cands)
        k = len(buf)
        if self.enable_loop_closing:
            frame_ids = list(range(self._frame_id, self._frame_id + k))
            if self._inline_close:
                self._queue_close_results(frame_ids, packed)
            else:
                self._queue_loop(
                    frame_ids, cands, cand_gens, outs.ref_kf, outs.ref_gen,
                )
        if len(self._frame_desc) < self._desc_archive_cap:
            self._frame_desc.append((descs, desc_valids))
        self._outs.append(outs)  # stacked: leaves have leading dim k
        self.timestamps.extend(t for _, _, t, _ in buf)
        self._frame_id += k

    def _queue_loop(self, frame_ids, cands, cand_gens, ref_kfs, ref_gens):
        """Queue one batch of per-frame loop detections (all device arrays
        with leading dim B) for a later asynchronous readback."""
        packed = jnp.concatenate(
            [cands, cand_gens, ref_kfs[:, None], ref_gens[:, None]], axis=1
        )  # [B, 2*MAX_CANDS + 2] i32
        self._pending_loop.append((frame_ids, packed))
        if sum(len(f) for f, _ in self._pending_loop) >= self._drain_every:
            self._drain_loop_queue()

    def _drain_loop_queue(self, final: bool = False) -> None:
        """Check past loop detections and run the heavy Sim3-verification/
        correction step for confirmed candidates — the async analogue of
        the reference's LoopClosing thread.

        Candidates are fetched in DRAIN_CHUNK batches with an ASYNC
        device-to-host copy: the copy for batch k starts when the batch
        closes and is consumed one drain later (batch k+1's close), by
        which point the transfer has long completed — the tracking loop
        never blocks on the tunnel round trip (a blocking per-frame scalar
        readback measured ~20-25 ms). Loop closure therefore lags up to
        2*DRAIN_CHUNK frames — like the reference's queue-fed LoopClosing
        thread (loopClosing.cpp:17-37)."""
        # process in-flight batches whose copies have LANDED; in throughput
        # mode (drain_every > 1) a still-copying batch is left in flight
        # rather than blocked on — np.asarray here would stall the host on
        # the device finishing the previous chunk's background program,
        # serializing the pipeline (the reference's LoopClosing thread
        # never back-pressures tracking either). drain_every == 1 keeps
        # blocking semantics: prompt closure, one frame behind detection.
        may_defer = self._drain_every > 1 and not final
        while self._inflight_drain:
            fids, arr = self._inflight_drain[0]
            if may_defer and hasattr(arr, "is_ready") and not arr.is_ready():
                break
            self._inflight_drain.pop(0)
            self._process_drain(fids, arr)
        if self._pending_loop:
            batch = self._pending_loop
            self._pending_loop = []
            frame_ids = [f for fids, _ in batch for f in fids]
            stacked = jnp.concatenate([p for _, p in batch], axis=0)
            try:
                stacked.copy_to_host_async()
            except AttributeError:
                pass
            self._inflight_drain.append((frame_ids, stacked))
        if final:
            for fids, arr in self._inflight_drain:
                self._process_drain(fids, arr)
            self._inflight_drain = []

    def _process_drain(self, frame_ids, stacked) -> None:
        """VO_LOOP_DIAG drain path: per-candidate close dispatches with
        gate diagnostics (inline_close handles the normal path on-device)."""
        arr = np.asarray(stacked)
        k = (arr.shape[1] - 2) // 2
        cands, gens = arr[:, :k], arr[:, k : 2 * k]
        kf_ids, kf_gens = arr[:, 2 * k], arr[:, 2 * k + 1]
        for frame_idx, crow, grow, kf_id, kf_gen in zip(
            frame_ids, cands.tolist(), gens.tolist(),
            kf_ids.tolist(), kf_gens.tolist(),
        ):
            self._process_one_diag(frame_idx, crow, grow, kf_id, kf_gen)

    def _queue_close_results(self, frame_ids, packed):
        """Stash per-frame inline-close outcome rows (packed [B,5] i32,
        built inside the background program) for a LAZY asynchronous
        readback — loop_closures/loop_attempts are diagnostics; the device
        state is already corrected, so the rows are only read at results()/
        vocabulary time — no per-chunk D2H is even STARTED (on the tunneled
        runtime every transfer is a serialized round trip of device idle).
        When global BA is enabled the readback is synchronous instead (the
        upstream behavior runs a global BA right after an accepted
        closure)."""
        self._close_results.append((frame_ids, packed))
        if self.enable_global_ba:
            self._collect_close_results()

    def _collect_close_results(self) -> None:
        """Fold landed inline-close outcomes into loop_closures /
        loop_attempts and (opt-in) trigger the upstream global BA."""
        for frame_ids, packed in self._close_results:
            arr = np.asarray(packed)
            for frame_idx, row in zip(frame_ids, arr.tolist()):
                done, which, attempted = row[:3]
                if len(row) >= 6 and row[5]:
                    # a KF event; n1=n2=0 means its BA was interrupt-skipped
                    self.ba_iters.append((frame_idx, row[3], row[4]))
                    if not (row[3] or row[4]):
                        self.n_ba_interrupts += 1
                if attempted:
                    self.loop_attempts.append((frame_idx, int(which), bool(done)))
                if done:
                    self.loop_closures.append(frame_idx)
                    if self.enable_global_ba:
                        from ..solvers.global_ba import global_bundle_adjust

                        self.map = global_bundle_adjust(
                            self.map, self.caps, self.camera,
                            jnp.asarray(0, jnp.int32),
                            inv_level_sigma2=self.inv_level_sigma2,
                        )
        self._close_results = []

    def _process_one_diag(self, frame_idx, crow, grow, kf_id, kf_gen) -> None:
        """VO_LOOP_DIAG=1 path: per-candidate dispatches with the gate
        diagnostics recorded into loop_attempts (scenario tuning)."""
        kf_id = jnp.asarray(kf_id, jnp.int32)
        kf_gen = jnp.asarray(kf_gen, jnp.int32)
        for cand_i, gen_i in zip(crow, grow):
            if cand_i < 0:
                continue
            g_curr = bow_voc.feature_groups(
                self.voc, self.map.kf_word[jnp.maximum(kf_id, 0)])
            g_cand = bow_voc.feature_groups(self.voc, self.map.kf_word[cand_i])
            self.map, self.loop_state, accepted, dg = loop_closing.close_step(
                self.map, self.loop_state, kf_id, jnp.asarray(cand_i, jnp.int32),
                self.caps, self.camera, self.scale_factors, g_curr, g_cand,
                kf_gen_expect=kf_gen,
                cand_gen_expect=jnp.asarray(gen_i, jnp.int32),
                diag=True,
            )
            ok = bool(np.asarray(accepted))
            self.loop_attempts.append(
                (frame_idx, int(cand_i), ok,
                 {k: int(np.asarray(v)) for k, v in dg.items()}))
            if not ok:
                continue
            self.loop_closures.append(frame_idx)
            if self.enable_global_ba:
                from ..solvers.global_ba import global_bundle_adjust

                self.map = global_bundle_adjust(
                    self.map, self.caps, self.camera, jnp.asarray(0, jnp.int32),
                    inv_level_sigma2=self.inv_level_sigma2,
                )
            break

    @staticmethod
    def _per_frame(outs_np):
        """Flatten device_get'd outs (scalar-frame or chunk-stacked)."""
        flat = []
        for o in outs_np:
            if np.ndim(o.ok) == 0:
                flat.append(o)
            else:
                for i in range(np.shape(o.ok)[0]):
                    flat.append(jax.tree.map(lambda x: x[i], o))
        return flat

    def _flush(self) -> None:
        """Track any frames still buffered in an incomplete chunk (uses the
        per-frame program; feed multiples of `chunk` to avoid its compile)."""
        if self._chunk_buf:
            buf, self._chunk_buf = self._chunk_buf, []
            chunk, self.chunk = self.chunk, 1
            try:
                for g, d, t, _ in buf:
                    self.track(g, d, t)
            finally:
                self.chunk = chunk

    def results(self):
        """Blocks; returns (trajectory T_w_c [F,4,4], stats, kf_traj)."""
        self._flush()
        if self.enable_loop_closing:
            self._drain_loop_queue(final=True)
            self._collect_close_results()
        keys = ("kf_pose", "kf_valid", "kf_gen", "cull_parent",
                "cull_parent_gen", "cull_gen", "kf_tcp")
        # start every D2H copy before reading any: a sequential device_get
        # pays one tunnel round trip PER LEAF (~5 ms each, dozens of
        # leaves); async-first overlaps them into ~one round trip
        for leaf in jax.tree.leaves((self._outs, [getattr(self.map, k) for k in keys])):
            try:
                leaf.copy_to_host_async()
            except AttributeError:
                pass
        outs = self._per_frame(jax.device_get(self._outs))
        arrays = {k: np.asarray(getattr(self.map, k)) for k in keys}
        traj, stats = [], []
        for o in outs:
            T_c_w = recover_frame_pose(
                int(o.ref_kf), int(o.ref_gen), np.asarray(o.T_cr),
                np.asarray(o.T_c_w), **arrays,
            )
            traj.append(np.linalg.inv(T_c_w))
            stats.append(
                TrackStats(
                    n_features=int(o.n_features), n_matches=int(o.n_matches),
                    n_inliers=int(o.n_inliers), ok=bool(o.ok),
                )
            )
        kf_ts = np.asarray(self.map.kf_timestamp)
        kf_traj = [
            (float(kf_ts[k]), np.linalg.inv(arrays["kf_pose"][k]))
            for k in range(arrays["kf_pose"].shape[0]) if arrays["kf_valid"][k]
        ]
        return np.stack(traj), stats, kf_traj

    @property
    def n_keyframes(self) -> int:
        return int(np.asarray(self.map.kf_valid).sum())

    @property
    def n_points(self) -> int:
        return int(np.asarray(self.map.pt_valid).sum())

    def create_vocabulary(self, k: int = 10, levels: int = 4, seed: int = 0):
        """Build a scene-specific vocabulary from the tracked keyframe
        descriptors PLUS the descriptors of lost frames — the capability the
        reference added over stock ORB-SLAM2 (map.cpp:60-99; lost frames
        archived at visualOdometry.cpp:115-121). Returns a Vocabulary; save
        with .save(path)."""
        kf_descs, lost_descs = self._vocabulary_descriptors()
        descs = kf_descs + lost_descs
        if not descs:
            raise RuntimeError("no keyframes to build a vocabulary from")
        return bow_voc.build_vocabulary(
            np.concatenate(descs), k=k, levels=levels, seed=seed
        )

    def _vocabulary_descriptors(self):
        """(keyframe descriptor arrays, lost-frame descriptor arrays)."""
        kf_valid = np.asarray(self.map.kf_valid)
        kf_desc = np.asarray(self.map.kf_desc)
        kp_valid = np.asarray(self.map.kf_kp_valid)
        kf_descs = [kf_desc[kf][kp_valid[kf]] for kf in np.nonzero(kf_valid)[0]]
        # lost-frame descriptors (map.cpp:79-83); archive entries may be
        # chunk-stacked [K,N,8] — flatten both streams to per-frame order
        frame_descs = []
        for desc, valid in self._frame_desc:
            d, v = np.asarray(desc), np.asarray(valid)
            if d.ndim == 2:
                frame_descs.append((d, v))
            else:
                frame_descs.extend(zip(d, v))
        oks = [
            bool(o.ok)
            for o in self._per_frame(jax.device_get(self._outs))[: len(frame_descs)]
        ]
        lost_descs = []
        for ok, (d, v) in zip(oks, frame_descs):
            if not ok:
                dd = d[v]
                if dd.size:
                    lost_descs.append(dd)
        return kf_descs, lost_descs

    @property
    def reloc_frames(self) -> List[int]:
        outs = self._per_frame(jax.device_get(self._outs))
        return [i for i, o in enumerate(outs) if bool(o.relocalized)]
