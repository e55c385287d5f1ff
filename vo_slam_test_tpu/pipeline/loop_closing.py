"""Loop closing: detection, Sim3 verification, correction, essential graph.

Covers the reference's LoopClosing thread (loopClosing.cpp):

- detect_step (one jit, runs conditionally every frame): BoW scores of the
  new keyframe vs the whole map, minimum-covisible-score gate (:68-83),
  Map::detectLoopCandidates cascade, and the 3-consecutive-detections
  consistency-group tracking (:95-174) kept as fixed-shape group masks.
- close_step (one jit, host-dispatched on a confirmed candidate):
  KF<->KF BoW matching, batched Horn Sim3 RANSAC (>=20 inliers,
  sim3Solver), LM Sim3 refinement (>=20, optimizer_ceres.cpp:810-1030),
  Scw-projection gathering of loop-side points with the >=40 acceptance
  gate (:178-348); then correctLoop (:350-492): propagate the correction to
  the current covisible group and its points, fuse loop points into the
  corrected group, and run the essential-graph Sim3 pose-graph
  (solvers/pose_graph.py) with edge measurements taken from PRE-correction
  poses (the drift signal) and the loop edge from the corrected relative.
  Map points are corrected through their reference keyframes afterwards
  (optimizer_ceres.cpp:1281-1301).

Deviation (DEVIATIONS.md D1): the reference runs 5 RANSAC iterations per
candidate per loop round across up to 300 total; the batched solver
evaluates 128 hypotheses at once, once per confirmed candidate.
searchBySim3's bidirectional matched-set enlargement IS implemented
(_search_by_sim3 below, matcher.cpp:679-865 semantics) and runs before the
>=20 refine gate, matching loopClosing.cpp:253-274 order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .. import lie
from ..bow import retrieval as bow_ret
from ..camera import Camera
from ..matching import bow_match
from ..ops import hamming
from ..slam_map import fuse
from ..slam_map.map_state import MapCaps, MapState
from ..solvers import pose_graph, sim3

MAX_GROUPS = 32
MAX_CANDS = 8          # candidate groups tracked per detection round
MIN_KF_GAP = 10        # >=10 KFs since last loop (loopClosing.cpp:62)
CONSISTENCY = 3        # consecutive consistent detections (:149)


@struct.dataclass
class LoopState:
    groups: jnp.ndarray      # [G,K] bool previous candidate groups
    counts: jnp.ndarray      # [G] i32 consistency counts
    n_groups: jnp.ndarray    # i32
    last_loop_seq: jnp.ndarray  # i32 kf_seq of the last accepted loop KF —
                                # the gap gate counts INSERTION order
                                # (keyframe.cpp id_), not slot ids, which
                                # stop being creation-ordered once slot
                                # recycling starts


def empty_loop_state(caps: MapCaps) -> LoopState:
    return LoopState(
        groups=jnp.zeros((MAX_GROUPS, caps.max_kf), bool),
        counts=jnp.zeros((MAX_GROUPS,), jnp.int32),
        n_groups=jnp.asarray(0, jnp.int32),
        # the reference initializes lastLoopKFId_ = 0 (loopClosing.cpp:14),
        # so the first 10 keyframes can never close a loop
        last_loop_seq=jnp.asarray(0, jnp.int32),
    )


def advance_consistency(cand_groups, top_ok, prev_groups, prev_counts, n_prev):
    """One round of the reference's consistency-group update
    (loopClosing.cpp:95-174), vectorized:

    - intersections [C,G] between candidate groups and previous groups;
    - a candidate's consistency count is max(prevCnt)+1 over intersecting
      previous groups (the reference checks currCnt >= 3 for EVERY
      intersecting group, which is the same confirm set);
    - the NEXT round's group list follows vbConsistentGroup dedup exactly:
      each previous group is claimed by the FIRST candidate intersecting it
      (one pushed entry per claimed previous group, count = prevCnt + 1),
      and a candidate intersecting nothing pushes its own group with count
      0; a candidate whose every intersecting group was already claimed
      pushes nothing.

    Returns (groups [G,K], counts [G], n_groups, cand_counts [C]).
    """
    G = prev_groups.shape[0]
    C = cand_groups.shape[0]
    inter = jnp.any(
        cand_groups[:, None, :] & prev_groups[None, :, :], axis=2
    ) & (jnp.arange(G)[None, :] < n_prev)                      # [C,G]
    prev_best = jnp.max(jnp.where(inter, prev_counts[None, :], -1), axis=1)
    cand_counts = jnp.where(
        top_ok, jnp.where(prev_best >= 0, prev_best + 1, 0), 0
    ).astype(jnp.int32)

    claimed = jnp.any(inter, axis=0)                           # [G]
    first_i = jnp.argmax(inter, axis=0)                        # [G]
    gA = cand_groups[first_i] & claimed[:, None]               # [G,K]
    cA = jnp.where(claimed, prev_counts + 1, 0).astype(jnp.int32)
    none = top_ok & ~jnp.any(inter, axis=1)                    # [C]
    gB = cand_groups & none[:, None]
    all_valid = jnp.concatenate([claimed, none])               # [G+C]
    all_groups = jnp.concatenate([gA, gB], axis=0)
    all_counts = jnp.concatenate([cA, jnp.zeros((C,), jnp.int32)])
    pos = jnp.cumsum(all_valid.astype(jnp.int32)) - 1
    slot = jnp.where(all_valid & (pos < G), pos, G)
    K = cand_groups.shape[1]
    groups = (
        jnp.zeros((G + 1, K), bool)
        .at[slot].max(all_groups & all_valid[:, None])[:G]
    )
    counts = (
        jnp.zeros((G + 1,), jnp.int32)
        .at[slot].set(jnp.where(all_valid, all_counts, 0))[:G]
    )
    n_groups = jnp.minimum(jnp.sum(all_valid.astype(jnp.int32)), G)
    return groups, counts, n_groups, cand_counts


@functools.partial(jax.jit, static_argnames=("caps",))
def detect_step(
    m: MapState,
    ls: LoopState,
    did_kf: jnp.ndarray,
    kf_id: jnp.ndarray,
    caps: MapCaps,
) -> Tuple[LoopState, jnp.ndarray]:
    """Returns (new loop state, confirmed candidate kf ids [MAX_CANDS],
    best score first, -1 padded)."""

    def work(args):
        m_, ls_ = args
        kf = jnp.maximum(kf_id, 0)
        K = caps.max_kf
        uniq = m_.kf_bow_word[kf]
        wgt = m_.kf_bow_weight[kf]
        scores, shared = bow_ret.scores_vs_keyframes(
            uniq, wgt, m_.kf_bow_word, m_.kf_bow_weight, m_.kf_valid.astype(jnp.float32)
        )
        covis_kfs = (m_.covis[kf] > 0) & m_.kf_valid
        min_score = jnp.min(jnp.where(covis_kfs, scores, jnp.inf))
        min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)

        cand_mask = bow_ret.loop_candidates(
            scores, shared, m_.covis, m_.kf_valid, kf, min_score
        )

        # consistency groups: exact vbConsistentGroup semantics of
        # loopClosing.cpp:95-174 — see advance_consistency
        cand_scores = jnp.where(cand_mask, scores, -jnp.inf)
        top_scores, top_ids = jax.lax.top_k(cand_scores, MAX_CANDS)
        top_ok = jnp.isfinite(top_scores)
        top_ids = top_ids.astype(jnp.int32)

        # [C,K] candidate groups
        self_row = jax.nn.one_hot(top_ids, K, dtype=bool)
        cand_groups = (
            self_row | ((m_.covis[top_ids] > 0) & m_.kf_valid[None, :])
        ) & top_ok[:, None]
        groups, counts, n_groups, new_counts = advance_consistency(
            cand_groups, top_ok, ls_.groups, ls_.counts, ls_.n_groups
        )
        conf_mask = top_ok & (new_counts >= CONSISTENCY)
        gap_ok = m_.kf_seq[kf] >= ls_.last_loop_seq + MIN_KF_GAP
        conf_mask &= gap_ok

        ls_new = LoopState(
            groups=groups, counts=counts,
            n_groups=n_groups,
            last_loop_seq=ls_.last_loop_seq,
        )
        # ALL enough-consistent candidates, best score first — the
        # reference's computeSim3 iterates every one until Sim3
        # verification succeeds (loopClosing.cpp:178-348). Candidate slot
        # generations ride along: close_step runs up to DRAIN_CHUNK frames
        # later, by which time a candidate slot may have been culled and
        # recycled into a different keyframe.
        out_cands = jnp.where(conf_mask, top_ids, -1)
        out_gens = jnp.where(conf_mask, m_.kf_gen[jnp.maximum(top_ids, 0)], -1)
        return ls_new, out_cands, out_gens

    def noop(args):
        _, ls_ = args
        pad = jnp.full((MAX_CANDS,), -1, jnp.int32)
        return ls_, pad, pad

    return jax.lax.cond(did_kf & (kf_id >= 0), work, noop, (m, ls))


def _close_one(
    m: MapState,
    ls: LoopState,
    kf: jnp.ndarray,           # current keyframe (>=0)
    cd: jnp.ndarray,           # candidate keyframe (>=0)
    gen_ok: jnp.ndarray,       # validity+generation guard, precomputed
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    voc_groups_curr: jnp.ndarray,  # [N] level-3 groups of kf's words
    voc_groups_cand: jnp.ndarray,
):
    """One candidate's Sim3 verification + (on accept) loop correction —
    the body of the reference's computeSim3 iteration (loopClosing.cpp:
    178-348) plus correctLoop. Returns (m, ls, accept, diag_dict)."""
    K = caps.max_kf
    N = caps.n_feat
    P = caps.max_pt
    kf_id = kf  # RANSAC seed

    # ---- KF<->KF BoW matching (matcher.cpp:561-677, ratio 0.75) ------------
    row1 = m.kf_mp[kf]
    row2 = m.kf_mp[cd]
    live1 = (row1 >= 0) & m.pt_valid[jnp.maximum(row1, 0)]
    live2 = (row2 >= 0) & m.pt_valid[jnp.maximum(row2, 0)]
    res = bow_match.search_by_bow_kf_frame(
        kf_desc=m.kf_desc[cd], kf_groups=voc_groups_cand, kf_mp=row2,
        kf_angle=m.kf_angle[cd], kf_pt_valid=live2,
        f_desc=m.kf_desc[kf], f_groups=voc_groups_curr, f_angle=m.kf_angle[kf],
        f_valid=m.kf_kp_valid[kf] & live1, ratio=0.75,
    )
    # res.assign: per kp-of-curr the matched point of cand
    match2 = res.assign                    # [N] cand-side point id
    match1 = row1                          # curr-side point per kp
    pair_ok = (match2 >= 0) & live1
    n_bow = res.count

    # camera-frame coordinates of the matched point pairs
    T1 = m.kf_pose[kf]
    T2 = m.kf_pose[cd]
    p1w = m.pt_pos[jnp.maximum(match1, 0)]
    pc1 = p1w @ T1[:3, :3].T + T1[:3, 3]
    uv1 = cam.camera2pixel(pc1)
    sig1 = scale_factors[m.kf_octave[kf]] ** 2
    gates1 = 9.21 * sig1

    def side2(pt_ids, kp_ids):
        """cand-side camera coords / pixels / sigma for pairs given the
        matched cand point and observing keypoint per curr keypoint."""
        pw = m.pt_pos[jnp.maximum(pt_ids, 0)]
        pc = pw @ T2[:3, :3].T + T2[:3, 3]
        uv = cam.camera2pixel(pc)
        sig = scale_factors[m.kf_octave[cd][jnp.maximum(kp_ids, 0)]] ** 2
        return pc, uv, sig

    pc2, uv2, sig2 = side2(match2, res.src_kp)
    s12, T12, inl_r, n_ransac = sim3.ransac_sim3(
        pc1, pc2, uv1, uv2, gates1, 9.21 * sig2, pair_ok,
        cam.fx, cam.fy, cam.cx, cam.cy, kf_id, fix_scale=True,
    )

    # enlarge the match set through the Sim3 estimate before refinement
    # (matcher.cpp:679-865 searchBySim3; computeSim3 order loopClosing.cpp:
    # 253-274) — the >=20 refine gate counts these extra matches
    pc2_own = m.pt_pos[jnp.maximum(row2, 0)] @ T2[:3, :3].T + T2[:3, 3]
    sb_kp, sb_ok = _search_by_sim3(
        m, kf, cd, T12, s12, pc1, pc2_own, live1, live2, cam, scale_factors
    )
    sb_new = sb_ok & (match2 < 0) & live1
    match2 = jnp.where(pair_ok, match2, jnp.where(sb_new, row2[jnp.maximum(sb_kp, 0)], -1))
    cand_kp = jnp.where(pair_ok, res.src_kp, jnp.where(sb_new, sb_kp, -1))

    pc2, uv2, sig2 = side2(match2, cand_kp)
    active = (inl_r & pair_ok) | sb_new
    s12b, T12b, inl_ref, n_ref = sim3.refine_sim3(
        T12, s12, pc1, pc2, uv1, uv2, 1.0 / sig1, 1.0 / sig2,
        active,
        cam.fx, cam.fy, cam.cx, cam.cy, fix_scale=True,
    )

    # corrected pose of the current keyframe: T1_corr = T12 * T2
    T1_corr = lie.orthonormalize(T12b @ T2)

    # ---- gather loop-side points and count total matches (>=40 gate) -------
    nb_cand = ((m.covis[cd] > 0) & m.kf_valid) | (jnp.arange(K) == cd)
    rows_on = nb_cand[:, None] & (m.kf_mp >= 0)
    flat_pt = jnp.where(rows_on, m.kf_mp, P - 1).reshape(-1)
    loop_pts = jnp.zeros((P,), bool).at[flat_pt].max(rows_on.reshape(-1))
    loop_pts &= m.pt_valid

    # project loop points into the corrected current frame, hamming match
    fr_u, fr_valid = _project_points(m, loop_pts, T1_corr, cam, scale_factors)
    lm = _sim3_projection_match(
        m, fr_u, fr_valid, kf, cam, scale_factors, radius=7.5
    )
    total = jnp.sum((lm >= 0).astype(jnp.int32))
    # re-check the >=10-KF gap HERE, not only at detection: detection for
    # keyframe k+1 runs in the device pipeline before the host processes
    # keyframe k's closure, so a loop accepted at k leaves k+1's queued
    # candidate carrying a stale gap verdict. The reference never sees this
    # hazard — its LoopClosing thread runs detect and close serially
    # (loopClosing.cpp:17-37), so mLastLoopKFid_ is always current at the
    # detect gate (:62-67); this check restores those serial semantics.
    gap_ok = m.kf_seq[kf] >= ls.last_loop_seq + MIN_KF_GAP
    accept = (
        gen_ok & gap_ok
        & (n_bow >= 20) & (n_ransac >= 20) & (n_ref >= 20) & (total >= 40)
    )

    # ---- correctLoop (loopClosing.cpp:350-492) ----------------------------
    def do_correct(m):
        pre_pose = m.kf_pose  # measurements for the essential graph
        # propagate the correction to the current covisible group
        group = ((m.covis[kf] > 0) & m.kf_valid) | (jnp.arange(K) == kf)
        T_delta = T1_corr @ lie.se3_inverse(T1)  # world-side correction of kf
        # S_i_corr = S_i_c * S_c_corr => T_i_corr = (T_i * T1^-1) * T1_corr
        T_i_c = jnp.einsum("kij,jl->kil", m.kf_pose, lie.se3_inverse(T1))
        T_corr_all = jnp.einsum("kij,jl->kil", T_i_c, T1_corr)
        new_poses = jnp.where(group[:, None, None], lie.orthonormalize(T_corr_all), m.kf_pose)
        m = m.replace(kf_pose=new_poses)

        # correct the group's points: p' = T_new^-1 T_old p via the point's
        # reference keyframe when it belongs to the group
        ref = jnp.maximum(m.pt_ref_kf, 0)
        in_group = group[ref] & m.pt_valid
        T_old = pre_pose[ref]
        T_new = new_poses[ref]
        p_cam = jnp.einsum("pij,pj->pi", T_old[:, :3, :3], m.pt_pos) + T_old[:, :3, 3]
        T_new_inv = jax.vmap(lie.se3_inverse)(T_new)
        p_corr = jnp.einsum("pij,pj->pi", T_new_inv[:, :3, :3], p_cam) + T_new_inv[:, :3, 3]
        m = m.replace(pt_pos=jnp.where(in_group[:, None], p_corr, m.pt_pos))

        # fuse loop points into the corrected group (searchAndFuse :496-516)
        group_ids = fuse._compact_ids(group, 16)

        def body(i, m):
            g = group_ids[i]
            return jax.lax.cond(
                g >= 0,
                lambda m: fuse.fuse_into_keyframe(
                    m, jnp.maximum(g, 0), loop_pts, caps, cam, scale_factors, threshold=4.0
                ),
                lambda m: m,
                m,
            )

        m = jax.lax.fori_loop(0, 16, body, m)

        # essential graph: parents + strong covisibles + loop edges + new edge
        kf_ids = jnp.arange(K)
        par_ok = (m.parent >= 0) & m.kf_valid
        edge_mask = jnp.zeros((K, K), bool)
        edge_mask = edge_mask.at[kf_ids, jnp.maximum(m.parent, 0)].max(par_ok)
        edge_mask |= edge_mask.T
        edge_mask |= (m.covis >= 100) & m.kf_valid[:, None] & m.kf_valid[None, :]
        edge_mask |= m.loop_edges
        edge_mask = edge_mask.at[kf, cd].set(True).at[cd, kf].set(True)

        # measurements: S_i S_j^-1 from PRE-correction poses for every
        # pre-existing edge (spanning tree, covis>=100, old loop edges) —
        # these carry the drift signal, because group vertices start at
        # their corrected poses while the measurement reflects the old
        # relative (optimizer_ceres.cpp:1141-1236 uses NonCorrectedSim3).
        # Only the NEW loop connections (corrected group <-> candidate
        # neighborhood, loopClosing.cpp:461-479 LoopConnections) take the
        # corrected relative. Within-group relatives are invariant under
        # the rigid group correction, so pre vs post is identical there.
        post = m.kf_pose
        use_post = (group[:, None] & nb_cand[None, :]) | (nb_cand[:, None] & group[None, :])
        pre_inv = jax.vmap(lie.se3_inverse)(pre_pose)
        post_inv = jax.vmap(lie.se3_inverse)(post)
        meas_pre = jnp.einsum("iab,jbc->ijac", pre_pose, pre_inv)
        meas_post = jnp.einsum("iab,jbc->ijac", post, post_inv)
        meas = jnp.where(use_post[:, :, None, None], meas_post, meas_pre)
        meas_R = meas[:, :, :3, :3]
        meas_t = meas[:, :, :3, 3]
        meas_s = jnp.ones((K, K))

        s_opt, R_opt, t_opt = pose_graph.solve_pose_graph(
            jnp.ones((K,)), post[:, :3, :3], post[:, :3, 3], m.kf_valid,
            edge_mask, meas_s, meas_R, meas_t, cd, fix_scale=True, iters=20,
        )
        pg_pose = lie.rt_to_mat(R_opt, t_opt / jnp.maximum(s_opt, 1e-9)[:, None])
        pg_pose = jnp.where(m.kf_valid[:, None, None], pg_pose, m.kf_pose)

        # correct all points through their reference keyframes
        refp = jnp.maximum(m.pt_ref_kf, 0)
        T_old2 = post[refp]
        T_new2 = pg_pose[refp]
        pc = jnp.einsum("pij,pj->pi", T_old2[:, :3, :3], m.pt_pos) + T_old2[:, :3, 3]
        T_new2_inv = jax.vmap(lie.se3_inverse)(T_new2)
        p2 = jnp.einsum("pij,pj->pi", T_new2_inv[:, :3, :3], pc) + T_new2_inv[:, :3, 3]
        m = m.replace(
            kf_pose=pg_pose,
            pt_pos=jnp.where(m.pt_valid[:, None], p2, m.pt_pos),
            loop_edges=m.loop_edges.at[kf, cd].set(True).at[cd, kf].set(True),
        )
        return m

    m = jax.lax.cond(accept, do_correct, lambda m: m, m)
    ls = ls.replace(
        last_loop_seq=jnp.where(accept, m.kf_seq[kf], ls.last_loop_seq)
    )
    return m, ls, accept, {
        "gen_ok": gen_ok, "gap_ok": gap_ok, "n_bow": n_bow,
        "n_ransac": n_ransac, "n_ref": n_ref, "total": total,
        "live1": jnp.sum(live1.astype(jnp.int32)),
        "live2": jnp.sum(live2.astype(jnp.int32)),
        "cand_seq": m.kf_seq[cd], "kf_seq": m.kf_seq[kf],
    }


@functools.partial(jax.jit, static_argnames=("caps", "diag"), donate_argnums=(0,))
def close_step(
    m: MapState,
    ls: LoopState,
    kf_id: jnp.ndarray,        # current keyframe
    cand_kf: jnp.ndarray,      # confirmed loop candidate
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    voc_groups_curr: jnp.ndarray,  # [N] level-3 groups of kf_id's words
    voc_groups_cand: jnp.ndarray,
    kf_gen_expect: jnp.ndarray = None,   # i32 kf_gen of kf_id at detect time
    cand_gen_expect: jnp.ndarray = None,  # i32 kf_gen of cand_kf at detect time
    diag: bool = False,   # static: also return the gate diagnostics
) -> Tuple[MapState, LoopState, jnp.ndarray]:
    """Attempt Sim3 verification + loop correction for ONE candidate.
    Returns (map, loop state, success flag) — plus a gate-diagnostics dict
    (n_bow/n_ransac/n_ref/total vs the 20/20/20/40 gates) when diag=True.

    The generation guards reject a queued candidate whose keyframe slot was
    culled and recycled between detection and this (drain-batched) call —
    without them a reused slot could verify a bogus loop against a
    different keyframe's features."""
    kf = jnp.maximum(kf_id, 0)
    cd = jnp.maximum(cand_kf, 0)
    gen_ok = m.kf_valid[kf] & m.kf_valid[cd]
    if kf_gen_expect is not None:
        gen_ok &= m.kf_gen[kf] == kf_gen_expect
    if cand_gen_expect is not None:
        gen_ok &= m.kf_gen[cd] == cand_gen_expect
    m, ls, accept, dg = _close_one(
        m, ls, kf, cd, gen_ok, caps, cam, scale_factors,
        voc_groups_curr, voc_groups_cand,
    )
    if diag:
        return m, ls, accept, dg
    return m, ls, accept


def _close_multi(
    m: MapState,
    ls: LoopState,
    kf: jnp.ndarray,           # current keyframe (>=0)
    kf_ok: jnp.ndarray,        # validity(+generation) guard of kf
    cand_kfs: jnp.ndarray,     # [C] confirmed candidates, -1 padded
    cand_gens: jnp.ndarray,    # [C] expected kf_gen per candidate
    group_div: jnp.ndarray,    # i32 featVec bucket divisor (k^3)
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
) -> Tuple[MapState, LoopState, jnp.ndarray, jnp.ndarray]:
    """Try every confirmed candidate of ONE keyframe until the first Sim3
    verification succeeds — the reference's computeSim3 candidate loop
    (loopClosing.cpp:178-348) as a lax.scan with an early-exit flag.
    Returns (map, loop state, accepted bool, winning candidate id or -1)."""
    words_curr = m.kf_word[kf]
    g_curr = jnp.where(words_curr >= 0, words_curr // group_div, -1)

    def body(carry, xs):
        m, ls, done, which = carry
        cand, gen = xs
        cd = jnp.maximum(cand, 0)

        def attempt(args):
            m, ls = args
            gen_ok = kf_ok & m.kf_valid[cd] & (m.kf_gen[cd] == gen)
            words_cand = m.kf_word[cd]
            g_cand = jnp.where(words_cand >= 0, words_cand // group_div, -1)
            m, ls, accept, _ = _close_one(
                m, ls, kf, cd, gen_ok, caps, cam, scale_factors, g_curr, g_cand
            )
            return m, ls, accept

        m, ls, accept = jax.lax.cond(
            ~done & (cand >= 0),
            attempt,
            lambda args: (args[0], args[1], jnp.asarray(False)),
            (m, ls),
        )
        which = jnp.where(accept, cand, which)
        return (m, ls, done | accept, which), None

    (m, ls, done, which), _ = jax.lax.scan(
        body,
        (m, ls, jnp.asarray(False), jnp.asarray(-1, jnp.int32)),
        (cand_kfs, cand_gens),
    )
    return m, ls, done, which


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def close_step_multi(
    m: MapState,
    ls: LoopState,
    kf_id: jnp.ndarray,        # current keyframe
    kf_gen_expect: jnp.ndarray,
    cand_kfs: jnp.ndarray,     # [C] confirmed candidates, -1 padded
    cand_gens: jnp.ndarray,    # [C] their kf_gen at detect time
    group_div: jnp.ndarray,    # i32 featVec bucket divisor (k^3)
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
) -> Tuple[MapState, LoopState, jnp.ndarray, jnp.ndarray]:
    """Host-dispatched variant of _close_multi (diagnostics / tests): one
    dispatch per keyframe with generation guards for drain-lagged calls."""
    kf = jnp.maximum(kf_id, 0)
    kf_ok = m.kf_valid[kf] & (m.kf_gen[kf] == kf_gen_expect)
    return _close_multi(
        m, ls, kf, kf_ok, cand_kfs, cand_gens, group_div, caps, cam,
        scale_factors,
    )


def _search_by_sim3(
    m, kf, cd, T12, s12, pc1, pc2, live1, live2, cam, scale_factors,
    radius: float = 7.5,
):
    """Matcher::searchBySim3 (matcher.cpp:679-865): project each side's
    map points into the other keyframe through the current Sim3 estimate,
    window-search by Hamming (TH_HIGH), and keep bidirectionally-agreeing
    pairs. Returns (match_kp [N] i32 cand keypoint per curr keypoint, ok
    [N]) for NEW pairs to enlarge the BoW match set before refinement —
    the reference's refine gate counts these extra matches, so omitting
    them makes the >=20 gate strictly harsher and drops marginal loops."""
    N = live1.shape[0]
    R12 = T12[:3, :3]
    t12 = T12[:3, 3]

    def window_match(uv_pred, pred_lvl, valid_src, src_desc, tgt_kf):
        kp_uv = m.kf_uv_und[tgt_kf]
        kp_oct = m.kf_octave[tgt_kf]
        kp_ok = m.kf_kp_valid[tgt_kf]
        r = radius * scale_factors[pred_lvl]
        du = jnp.abs(kp_uv[None, :, 0] - uv_pred[:, 0:1])
        dv = jnp.abs(kp_uv[None, :, 1] - uv_pred[:, 1:2])
        window = (du < r[:, None]) & (dv < r[:, None])
        oct_ok = (kp_oct[None, :] >= (pred_lvl - 1)[:, None]) & (
            kp_oct[None, :] <= pred_lvl[:, None]
        )
        allowed = window & oct_ok & valid_src[:, None] & kp_ok[None, :]
        D = jnp.where(allowed, hamming.distance_matrix(src_desc, m.kf_desc[tgt_kf]), 1 << 20)
        best = jnp.argmin(D, axis=1).astype(jnp.int32)
        best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
        return jnp.where(best_d <= 100, best, -1)

    # forward: kf1 points -> cand image through S21
    p2_pred = ((pc1 - t12) @ R12) / jnp.maximum(s12, 1e-9)
    uv2_pred = cam.camera2pixel(p2_pred)
    in2 = (p2_pred[:, 2] > 0) & cam.in_image(uv2_pred)
    # scale prediction from the source observation's octave (the reference
    # predicts from the point's distance band; the observing octave is the
    # equivalent fixed-shape stand-in)
    lvl1 = m.kf_octave[kf]
    m12 = window_match(uv2_pred, lvl1, live1 & in2, m.kf_desc[kf], cd)

    # backward: cand points -> kf1 image through S12
    p1_pred = s12 * pc2 @ R12.T + t12
    uv1_pred = cam.camera2pixel(p1_pred)
    in1 = (p1_pred[:, 2] > 0) & cam.in_image(uv1_pred)
    lvl2 = m.kf_octave[cd]
    m21 = window_match(uv1_pred, lvl2, live2 & in1, m.kf_desc[cd], kf)

    # bidirectional agreement (matcher.cpp:833-860)
    j = jnp.maximum(m12, 0)
    agree = (m12 >= 0) & (m21[j] == jnp.arange(N, dtype=jnp.int32))
    return jnp.where(agree, m12, -1), agree


def _project_points(m, mask, T, cam, scale_factors):
    """Project masked points with frustum/distance gates; returns
    ((u, v, pred_level), valid)."""
    R, t = T[:3, :3], T[:3, 3]
    pc = m.pt_pos @ R.T + t
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[:, 0] / safe_z + cam.cx
    v = cam.fy * pc[:, 1] / safe_z + cam.cy
    ow = -R.T @ t
    dist = jnp.linalg.norm(m.pt_pos - ow, axis=-1)
    ok = (
        mask & (z > 0)
        & (u >= 0) & (u <= cam.width) & (v >= 0) & (v <= cam.height)
        # 0.8/1.2 invariance slack (mappoint.cpp:391-401)
        & (dist >= 0.8 * m.pt_min_dist) & (dist <= 1.2 * m.pt_max_dist)
    )
    ratio = m.pt_max_dist / jnp.maximum(dist, 1e-9)
    pred = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factors[1])).astype(jnp.int32),
        0, scale_factors.shape[0] - 1,
    )
    return (u, v, pred), ok


def _sim3_projection_match(m, proj, valid, kf, cam, scale_factors, radius):
    """Hamming match projected loop points against kf's keypoints
    (matcher.cpp:356-447 searchByProjection with a Sim3-corrected pose).
    Returns per-point matched keypoint index (-1 none), compacted to 4096."""
    u, v, pred = proj
    ids = fuse._compact_ids(valid, fuse.MAX_FUSE)
    ok = ids >= 0
    sid = jnp.maximum(ids, 0)
    c_u, c_v, c_pred = u[sid], v[sid], pred[sid]
    c_desc = m.pt_desc[sid]
    r_scale = radius * scale_factors[c_pred]

    kp_uv = m.kf_uv_und[kf]
    kp_oct = m.kf_octave[kf]
    kp_ok = m.kf_kp_valid[kf]
    du = jnp.abs(kp_uv[None, :, 0] - c_u[:, None])
    dv = jnp.abs(kp_uv[None, :, 1] - c_v[:, None])
    window = (du < r_scale[:, None]) & (dv < r_scale[:, None])
    oct_ok = (kp_oct[None, :] >= (c_pred - 1)[:, None]) & (kp_oct[None, :] <= (c_pred + 1)[:, None])
    allowed = window & oct_ok & ok[:, None] & kp_ok[None, :]
    D = jnp.where(allowed, hamming.distance_matrix(c_desc, m.kf_desc[kf]), 1 << 20)
    best = jnp.argmin(D, axis=1).astype(jnp.int32)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    return jnp.where(best_d <= 100, best, -1)
