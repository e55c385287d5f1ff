"""End-to-end close_step on a hand-built drifted keyframe chain.

Regression for the essential-graph measurement semantics: edge measurements
must come from PRE-correction poses (the reference's NonCorrectedSim3,
optimizer_ceres.cpp:1141-1236), with only the new loop connections taking
corrected relatives — otherwise every pose-graph residual starts at identity
and the drift never propagates past the rigidly-corrected covisible group.

Scenario: 10 keyframes; KF0 and KF9 revisit the same place (true relative
pose small); the STORED chain accumulates drift that grows with the index.
close_step must (a) accept the loop, (b) snap KF9 (and its covisible KF8)
to truth via Sim3, and (c) redistribute the drift along KFs 1..7 through
the pose graph, shrinking their pose error vs ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.pipeline import loop_closing as LC
from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map

CAPS = MapCaps(max_kf=16, max_pt=512, max_obs=8, n_feat=128)
NP_PTS = 80


def se3(tx=0.0, ty=0.0, tz=0.0, rx=0.0, ry=0.0, rz=0.0):
    return np.asarray(
        lie.se3_exp(jnp.asarray([tx, ty, tz, rx, ry, rz], jnp.float32))
    )


def build_drifted_loop_map(cam):
    rng = np.random.default_rng(7)
    m = empty_map(CAPS)

    # true T_c_w: KF0 identity; KF9 a small offset; intermediates wander
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, 9):
        gt.append(se3(tx=0.02 * i, ry=0.01 * i))
    gt.append(se3(tx=0.05))
    gt = np.stack(gt)

    # stored = gt composed with growing world-side drift D_i
    drift = [se3(tx=0.03 * i, ty=0.015 * i, ry=0.008 * i) for i in range(10)]
    stored = np.stack([gt[i] @ drift[i] for i in range(10)]).astype(np.float32)
    drift_inv = [np.linalg.inv(d) for d in drift]

    # cluster-A physical points visible from KF0 and KF9
    p_true = np.stack(
        [
            rng.uniform(-0.8, 0.8, NP_PTS),
            rng.uniform(-0.6, 0.6, NP_PTS),
            rng.uniform(1.5, 2.5, NP_PTS),
        ],
        axis=1,
    ).astype(np.float32)
    descs = rng.integers(0, 2**32, size=(NP_PTS, 8), dtype=np.uint32)

    def project(T_c_w, pw):
        pc = pw @ T_c_w[:3, :3].T + T_c_w[:3, 3]
        u = float(cam.fx) * pc[:, 0] / pc[:, 2] + float(cam.cx)
        v = float(cam.fy) * pc[:, 1] / pc[:, 2] + float(cam.cy)
        return np.stack([u, v], axis=1).astype(np.float32), pc

    uv0, pc0 = project(gt[0], p_true)
    uv9, pc9 = project(gt[9], p_true)
    # KF9's own (drifted) duplicates of the same physical points: stored so
    # that stored_pose9 @ p_dup = true camera coords
    p_dup = (p_true @ gt[9][:3, :3].T + gt[9][:3, 3])  # true cam coords
    inv9 = np.linalg.inv(stored[9])
    p_dup = p_dup @ inv9[:3, :3].T + inv9[:3, 3]

    K, N, P = CAPS.max_kf, CAPS.n_feat, CAPS.max_pt
    kf_pose = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    kf_pose[:10] = stored
    kf_valid = np.zeros(K, bool)
    kf_valid[:10] = True
    kf_uv = np.zeros((K, N, 2), np.float32)
    kf_uv[0, :NP_PTS] = uv0
    kf_uv[9, :NP_PTS] = uv9
    kf_desc = np.zeros((K, N, 8), np.uint32)
    kf_desc[0, :NP_PTS] = descs
    kf_desc[9, :NP_PTS] = descs
    kf_kp_valid = np.zeros((K, N), bool)
    kf_kp_valid[0, :NP_PTS] = True
    kf_kp_valid[9, :NP_PTS] = True
    kf_mp = np.full((K, N), -1, np.int32)
    kf_mp[0, :NP_PTS] = np.arange(NP_PTS)
    kf_mp[9, :NP_PTS] = NP_PTS + np.arange(NP_PTS)

    covis = np.zeros((K, K), np.int32)
    for i in range(9):
        covis[i, i + 1] = covis[i + 1, i] = 120
    parent = np.full(K, -1, np.int32)
    parent[1:10] = np.arange(9)

    pt_pos = np.zeros((P, 3), np.float32)
    pt_pos[:NP_PTS] = p_true
    pt_pos[NP_PTS : 2 * NP_PTS] = p_dup
    pt_desc = np.zeros((P, 8), np.uint32)
    pt_desc[:NP_PTS] = descs
    pt_desc[NP_PTS : 2 * NP_PTS] = descs
    pt_valid = np.zeros(P, bool)
    pt_valid[: 2 * NP_PTS] = True
    pt_ref = np.full(P, -1, np.int32)
    pt_ref[:NP_PTS] = 0
    pt_ref[NP_PTS : 2 * NP_PTS] = 9
    d0 = np.linalg.norm(pc0, axis=1)
    d9 = np.linalg.norm(pc9, axis=1)
    pt_min = np.zeros(P, np.float32)
    pt_max = np.zeros(P, np.float32)
    pt_min[:NP_PTS] = 0.5 * d0
    pt_max[:NP_PTS] = 1.02 * d0
    pt_min[NP_PTS : 2 * NP_PTS] = 0.5 * d9
    pt_max[NP_PTS : 2 * NP_PTS] = 1.02 * d9
    pt_obs_kf = np.full((P, CAPS.max_obs), -1, np.int32)
    pt_obs_kp = np.full((P, CAPS.max_obs), -1, np.int32)
    pt_obs_kf[:NP_PTS, 0] = 0
    pt_obs_kp[:NP_PTS, 0] = np.arange(NP_PTS)
    pt_obs_kf[NP_PTS : 2 * NP_PTS, 0] = 9
    pt_obs_kp[NP_PTS : 2 * NP_PTS, 0] = np.arange(NP_PTS)
    pt_obs_cnt = np.zeros(P, np.int32)
    pt_obs_cnt[: 2 * NP_PTS] = 1

    # insertion sequence numbers: close_step re-checks the >=10-KF loop gap
    # against kf_seq (loopClosing.cpp:62-67 semantics), so the hand-built
    # chain gets seqs 10..19 — as a map whose first ten keyframes were culled
    kf_seq = np.full(K, -1, np.int32)
    kf_seq[:10] = 10 + np.arange(10)

    m = m.replace(
        kf_seq=jnp.asarray(kf_seq),
        n_kf_ever=jnp.asarray(20, jnp.int32),
        kf_pose=jnp.asarray(kf_pose),
        kf_valid=jnp.asarray(kf_valid),
        kf_uv_und=jnp.asarray(kf_uv),
        kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_kp_valid),
        kf_mp=jnp.asarray(kf_mp),
        covis=jnp.asarray(covis),
        parent=jnp.asarray(parent),
        pt_pos=jnp.asarray(pt_pos),
        pt_desc=jnp.asarray(pt_desc),
        pt_valid=jnp.asarray(pt_valid),
        pt_ref_kf=jnp.asarray(pt_ref),
        pt_min_dist=jnp.asarray(pt_min),
        pt_max_dist=jnp.asarray(pt_max),
        pt_obs_kf=jnp.asarray(pt_obs_kf),
        pt_obs_kp=jnp.asarray(pt_obs_kp),
        pt_obs_cnt=jnp.asarray(pt_obs_cnt),
        n_kf=jnp.asarray(10, jnp.int32),
        n_pt=jnp.asarray(2 * NP_PTS, jnp.int32),
    )
    return m, gt, stored


class TestCloseStep:
    @pytest.mark.slow  # ~33 s: compiles the full close_step program
    def test_loop_correction_propagates_drift(self):
        cfg = SlamConfig(
            camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0
        )
        cam = Camera.from_config(cfg)
        m, gt, stored = build_drifted_loop_map(cam)
        ls = LC.empty_loop_state(CAPS)
        scale_factors = jnp.asarray(1.2 ** np.arange(8), jnp.float32)
        groups = jnp.zeros((CAPS.n_feat,), jnp.int32)
        gt_pts = np.asarray(m.pt_pos)[:NP_PTS].copy()  # m is donated below

        m2, ls2, accepted = LC.close_step(
            m, ls, jnp.asarray(9, jnp.int32), jnp.asarray(0, jnp.int32),
            CAPS, cam, scale_factors, groups, groups,
        )
        assert bool(accepted), "loop must be accepted"
        assert bool(np.asarray(m2.loop_edges)[9, 0]) and bool(np.asarray(m2.loop_edges)[0, 9])

        poses = np.asarray(m2.kf_pose)

        def t_err(P_est, P_gt):
            return np.linalg.norm(P_est[:3, 3] - P_gt[:3, 3])

        # KF9 snaps near truth (stored drift was 0.30); the optimum balances
        # the exact loop edge against the drifted odometry edges, so a small
        # residual remains
        assert t_err(poses[9], gt[9]) < 0.05, t_err(poses[9], gt[9])
        assert t_err(poses[9], gt[9]) < 0.2 * t_err(stored[9], gt[9])

        # drift along the chain must SHRINK relative to the stored poses —
        # with identity-residual measurements (the old bug) the mid-chain
        # never moves and this fails
        before = sum(t_err(stored[i], gt[i]) for i in range(1, 8))
        after = sum(t_err(poses[i], gt[i]) for i in range(1, 8))
        assert after < 0.3 * before, (before, after)

        # mid-chain keyframes actually moved (the no-op regression)
        moved = sum(t_err(poses[i], stored[i]) for i in range(1, 8))
        assert moved > 0.01, moved

        # map points followed their reference keyframes: cluster-A points
        # stay near truth (their ref KF0 is the fixed vertex)
        pts = np.asarray(m2.pt_pos)[:NP_PTS]
        assert np.linalg.norm(pts - gt_pts, axis=1).max() < 0.05

    @pytest.mark.slow  # compiles the batched close program
    def test_close_step_multi_first_success(self):
        """The batched candidate loop (close_step_multi) must skip -1 pads
        and generation-mismatched candidates, try real candidates in order
        (the reference's computeSim3 loop, loopClosing.cpp:178-348), accept
        the genuine loop, and report WHICH candidate verified."""
        cfg = SlamConfig(
            camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0
        )
        cam = Camera.from_config(cfg)
        m, gt, stored = build_drifted_loop_map(cam)
        # close_step_multi derives featVec buckets from kf_word (the
        # original test passes explicit zero groups); give the loop pair's
        # keypoints word 0 so all land in one bucket, as before
        kf_word = np.asarray(m.kf_word).copy()
        kf_word[0, :NP_PTS] = 0
        kf_word[9, :NP_PTS] = 0
        kf_word[4, :NP_PTS] = 0
        m = m.replace(kf_word=jnp.asarray(kf_word))
        ls = LC.empty_loop_state(CAPS)
        scale_factors = jnp.asarray(1.2 ** np.arange(8), jnp.float32)

        # candidate list: pad, a bogus mid-chain KF (no shared points ->
        # verification fails), a generation-mismatched copy of the true
        # candidate (must be skipped), then the true candidate
        cands = jnp.asarray([-1, 4, 0, 0, -1, -1, -1, -1], jnp.int32)
        gens = jnp.asarray([-1, 0, 99, 0, -1, -1, -1, -1], jnp.int32)
        m2, ls2, done, which = LC.close_step_multi(
            m, ls, jnp.asarray(9, jnp.int32), jnp.asarray(0, jnp.int32),
            cands, gens, jnp.asarray(1000, jnp.int32),
            CAPS, cam, scale_factors,
        )
        assert bool(np.asarray(done))
        assert int(np.asarray(which)) == 0
        assert bool(np.asarray(m2.loop_edges)[9, 0])
        # the correction actually ran: KF9 snapped toward truth
        poses = np.asarray(m2.kf_pose)
        err = np.linalg.norm(poses[9][:3, 3] - gt[9][:3, 3])
        assert err < 0.05, err
        # last_loop_seq advanced to the accepting keyframe's seq
        assert int(np.asarray(ls2.last_loop_seq)) == 19
