"""Local BA: synthetic multi-view scene with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map
from vo_slam_test_tpu.solvers.local_ba import build_problem, local_bundle_adjust

CAPS = MapCaps(max_kf=16, max_pt=2048, max_obs=12, n_feat=256)
# smaller problem for the interpret-mode Pallas parity tests: interpret
# emulates the kernel tile-by-tile in python, so cost scales with O*L
PCAPS = MapCaps(max_kf=16, max_pt=512, max_obs=8, n_feat=128)


def fabricate_map(n_kf=6, n_pt=400, noise_px=0.3, pose_noise=0.02, pt_noise=0.03, seed=0, caps=CAPS):
    """Build a MapState holding a consistent multi-view scene, then perturb
    poses (except KF0) and points. Returns (map, gt_poses, gt_points)."""
    rng = np.random.default_rng(seed)
    cam = Camera.from_config(SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0))
    fx, fy, cx, cy, bf = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy), float(cam.bf))

    gt_pts = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 6.0], size=(n_pt, 3)).astype(np.float32)
    gt_poses = []
    for k in range(n_kf):
        xi = np.zeros(6, np.float32)
        xi[:3] = rng.uniform(-0.3, 0.3, 3)
        xi[3:] = rng.uniform(-0.05, 0.05, 3)
        gt_poses.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    gt_poses = np.stack(gt_poses)

    m = empty_map(caps)
    md = {f: np.array(getattr(m, f)) for f in (
        "kf_pose kf_valid kf_uv_und kf_octave kf_u_right kf_depth kf_kp_valid kf_mp "
        "pt_pos pt_valid pt_obs_kf pt_obs_kp pt_obs_cnt covis".split())}

    obs_per_kf = caps.n_feat
    for k in range(n_kf):
        T = gt_poses[k]
        pc = gt_pts @ T[:3, :3].T + T[:3, 3]
        u = fx * pc[:, 0] / pc[:, 2] + cx + rng.normal(0, noise_px, n_pt)
        v = fy * pc[:, 1] / pc[:, 2] + cy + rng.normal(0, noise_px, n_pt)
        vis = (pc[:, 2] > 0.2) & (u > 5) & (u < 635) & (v > 5) & (v < 475)
        vis_idx = np.nonzero(vis)[0][:obs_per_kf]
        md["kf_pose"][k] = T
        md["kf_valid"][k] = True
        for slot, p in enumerate(vis_idx):
            md["kf_uv_und"][k, slot] = (u[p], v[p])
            md["kf_octave"][k, slot] = 0
            stereo = rng.uniform() < 0.5
            md["kf_u_right"][k, slot] = (u[p] - bf / pc[p, 2] + rng.normal(0, noise_px)) if stereo else -1.0
            md["kf_depth"][k, slot] = pc[p, 2] if stereo else -1.0
            md["kf_kp_valid"][k, slot] = True
            md["kf_mp"][k, slot] = p
            cnt = md["pt_obs_cnt"][p]
            if cnt < caps.max_obs:
                md["pt_obs_kf"][p, cnt] = k
                md["pt_obs_kp"][p, cnt] = slot
            md["pt_obs_cnt"][p] += 1
    md["pt_pos"][:n_pt] = gt_pts + rng.normal(0, pt_noise, (n_pt, 3))
    md["pt_valid"][:n_pt] = True
    # covisibility: all KFs share most points
    md["covis"][:n_kf, :n_kf] = 200
    np.fill_diagonal(md["covis"], 0)

    # perturb poses except the first two (they act as the fixed anchor —
    # window BA is gauge-free otherwise)
    for k in range(1, n_kf):
        xi = np.concatenate([rng.normal(0, pose_noise, 3), rng.normal(0, pose_noise / 2, 3)]).astype(np.float32)
        md["kf_pose"][k] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ md["kf_pose"][k]

    m = m.replace(
        n_kf=jnp.asarray(n_kf, jnp.int32), n_pt=jnp.asarray(n_pt, jnp.int32),
        **{f: jnp.asarray(vv) for f, vv in md.items()},
    )
    return m, gt_poses, gt_pts, cam


def reproj_rmse(m, cam, n_kf, n_pt):
    fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
    kf_pose = np.array(m.kf_pose)
    pt = np.array(m.pt_pos)
    errs = []
    kf_mp = np.array(m.kf_mp)
    uv = np.array(m.kf_uv_und)
    for k in range(n_kf):
        sel = kf_mp[k] >= 0
        pids = kf_mp[k][sel]
        pc = pt[pids] @ kf_pose[k][:3, :3].T + kf_pose[k][:3, 3]
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        e = np.stack([u, v], -1) - uv[k][sel]
        errs.append(e)
    e = np.concatenate(errs)
    return float(np.sqrt((e**2).sum(-1).mean()))


class TestLocalBA:
    def test_reduces_error_and_recovers_geometry(self):
        m, gt_poses, gt_pts, cam = fabricate_map()
        before = reproj_rmse(m, cam, 6, 400)
        m2 = local_bundle_adjust(m, jnp.asarray(5, jnp.int32), CAPS, cam)
        after = reproj_rmse(m2, cam, 6, 400)
        assert after < before * 0.3, (before, after)
        assert after < 1.0, after
        # pose recovery: translation error well below the injected noise
        est = np.array(m2.kf_pose)[:6]
        terr = np.linalg.norm(est[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
        assert terr.max() < 0.01, terr

    def test_build_problem_structure(self):
        m, *_ , cam = fabricate_map()
        prob = build_problem(m, jnp.asarray(5, jnp.int32), CAPS)
        kf_ids = np.array(prob.kf_ids)
        assert kf_ids[0] == 5  # center first
        assert (kf_ids[:6] >= 0).sum() == 6  # all covisible KFs in window
        assert int(np.array(prob.o_valid).sum()) > 1000
        pt_ids = np.array(prob.pt_ids)
        # union of the window's kf_mp entries (each KF holds <=256 slots)
        expect = len({p for row in np.array(m.kf_mp)[:6] for p in row if p >= 0})
        assert (pt_ids >= 0).sum() == expect

    def test_outlier_observation_erased(self):
        m, gt_poses, gt_pts, cam = fabricate_map(noise_px=0.2, pose_noise=0.01)
        # corrupt one observation of point 7 in KF 3 massively
        uv = np.array(m.kf_uv_und)
        kf_mp = np.array(m.kf_mp)
        slots = np.nonzero(kf_mp[3] == 7)[0]
        if slots.size == 0:
            pytest.skip("point 7 not observed in KF 3 for this seed")
        uv[3, slots[0]] += 80.0
        m = m.replace(kf_uv_und=jnp.asarray(uv))
        obs_before = int(np.array(m.pt_obs_cnt)[7])
        m2 = local_bundle_adjust(m, jnp.asarray(5, jnp.int32), CAPS, cam)
        assert int(np.array(m2.kf_mp)[3, slots[0]]) == -1  # edge erased
        assert int(np.array(m2.pt_obs_cnt)[7]) == obs_before - 1


@pytest.mark.slow  # interpret-mode Pallas on CPU: ~100 s of the fast tier
class TestPallasParity:
    """ops/ba_pallas.py (interpret mode on CPU) vs the XLA [blk,O,L] path.

    Exact multi-iteration pose parity is not meaningful: points constrained
    only in 2 directions make Hll+lam*I nearly singular, so 1-ulp rounding
    differences in the closed-form inverse amplify arbitrarily (LM's cost
    gate rejects the resulting garbage steps on both paths). What must
    match: the per-iteration accumulators at f32 rounding, and the
    optimization outcome."""

    def test_accumulators_match_xla(self):
        from vo_slam_test_tpu.ops import ba_pallas
        from vo_slam_test_tpu.solvers.local_ba import (
            W_KF, _jacobians_ol, build_problem_ol,
        )

        m, gt_poses, gt_pts, cam = fabricate_map(n_pt=220, caps=PCAPS)
        prob = build_problem_ol(m, jnp.asarray(5, jnp.int32), PCAPS)
        poses = m.kf_pose[jnp.maximum(prob.kf_ids, 0)]
        points = m.pt_pos[jnp.maximum(prob.pt_ids, 0)]
        wk = min(W_KF, int(m.kf_valid.shape[0]))
        WF = int(prob.kf_ids.shape[0])
        O, L = prob.o_valid.shape
        act = prob.o_valid.astype(jnp.float32)
        povar = jnp.sum(prob.oh_win, axis=0)
        inv_sig = jnp.sqrt(prob.o_inv_sigma2)

        J_pose, J_pt, e, stereo = _jacobians_ol(poses, points, prob, cam)
        ew = e * inv_sig[None]
        Jp = J_pose * inv_sig[None, None]
        Jl = J_pt * inv_sig[None, None]
        nrm = jnp.sqrt(jnp.sum(ew * ew, 0) + 1e-12)
        delta = jnp.where(stereo, jnp.sqrt(7.815), jnp.sqrt(5.991))
        w = act * jnp.minimum(1.0, delta / nrm)
        bl = jnp.einsum("riol,rol,ol->il", Jl, ew, w)
        Jpw = Jp * w[None, None]
        oh2 = prob.oh_win.reshape(wk, O * L)
        Hpp = oh2 @ jnp.einsum("riol,rjol->ijol", Jpw, Jp).reshape(36, O * L).T
        bp = oh2 @ jnp.einsum("riol,rol->iol", Jpw, ew).reshape(6, O * L).T
        Wc = jnp.einsum(
            "wol,ijol->wijl", prob.oh_win,
            jnp.einsum("riol,rjol->ijol", Jpw, Jl),
        )
        s2 = jnp.sum(ew * ew, 0)
        s = jnp.sqrt(s2 + 1e-12)
        rho = jnp.where(s <= delta, s2, 2 * delta * s - delta * delta)
        cost = jnp.sum(jnp.where(prob.o_valid, rho, 0.0))

        out = ba_pallas.ba_accumulate(
            jnp.asarray(1e-4), poses.reshape(WF, 16).T, points.T,
            prob.o_slot, prob.o_uv[0], prob.o_uv[1], prob.o_ur,
            prob.o_inv_sigma2, act, povar,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
            WF=WF, wk=wk, O=O, use_huber=True, interpret=True,
        )
        Hpp_k, bp_k, S_k, rhs_k, cost_k, Hinv_k, bl_k, Wc_k = out
        scale = float(jnp.abs(Hpp).max())
        np.testing.assert_allclose(np.asarray(cost_k)[0, 0], float(cost), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(Hpp_k), np.asarray(Hpp), atol=2e-5 * scale)
        np.testing.assert_allclose(
            np.asarray(bp_k), np.asarray(bp), atol=2e-5 * float(jnp.abs(bp).max()))
        np.testing.assert_allclose(
            np.asarray(bl_k), np.asarray(bl), atol=2e-5 * float(jnp.abs(bl).max()))
        np.testing.assert_allclose(
            np.asarray(Wc_k).reshape(wk, 6, 3, L), np.asarray(Wc),
            atol=2e-5 * float(jnp.abs(Wc).max()))

    def test_pallas_pass_recovers_geometry(self):
        from vo_slam_test_tpu.solvers.local_ba import (
            W_KF, _classify_ol, _lm_pass_pallas, build_problem_ol,
        )

        m, gt_poses, gt_pts, cam = fabricate_map(n_pt=220, caps=PCAPS)
        prob = build_problem_ol(m, jnp.asarray(5, jnp.int32), PCAPS)
        poses0 = m.kf_pose[jnp.maximum(prob.kf_ids, 0)]
        points0 = m.pt_pos[jnp.maximum(prob.pt_ids, 0)]
        wk = min(W_KF, int(m.kf_valid.shape[0]))
        poses, points, _ = _lm_pass_pallas(
            poses0, points0, prob, cam, prob.o_valid, True, 5, wk, interpret=True
        )
        inl = _classify_ol(poses, points, prob, cam)
        poses, points, _ = _lm_pass_pallas(
            poses, points, prob, cam, inl, False, 10, wk, interpret=True
        )
        # window slots are covisibility-ordered; map back to keyframe ids
        kf_ids = np.asarray(prob.kf_ids)
        est = np.asarray(poses)
        terr = [
            np.linalg.norm(est[s, :3, 3] - gt_poses[kf_ids[s], :3, 3])
            for s in range(wk) if 0 <= kf_ids[s] < 6
        ]
        assert len(terr) == 6
        assert max(terr) < 0.01, terr


class TestInterruptBA:
    """The reference's interruptBA analogue (localMapping.cpp:538-541):
    the flag is read at the solver's ENTRY (optimizer_ceres.cpp:594
    `if (stopFlag) return;`) — a raised flag skips the whole local BA,
    leaving the map untouched (round-5 revision)."""

    @pytest.mark.slow  # ~31 s: second full local-BA compile in the file
    def test_stop_flag_skips_entirely(self):
        import sys as _sys
        _sys.path.insert(0, "/root/repo/tools")
        from synth_map import build

        caps = MapCaps(max_kf=16, max_pt=1024, max_obs=8, n_feat=128)
        m, cam = build(caps, n_kf=8, n_pt=300, seed=6)
        # perturb the newest pose so BA has real work
        poses = np.asarray(m.kf_pose).copy()
        poses[7, 0, 3] += 0.05
        m = m.replace(kf_pose=jnp.asarray(poses))
        kid = jnp.asarray(7, jnp.int32)
        copy = jax.jit(lambda x: jax.tree.map(jnp.copy, x))

        m_full = local_bundle_adjust(copy(m), kid, caps, cam)
        m_stop = local_bundle_adjust(
            copy(m), kid, caps, cam, stop=jnp.asarray(True)
        )
        pf = np.asarray(m_full.kf_pose)
        ps = np.asarray(m_stop.kf_pose)
        p0 = poses
        assert np.isfinite(pf).all() and np.isfinite(ps).all()
        # full BA moved the perturbed pose; stopped BA left the map alone
        assert np.abs(pf[7] - p0[7]).max() > 1e-5
        np.testing.assert_array_equal(ps, p0)
        np.testing.assert_array_equal(
            np.asarray(m_stop.pt_pos), np.asarray(m.pt_pos))
        # ...and the full run improved the reprojection cost while the
        # skipped run left it untouched (evaluated on the pre-BA problem)
        from vo_slam_test_tpu.solvers.local_ba import (
            _residuals_ol,
            build_problem_ol,
        )

        prob = build_problem_ol(m, kid, caps)

        def cost(mm):
            pw = mm.kf_pose[jnp.maximum(prob.kf_ids, 0)]
            pl = mm.pt_pos[jnp.maximum(prob.pt_ids, 0)]
            e, _, _ = _residuals_ol(pw, pl, prob, cam)
            chi2 = (e**2).sum(0) * prob.o_inv_sigma2
            return float(jnp.where(prob.o_valid, chi2, 0.0).sum())

        c0, cf, cs = cost(m), cost(m_full), cost(m_stop)
        assert cf < c0  # full BA improved the map
        assert cs == c0  # skipped BA left the objective untouched
        # map structurally consistent after the skipped write-back
        live = np.asarray(m_stop.pt_valid)
        obs = np.asarray(m_stop.pt_obs_kf)
        cnt = np.asarray(m_stop.pt_obs_cnt)
        np.testing.assert_array_equal((obs[live] >= 0).sum(1), cnt[live])
