"""Local BA cap-saturation behavior on fr3-scale covisibility.

The reference optimizes ALL covisible keyframes and ALL observers
(optimizer_ceres.cpp:449-528); the TPU build bounds the problem at
W_KF=24 window keyframes, F_KF=40 fixed, L_PT local points, O_BA=12
observer slots (solvers/local_ba.py:40-43,176). These tests drive maps
that EXCEED every cap and pin down the documented degradation:

  - the window keeps the strongest-covisible W_KF (never arbitrary rows);
  - point selection fills exactly l_pt slots and only with window-observed
    valid points; overflow points are left untouched, not corrupted;
  - observer lists longer than O_BA enter valid-first truncated;
  - the solve still reduces reprojection error and never moves state
    outside the extracted problem.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

from synth_map import build  # noqa: E402

from vo_slam_test_tpu.solvers import local_ba  # noqa: E402
from vo_slam_test_tpu.slam_map.map_state import MapCaps  # noqa: E402

pytestmark = pytest.mark.slow  # production-shaped BA compile

CAPS = MapCaps(max_kf=64, max_pt=4096, max_obs=24, n_feat=256)


def _dense_map(seed=3):
    # span up to 24 consecutive KFs -> the center keyframe is covisible
    # with far more than W_KF=24 neighbors (fr3_long_office-like density)
    m, cam = build(CAPS, n_kf=40, n_pt=3500, seed=seed, span_max=24)
    return m, cam


def _reproj_cost(m, cam, kf_sel):
    kf_pose = np.asarray(m.kf_pose)
    pt = np.asarray(m.pt_pos)
    kf_mp = np.asarray(m.kf_mp)
    uv = np.asarray(m.kf_uv_und)
    errs = []
    for k in kf_sel:
        sel = kf_mp[k] >= 0
        pc = pt[kf_mp[k][sel]] @ kf_pose[k][:3, :3].T + kf_pose[k][:3, 3]
        u = float(cam.fx) * pc[:, 0] / pc[:, 2] + float(cam.cx)
        v = float(cam.fy) * pc[:, 1] / pc[:, 2] + float(cam.cy)
        errs.append(np.stack([u, v], -1) - uv[k][sel])
    e = np.concatenate(errs)
    return float(np.sqrt((e ** 2).sum(-1).mean()))


class TestWindowSaturation:
    def test_window_keeps_strongest_covisibles(self):
        m, cam = _dense_map()
        center = jnp.asarray(20, jnp.int32)
        covis = np.asarray(m.covis)[20] * np.asarray(m.kf_valid)
        connected = int((covis > 0).sum())
        assert connected > local_ba.W_KF, connected  # saturation is real

        prob = local_ba.build_problem_ol(m, center, CAPS)
        win = np.asarray(prob.kf_ids)[: local_ba.W_KF]
        assert (win >= 0).all() and win[0] == 20
        # every selected neighbor is at least as covisible as every
        # unselected one (the reference's best-covisible ordering)
        sel_w = covis[win[1:]]
        unsel = np.setdiff1d(np.nonzero(covis > 0)[0], win)
        assert sel_w.min() >= covis[unsel].max(), (sel_w.min(), covis[unsel].max())

    def test_observer_lists_truncate_valid_first(self):
        m, cam = _dense_map()
        prob = local_ba.build_problem_ol(m, jnp.asarray(20, jnp.int32), CAPS)
        o_valid = np.asarray(prob.o_valid)          # [O_BA, L]
        assert o_valid.shape[0] == local_ba.O_BA
        # valid-first compaction: no valid slot after an invalid one
        first_invalid = np.argmin(o_valid, axis=0)  # first False (or 0)
        any_invalid = ~o_valid.all(axis=0)
        for col in np.nonzero(any_invalid)[0][:200]:
            assert not o_valid[first_invalid[col]:, col].any()

    def test_saturated_solve_reduces_error_and_touches_only_problem(self):
        m, cam = _dense_map()
        center = jnp.asarray(20, jnp.int32)
        prob = local_ba.build_problem_ol(m, center, CAPS)
        win = np.asarray(prob.kf_ids)[: local_ba.W_KF]
        in_prob_pts = np.asarray(prob.pt_ids)
        in_prob_pts = set(in_prob_pts[in_prob_pts >= 0].tolist())

        # perturb the local points: BA must pull them back
        rng = np.random.default_rng(0)
        pt = np.asarray(m.pt_pos).copy()
        sel = np.asarray(sorted(in_prob_pts))
        pt[sel] += rng.normal(0, 0.02, (len(sel), 3)).astype(np.float32)
        m = m.replace(pt_pos=jnp.asarray(pt))
        pre_pose = np.asarray(m.kf_pose).copy()
        pre_pts = pt.copy()

        before = _reproj_cost(m, cam, win)
        m2 = local_ba.local_bundle_adjust(m, center, CAPS, cam)
        after = _reproj_cost(m2, cam, win)
        assert after < before * 0.5, (before, after)

        # outside the problem nothing moves
        post_pose = np.asarray(m2.kf_pose)
        post_pts = np.asarray(m2.pt_pos)
        kf_in = np.zeros(CAPS.max_kf, bool)
        kf_in[np.asarray(prob.kf_ids)[np.asarray(prob.kf_ids) >= 0]] = True
        np.testing.assert_array_equal(post_pose[~kf_in], pre_pose[~kf_in])
        pt_in = np.zeros(CAPS.max_pt, bool)
        pt_in[sorted(in_prob_pts)] = True
        np.testing.assert_array_equal(post_pts[~pt_in], pre_pts[~pt_in])


class TestPointCapSaturation:
    def test_point_overflow_drops_cleanly(self, monkeypatch):
        # n_feat=1024 here: with the shared CAPS' 256 keypoint slots per KF,
        # synth_map can bind at most ~800 valid points across 40 KFs (kf_mp
        # saturates), so the window could never exceed a 1024-point cap
        caps = MapCaps(max_kf=64, max_pt=4096, max_obs=24, n_feat=1024)
        m, cam = build(caps, n_kf=40, n_pt=3500, seed=5, span_max=24)
        center = jnp.asarray(20, jnp.int32)
        full = local_ba.build_problem_ol(m, center, caps)
        n_candidates = int((np.asarray(full.pt_ids) >= 0).sum())
        cap = 1024
        assert n_candidates > cap  # the synthetic window really overflows

        # shrink the cap: same code path as a >L_PT fr3-scale map without
        # compiling a 24576-point problem on the CPU test runner
        monkeypatch.setattr(local_ba, "L_PT", cap)
        prob = local_ba.build_problem_ol(m, center, caps)
        pids = np.asarray(prob.pt_ids)
        assert pids.shape[0] == cap and (pids >= 0).all()
        pt_valid = np.asarray(m.pt_valid)
        assert pt_valid[pids].all()
        # every observation row references a selected point's observers
        o_valid = np.asarray(prob.o_valid)
        o_slot = np.asarray(prob.o_slot)
        assert (o_slot[o_valid] >= 0).all()
        assert o_valid.shape == (local_ba.O_BA, cap)
