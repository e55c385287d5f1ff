"""Sustained cap-churn through the full SlamSystem (VERDICT r3 #2).

Drives the loop-e2e pan trajectory (high keyframe cadence at fps=3;
measured on TPU: 17 lifetime keyframe inserts with 7 redundancy culls at
uncapped run — tools/dbg_loop_scenarios.py) with max_kf=14, so lifetime
demand EXCEEDS the cap and the run exercises the complete churn cycle
end-to-end: insertion -> redundancy culling (keyframe.cpp:400-491
protocol) -> generation-bumped slot recycling -> covisible reparenting ->
and, when no slot is momentarily free, the need_kf drop gate — all while
tracking continues and the exported trajectory stays recoverable through
the Tcp/generation walk.

Full-scale churn evidence (240 frames / 40-42 inserts / caps 24 and 36,
on TPU) lives in NOTES.md ("Long-horizon churn runs"); this is the
suite-sized variant. The vocabulary is required — the pan legs move
~0.2 m/frame, beyond cold-model motion-only tracking, and the BoW ref-KF
fallback (visualOdometry.cpp:227-231) is what carries the early frames
(measured: the no-vocab variant loses tracking immediately at any cap).
The ATE bound carries the natural drift of the receding pan (~0.25 m,
see test_loop_e2e's island-residual rationale) since no drift is
injected and the natural revisit may or may not close.
"""

import numpy as np
import pytest

from test_loop_e2e import pan_trajectory
from vo_slam_test_tpu.bow.vocabulary import build_vocabulary
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.datasets.tum import ate_rmse
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps

pytestmark = pytest.mark.slow  # multi-minute: full SlamSystem compiles


class TestCapChurn:
    def test_pan_under_tight_kf_cap(self):
        traj = pan_trajectory()
        seq = SyntheticRGBD(seed=41, trajectory=traj)
        n_frames = len(seq)
        cfg = SlamConfig(
            camera_fx=seq.fx, camera_fy=seq.fy,
            camera_cx=seq.cx, camera_cy=seq.cy,
            camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
            camera_fps=3,
        )
        ext = OrbExtractor(Camera.from_config(cfg), n_features=1000)
        descs = []
        for i in (0, 6, 12, 20, 26, 36, 50):
            g, d, _ = seq[i]
            f = ext(g, d)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        voc = build_vocabulary(np.concatenate(descs), k=8, levels=3, seed=3)
        caps = MapCaps(max_kf=14, max_pt=8192)
        sys_ = SlamSystem(cfg, caps=caps, vocabulary=voc, chunk=4)
        for i in range(n_frames):
            g, d, ts = seq[i]
            sys_.track(g, d, ts)

        traj_est, stats, _ = sys_.results()
        oks = [s.ok for s in stats]
        assert sum(oks) >= 0.9 * n_frames, oks

        m = sys_.map
        ever = int(np.asarray(m.n_kf_ever))
        live = int(np.asarray(m.kf_valid).sum())
        kf_gen = np.asarray(m.kf_gen)
        assert ever > caps.max_kf, (ever, caps.max_kf)  # cap exceeded
        assert live <= caps.max_kf
        # slots actually recycled (culling freed them mid-run) — the
        # generation counter is what keeps stale cross-references dead
        assert (kf_gen > 1).sum() > 0, kf_gen.tolist()

        # trajectory recovery (Tcp/generation walk) must yield a finite
        # pose for every tracked frame even though reference keyframes
        # were culled and their slots re-used
        ok_rows = np.asarray(oks)
        assert np.isfinite(np.stack(traj_est)[ok_rows]).all()

        # quality stays sane under churn (receding pan, no loop closure:
        # natural drift ~0.25 m; corruption shows up as meters)
        gt = np.stack([seq.poses[i] for i in range(n_frames)])
        rmse = ate_rmse(sys_.timestamps, gt, sys_.timestamps, traj_est)
        assert rmse < 0.6, rmse

        # map invariants survive churn: no binding to a dead point, no
        # observation disagreeing with the binding table
        kf_mp = np.asarray(m.kf_mp)
        pt_valid = np.asarray(m.pt_valid)
        kf_valid = np.asarray(m.kf_valid)
        bound = kf_mp[kf_valid]
        bound = bound[bound >= 0]
        assert pt_valid[bound].all()
        obs_kf = np.asarray(m.pt_obs_kf)
        obs_kp = np.asarray(m.pt_obs_kp)
        for p in np.nonzero(pt_valid)[0][:300]:
            for o in range(obs_kf.shape[1]):
                kf, kp = obs_kf[p, o], obs_kp[p, o]
                if kf >= 0 and kf_valid[kf]:
                    assert kf_mp[kf, kp] == p, (p, kf, kp, kf_mp[kf, kp])
