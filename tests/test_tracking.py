"""Milestone A end-to-end: frame-to-frame VO on the synthetic sequence."""

import numpy as np
import pytest

from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.datasets.tum import ate_rmse
from vo_slam_test_tpu.pipeline.tracking import FrameToFrameTracker, FusedTracker

pytestmark = pytest.mark.slow  # multi-minute: full SlamSystem compiles


def make_cfg(seq):
    return SlamConfig(
        camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
        camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
    )


class TestFrameToFrame:
    def test_tracks_synthetic_sequence(self):
        seq = SyntheticRGBD(n_frames=12, seed=11, motion_scale=0.5)
        tracker = FrameToFrameTracker(make_cfg(seq))
        for i in range(len(seq)):
            gray, depth, ts = seq[i]
            st = tracker.track(gray, depth, ts)
            assert st.ok, (i, st)
            if i > 0:
                assert st.n_matches >= 100, (i, st)
                assert st.n_inliers >= 50, (i, st)

        gt = np.stack([seq.poses[i] for i in range(len(seq))])
        est = np.stack(tracker.trajectory)
        rmse = ate_rmse(tracker.timestamps, gt, tracker.timestamps, est)
        # frame-to-frame VO accumulates drift; a 12-frame gentle run should
        # stay within a couple of cm
        assert rmse < 0.03, rmse

    def test_fused_matches_host_path(self):
        """The fused device-resident tracker must track the same sequence
        with comparable accuracy (selection differs slightly by design)."""
        seq = SyntheticRGBD(n_frames=8, seed=11, motion_scale=0.5)
        tr = FusedTracker(make_cfg(seq))
        for i in range(len(seq)):
            gray, depth, ts = seq[i]
            tr.track(gray, depth, ts)
        traj, stats = tr.results()
        assert all(s.ok for s in stats), stats
        assert all(s.n_matches >= 100 for s in stats[1:]), stats
        gt = np.stack([seq.poses[i] for i in range(len(seq))])
        rmse = ate_rmse(tr.timestamps, gt, tr.timestamps, traj)
        assert rmse < 0.03, rmse

    def test_recovers_scale_of_motion(self):
        """Translation magnitude between consecutive frames ~ ground truth."""
        seq = SyntheticRGBD(n_frames=10, seed=13, motion_scale=0.45)
        tracker = FrameToFrameTracker(make_cfg(seq))
        for i in range(len(seq)):
            gray, depth, ts = seq[i]
            st = tracker.track(gray, depth, ts)
            assert st.ok, (i, st)
        est = np.stack(tracker.trajectory)
        for i in range(1, len(seq)):
            gt_step = np.linalg.norm(seq.poses[i][:3, 3] - seq.poses[i - 1][:3, 3])
            est_step = np.linalg.norm(est[i][:3, 3] - est[i - 1][:3, 3])
            assert abs(gt_step - est_step) < 0.01 + 0.1 * gt_step, (i, gt_step, est_step)
