"""Milestone B end-to-end: tracking + mapping + local BA on synthetic data."""

import numpy as np
import pytest

from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.datasets.tum import ate_rmse
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps

pytestmark = pytest.mark.slow  # multi-minute: full SlamSystem compiles


def make_cfg(seq):
    return SlamConfig(
        camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
        camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
    )


class TestSlamSystem:
    def test_tracks_and_maps(self):
        seq = SyntheticRGBD(n_frames=10, seed=21, motion_scale=0.5)
        sys_ = SlamSystem(make_cfg(seq), caps=MapCaps(max_kf=32, max_pt=8192))
        for i in range(len(seq)):
            gray, depth, ts = seq[i]
            sys_.track(gray, depth, ts)
        traj, stats, kf_traj = sys_.results()
        assert all(s.ok for s in stats), stats
        assert sys_.n_keyframes >= 1
        assert sys_.n_points > 300
        gt = np.stack([seq.poses[i] for i in range(len(seq))])
        rmse = ate_rmse(sys_.timestamps, gt, sys_.timestamps, traj)
        assert rmse < 0.02, rmse
        # observed-map inliers should dominate once the map exists
        assert np.median([s.n_inliers for s in stats[1:]]) > 100

    def test_keyframe_trajectory_exported(self):
        seq = SyntheticRGBD(n_frames=6, seed=22, motion_scale=0.3)
        sys_ = SlamSystem(make_cfg(seq), caps=MapCaps(max_kf=32, max_pt=8192))
        for i in range(len(seq)):
            gray, depth, ts = seq[i]
            sys_.track(gray, depth, ts)
        _, _, kf_traj = sys_.results()
        assert len(kf_traj) == sys_.n_keyframes
        ts0, T0 = kf_traj[0]
        assert T0.shape == (4, 4)

