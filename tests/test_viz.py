"""Headless drawer: snapshot + rendering + metrics CSV."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles a full SlamSystem

from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps
from vo_slam_test_tpu.viz import plot_map, plot_trajectories, save_metrics_csv, snapshot_map


class TestViz:
    def test_snapshot_and_render(self, tmp_path):
        seq = SyntheticRGBD(n_frames=5, seed=51, motion_scale=0.4)
        cfg = SlamConfig(
            camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
            camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
        )
        sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=16, max_pt=4096))
        for i in range(len(seq)):
            sys_.track(*seq[i])
        traj, stats, _ = sys_.results()

        snap = snapshot_map(sys_.map)
        assert snap.kf_poses.shape[0] == sys_.n_keyframes
        assert snap.points.shape[0] == sys_.n_points

        map_png = str(tmp_path / "map.png")
        plot_map(snap, map_png)
        assert os.path.getsize(map_png) > 1000

        traj_png = str(tmp_path / "traj.png")
        gt = np.stack([seq.poses[i] for i in range(len(seq))])
        plot_trajectories(traj_png, traj, gt)
        assert os.path.getsize(traj_png) > 1000

        csv = str(tmp_path / "metrics.csv")
        save_metrics_csv(csv, sys_.timestamps, stats)
        lines = open(csv).read().strip().splitlines()
        assert len(lines) == len(seq) + 1
        assert lines[0].startswith("timestamp,ok")
