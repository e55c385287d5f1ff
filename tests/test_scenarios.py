"""Off-nominal scenario probes (reference README.md:19-26 sequence intent).

The reference's five TUM sequences probe specific failure modes; the two
that round 3 lacked synthetic analogues for:

- fr3_sit_halfsph: independently moving objects — tracking must reject
  geometrically plausible but world-inconsistent landmarks (chi^2 gates in
  solvePoseOnlySE3, visualOdometry.cpp two-round Huber, and the rotation-
  consistency bin filter in the frame-to-frame matcher).
- fr3_nstr_tex_near_withloop: texture without structure — feature-sparse
  frames must not lose tracking, and the KF policy's tracking-weak branch
  (visualOdometry.cpp:397-461, ratio thresholds) must keep inserting
  keyframes at reduced match counts.
"""

import numpy as np
import pytest

from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.datasets.tum import ate_rmse
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps

pytestmark = pytest.mark.slow  # multi-minute: full SlamSystem compiles

# same caps as test_system.py so the jitted slam_step program is shared
CAPS = MapCaps(max_kf=32, max_pt=8192)


def make_cfg(seq):
    return SlamConfig(
        camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
        camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
    )


def run_sequence(seq):
    sys_ = SlamSystem(make_cfg(seq), caps=CAPS)
    for i in range(len(seq)):
        gray, depth, ts = seq[i]
        sys_.track(gray, depth, ts)
    traj, stats, _ = sys_.results()
    gt = np.stack([seq.poses[i] for i in range(len(seq))])
    rmse = ate_rmse(sys_.timestamps, gt, sys_.timestamps, traj)
    return sys_, stats, rmse


class TestDynamicScene:
    def test_moving_object_tracked_and_rejected(self):
        """A large textured patch slides across the back wall with
        consistent depth (fr3_sit_halfsph analogue). Tracking must survive
        the whole sequence and the moving features must not drag the pose:
        ATE stays within 2x of the static-scene bound."""
        seq = SyntheticRGBD(
            n_frames=12, seed=41, motion_scale=0.5,
            moving_patch=(0.9, 0.06),  # ~150 px wide, ~10 px/frame sweep
        )
        sys_, stats, rmse = run_sequence(seq)
        assert all(s.ok for s in stats), [s.ok for s in stats]
        assert rmse < 0.04, rmse
        # the static world still dominates the inlier set
        assert np.median([s.n_inliers for s in stats[1:]]) > 80

    def test_moving_object_outliers_actually_culled(self):
        """The chi^2/Huber gates must mark the moving-patch matches as
        outliers rather than absorbing them: the per-frame inlier count
        stays well below the raw match count whenever the patch is in
        view (a static scene keeps ~all matches)."""
        seq = SyntheticRGBD(
            n_frames=12, seed=41, motion_scale=0.5, moving_patch=(0.9, 0.06),
        )
        sys_, stats, _ = run_sequence(seq)
        rej = [s.n_matches - s.n_inliers for s in stats[1:]]
        # some frames must show substantial rejection (the patch carries
        # dozens of features that move ~30 px between frames)
        assert max(rej) > 20, rej


class TestTexturePoorScene:
    def test_sparse_texture_tracks_without_loss(self):
        """texture_corners=0.06 leaves ~54 rectangles per plane — feature
        extraction yields a few hundred keypoints instead of 1000
        (fr3_nstr_tex_near analogue). No frame may lose tracking and the
        KF policy must still create keyframes from the weaker matches."""
        seq = SyntheticRGBD(
            n_frames=12, seed=43, motion_scale=0.4, texture_corners=0.06,
        )
        sys_, stats, rmse = run_sequence(seq)
        assert all(s.ok for s in stats), [s.ok for s in stats]
        assert rmse < 0.04, rmse
        assert sys_.n_keyframes >= 1
        # genuinely feature-sparse: median matches well under the budget
        assert np.median([s.n_matches for s in stats[1:]]) < 600
