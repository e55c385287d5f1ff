"""Global BA: matrix-free Schur CG recovers a perturbed full map."""

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.solvers.global_ba import global_bundle_adjust

from test_local_ba import CAPS, fabricate_map, reproj_rmse


class TestGlobalBA:
    def test_recovers_geometry(self):
        m, gt_poses, gt_pts, cam = fabricate_map(pose_noise=0.03, pt_noise=0.05, seed=3)
        before = reproj_rmse(m, cam, 6, 400)
        m2 = global_bundle_adjust(m, CAPS, cam, jnp.asarray(0, jnp.int32))
        after = reproj_rmse(m2, cam, 6, 400)
        assert after < before * 0.1, (before, after)
        assert after < 1.0, after
        est = np.array(m2.kf_pose)[:6]
        terr = np.linalg.norm(est[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
        assert terr.max() < 0.01, terr
        # gauge anchor untouched
        np.testing.assert_allclose(np.array(m2.kf_pose)[0], gt_poses[0], atol=1e-6)

    def test_invalid_slots_untouched(self):
        m, *_, cam = fabricate_map(seed=3)
        m2 = global_bundle_adjust(m, CAPS, cam, jnp.asarray(0, jnp.int32))
        pv = np.array(m.pt_valid)
        np.testing.assert_array_equal(
            np.array(m2.pt_pos)[~pv], np.array(m.pt_pos)[~pv]
        )
        kv = np.array(m.kf_valid)
        np.testing.assert_array_equal(
            np.array(m2.kf_pose)[~kv], np.array(m.kf_pose)[~kv]
        )

    def test_robust_to_outlier(self):
        m, gt_poses, gt_pts, cam = fabricate_map(noise_px=0.2, pose_noise=0.02, seed=3)
        uv = np.array(m.kf_uv_und)
        uv[3, 10] += 120.0  # one wildly wrong observation
        m = m.replace(kf_uv_und=jnp.asarray(uv))
        m2 = global_bundle_adjust(m, CAPS, cam, jnp.asarray(0, jnp.int32))
        est = np.array(m2.kf_pose)[:6]
        terr = np.linalg.norm(est[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
        assert terr.max() < 0.02, terr
