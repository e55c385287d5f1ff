"""Global BA: matrix-free Schur CG recovers a perturbed full map."""

import jax.numpy as jnp
import pytest
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


class TestGlobalBAMesh:
    """global_bundle_adjust_mesh converges like global_bundle_adjust.

    Exact equality is NOT expected: shard_map compiles the core differently
    (reassociated f32 reductions), and 24-iteration CG on f32 amplifies
    ulp-level input differences into different-but-equally-optimal iterate
    paths — measured: a 1-DEVICE mesh already differs from the unsharded
    run by ~3e-3 while an 8-device mesh differs by ~1e-3, i.e. the gap is
    compilation numerics, not sharding logic. So the contract tested is:
    same optimum (ground-truth recovery + reprojection RMSE within 10% of
    the single-device run) plus a coarse pose band."""

    @pytest.mark.slow  # compiles the Schur-CG core twice (mesh + single)
    def test_mesh_matches_single_device(self):
        from vo_slam_test_tpu.parallel import make_obs_mesh
        from vo_slam_test_tpu.solvers.global_ba import global_bundle_adjust_mesh

        m, gt_poses, gt_pts, cam = fabricate_map(
            pose_noise=0.03, pt_noise=0.05, seed=3)
        fixed = jnp.asarray(0, jnp.int32)
        m1 = global_bundle_adjust(m, CAPS, cam, fixed)
        m2 = global_bundle_adjust_mesh(m, CAPS, cam, fixed, make_obs_mesh(8))

        np.testing.assert_allclose(
            np.asarray(m2.kf_pose), np.asarray(m1.kf_pose), atol=1e-2)
        # gauge anchor untouched, every pose recovered to ground truth
        np.testing.assert_allclose(
            np.asarray(m2.kf_pose)[0], gt_poses[0], atol=1e-6)
        est = np.asarray(m2.kf_pose)[:6]
        terr = np.linalg.norm(est[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
        assert terr.max() < 0.01, terr
        # same optimum quality as the single-device solve
        r1 = reproj_rmse(m1, cam, 6, 400)
        r2 = reproj_rmse(m2, cam, 6, 400)
        assert r2 < 1.0 and r2 < r1 * 1.1, (r1, r2)
