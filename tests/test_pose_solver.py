import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.solvers.pose_only import PoseObs, solve_pose_only

FX, FY, CX, CY, BF = 517.3, 516.5, 318.6, 255.3, 40.0


def make_scene(n=300, seed=0, noise=0.3, outlier_frac=0.0, stereo_frac=0.7):
    rng = np.random.default_rng(seed)
    pw = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], size=(n, 3)).astype(np.float32)
    xi_gt = np.array([0.05, -0.08, 0.12, 0.03, -0.02, 0.04], np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(xi_gt)))
    pc = pw @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = FX * pc[:, 0] / pc[:, 2] + CX + rng.normal(0, noise, n)
    v = FY * pc[:, 1] / pc[:, 2] + CY + rng.normal(0, noise, n)
    ur = u - BF / pc[:, 2] + rng.normal(0, noise, n)
    stereo = rng.uniform(size=n) < stereo_frac
    ur = np.where(stereo, ur, -1.0)
    is_out = rng.uniform(size=n) < outlier_frac
    u = np.where(is_out, u + rng.uniform(15, 60, n) * rng.choice([-1, 1], n), u)
    v = np.where(is_out, v + rng.uniform(15, 60, n) * rng.choice([-1, 1], n), v)
    octave = rng.integers(0, 8, n)
    inv_sigma2 = (1.0 / 1.2 ** (2 * octave)).astype(np.float32)
    obs = PoseObs(
        p_world=jnp.asarray(pw),
        uv=jnp.asarray(np.stack([u, v], -1).astype(np.float32)),
        u_right=jnp.asarray(ur.astype(np.float32)),
        inv_sigma2=jnp.asarray(inv_sigma2),
        valid=jnp.ones(n, bool),
    )
    return T_gt, obs, is_out


def pose_err(T_a, T_b):
    d = np.asarray(lie.se3_log(jnp.asarray(T_a @ np.linalg.inv(T_b), dtype=jnp.float32)))
    return np.abs(d).max()


class TestPoseOnly:
    def test_clean_recovery(self):
        T_gt, obs, _ = make_scene(noise=0.0)
        xi0 = np.array([0.02, -0.03, 0.05, 0.01, 0.02, -0.01], np.float32)
        T0 = jnp.asarray(np.asarray(lie.se3_exp(jnp.asarray(xi0))) @ T_gt, dtype=jnp.float32)
        T, inl, n = solve_pose_only(T0, obs, FX, FY, CX, CY, BF)
        assert pose_err(np.asarray(T), T_gt) < 1e-3
        assert int(n) == 300

    def test_noisy_with_outliers(self):
        T_gt, obs, is_out = make_scene(noise=0.4, outlier_frac=0.25, seed=3)
        xi0 = np.array([0.03, 0.02, -0.04, -0.015, 0.01, 0.02], np.float32)
        T0 = jnp.asarray(np.asarray(lie.se3_exp(jnp.asarray(xi0))) @ T_gt, dtype=jnp.float32)
        T, inl, n = solve_pose_only(T0, obs, FX, FY, CX, CY, BF)
        assert pose_err(np.asarray(T), T_gt) < 5e-3
        inl = np.asarray(inl)
        # outliers rejected, inliers kept (a few borderline swaps allowed)
        assert inl[~is_out].mean() > 0.97
        assert inl[is_out].mean() < 0.05

    def test_respects_valid_mask(self):
        T_gt, obs, _ = make_scene(noise=0.0, seed=5)
        # corrupt the second half but mark invalid
        uv = np.array(obs.uv)
        uv[150:] += 500.0
        obs = obs._replace(uv=jnp.asarray(uv), valid=jnp.asarray(np.arange(300) < 150))
        T0 = jnp.asarray(T_gt, dtype=jnp.float32)
        T, inl, n = solve_pose_only(T0, obs, FX, FY, CX, CY, BF)
        assert int(n) == 150
        assert pose_err(np.asarray(T), T_gt) < 1e-3
        assert not np.asarray(inl)[150:].any()

    def test_insufficient_inliers_returns_low_count(self):
        T_gt, obs, _ = make_scene(n=8, noise=0.0, seed=7)
        T0 = jnp.asarray(T_gt, dtype=jnp.float32)
        T, inl, n = solve_pose_only(T0, obs, FX, FY, CX, CY, BF)
        assert int(n) <= 8
