import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie

jax.config.update("jax_enable_x64", False)


def random_twists(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, size=(n, 6)).astype(np.float32))


class TestSO3:
    def test_exp_orthonormal(self):
        phi = random_twists(32)[:, 3:]
        R = lie.so3_exp(phi)
        eye = jnp.eye(3)[None].repeat(32, 0)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        phi = random_twists(64, scale=1.5)[:, 3:]
        phi2 = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=2e-4)

    def test_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        theta = np.pi - 1e-4
        phi = jnp.asarray((axis * theta).astype(np.float32))[None]
        phi2 = lie.so3_log(lie.so3_exp(phi))
        R1 = lie.so3_exp(phi)
        R2 = lie.so3_exp(phi2)
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = random_twists(64, scale=1.0)
        xi2 = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-4)

    def test_inverse(self):
        xi = random_twists(16)
        T = lie.se3_exp(xi)
        TT = T @ lie.se3_inverse(T)
        np.testing.assert_allclose(np.asarray(TT), np.eye(4)[None].repeat(16, 0), atol=1e-5)

    def test_transform_points(self):
        xi = random_twists(4)
        T = lie.se3_exp(xi)
        pts = jnp.asarray(np.random.default_rng(1).normal(size=(4, 10, 3)).astype(np.float32))
        out = lie.transform_points(T, pts)
        manual = jnp.einsum("bij,bnj->bni", T[:, :3, :3], pts) + T[:, None, :3, 3]
        np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-6)


class TestQuat:
    def test_mat_quat_roundtrip(self):
        phi = random_twists(128, scale=2.0)[:, 3:]
        R = lie.so3_exp(phi)
        q = lie.mat_to_quat(R)
        R2 = lie.quat_to_mat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_scipy_agreement(self):
        from scipy.spatial.transform import Rotation

        phi = np.asarray(random_twists(32, scale=1.5)[:, 3:])
        R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        q_ours = np.asarray(lie.mat_to_quat(jnp.asarray(R)))
        q_scipy = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
        # quaternion sign ambiguity
        sign = np.sign((q_ours * q_scipy).sum(-1, keepdims=True))
        np.testing.assert_allclose(q_ours * sign, q_scipy, atol=1e-4)


class TestSim3:
    def test_apply_compose_inverse(self):
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32))
        R = lie.so3_exp(random_twists(8)[:, 3:])
        t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3)[None].repeat(8, 0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-4)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(2)
        xi = jnp.asarray(rng.uniform(-0.8, 0.8, size=(32, 7)).astype(np.float32))
        s, R, t = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(s, R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-3)
