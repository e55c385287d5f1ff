"""EPnP: batched 2D-3D absolute pose vs ground truth and cv2 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.solvers.epnp import epnp_pose, ransac_pnp


def make_scene(n=60, seed=0, noise_px=0.0):
    rng = np.random.default_rng(seed)
    cam = Camera.from_config(
        SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0)
    )
    Xw = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 6.0], (n, 3)).astype(np.float32)
    xi = np.concatenate([rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.1, 0.1, 3)])
    T = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
    pc = Xw @ T[:3, :3].T + T[:3, 3]
    u = float(cam.fx) * pc[:, 0] / pc[:, 2] + float(cam.cx)
    v = float(cam.fy) * pc[:, 1] / pc[:, 2] + float(cam.cy)
    uv = np.stack([u, v], -1) + rng.normal(0, noise_px, (n, 2))
    return cam, Xw, uv.astype(np.float32), T


def pose_err(Ta, Tb):
    dt = np.linalg.norm(Ta[:3, 3] - Tb[:3, 3])
    dR = np.degrees(
        np.arccos(np.clip((np.trace(Ta[:3, :3].T @ Tb[:3, :3]) - 1) / 2, -1, 1))
    )
    return dt, dR


class TestEpnp:
    def test_exact_recovery_many_points(self):
        cam, Xw, uv, T_gt = make_scene(n=60, seed=1)
        T = np.asarray(epnp_pose(jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(60), cam))
        dt, dR = pose_err(T, T_gt)
        assert dt < 2e-3 and dR < 0.05, (dt, dR)

    def test_minimal_four_points(self):
        cam, Xw, uv, T_gt = make_scene(n=4, seed=2)
        T = np.asarray(epnp_pose(jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(4), cam))
        dt, dR = pose_err(T, T_gt)
        assert dt < 0.02 and dR < 0.5, (dt, dR)

    def test_matches_cv2_epnp(self):
        cv2 = pytest.importorskip("cv2")
        cam, Xw, uv, T_gt = make_scene(n=50, seed=3, noise_px=0.3)
        K = np.array(
            [[float(cam.fx), 0, float(cam.cx)], [0, float(cam.fy), float(cam.cy)], [0, 0, 1]]
        )
        ok, rvec, tvec = cv2.solvePnP(
            Xw.astype(np.float64), uv.astype(np.float64), K, None,
            flags=cv2.SOLVEPNP_EPNP,
        )
        assert ok
        R_cv, _ = cv2.Rodrigues(rvec)
        T_cv = np.eye(4); T_cv[:3, :3] = R_cv; T_cv[:3, 3] = tvec[:, 0]
        T = np.asarray(epnp_pose(jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(50), cam))
        dt, dR = pose_err(T, T_cv)
        assert dt < 0.01 and dR < 0.2, (dt, dR)

    def test_ransac_with_outliers(self):
        cam, Xw, uv, T_gt = make_scene(n=80, seed=4, noise_px=0.3)
        rng = np.random.default_rng(9)
        bad = rng.choice(80, 24, replace=False)       # 30% outliers
        uv = uv.copy()
        uv[bad] += rng.uniform(30, 120, (24, 2)) * rng.choice([-1, 1], (24, 2))
        inv_s2 = np.ones(80, np.float32)
        T, inl, n = ransac_pnp(
            jax.random.PRNGKey(0), jnp.asarray(Xw), jnp.asarray(uv),
            jnp.ones(80, bool), jnp.asarray(inv_s2), cam,
        )
        T = np.asarray(T); inl = np.asarray(inl)
        dt, dR = pose_err(T, T_gt)
        assert dt < 0.01 and dR < 0.3, (dt, dR)
        assert int(n) >= 50
        assert not inl[bad].any() or inl[bad].sum() <= 2  # outliers rejected

    def test_padded_invalid_slots(self):
        cam, Xw, uv, T_gt = make_scene(n=40, seed=5)
        Xp = np.concatenate([Xw, np.zeros((24, 3), np.float32)])
        up = np.concatenate([uv, np.zeros((24, 2), np.float32)])
        valid = np.concatenate([np.ones(40, bool), np.zeros(24, bool)])
        T, inl, n = ransac_pnp(
            jax.random.PRNGKey(1), jnp.asarray(Xp), jnp.asarray(up),
            jnp.asarray(valid), jnp.ones(64), cam,
        )
        dt, dR = pose_err(np.asarray(T), T_gt)
        assert dt < 0.01 and dR < 0.3, (dt, dR)
        assert not np.asarray(inl)[40:].any()
