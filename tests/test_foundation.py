import os

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig, _load_opencv_yaml

EXAMPLE_YAML = """\
%YAML:1.0
dataset_dir: /tmp/data
camera_fx: 517.306408
camera_fy: 516.469215
camera_cx: 318.643040
camera_cy: 255.313989
camera_k1: 0.262383
camera_k2: -0.953104
camera_p1: -0.005358
camera_p2: 0.002628
camera_k3: 1.163314
camera_depthScale: 5000
camera_width: 640
camera_height: 480
camera_RGB: 1
camera_fps: 30
camera_bf: 40.0
thDepth: 40.0
num_of_features: 1000
scale_factor: 1.2
level_pyramid: 8
some_extra_key: 7
"""


class TestConfig:
    def test_opencv_yaml_header(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text(EXAMPLE_YAML)
        cfg = SlamConfig.from_yaml(str(p))
        assert cfg.camera_fx == pytest.approx(517.306408)
        assert cfg.num_of_features == 1000
        assert cfg.get("some_extra_key") == 7
        assert cfg.get("missing", default=5) == 5
        with pytest.raises(KeyError):
            cfg.get("missing")

    def test_defaults_cover_undocumented_keys(self):
        cfg = SlamConfig()
        # keys the reference requires at runtime but omitted from example.yaml
        assert cfg.max_lost > 0
        assert cfg.data_num == 0


class TestCamera:
    def make(self):
        return Camera.from_config(SlamConfig())

    def test_derived_quantities(self):
        cam = self.make()
        # b = bf/fx; thDepth scaled by b (camera.cpp:19-20)
        assert float(cam.b) == pytest.approx(40.0 / 517.306408)
        assert float(cam.th_depth) == pytest.approx(40.0 * 40.0 / 517.306408)

    def test_project_roundtrip(self):
        cam = self.make()
        rng = np.random.default_rng(0)
        uv = jnp.asarray(rng.uniform(0, 640, size=(100, 2)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(100,)).astype(np.float32))
        pc = cam.pixel2camera(uv, depth)
        uv2 = cam.camera2pixel(pc)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_world_pixel_roundtrip(self):
        cam = self.make()
        xi = jnp.asarray([0.1, -0.2, 0.3, 0.05, -0.02, 0.01], dtype=jnp.float32)
        T_c_w = lie.se3_exp(xi)
        rng = np.random.default_rng(1)
        uv = jnp.asarray(rng.uniform(100, 500, size=(50, 2)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(1.0, 4.0, size=(50,)).astype(np.float32))
        pw = cam.pixel2world(uv, depth, T_c_w)
        uv2 = cam.world2pixel(pw, T_c_w)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)

    def test_u_right_sentinel(self):
        cam = self.make()
        u = jnp.asarray([100.0, 200.0])
        d = jnp.asarray([2.0, 0.0])
        ur = cam.u_right(u, d)
        assert float(ur[0]) == pytest.approx(100.0 - 40.0 / 2.0)
        assert float(ur[1]) == -1.0


class TestSynthetic:
    def test_render_shapes(self, synthetic_seq):
        gray, depth, ts = synthetic_seq[0]
        assert gray.shape == (480, 640)
        assert gray.dtype == np.uint8
        assert depth.shape == (480, 640)
        # most pixels hit a wall
        assert (depth > 0).mean() > 0.9
        assert depth[depth > 0].min() > 0.3

    def test_depth_consistent_with_geometry(self, synthetic_seq):
        """Back-projected pixels of frame 0 must land on one of the 3 planes."""
        gray, depth, _ = synthetic_seq[0]
        cam = Camera.from_config(SlamConfig())
        # synthetic uses slightly rounded intrinsics; construct to match
        seq = synthetic_seq
        v, u = np.mgrid[0:480:40, 0:640:40]
        z = depth[v, u]
        ok = z > 0
        x = (u[ok] - seq.cx) / seq.fx * z[ok]
        y = (v[ok] - seq.cy) / seq.fy * z[ok]
        T_w_c = seq.poses[0]
        pw = (np.stack([x, y, z[ok]], -1) @ T_w_c[:3, :3].T) + T_w_c[:3, 3]
        on_plane = (
            (np.abs(pw[:, 2] - 3.0) < 1e-2)
            | (np.abs(pw[:, 1] - 0.8) < 1e-2)
            | (np.abs(pw[:, 0] - 1.5) < 1e-2)
        )
        assert on_plane.mean() > 0.99

    def test_texture_has_corners(self, synthetic_seq):
        """cv2 FAST should find hundreds of corners in the rendering."""
        cv2 = pytest.importorskip("cv2")
        gray, _, _ = synthetic_seq[0]
        kps = cv2.FastFeatureDetector_create(threshold=20).detect(gray)
        assert len(kps) > 500
