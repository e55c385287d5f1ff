"""BoW-bucket gating of triangulation candidate pairs
(searchForTriangulation's featVec lockstep walk, matcher.cpp:903-965):
pairs in different buckets must not match when a vocabulary is loaded;
without one (div=0) the full epipolar-gated search is the superset
fallback."""

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map
from vo_slam_test_tpu.slam_map.triangulate import create_new_map_points

CAPS = MapCaps(max_kf=8, max_pt=512, max_obs=8, n_feat=64)


def two_view_map(words0, words1):
    """Two keyframes seeing the same 12 unmatched 3D points; descriptors
    identical per correspondence, epipolar-consistent projections."""
    rng = np.random.default_rng(5)
    cam = Camera.from_config(
        SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0)
    )
    n = 12
    pts = rng.uniform([-1, -0.8, 3.0], [1, 0.8, 5.0], (n, 3)).astype(np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.asarray(lie.se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.02, 0.0])))

    m = empty_map(CAPS)
    md = {
        f: np.array(getattr(m, f))
        for f in (
            "kf_pose kf_valid kf_uv_und kf_octave kf_kp_valid kf_mp kf_desc "
            "kf_word kf_u_right kf_depth covis".split()
        )
    }
    for k, T in ((0, T0), (1, T1)):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        u = float(cam.fx) * pc[:, 0] / pc[:, 2] + float(cam.cx)
        v = float(cam.fy) * pc[:, 1] / pc[:, 2] + float(cam.cy)
        md["kf_pose"][k] = T
        md["kf_valid"][k] = True
        for i in range(n):
            md["kf_uv_und"][k, i] = (u[i], v[i])
            md["kf_kp_valid"][k, i] = True
            md["kf_desc"][k, i] = rng.integers(0, 2**32, 8, dtype=np.uint32) if k == 0 else md["kf_desc"][0, i]
            md["kf_u_right"][k, i] = -1.0
            md["kf_depth"][k, i] = -1.0
    md["kf_word"][0, :n] = words0
    md["kf_word"][1, :n] = words1
    md["covis"][0, 1] = md["covis"][1, 0] = 50
    return (
        m.replace(
            n_kf=jnp.asarray(2, jnp.int32),
            **{f: jnp.asarray(v) for f, v in md.items()},
        ),
        cam,
    )


def run(words0, words1, div):
    m, cam = two_view_map(words0, words1)
    sf = jnp.asarray([1.2**i for i in range(8)], jnp.float32)
    before = int(np.asarray(m.pt_valid).sum())
    m2 = create_new_map_points(
        m, jnp.asarray(1, jnp.int32), CAPS, cam, sf,
        bow_group_div=jnp.asarray(div, jnp.int32),
    )
    return int(np.asarray(m2.pt_valid).sum()) - before


class TestTriangulationBucketGate:
    def test_same_bucket_triangulates(self):
        w = np.arange(12, dtype=np.int32) + 640  # bucket 640//64=10 each pair
        assert run(w, w, 64) > 6

    def test_cross_bucket_blocked(self):
        w0 = np.arange(12, dtype=np.int32) + 640   # buckets 10..10
        w1 = np.arange(12, dtype=np.int32) + 1280  # buckets 20..20
        assert run(w0, w1, 64) == 0

    def test_div_zero_is_unrestricted(self):
        w0 = np.arange(12, dtype=np.int32) + 640
        w1 = np.arange(12, dtype=np.int32) + 1280
        assert run(w0, w1, 0) > 6
