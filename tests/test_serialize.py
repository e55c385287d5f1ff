"""Map checkpoint save/load roundtrip + reuse."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles a full SlamSystem

from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps
from vo_slam_test_tpu.slam_map.serialize import load_map, save_map


class TestSerialize:
    def test_roundtrip_and_resume(self, tmp_path):
        seq = SyntheticRGBD(n_frames=10, seed=61, motion_scale=0.3)
        cfg = SlamConfig(
            camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
            camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
        )
        caps = MapCaps(max_kf=16, max_pt=4096)
        sys_ = SlamSystem(cfg, caps=caps)
        for i in range(len(seq)):
            sys_.track(*seq[i])
        sys_.results()
        path = str(tmp_path / "map.npz")
        save_map(path, sys_.map, sys_.caps)

        m2, caps2 = load_map(path)
        assert caps2 == caps
        for f in ("kf_pose", "pt_pos", "kf_mp", "covis", "pt_desc"):
            np.testing.assert_array_equal(np.asarray(getattr(m2, f)), np.asarray(getattr(sys_.map, f)))

        # a fresh system can adopt the loaded map and keep tracking
        sys2 = SlamSystem(cfg, caps=caps2)
        sys2.map = m2
        sys2.state = sys_.state
        sys2._frame_id = sys_._frame_id
        sys2.track(*seq[len(seq) - 1])
        _, stats, _ = sys2.results()
        assert stats[-1].ok
