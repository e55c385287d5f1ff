"""Native C++ dataset loader: build, decode parity vs cv2, ordering."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vo_slam_test_tpu.native import NativeTumLoader, native_available


@pytest.fixture(scope="module")
def png_dataset(tmp_path_factory, synthetic_seq):
    d = tmp_path_factory.mktemp("tum")
    rgbs, deps, ts = [], [], []
    for i in range(4):
        gray, depth, t = synthetic_seq[i]
        rgb = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
        # make it genuinely colored so luma conversion is exercised
        rgb[..., 0] = np.clip(rgb[..., 0].astype(int) + 20, 0, 255).astype(np.uint8)
        rp = str(d / f"rgb_{i}.png")
        dp = str(d / f"depth_{i}.png")
        cv2.imwrite(rp, rgb)
        cv2.imwrite(dp, (depth * 5000.0).astype(np.uint16))
        rgbs.append(rp)
        deps.append(dp)
        ts.append(t)
    return rgbs, deps, ts


class TestNativeLoader:
    def test_builds(self):
        assert native_available(), "native loader failed to build"

    def test_decode_matches_cv2(self, png_dataset):
        rgbs, deps, ts = png_dataset
        loader = NativeTumLoader(rgbs, deps, ts, depth_scale=5000.0)
        for i in range(len(rgbs)):
            gray, depth, t = loader[i]
            # cv2.imread PNG is BGR; our loader reads PNG channel order (RGB)
            ref_rgb = cv2.cvtColor(cv2.imread(rgbs[i]), cv2.COLOR_BGR2RGB)
            r, g, b = ref_rgb[..., 0].astype(int), ref_rgb[..., 1].astype(int), ref_rgb[..., 2].astype(int)
            ref_gray = ((19595 * r + 38470 * g + 7471 * b + 32768) >> 16).astype(np.uint8)
            np.testing.assert_array_equal(gray, ref_gray)
            ref_depth = cv2.imread(deps[i], cv2.IMREAD_UNCHANGED).astype(np.float32) / 5000.0
            np.testing.assert_allclose(depth, ref_depth, atol=1e-6)
            assert t == ts[i]
        loader.close()

    def test_sequential_enforced(self, png_dataset):
        rgbs, deps, ts = png_dataset
        loader = NativeTumLoader(rgbs, deps, ts)
        loader[0]
        with pytest.raises(ValueError):
            loader[3]
        loader.close()
