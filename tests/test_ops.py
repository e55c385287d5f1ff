"""Golden tests for the ORB front-end kernels against OpenCV oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vo_slam_test_tpu.ops import fast, gaussian, hamming, pattern, undistort
from vo_slam_test_tpu.ops.pyramid import HALO, Pyramid, PyramidSpec, build_pyramid, interior


@pytest.fixture(scope="module")
def test_image(synthetic_seq):
    gray, _, _ = synthetic_seq[0]
    return gray


class TestFast:
    def test_against_cv2(self, test_image):
        """Full-image FAST-9/16 with NMS must match cv2 keypoints+responses."""
        th = 20
        det = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=True, type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16
        )
        kps = det.detect(test_image)
        ref = {(int(k.pt.x) if hasattr(k.pt, "x") else int(k.pt[0]), int(k.pt[1])): k.response for k in kps}

        img = jnp.asarray(test_image, dtype=jnp.float32)[None]
        score = np.asarray(fast.fast_score(img))[0]
        keep = np.asarray(fast.nms3x3(jnp.asarray(score[None])))[0]
        # cv2 FAST ignores a 3px border
        mask = np.zeros_like(score, dtype=bool)
        mask[3:-3, 3:-3] = True
        ours_mask = (score > th) & keep & mask
        ys, xs = np.nonzero(ours_mask)
        ours = {(x, y): score[y, x] - 1 for y, x in zip(ys, xs)}

        missing = set(ref) - set(ours)
        extra = set(ours) - set(ref)
        # allow a tiny mismatch at NMS ties / borders
        assert len(missing) <= 0.01 * len(ref), f"missing {len(missing)}/{len(ref)}: {list(missing)[:5]}"
        assert len(extra) <= 0.01 * len(ref), f"extra {len(extra)}/{len(ref)}: {list(extra)[:5]}"
        for key in list(set(ref) & set(ours))[:500]:
            assert abs(ref[key] - ours[key]) <= 1e-3, (key, ref[key], ours[key])

    def test_two_threshold_retry(self, test_image):
        spec = PyramidSpec(640, 480, 2, 1.2)
        img = jnp.asarray(test_image, dtype=jnp.float32)
        pyr = build_pyramid(img, spec)
        cands = fast.detect_pyramid(interior(pyr.raw, spec), spec, 20.0, 7.0, 8)
        v = np.asarray(cands.valid)
        assert v.any()
        # responses of valid candidates are >= lo-1
        resp = np.asarray(cands.response)
        assert (resp[v] >= 6.0).all()


class TestGaussian:
    def test_matches_cv2(self, test_image):
        img = test_image.astype(np.float32)
        ours = np.asarray(gaussian.gaussian_blur_7x7(jnp.asarray(img)))
        ref = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, ref, atol=2e-2)


class TestPyramid:
    @pytest.mark.slow  # ~28 s: 8-level full-res golden; pyramid is also
    # covered by the extractor end-to-end tests in the fast tier
    def test_levels_match_cv2_resize_chain_exactly(self, test_image):
        """BIT-EXACT equality with the chained cv::resize INTER_LINEAR u8
        pyramid (ORBextractor.cpp:1129-1138): the resize reproduces
        OpenCV's 11-bit fixed-point taps and specialized u8 vertical cast,
        so every level must match to the last gray level — on the textured
        render AND on white noise (the harshest rounding exerciser)."""
        noise = np.random.default_rng(11).integers(0, 256, (480, 640), np.uint8)
        for img in (test_image, noise):
            spec = PyramidSpec(640, 480, 8, 1.2)
            pyr = build_pyramid(jnp.asarray(img), spec)
            inner = np.asarray(interior(pyr.raw, spec))
            prev = img.copy()
            for lvl in range(1, 8):
                h, w = spec.sizes[lvl]
                prev = cv2.resize(prev, (w, h), interpolation=cv2.INTER_LINEAR)
                ours = inner[lvl, :h, :w].astype(np.int32)
                diff = np.abs(ours - prev.astype(np.int32))
                assert diff.max() == 0, (lvl, diff.max(), np.mean(diff > 0))

    def test_halo_is_reflect101(self, test_image):
        spec = PyramidSpec(640, 480, 2, 1.2)
        pyr = build_pyramid(jnp.asarray(test_image), spec)
        raw = np.asarray(pyr.raw)[0]
        img = test_image.astype(np.float32)
        # left halo column HALO-1 equals image column 1 (reflect_101)
        np.testing.assert_allclose(raw[HALO : HALO + 480, HALO - 1], img[:, 1], atol=1e-4)
        np.testing.assert_allclose(raw[HALO - 1, HALO : HALO + 640], img[1, :], atol=1e-4)
        # halo is unblurred in the blur canvas
        blur = np.asarray(pyr.blur)[0]
        np.testing.assert_allclose(blur[HALO - 1, HALO : HALO + 640], img[1, :], atol=1e-4)


class TestUndistort:
    def test_matches_cv2(self):
        fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3
        dist = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633], np.float32)
        rng = np.random.default_rng(0)
        pts = rng.uniform([50, 50], [590, 430], size=(200, 2)).astype(np.float32)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        ref = cv2.undistortPoints(pts[:, None, :], K, dist, P=K).reshape(-1, 2)
        ours = np.asarray(
            undistort.undistort_points(jnp.asarray(pts), fx, fy, cx, cy, jnp.asarray(dist))
        )
        np.testing.assert_allclose(ours, ref, atol=5e-2)

    def test_roundtrip(self):
        fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3
        dist = jnp.asarray([0.2624, -0.9531, -0.0054, 0.0026, 1.1633], jnp.float32)
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.uniform([100, 100], [540, 380], size=(100, 2)).astype(np.float32))
        und = undistort.undistort_points(pts, fx, fy, cx, cy, dist)
        back = undistort.distort_points(und, fx, fy, cx, cy, dist)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-2)


class TestHamming:
    def test_vs_numpy_and_mxu(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, size=(96, 8), dtype=np.uint32)
        ref = np.zeros((64, 96), np.int32)
        for i in range(64):
            x = a[i][None] ^ b
            ref[i] = np.unpackbits(x.view(np.uint8), axis=1).sum(1)
        d1 = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        d2 = np.asarray(hamming.distance_matrix_mxu(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(d1, ref)
        np.testing.assert_array_equal(d2, ref)

    def test_identical_is_zero(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32))
        assert np.all(np.asarray(hamming.hamming(a, a)) == 0)


class TestPattern:
    def test_table_shape_and_range(self):
        p = pattern.bit_pattern_31()
        assert p.shape == (256, 4)
        assert p.min() >= -13 and p.max() <= 13

    def test_umax_symmetric(self):
        u = pattern.umax_table()
        assert u[0] == 15
        assert len(u) == 16
        # 45-degree symmetry: mask transpose-invariant
        m = pattern.circular_patch_mask()
        assert (m == m.T).all()
