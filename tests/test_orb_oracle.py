"""Whole-front-end parity vs the COMPILED REFERENCE ORBextractor.

The strongest parity evidence obtainable in this environment (zero
egress): /root/reference/src/ORBextractor.cpp is compiled in place
(native/orb_oracle.py — an OpenCV-4 header shim is the only change) and
run on the same pixels as our TPU front end.

Measured attribution of every residual divergence (tools/dbg_orb_overlap.py,
tools/measure_orb_oracle.py; NOTES round 5):

- pyramid: BIT-EXACT, all 8 levels, on the textured render, white noise
  and a gradient image — the round-4 fixed-point resize validated against
  actual reference code, not just cv2 primitives.
- IC angles: <=0.01 deg of the reference's cvFastAtan2 values.
- keypoint sets: ~73-86% overlap. Attribution on the render / noise:
    FAST stage 6.5% / 1.9% (reference NMS is cell-local inside ~31px
    cv::FAST windows, ours is dense+global; cell grids differ),
    quad-tree stage 14% / 25% (the reference's finishing round sorts
    pair<int, ExtractorNode*> — ORBextractor.cpp:691 — so equal-count
    nodes are ordered by RAW HEAP POINTER VALUE: which tied node gets
    split is allocator-dependent and unreproducible by design; on noise
    almost all finishing-round nodes are tied).
- descriptors + angles (matched keypoints): BIT-IDENTICAL (hamming 0,
  angle diff 0.0000 deg) after round-5's bit-exact u8 Gaussian
  (ops/gaussian.py::gaussian_blur_7x7_u8) and cvFastAtan2 replica
  (ops/orientation.py::fast_atan2_deg). Measured zeros on all three
  images; the asserts below keep a hair of slack for platform variation.
"""

import numpy as np
import pytest

from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.native.orb_oracle import oracle_available
from vo_slam_test_tpu.ops.pyramid import HALO, PyramidSpec, build_pyramid

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not oracle_available(), reason="reference oracle unavailable"),
]


@pytest.fixture(scope="module")
def images():
    seq = SyntheticRGBD(n_frames=1, seed=3)
    gray, _, _ = seq[0]
    rng = np.random.default_rng(42)
    noise = (rng.random((480, 640)) * 255).astype(np.uint8)
    return {"render": gray, "noise": noise}


@pytest.fixture(scope="module")
def spec():
    return PyramidSpec(640, 480, 8, 1.2)


def test_pyramid_bit_exact_vs_reference(images, spec):
    from vo_slam_test_tpu.native.orb_oracle import reference_pyramid_level

    for name, img in images.items():
        pyr = build_pyramid(np.asarray(img), spec)
        for lvl in range(8):
            h, w = spec.sizes[lvl]
            ours = np.asarray(pyr.raw[lvl, HALO:HALO + h, HALO:HALO + w]).astype(np.uint8)
            ref = reference_pyramid_level(img, lvl)
            assert ref.shape == (h, w), (name, lvl)
            assert (ours == ref).all(), (name, lvl, int((ours != ref).sum()))


def _extract_both(img):
    from vo_slam_test_tpu.native.orb_oracle import reference_extract

    cam = Camera.from_config(
        SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0))
    ext = OrbExtractor(cam)
    kr, dr = reference_extract(img)
    ko = ext(img, np.ones((480, 640), np.float32))
    val = np.asarray(ko.valid)
    return kr, dr, (
        np.asarray(ko.uv)[val], np.asarray(ko.angle)[val],
        np.asarray(ko.octave)[val], np.asarray(ko.desc)[val],
    )


def _match(kr, uv, octv, scales):
    def key(x, y, o):
        lx = np.rint(x / scales[o]).astype(np.int64)
        ly = np.rint(y / scales[o]).astype(np.int64)
        return o.astype(np.int64) * 10_000_000 + ly * 3000 + lx

    kref = key(kr[:, 0], kr[:, 1], kr[:, 3].astype(np.int64))
    kours = key(uv[:, 0], uv[:, 1], octv.astype(np.int64))
    ref_map = {k: i for i, k in enumerate(kref)}
    pairs = [(ref_map[k], j) for j, k in enumerate(kours) if k in ref_map]
    ri = np.array([p[0] for p in pairs], dtype=np.int64)
    oi = np.array([p[1] for p in pairs], dtype=np.int64)
    return ri, oi, len(kref), len(kours)


def test_host_quadtree_vs_reference_distribute():
    """Our DistributeOctTree replica vs the compiled reference on IDENTICAL
    candidates: most cases agree EXACTLY; the residual is the reference's
    pointer-value tie-break among equal-count nodes (module docstring).

    Measured: 5/7 cases exact when the oracle runs in a fresh process,
    3/7 inside the full pytest process — the reference's OWN output
    depends on heap history (the pair<int, ExtractorNode*> sort), which
    is why only the per-case floor is asserted."""
    from vo_slam_test_tpu.frontend.distribute import distribute_octtree
    from vo_slam_test_tpu.native.orb_oracle import reference_distribute

    rng = np.random.default_rng(5)
    cases = [(2500, 608, 448, 217), (800, 200, 150, 100),
             (3000, 608, 448, 217), (150, 506, 373, 151),
             (1200, 608, 448, 60), (5000, 608, 448, 181),
             (400, 304, 224, 217)]
    n_exact = 0
    for (n, w, h, target) in cases:
        pos = rng.choice(w * h, size=n, replace=False)
        xs = (pos % w).astype(np.float32)
        ys = (pos // w).astype(np.float32)
        resp = rng.random(n).astype(np.float32) * 100
        ref = set(reference_distribute(xs, ys, resp, 0, w, 0, h, target).tolist())
        ours = set(distribute_octtree(
            xs, ys, resp, 0.0, float(w), 0.0, float(h), target).tolist())
        common = len(ref & ours)
        assert common / max(len(ref), 1) >= 0.94, (n, w, h, target, common, len(ref))
        n_exact += int(ref == ours)
    assert n_exact >= 2, n_exact  # 5/7 fresh process, 3/7 under pytest


class TestFrontEndVsCompiledReference:
    # Floors measured in round 5 (see module docstring for attribution);
    # the quad-tree tie-break makes ~100% unattainable in principle.
    MIN_OVERLAP = {"render": 0.75, "noise": 0.68}
    MAX_MEAN_HAMMING = 0.01
    MIN_BIT_IDENTICAL = 0.999

    @pytest.mark.parametrize("name", ["render", "noise"])
    def test_keypoints_angles_descriptors(self, images, spec, name):
        img = images[name]
        scales = np.asarray(spec.scales)
        kr, dr, (uv, ang, octv, desc) = _extract_both(img)
        ri, oi, n_ref, n_ours = _match(kr, uv, octv, scales)

        overlap = len(ri) / n_ref
        assert overlap >= self.MIN_OVERLAP[name], (overlap, n_ref, n_ours)

        da = np.abs(kr[ri, 2] - ang[oi])
        da = np.minimum(da, 360.0 - da)
        assert da.max() < 1e-3, float(da.max())

        ours_rows = np.frombuffer(
            desc[oi].astype("<u4").tobytes(), np.uint8).reshape(-1, 32)
        ham = np.unpackbits(ours_rows ^ dr[ri], axis=1).sum(axis=1)
        bit_identical = (ham == 0).mean()
        assert ham.mean() <= self.MAX_MEAN_HAMMING, (float(ham.mean()), float(bit_identical))
        assert bit_identical >= self.MIN_BIT_IDENTICAL, float(bit_identical)
