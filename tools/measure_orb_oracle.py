"""Measure front-end parity vs the compiled reference ORBextractor.

Prints, per image: pyramid bit-equality, keypoint set overlap, angle
agreement, descriptor bit-equality / hamming stats for matched keypoints.
Used to pin the thresholds in tests/test_orb_oracle.py.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np

from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.native.orb_oracle import (
    oracle_available, reference_extract, reference_pyramid_level)
from vo_slam_test_tpu.ops.pyramid import HALO, PyramidSpec, build_pyramid


def images():
    seq = SyntheticRGBD(n_frames=2, seed=3)
    g0, d0, _ = seq[0]
    yield "synthetic_corner", g0, d0
    rng = np.random.default_rng(42)
    noise = (rng.random((480, 640)) * 255).astype(np.uint8)
    yield "white_noise", noise, np.ones((480, 640), np.float32)
    gx = np.linspace(0, 255, 640, dtype=np.float32)[None, :]
    gy = np.linspace(0, 255, 480, dtype=np.float32)[:, None]
    grad = ((gx + gy) / 2).astype(np.uint8)
    # sprinkle corners so FAST finds something
    for i in range(40):
        y, x = rng.integers(40, 440), rng.integers(40, 600)
        grad[y : y + 12, x : x + 12] = rng.integers(0, 255)
    yield "gradient_squares", grad, np.ones((480, 640), np.float32)


def main():
    assert oracle_available(), "oracle build failed"
    cam = Camera.from_config(
        SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0))
    ext = OrbExtractor(cam)
    spec = PyramidSpec(640, 480, 8, 1.2)
    scales = np.asarray(spec.scales)

    for name, gray, depth in images():
        # --- pyramid bit equality

        pyr = build_pyramid(np.asarray(gray), spec)
        pyr_ok = []
        for lvl in range(8):
            h, w = spec.sizes[lvl]
            ours = np.asarray(pyr.raw[lvl, HALO:HALO + h, HALO:HALO + w]).astype(np.uint8)
            ref = reference_pyramid_level(gray, lvl)
            pyr_ok.append(bool((ours == ref).all()) and ref.shape == (h, w))
        kr, dr = reference_extract(gray)
        ko = ext(gray, depth.astype(np.float32))
        uv = np.asarray(ko.uv)
        ang = np.asarray(ko.angle)
        octv = np.asarray(ko.octave)
        desc = np.asarray(ko.desc)
        val = np.asarray(ko.valid)
        uv, ang, octv, desc = uv[val], ang[val], octv[val], desc[val]

        # match on (octave, level-x, level-y)
        def key(x, y, o):
            lx = np.rint(x / scales[o]).astype(np.int64)
            ly = np.rint(y / scales[o]).astype(np.int64)
            return o.astype(np.int64) * 10_000_000 + ly * 3000 + lx

        kref = key(kr[:, 0], kr[:, 1], kr[:, 3].astype(np.int64))
        kours = key(uv[:, 0], uv[:, 1], octv)
        ref_map = {k: i for i, k in enumerate(kref)}
        matches = [(ref_map[k], j) for j, k in enumerate(kours) if k in ref_map]
        ri = np.array([m[0] for m in matches])
        oi = np.array([m[1] for m in matches])

        overlap_ref = len(matches) / max(len(kref), 1)
        overlap_ours = len(matches) / max(len(kours), 1)

        da = np.abs(kr[ri, 2] - ang[oi])
        da = np.minimum(da, 360 - da)
        ours_bytes = desc[oi].astype("<u4").tobytes()
        ours_rows = np.frombuffer(ours_bytes, np.uint8).reshape(-1, 32)
        ref_rows = dr[ri]
        bit_eq = (ours_rows == ref_rows).all(axis=1)
        ham = np.unpackbits(ours_rows ^ ref_rows, axis=1).sum(axis=1)

        print(f"== {name}: ref {len(kref)} kps, ours {len(kours)}")
        print(f"   pyramid bit-exact: {pyr_ok}")
        print(f"   overlap: {overlap_ref:.4f} of ref, {overlap_ours:.4f} of ours "
              f"({len(matches)} matched)")
        if len(matches):
            print(f"   angle: max |d| {da.max():.4f} deg, mean {da.mean():.5f}, "
                  f">0.1deg: {(da > 0.1).mean():.4f}")
            print(f"   desc: bit-identical {bit_eq.mean():.4f}, "
                  f"mean hamming {ham.mean():.3f}, max {ham.max()}")


if __name__ == "__main__":
    main()
