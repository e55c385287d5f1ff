"""Steered rBRIEF descriptors (256 bit) as a batched gather + bit-pack.

Reference: ORBextractor.cpp:110-151 (computeOrbDescriptor): each of 256
pattern pairs is rotated by the keypoint angle (coordinates rounded), sampled
on the blurred level image, and compared (bit = I(p1) < I(p2)).

TPU design: all keypoints and all 512 sample points in one gather from the
blurred haloed canvas, then a vectorized bit-pack into uint32[N, 8].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pattern
from .pyramid import HALO


@functools.lru_cache()
def _pattern_xy() -> np.ndarray:
    """(512, 2) f32: interleaved (x, y) of the two points of each pair."""
    p = pattern.bit_pattern_31().astype(np.float32)  # (256, 4): x1 y1 x2 y2
    pts = np.stack([p[:, [0, 1]], p[:, [2, 3]]], axis=1)  # (256, 2, 2)
    return pts.reshape(512, 2)


def compute_descriptors(
    canvas_blur: jnp.ndarray,
    level: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    angle_deg: jnp.ndarray,
) -> jnp.ndarray:
    """-> uint32 [N, 8] packed descriptors (bit b of word w = pair 32w+b).

    level/ys/xs are *level-image* integer coordinates; angle in degrees.
    """
    L, CH, CW = canvas_blur.shape
    pts = jnp.asarray(_pattern_xy())  # [512, 2]
    theta = jnp.radians(angle_deg)
    ca, sa = jnp.cos(theta), jnp.sin(theta)  # [N]
    # rotated, rounded sample offsets (ORBextractor.cpp GET_VALUE)
    rx = jnp.rint(pts[None, :, 0] * ca[:, None] - pts[None, :, 1] * sa[:, None]).astype(jnp.int32)
    ry = jnp.rint(pts[None, :, 0] * sa[:, None] + pts[None, :, 1] * ca[:, None]).astype(jnp.int32)

    yy = ys[:, None] + HALO + ry  # [N, 512]
    xx = xs[:, None] + HALO + rx
    flat = canvas_blur.reshape(-1)
    idx = (level[:, None] * CH + yy) * CW + xx
    samples = flat[idx.reshape(-1)].reshape(idx.shape)  # [N, 512]

    t1 = samples[:, 0::2]
    t2 = samples[:, 1::2]
    bits = (t1 < t2).astype(jnp.uint32)  # [N, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1)
    return words.astype(jnp.uint32)
