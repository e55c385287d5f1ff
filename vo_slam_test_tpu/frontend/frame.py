"""Frame feature container (fixed-shape struct-of-arrays).

Replaces the reference Frame's per-keypoint vectors (reference:
frame.h:19-53) with padded, masked device arrays of capacity MAX_FEATURES so
every downstream program is fixed-shape. The 64x48 occupancy grid of the
reference (frame.cpp:72-89) is unnecessary on TPU — spatial windowing is a
mask over dense distance matrices — but grid cell ids are kept for parity
diagnostics.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

MAX_FEATURES = 1024


@struct.dataclass
class FrameFeatures:
    """Padded per-keypoint arrays; entries beyond ``count`` are masked."""

    uv: jnp.ndarray        # [N, 2] f32 raw (distorted) level-0 coords
    uv_und: jnp.ndarray    # [N, 2] f32 undistorted coords
    response: jnp.ndarray  # [N] f32 FAST response
    angle: jnp.ndarray     # [N] f32 degrees [0, 360)
    octave: jnp.ndarray    # [N] i32 pyramid level
    depth: jnp.ndarray     # [N] f32 meters; -1 when missing
    u_right: jnp.ndarray   # [N] f32 virtual right-image u; -1 when no depth
    desc: jnp.ndarray      # [N, 8] u32 packed 256-bit rBRIEF
    valid: jnp.ndarray     # [N] bool

    @property
    def n(self) -> int:
        return self.uv.shape[0]
