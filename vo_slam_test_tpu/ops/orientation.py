"""Intensity-centroid keypoint orientation (IC angle).

Reference: ORBextractor.cpp:79-107 — moments m10 = sum(x * I), m01 = sum(y * I)
over a radius-15 circular patch clipped row-wise by the umax table; angle =
fastAtan2(m01, m10) in degrees [0, 360).

TPU design: one batched 31x31 gather per keypoint set and two masked
reductions — no per-keypoint loops. Angles replicate OpenCV's cvFastAtan2
f32 polynomial (fast_atan2_deg) so the cvRound'ed rBRIEF rotations — and
hence descriptor bits — agree with the reference (validated against the
compiled reference extractor in tests/test_orb_oracle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pattern
from .pyramid import HALO


# cvFastAtan2's f32 polynomial constants (OpenCV mathfuncs.cpp): the
# reference's keypoint angles are fastAtan2(m01, m10), NOT exact atan2 —
# replicating the ~0.005-deg approximation makes the cvRound'ed rBRIEF
# pattern rotations (and hence descriptor bits) agree with the reference.
_ATAN_P1 = np.float32(0.9997878412794807 * (180.0 / np.pi))
_ATAN_P3 = np.float32(-0.3258083974640975 * (180.0 / np.pi))
_ATAN_P5 = np.float32(0.1555786518463281 * (180.0 / np.pi))
_ATAN_P7 = np.float32(-0.04432655554792128 * (180.0 / np.pi))
_ATAN_EPS = np.float32(2.220446049250313e-16)  # (float)DBL_EPSILON


def fast_atan2_deg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bit-faithful cvFastAtan2(y, x) in degrees [0, 360), f32 throughout."""
    ax = jnp.abs(x).astype(jnp.float32)
    ay = jnp.abs(y).astype(jnp.float32)
    lo = jnp.minimum(ax, ay)
    hi = jnp.maximum(ax, ay)
    c = lo / (hi + _ATAN_EPS)
    c2 = c * c
    poly = (((_ATAN_P7 * c2 + _ATAN_P5) * c2 + _ATAN_P3) * c2 + _ATAN_P1) * c
    a = jnp.where(ax >= ay, poly, np.float32(90.0) - poly)
    a = jnp.where(x < 0, np.float32(180.0) - a, a)
    a = jnp.where(y < 0, np.float32(360.0) - a, a)
    return a


@functools.lru_cache()
def _moment_kernels() -> np.ndarray:
    """[2,1,31,31] f32: x- and y-weighted circular-patch kernels.

    Cross-correlation with the image gives (m10, m01) at every pixel.
    """
    hp = pattern.HALF_PATCH_SIZE
    mask = pattern.circular_patch_mask().astype(np.float32)
    offs = np.arange(-hp, hp + 1, dtype=np.float32)
    kx = mask * offs[None, :]
    ky = mask * offs[:, None]
    return np.stack([kx, ky])[:, None]


def ic_angle_conv(canvas: jnp.ndarray, level: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Orientation via moment *maps*: two 31x31 convolutions on the MXU,
    then a 2-scalar gather per keypoint.

    The direct formulation gathers a 31x31 patch per keypoint — 1M scattered
    HBM reads that dominate the extraction profile (~7 ms/frame). As
    convolutions the same arithmetic runs at MXU speed; bf16x3 passes give
    ~1e-3 relative moment error (~0.05 deg angle error, far below OpenCV's
    own fastAtan2 approximation).

    NOTE: on the current XLA TPU build a 31x31 single-channel conv lowers
    through im2col with a catastrophic blowup, so the extractor uses the
    gather formulation; this path is kept for future XLA versions and
    non-TPU backends.
    """
    L, CH, CW = canvas.shape
    k = jnp.asarray(_moment_kernels())
    m = jax.lax.conv_general_dilated(
        canvas[:, None],          # [L,1,CH,CW]
        k,                        # [2,1,31,31]
        window_strides=(1, 1),
        padding="SAME",
        precision=jax.lax.Precision.DEFAULT,
    )                             # [L,2,CH,CW]
    yy = ys + HALO
    xx = xs + HALO
    m10 = m[level, 0, yy, xx]
    m01 = m[level, 1, yy, xx]
    return fast_atan2_deg(m01, m10)


@functools.partial(jax.jit, static_argnames=())
def ic_angle(canvas: jnp.ndarray, level: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Orientation in degrees [0, 360) for each keypoint.

    canvas: [L, CH, CW] f32 raw haloed pyramid canvas.
    level/ys/xs: [N] int32 keypoint level + *level-image* coordinates.
    """
    L, CH, CW = canvas.shape
    hp = pattern.HALF_PATCH_SIZE
    offs = jnp.arange(-hp, hp + 1, dtype=jnp.int32)
    # gather indices into the flattened canvas
    yy = ys[:, None] + HALO + offs[None, :]          # [N, 31]
    xx = xs[:, None] + HALO + offs[None, :]          # [N, 31]
    flat = canvas.reshape(-1)
    idx = (level[:, None, None] * CH + yy[:, :, None]) * CW + xx[:, None, :]
    patches = flat[idx.reshape(-1)].reshape(ys.shape[0], 2 * hp + 1, 2 * hp + 1)

    mask = jnp.asarray(pattern.circular_patch_mask(), dtype=jnp.float32)
    pm = patches * mask
    xw = offs.astype(jnp.float32)
    m10 = jnp.einsum("nij,j->n", pm, xw)
    m01 = jnp.einsum("nij,i->n", pm, xw)
    return fast_atan2_deg(m01, m10)
