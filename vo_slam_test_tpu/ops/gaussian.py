"""Separable Gaussian blur (7x7, sigma=2) matching cv::GaussianBlur defaults.

The reference blurs each level before rBRIEF sampling
(reference: ORBextractor.cpp:1094: GaussianBlur(..., Size(7,7), 2, 2,
BORDER_REFLECT_101)). Implemented as two 1-D convolutions — XLA fuses these
into a handful of VPU passes; a Pallas fusion with the descriptor gather is
a later optimization.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel_1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    """Matches cv::getGaussianKernel (f64 normalization)."""
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


# OpenCV's "bit-exact" u8 Gaussian coefficients for ksize=7 sigma=2, Q8
# fixed point: horizontal pass u8*Q8 -> exact Q8 integers, vertical pass
# Q8*Q8 -> Q16, then round-half-up >> 16 (smooth.simd fixed-point path).
# Recovered empirically against the linked reference OpenCV
# (tests/test_orb_oracle.py pins bit-equality via native/orb_oracle.py).
_K_U8_Q8 = (18, 34, 48, 56, 48, 34, 18)  # sums to 256


def gaussian_blur_7x7_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact replica of cv::GaussianBlur(7x7, sigma 2, REFLECT_101) on
    CV_8U, the exact blur the reference applies before rBRIEF sampling
    (ORBextractor.cpp:1094). Input/output are f32 arrays holding u8 integer
    values; every intermediate stays below 2**24 so f32 arithmetic is exact
    on TPU (max Q16 sum: 255*65536 + 2**15 < 2**24).
    """
    k = jnp.asarray(_K_U8_Q8, dtype=jnp.float32)
    pad = 3

    def blur2d(x):
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        h = sum(k[i] * xp[:, i : i + x.shape[1]] for i in range(7))  # Q8
        hp = jnp.pad(h, ((pad, pad), (0, 0)), mode="reflect")
        v = sum(k[i] * hp[i : i + x.shape[0], :] for i in range(7))  # Q16
        return jnp.clip(jnp.floor((v + 32768.0) * (1.0 / 65536.0)), 0.0, 255.0)

    if img.ndim == 2:
        return blur2d(img)
    flat = img.reshape((-1,) + img.shape[-2:])
    return jax.vmap(blur2d)(flat).reshape(img.shape)


def gaussian_blur_7x7(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) or (..., H, W) f32 -> same shape; REFLECT_101 border."""
    k = jnp.asarray(gaussian_kernel_1d(7, 2.0))
    pad = 3

    def blur2d(x):
        xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="reflect")
        rows = sum(k[i] * xp[i : i + x.shape[0], :] for i in range(7))
        rp = jnp.pad(rows, ((0, 0), (pad, pad)), mode="reflect")
        return sum(k[i] * rp[:, i : i + x.shape[1]] for i in range(7))

    if img.ndim == 2:
        return blur2d(img)
    flat = img.reshape((-1,) + img.shape[-2:])
    return jax.vmap(blur2d)(flat).reshape(img.shape)
