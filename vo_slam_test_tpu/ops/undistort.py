"""Radial-tangential point undistortion (cv::undistortPoints equivalent).

The reference undistorts keypoint coordinates once per frame
(reference: frame.cpp:36-70). Implemented as the standard fixed-point
iteration on normalized coordinates, fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def undistort_points(
    uv: jnp.ndarray,
    fx, fy, cx, cy,
    dist_coef: jnp.ndarray,
    iters: int = 10,
) -> jnp.ndarray:
    """(..., 2) distorted pixels -> (..., 2) undistorted pixels (same K)."""
    k1, k2, p1, p2, k3 = (dist_coef[i] for i in range(5))
    x0 = (uv[..., 0] - cx) / fx
    y0 = (uv[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return ((x0 - dx) * icdist, (y0 - dy) * icdist)

    x, y = jax.lax.fori_loop(0, iters, body, (x0, y0))
    return jnp.stack([fx * x + cx, fy * y + cy], axis=-1)


def distort_points(
    uv_undist: jnp.ndarray,
    fx, fy, cx, cy,
    dist_coef: jnp.ndarray,
) -> jnp.ndarray:
    """Forward distortion model (closed form) — used for tests."""
    k1, k2, p1, p2, k3 = (dist_coef[i] for i in range(5))
    x = (uv_undist[..., 0] - cx) / fx
    y = (uv_undist[..., 1] - cy) / fy
    r2 = x * x + y * y
    radial = 1.0 + ((k3 * r2 + k2) * r2 + k1) * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)
