"""Small batched linear-algebra kernels that XLA:TPU lowers poorly.

jnp.linalg.inv on a [..., 3, 3] batch goes through LU with pivoting —
a serial per-matrix loop on TPU. The closed-form adjugate inverse is pure
elementwise VPU math and fuses with its consumers. Used by the BA solvers
(solvers/local_ba.py, solvers/global_ba.py) where a [8192+, 3, 3] batch of
point-Hessian blocks inverts every LM iteration.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv3x3(A: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Closed-form inverse of a [..., 3, 3] batch (adjugate / det).

    Intended for damped SPD blocks (det safely positive); `eps` guards the
    determinant for all-zero padding blocks.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -1.0, 1.0) * eps, det) \
        if eps else 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], -1),
            jnp.stack([co10, co11, co12], -1),
            jnp.stack([co20, co21, co22], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]
