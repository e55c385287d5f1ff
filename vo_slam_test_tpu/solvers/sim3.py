"""Sim3 solving for loop closure: batched Horn RANSAC + LM refinement.

- ransac_sim3: the reference's Sim3Solver (sim3Solver.cpp) as a fully
  batched program: every RANSAC hypothesis is a closed-form 3-point
  alignment between the two keyframes' camera-frame points, checked by the
  bidirectional reprojection gates 9.21 * sigma^2 (sim3Solver.cpp:53-54,
  242-268). For RGB-D the scale is fixed to 1 (sim3Solver.cpp:227-234), so
  the per-hypothesis solve is the same Horn alignment as relocalization;
  the scale estimate is kept for completeness when fix_scale=False.
- refine_sim3: Optimizer::solveLoopSim3 (optimizer_ceres.cpp:810-1030):
  Levenberg-Marquardt over the relative transform with bidirectional
  reprojection residuals, Huber(sqrt(10)) first pass, chi2=10 outlier
  gates, two passes. Jacobians by forward-mode autodiff over the 6-dof
  twist (scale frozen for RGB-D).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import lie
from .ransac import horn_align

N_HYP = 128
CHI2_SIM3 = 10.0


def _project(pc, fx, fy, cx, cy):
    z = pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.stack(
        [fx * pc[..., 0] / safe_z + cx, fy * pc[..., 1] / safe_z + cy], axis=-1
    )


def _horn_scale(src, dst, w):
    """Optional scale for the non-fixed case (Horn's symmetric scale)."""
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    wn = w / wsum
    c_src = jnp.sum(src * wn[..., None], axis=-2)
    c_dst = jnp.sum(dst * wn[..., None], axis=-2)
    num = jnp.sum(jnp.sum((dst - c_dst[..., None, :]) ** 2, -1) * wn, -1)
    den = jnp.sum(jnp.sum((src - c_src[..., None, :]) ** 2, -1) * wn, -1)
    return jnp.sqrt(num / jnp.maximum(den, 1e-12))


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def ransac_sim3(
    pc1: jnp.ndarray,      # [N,3] matched points in keyframe-1 camera frame
    pc2: jnp.ndarray,      # [N,3] same points in keyframe-2 camera frame
    uv1: jnp.ndarray,      # [N,2] pixels in image 1
    uv2: jnp.ndarray,      # [N,2] pixels in image 2
    max_err1: jnp.ndarray,  # [N] 9.21*sigma1^2 gates
    max_err2: jnp.ndarray,
    valid: jnp.ndarray,    # [N]
    fx, fy, cx, cy,
    seed: jnp.ndarray,
    fix_scale: bool = True,
):
    """Returns (s12, T12 [4,4] (cam2->cam1, rotation+translation), inlier
    mask, count). Apply as p1 = s12 * R12 p2 + t12."""
    N = pc1.shape[0]
    key = jax.random.PRNGKey(seed.astype(jnp.uint32))
    logits = jnp.where(valid, 0.0, -1e9)
    # one gumbel vector per hypothesis; top-3 guarantees distinct samples
    g = jax.random.gumbel(key, (N_HYP, N)) + logits[None, :]
    _, picks = jax.lax.top_k(g, 3)

    src = pc2[picks]   # [B,3,3]
    dst = pc1[picks]
    w3 = jnp.ones((N_HYP, 3))
    if fix_scale:
        s = jnp.ones((N_HYP,))
        T = horn_align(src, dst, w3)
    else:
        s = _horn_scale(src, dst, w3)
        T = horn_align(src * s[:, None, None], dst, w3)

    # bidirectional gates for every hypothesis
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    p1_pred = s[:, None, None] * jnp.einsum("bij,nj->bni", R, pc2) + t[:, None, :]
    uv1_pred = _project(p1_pred, fx, fy, cx, cy)
    # inverse: p2 = (1/s) R^T (p1 - t)
    Rt = jnp.swapaxes(R, 1, 2)
    p2_pred = jnp.einsum("bij,bnj->bni", Rt, pc1[None] - t[:, None, :]) / s[:, None, None]
    uv2_pred = _project(p2_pred, fx, fy, cx, cy)
    e1 = jnp.sum((uv1_pred - uv1[None]) ** 2, -1)
    e2 = jnp.sum((uv2_pred - uv2[None]) ** 2, -1)
    inl = (e1 < max_err1[None]) & (e2 < max_err2[None]) & valid[None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)

    best = jnp.argmax(counts)
    return s[best], lie.orthonormalize(T[best]), inl[best], counts[best]


@functools.partial(jax.jit, static_argnames=("fix_scale", "iters"))
def refine_sim3(
    T12_init: jnp.ndarray,  # [4,4]
    s12_init: jnp.ndarray,
    pc1: jnp.ndarray, pc2: jnp.ndarray,
    uv1: jnp.ndarray, uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray, inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fx, fy, cx, cy,
    fix_scale: bool = True,
    iters: int = 10,
):
    """Two-pass LM refinement. Returns (s12, T12, inlier mask, count)."""
    n_param = 6 if fix_scale else 7

    def apply(params, base_T, base_s):
        xi = params[:6]
        ds = jnp.where(jnp.asarray(n_param == 7), params[-1], 0.0) if n_param == 7 else 0.0
        T = lie.se3_exp(xi) @ base_T
        s = base_s * jnp.exp(ds)
        return s, T

    def residuals(params, base_T, base_s):
        s, T = apply(params, base_T, base_s)
        R = T[:3, :3]
        t = T[:3, 3]
        p1 = s * pc2 @ R.T + t
        e1 = (_project(p1, fx, fy, cx, cy) - uv1) * jnp.sqrt(inv_sigma2_1)[:, None]
        p2 = ((pc1 - t) @ R) / s
        e2 = (_project(p2, fx, fy, cx, cy) - uv2) * jnp.sqrt(inv_sigma2_2)[:, None]
        return jnp.concatenate([e1, e2], axis=1)  # [N,4]

    delta = jnp.sqrt(CHI2_SIM3)

    def lm_pass(base_T, base_s, active, use_huber):
        def body(state):
            T, s_, lam, it, done = state
            zero = jnp.zeros((n_param,))
            e = residuals(zero, T, s_)              # [N,4]
            J = jax.jacfwd(lambda p: residuals(p, T, s_))(zero)  # [N,4,P]
            r2 = jnp.sum(e * e, -1)
            if use_huber:
                nrm = jnp.sqrt(r2 + 1e-12)
                wr = jnp.minimum(1.0, delta / nrm)
            else:
                wr = jnp.ones_like(r2)
            w = active.astype(e.dtype) * wr
            H = jnp.einsum("nri,nrj,n->ij", J, J, w)
            g = jnp.einsum("nri,nr,n->i", J, e, w)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(n_param)
            step = -jnp.linalg.solve(Hd, g)
            s_new, T_new = apply(step, T, s_)

            def cost(Tc, sc):
                ec = residuals(jnp.zeros((n_param,)), Tc, sc)
                r2c = jnp.sum(ec * ec, -1)
                if use_huber:
                    src = jnp.sqrt(r2c + 1e-12)
                    rho = jnp.where(src <= delta, r2c, 2 * delta * src - delta * delta)
                else:
                    rho = r2c
                return jnp.sum(jnp.where(active, rho, 0.0))

            improved = cost(T_new, s_new) < cost(T, s_)
            T = jnp.where(improved, T_new, T)
            s_ = jnp.where(improved, s_new, s_)
            lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-8), jnp.minimum(lam * 4.0, 1e6))
            return T, s_, lam, it + 1, jnp.max(jnp.abs(step)) < 1e-8

        T, s_, _, _, _ = jax.lax.while_loop(
            lambda st: (st[3] < iters) & (~st[4]),
            body,
            (base_T, base_s, jnp.asarray(1e-4), jnp.asarray(0), jnp.asarray(False)),
        )
        return T, s_

    def classify(T, s_):
        e = residuals(jnp.zeros((n_param,)), T, s_)
        chi1 = jnp.sum(e[:, :2] ** 2, -1)
        chi2c = jnp.sum(e[:, 2:] ** 2, -1)
        return valid & (chi1 < CHI2_SIM3) & (chi2c < CHI2_SIM3)

    T1, s1 = lm_pass(T12_init, s12_init, valid, True)
    inl = classify(T1, s1)
    T2, s2 = lm_pass(T1, s1, inl, False)
    inl2 = classify(T2, s2)
    return s2, lie.orthonormalize(T2), inl2, jnp.sum(inl2.astype(jnp.int32))
