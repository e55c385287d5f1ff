"""Pose-only SE3 optimization (motion-only bundle adjustment).

Re-designs the reference's Ceres-based solver (reference:
optimizer_ceres.cpp:157-314) as one fixed-shape jitted program:

- batched residuals over the padded match set (mono 2-dof rows + virtual
  stereo 3-dof rows selected by mask), analytic Jacobians
  (the same math as PoseOnlySE3UV / PoseOnlyStereoSE3UVD,
  optimizer_ceres.cpp:62-154), per-octave invSigma weighting;
- Levenberg-Marquardt on the 6-dof left-multiplied twist
  (exp(delta) * T, like the reference's PoseLocalParameterization,
  optimizer_ceres.cpp:44-60) — the normal equations are a 6x6 solve, so the
  whole LM loop lives in one lax.while_loop with zero host sync;
- the reference's two-round structure: round 0 with Huber loss
  (sqrt(5.991) mono / sqrt(7.815) stereo), round 1 without; each round
  RESTARTS from the input pose (reference behavior: pose_backup memcpy,
  optimizer_ceres.cpp:213); after each round every candidate is re-classified
  by unweighted-chi2 gates 5.991 / 7.815 (optimizer_ceres.cpp:259-304), and
  outliers are excluded from the next round's residuals;
- early exit when inliers < 10 after a round (optimizer_ceres.cpp:306-307).

Returns (pose, outlier mask, inlier count) with a single host readback.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import lie

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseObs(NamedTuple):
    """Padded observation set for one frame."""

    p_world: jnp.ndarray    # [N, 3] f32 map point positions
    uv: jnp.ndarray         # [N, 2] f32 undistorted pixel observations
    u_right: jnp.ndarray    # [N] f32 virtual-stereo u; < 0 => mono
    inv_sigma2: jnp.ndarray  # [N] f32 1/scale^2 per observation octave
    valid: jnp.ndarray      # [N] bool


def _residuals_jac(T, obs: PoseObs, fx, fy, cx, cy, bf):
    """Residuals [N,3] (third row zeroed for mono) and Jacobians [N,3,6]
    w.r.t. the left-multiplied twist (rho, phi)."""
    pc = lie.transform_points(T[None], obs.p_world[None])[0]  # [N, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    invz = 1.0 / safe_z
    invz2 = invz * invz
    u = fx * x * invz + cx
    v = fy * y * invz + cy
    ur = u - bf * invz

    stereo = obs.u_right >= 0
    e = jnp.stack(
        [u - obs.uv[:, 0], v - obs.uv[:, 1], jnp.where(stereo, ur - obs.u_right, 0.0)],
        axis=-1,
    )

    # d proj / d pc
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * invz, zero, -fx * x * invz2], -1)            # [N,3]
    dv = jnp.stack([zero, fy * invz, -fy * y * invz2], -1)
    dur = du + jnp.stack([zero, zero, bf * invz2], -1)
    dproj = jnp.stack([du, dv, jnp.where(stereo[:, None], dur, 0.0)], -2)  # [N,3,3]

    # d pc / d twist = [I | -hat(pc)]
    dpc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3)), -lie.hat(pc)],
        axis=-1,
    )  # [N,3,6]
    J = dproj @ dpc  # [N,3,6]
    return e, J, stereo


def _solve_round(
    T0: jnp.ndarray,
    obs: PoseObs,
    active: jnp.ndarray,
    fx, fy, cx, cy, bf,
    use_huber: bool,
    max_iters: int = 10,
) -> jnp.ndarray:
    """One LM round from T0 over the active subset. Returns refined pose."""
    inv_sigma = jnp.sqrt(obs.inv_sigma2)
    delta_mono = jnp.sqrt(CHI2_MONO)
    delta_stereo = jnp.sqrt(CHI2_STEREO)

    def weighted(e, stereo):
        """Per-point robust IRLS weight on top of the sigma weighting."""
        wsig = inv_sigma[:, None]
        ew = e * wsig
        if not use_huber:
            return ew, jnp.ones(e.shape[0], e.dtype)
        norm = jnp.sqrt(jnp.sum(ew * ew, axis=-1) + 1e-12)
        delta = jnp.where(stereo, delta_stereo, delta_mono)
        w = jnp.minimum(1.0, delta / norm)
        return ew, w

    def cost_of(T):
        e, _, stereo = _residuals_jac(T, obs, fx, fy, cx, cy, bf)
        ew = e * inv_sigma[:, None]
        s2 = jnp.sum(ew * ew, axis=-1)
        if use_huber:
            delta = jnp.where(stereo, delta_stereo, delta_mono)
            s = jnp.sqrt(s2 + 1e-12)
            rho = jnp.where(s <= delta, s2, 2.0 * delta * s - delta * delta)
        else:
            rho = s2
        return jnp.sum(jnp.where(active, rho, 0.0))

    def body(state):
        T, lam, it, _ = state
        e, J, stereo = _residuals_jac(T, obs, fx, fy, cx, cy, bf)
        ew, w = weighted(e, stereo)
        Jw = J * inv_sigma[:, None, None]
        m = (active & True).astype(e.dtype) * w
        H = jnp.einsum("nri,nrj,n->ij", Jw, Jw, m)
        g = jnp.einsum("nri,nr,n->i", Jw, ew, m)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6, dtype=H.dtype)
        step = -jnp.linalg.solve(Hd, g)
        T_new = lie.se3_exp(step) @ T
        # old cost from the residuals already in hand (avoids a second
        # residual pass per iteration; the LM loop is latency-bound)
        s2_old = jnp.sum(ew * ew, axis=-1)
        if use_huber:
            delta = jnp.where(stereo, delta_stereo, delta_mono)
            s_old = jnp.sqrt(s2_old + 1e-12)
            rho_old = jnp.where(s_old <= delta, s2_old, 2.0 * delta * s_old - delta * delta)
        else:
            rho_old = s2_old
        c_old = jnp.sum(jnp.where(active, rho_old, 0.0))
        c_new = cost_of(T_new)
        improved = c_new < c_old
        T = jnp.where(improved, T_new, T)
        lam = jnp.where(improved, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 4.0, 1e6))
        done = jnp.max(jnp.abs(step)) < 1e-8
        return T, lam, it + 1, done

    def cond(state):
        _, _, it, done = state
        return (it < max_iters) & (~done)

    T, _, _, _ = jax.lax.while_loop(
        cond, body, (T0, jnp.asarray(1e-4, T0.dtype), jnp.asarray(0), jnp.asarray(False))
    )
    return T


def _solve_round_gn(
    T0: jnp.ndarray,
    obs: PoseObs,
    active: jnp.ndarray,
    fx, fy, cx, cy, bf,
    use_huber: bool,
    iters: int,
) -> jnp.ndarray:
    """Fixed-iteration damped Gauss-Newton round (the tracking fast path).

    The accept/reject LM machinery doubles the kernel count per iteration;
    with the motion-model / previous-round initialization the tracking
    solves sit well inside the convergence basin, so a short fixed GN with
    constant damping reaches the same fixed point. The chi2 classification
    after each round still rejects any residual misfits.
    """
    inv_sigma = jnp.sqrt(obs.inv_sigma2)
    delta_mono = jnp.sqrt(CHI2_MONO)
    delta_stereo = jnp.sqrt(CHI2_STEREO)

    def body(_, T):
        e, J, stereo = _residuals_jac(T, obs, fx, fy, cx, cy, bf)
        ew = e * inv_sigma[:, None]
        if use_huber:
            nrm = jnp.sqrt(jnp.sum(ew * ew, axis=-1) + 1e-12)
            delta = jnp.where(stereo, delta_stereo, delta_mono)
            w = jnp.minimum(1.0, delta / nrm)
        else:
            w = jnp.ones(e.shape[0], e.dtype)
        Jw = J * inv_sigma[:, None, None]
        m = active.astype(e.dtype) * w
        H = jnp.einsum("nri,nrj,n->ij", Jw, Jw, m)
        g = jnp.einsum("nri,nr,n->i", Jw, ew, m)
        Hd = H + 1e-4 * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6, dtype=H.dtype)
        step = -jnp.linalg.solve(Hd, g)
        # guard: a wild step (degenerate geometry) keeps the old pose
        ok = jnp.all(jnp.isfinite(step)) & (jnp.max(jnp.abs(step)) < 1.0)
        return jnp.where(ok, lie.se3_exp(step) @ T, T)

    return jax.lax.fori_loop(0, iters, body, T0)


def _classify(T, obs: PoseObs, fx, fy, cx, cy, bf) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """chi2 inlier classification (optimizer_ceres.cpp:259-304)."""
    e, _, stereo = _residuals_jac(T, obs, fx, fy, cx, cy, bf)
    e2 = jnp.sum(e[:, :2] ** 2, axis=-1)
    e2_st = e2 + e[:, 2] ** 2
    chi2 = jnp.where(stereo, e2_st, e2) * obs.inv_sigma2
    gate = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
    inlier = (chi2 < gate) & obs.valid
    return inlier, jnp.sum(inlier.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("max_iters", "fast"))
def solve_pose_only(
    T_init: jnp.ndarray,
    obs: PoseObs,
    fx, fy, cx, cy, bf,
    max_iters: int = 10,
    fast: bool = False,
):
    """Two-round robust pose-only solve.

    Returns (T, inlier_mask [N] bool, inlier_count i32). Matches the
    reference's control flow; the final pose is always written (the
    reference sets the pose even on failure and lets the caller gate on the
    inlier count, optimizer_ceres.cpp:311). ``fast=True`` swaps the LM
    rounds for fixed-iteration damped Gauss-Newton (see _solve_round_gn).
    """
    if fast:
        def rnd(T0, act, huber):
            return _solve_round_gn(T0, obs, act, fx, fy, cx, cy, bf, huber, 4)
    else:
        def rnd(T0, act, huber):
            return _solve_round(T0, obs, act, fx, fy, cx, cy, bf, huber, max_iters)

    active0 = obs.valid
    T1 = rnd(T_init, active0, True)
    inlier1, n1 = _classify(T1, obs, fx, fy, cx, cy, bf)

    def round2(_):
        T2 = rnd(T_init, inlier1, False)
        inlier2, n2 = _classify(T2, obs, fx, fy, cx, cy, bf)
        return T2, inlier2, n2

    def keep(_):
        return T1, inlier1, n1

    T_out, inlier_out, n_out = jax.lax.cond(n1 >= 10, round2, keep, None)
    # keep the pose on the SE3 manifold: without this, f32 drift compounds
    # exponentially through the motion-model inverse (see lie.orthonormalize)
    return lie.orthonormalize(T_out), inlier_out, n_out
