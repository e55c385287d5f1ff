"""Pallas TPU kernels for the local-BA Levenberg-Marquardt iteration.

Why a kernel: the LM accumulation builds many small-block tensors
([6,6]/[6,3]/[3,3] per observation). XLA's TPU layout assignment
materializes those with the block dims in the last two axes, which tile to
(8,128) with 20-40x padding waste — profiled at 12-14 ms per LM iteration
regardless of the einsum index order (see solvers/local_ba.py). Here every
intermediate is a [1, T] / [rows, T] vector with the point axis in lanes,
the per-block math is unrolled over explicit rows, and the accumulations
run on the MXU as lane-contraction dot_generals:

  pose gather        posesT [16,WF] @ one-hot [WF, T]       (per obs slot)
  Hpp / bp           dot(oh_win [wk,T], G [36|6, T])        (per obs slot)
  Schur reduction    dot(WH_k [wk*6, T], Wc_k [wk*6, T])    (k = 0..2)

Mosaic constraint honored throughout: no reshape ever merges the sublane
axis into lanes (only leading-dim reshapes and 2D dots are used).

The reference math is Optimizer::solveLocalBAPoseAndPoint's residuals and
analytic Jacobians (optimizer_ceres.cpp:316-444,583-699), identical to the
XLA path in solvers/local_ba.py (kept for CPU execution and as the
numerical oracle for the interpret-mode parity test).

Layout contract with the caller (all f32 unless noted):
  posesT   [16, WF]    poses.reshape(WF,16).T (row-major 4x4 rows)
  X        [3, L]      point coordinates
  slot     [O, L] i32  observer slot into kf_ids (-1 invalid)
  u, v     [O, L]      observed pixels
  ur       [O, L]      observed right coordinate (-1 mono)
  isig2    [O, L]      1/sigma^2 per observation
  act      [O, L]      1.0 where the observation participates
  povar    [O, L]      1.0 where the observer pose is a variable (slot<wk)
Outputs:
  Hpp [wk, 36], bp [wk, 6], S_red [wk*6, wk*6], rhs_red [wk*6, 1],
  cost [1, 1], Hinv [9, L] (damped-inverse point blocks), bl [3, L],
  Wc [wk, 18, L] (pose-point cross blocks)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHI2_MONO = 5.991
CHI2_STEREO = 7.815

_LANE_DOT = (((1,), (1,)), ((), ()))  # contract the lane axis of both sides


def _obs_rows(Tm, xb, yb, zb, u_o, v_o, ur_o, isig2, act, fx, fy, cx, cy, bf,
              use_huber, want_jacobians):
    """Residual rows, robust weight and (optionally) Jacobian rows for one
    observer slot. Everything is a [1, T] row vector."""
    R = [[Tm[0:1], Tm[1:2], Tm[2:3]],
         [Tm[4:5], Tm[5:6], Tm[6:7]],
         [Tm[8:9], Tm[9:10], Tm[10:11]]]
    t = [Tm[3:4], Tm[7:8], Tm[11:12]]
    pcx = R[0][0] * xb + R[0][1] * yb + R[0][2] * zb + t[0]
    pcy = R[1][0] * xb + R[1][1] * yb + R[1][2] * zb + t[1]
    pcz = R[2][0] * xb + R[2][1] * yb + R[2][2] * zb + t[2]
    safe_z = jnp.where(jnp.abs(pcz) < 1e-9, 1e-9, pcz)
    invz = 1.0 / safe_z
    uu = fx * pcx * invz + cx
    vv = fy * pcy * invz + cy
    stereo = ur_o >= 0
    e0 = uu - u_o
    e1 = vv - v_o
    e2 = jnp.where(stereo, (uu - bf * invz) - ur_o, 0.0)

    s2 = (e0 * e0 + e1 * e1 + e2 * e2) * isig2
    if use_huber:
        delta2 = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
        delta = jnp.sqrt(delta2)
        s = jnp.sqrt(s2 + 1e-12)
        wrob = jnp.minimum(1.0, delta / s)
        rho = jnp.where(s <= delta, s2, 2 * delta * s - delta2)
    else:
        wrob = jnp.ones_like(s2)
        rho = s2
    w = act * wrob
    cost_c = jnp.sum(act * rho)
    if not want_jacobians:
        return cost_c

    isig = jnp.sqrt(isig2)
    ew = [e0 * isig, e1 * isig, e2 * isig]
    invz2 = invz * invz
    zero = jnp.zeros_like(invz)
    st = stereo.astype(jnp.float32)
    du = [fx * invz, zero, -fx * pcx * invz2]
    dv = [zero, fy * invz, -fy * pcy * invz2]
    dur = [du[0] * st, zero, (du[2] + bf * invz2) * st]
    dproj = [du, dv, dur]
    one = jnp.ones_like(invz)
    dpc = [
        [one, zero, zero, zero, pcz, -pcy],
        [zero, one, zero, -pcz, zero, pcx],
        [zero, zero, one, pcy, -pcx, zero],
    ]
    Jp = [[isig * sum(dproj[r][b] * dpc[b][c] for b in range(3))
           for c in range(6)] for r in range(3)]
    Jl = [[isig * sum(dproj[r][b] * R[b][j] for b in range(3))
           for j in range(3)] for r in range(3)]
    return cost_c, w, ew, Jp, Jl


def _make_acc_kernel(WF, wk, O, T, use_huber):
    def kernel(lam_ref, cam_ref, posesT_ref, X_ref, slot_ref, u_ref, v_ref,
               ur_ref, isig_ref, act_ref, povar_ref,
               Hpp_ref, bp_ref, Sred_ref, rhs_ref, cost_ref,
               Hinv_ref, bl_ref, Wc_ref):
        lam = lam_ref[0, 0]
        fx, fy, cx, cy, bf = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2],
                              cam_ref[0, 3], cam_ref[0, 4])
        iota = jax.lax.broadcasted_iota(jnp.int32, (WF, T), 0)
        xb = X_ref[0:1, :]
        yb = X_ref[1:2, :]
        zb = X_ref[2:3, :]

        zrow = jnp.zeros((1, T), jnp.float32)
        hll = [[zrow for _ in range(3)] for _ in range(3)]
        bl = [zrow for _ in range(3)]
        Hpp_acc = jnp.zeros((wk, 36), jnp.float32)
        bp_acc = jnp.zeros((wk, 6), jnp.float32)
        Wc_acc = jnp.zeros((wk, 18, T), jnp.float32)
        cost_acc = jnp.zeros((), jnp.float32)

        for o in range(O):
            s_o = slot_ref[o:o + 1, :]
            oh = (iota == s_o).astype(jnp.float32)             # [WF, T]
            Tm = jnp.dot(posesT_ref[:], oh,
                         preferred_element_type=jnp.float32)    # [16, T]
            cost_c, w, ew, Jp, Jl = _obs_rows(
                Tm, xb, yb, zb, u_ref[o:o + 1, :], v_ref[o:o + 1, :],
                ur_ref[o:o + 1, :], isig_ref[o:o + 1, :], act_ref[o:o + 1, :],
                fx, fy, cx, cy, bf, use_huber, True,
            )
            cost_acc = cost_acc + cost_c
            for i in range(3):
                bl[i] = bl[i] + w * sum(Jl[r][i] * ew[r] for r in range(3))
                for j in range(i, 3):
                    hll[i][j] = hll[i][j] + w * sum(
                        Jl[r][i] * Jl[r][j] for r in range(3))

            ohw = oh[:wk] * povar_ref[o:o + 1, :]               # [wk, T]
            G = jnp.concatenate(
                [w * sum(Jp[r][i] * Jp[r][j] for r in range(3))
                 for i in range(6) for j in range(6)], axis=0)  # [36, T]
            Hpp_acc = Hpp_acc + jax.lax.dot_general(
                ohw, G, _LANE_DOT, preferred_element_type=jnp.float32)
            g6 = jnp.concatenate(
                [w * sum(Jp[r][i] * ew[r] for r in range(3))
                 for i in range(6)], axis=0)                    # [6, T]
            bp_acc = bp_acc + jax.lax.dot_general(
                ohw, g6, _LANE_DOT, preferred_element_type=jnp.float32)
            C = jnp.concatenate(
                [w * sum(Jp[r][i] * Jl[r][j] for r in range(3))
                 for i in range(6) for j in range(3)], axis=0)  # [18, T]
            Wc_acc = Wc_acc + ohw[:, None, :] * C[None, :, :]

        # symmetric completion + damped closed-form 3x3 inverse
        a = hll[0][0] + lam + 1e-8
        b_ = hll[0][1]
        c_ = hll[0][2]
        e_ = hll[1][1] + lam + 1e-8
        f_ = hll[1][2]
        i_ = hll[2][2] + lam + 1e-8
        A = e_ * i_ - f_ * f_
        B = -(b_ * i_ - f_ * c_)
        C3 = b_ * f_ - e_ * c_
        det = a * A + b_ * B + c_ * C3
        idet = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        hinv = [
            [A * idet, B * idet, C3 * idet],
            [B * idet, (a * i_ - c_ * c_) * idet, -(a * f_ - c_ * b_) * idet],
            [C3 * idet, -(a * f_ - b_ * c_) * idet, (a * e_ - b_ * b_) * idet],
        ]
        for i in range(3):
            for j in range(3):
                Hinv_ref[3 * i + j:3 * i + j + 1, :] = hinv[i][j]
            bl_ref[i:i + 1, :] = bl[i]
        Wc_ref[:] = Wc_acc

        # Schur reduction: WH_k = sum_j Wc[:,(i,j)] hinv[j][k]
        WcT = Wc_acc.reshape(wk * 6, 3, T)
        S_c = jnp.zeros((wk * 6, wk * 6), jnp.float32)
        rhs_c = jnp.zeros((wk * 6, 1), jnp.float32)
        # a [wk6,T]x[1,T] matvec lowers to an unsupported 1D multi_reduction;
        # dot against the zero-padded 8-row bl matrix and slice the column
        BL8 = jnp.concatenate(
            bl + [jnp.zeros((1, T), jnp.float32)] * 5, axis=0)   # [8, T]
        for k in range(3):
            WH_k = sum(WcT[:, j, :] * hinv[j][k] for j in range(3))  # [wk6,T]
            S_c = S_c + jax.lax.dot_general(
                WH_k, WcT[:, k, :], _LANE_DOT,
                preferred_element_type=jnp.float32)
            rhs_full = jax.lax.dot_general(
                WH_k, BL8, _LANE_DOT, preferred_element_type=jnp.float32)
            rhs_c = rhs_c + rhs_full[:, k:k + 1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            Hpp_ref[:] = Hpp_acc
            bp_ref[:] = bp_acc
            Sred_ref[:] = S_c
            rhs_ref[:] = rhs_c
            cost_ref[0, 0] = cost_acc

        @pl.when(pl.program_id(0) != 0)
        def _():
            Hpp_ref[:] = Hpp_ref[:] + Hpp_acc
            bp_ref[:] = bp_ref[:] + bp_acc
            Sred_ref[:] = Sred_ref[:] + S_c
            rhs_ref[:] = rhs_ref[:] + rhs_c
            cost_ref[0, 0] = cost_ref[0, 0] + cost_acc

    return kernel


def _make_cost_kernel(WF, O, T, use_huber):
    def kernel(cam_ref, posesT_ref, X_ref, slot_ref, u_ref, v_ref, ur_ref,
               isig_ref, act_ref, cost_ref):
        fx, fy, cx, cy, bf = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2],
                              cam_ref[0, 3], cam_ref[0, 4])
        iota = jax.lax.broadcasted_iota(jnp.int32, (WF, T), 0)
        xb = X_ref[0:1, :]
        yb = X_ref[1:2, :]
        zb = X_ref[2:3, :]
        cost_acc = jnp.zeros((), jnp.float32)
        for o in range(O):
            oh = (iota == slot_ref[o:o + 1, :]).astype(jnp.float32)
            Tm = jnp.dot(posesT_ref[:], oh,
                         preferred_element_type=jnp.float32)
            cost_acc = cost_acc + _obs_rows(
                Tm, xb, yb, zb, u_ref[o:o + 1, :], v_ref[o:o + 1, :],
                ur_ref[o:o + 1, :], isig_ref[o:o + 1, :], act_ref[o:o + 1, :],
                fx, fy, cx, cy, bf, use_huber, False,
            )

        @pl.when(pl.program_id(0) == 0)
        def _():
            cost_ref[0, 0] = cost_acc

        @pl.when(pl.program_id(0) != 0)
        def _():
            cost_ref[0, 0] = cost_ref[0, 0] + cost_acc

    return kernel


def _make_backsub_kernel(wk, T):
    def kernel(Wc_ref, Hinv_ref, bl_ref, dxp_ref, dxpt_ref):
        WcT = Wc_ref[:].reshape(wk * 6, 3, T)
        dxp = dxp_ref[:]                                     # [8, wk*6] (row 0 live)
        tmp = []
        for k in range(3):
            wt_k = jax.lax.dot_general(
                dxp, WcT[:, k, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [8, T]
            tmp.append(bl_ref[k:k + 1, :] + wt_k[0:1, :])
        for i in range(3):
            dxpt_ref[i:i + 1, :] = -sum(
                Hinv_ref[3 * i + j:3 * i + j + 1, :] * tmp[j]
                for j in range(3)
            )

    return kernel


def _tile(L):
    for t in (512, 256, 128):
        if L % t == 0:
            return t
    return L


@functools.partial(
    jax.jit,
    static_argnames=("WF", "wk", "O", "use_huber", "interpret"),
)
def ba_accumulate(
    lam, posesT, X, slot, u, v, ur, isig2, act, povar,
    fx, fy, cx, cy, bf,
    WF: int, wk: int, O: int, use_huber: bool, interpret: bool = False,
):
    """One LM iteration's normal-equation build + Schur reduction.

    Returns (Hpp [wk,36], bp [wk,6], S_red [wk6,wk6], rhs_red [wk6,1],
    cost [1,1], Hinv [9,L], bl [3,L], Wc [wk,18,L])."""
    L = X.shape[1]
    T = _tile(L)
    grid = L // T
    kern = _make_acc_kernel(WF, wk, O, T, use_huber)
    cam5 = jnp.stack([fx, fy, cx, cy, bf]).astype(jnp.float32).reshape(1, 5)
    row_spec = lambda r: pl.BlockSpec((r, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((wk, 36), jnp.float32),
        jax.ShapeDtypeStruct((wk, 6), jnp.float32),
        jax.ShapeDtypeStruct((wk * 6, wk * 6), jnp.float32),
        jax.ShapeDtypeStruct((wk * 6, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((9, L), jnp.float32),
        jax.ShapeDtypeStruct((3, L), jnp.float32),
        jax.ShapeDtypeStruct((wk, 18, L), jnp.float32),
    )
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 5), lambda i: (0, 0), memory_space=pltpu.SMEM),
            const_spec((16, WF)),
            row_spec(3),
            row_spec(O), row_spec(O), row_spec(O), row_spec(O),
            row_spec(O), row_spec(O), row_spec(O),
        ],
        out_specs=(
            const_spec((wk, 36)),
            const_spec((wk, 6)),
            const_spec((wk * 6, wk * 6)),
            const_spec((wk * 6, 1)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec(9),
            row_spec(3),
            pl.BlockSpec((wk, 18, T), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(lam.reshape(1, 1), cam5, posesT, X, slot, u, v, ur, isig2, act, povar)


@functools.partial(jax.jit, static_argnames=("WF", "O", "use_huber", "interpret"))
def ba_cost(
    posesT, X, slot, u, v, ur, isig2, act,
    fx, fy, cx, cy, bf,
    WF: int, O: int, use_huber: bool, interpret: bool = False,
):
    L = X.shape[1]
    T = _tile(L)
    kern = _make_cost_kernel(WF, O, T, use_huber)
    cam5 = jnp.stack([fx, fy, cx, cy, bf]).astype(jnp.float32).reshape(1, 5)
    row_spec = lambda r: pl.BlockSpec((r, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(L // T,),
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, WF), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row_spec(3),
            row_spec(O), row_spec(O), row_spec(O), row_spec(O),
            row_spec(O), row_spec(O),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(cam5, posesT, X, slot, u, v, ur, isig2, act)


@functools.partial(jax.jit, static_argnames=("wk", "interpret"))
def ba_backsub(Wc, Hinv, bl, dx_pose, wk: int, interpret: bool = False):
    """dx_pt [3,L] = -Hinv (bl + Wc^T dx_pose)."""
    L = bl.shape[1]
    T = _tile(L)
    kern = _make_backsub_kernel(wk, T)
    row_spec = lambda r: pl.BlockSpec((r, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(L // T,),
        in_specs=[
            pl.BlockSpec((wk, 18, T), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            row_spec(9),
            row_spec(3),
            pl.BlockSpec((8, wk * 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec(3),
        out_shape=jax.ShapeDtypeStruct((3, L), jnp.float32),
        interpret=interpret,
    )(
        Wc, Hinv, bl,
        jnp.zeros((8, wk * 6), jnp.float32).at[0].set(dx_pose.reshape(wk * 6)),
    )
