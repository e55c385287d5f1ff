"""Fused masked-Hamming top-2 search kernel (Pallas, TPU).

The projection matchers (matcher.cpp:36-272 / :274-353 in the reference)
reduce on TPU to: build a geometric `allowed` mask over [M src, N tgt]
pairs, compute the 256-bit Hamming distance matrix, and take the best (and
second-best) target per source row. The XLA formulation materializes the
[M,N] i32 distance matrix plus several [M,N] gate masks in HBM and re-reads
them across the where/argmin/take passes — for the local-map search
(M=4096, N=1024) that is ~100 MB of HBM traffic per frame.

This kernel fuses gate construction, XOR+SWAR-popcount, masking, and the
top-2 reduction into one VMEM-resident pass: HBM sees only the rank-1
inputs (descriptors + per-row/per-column gate parameters, ~200 KB) and a
[M,4] result.

Layout discipline (the whole trick):
- per-ROW parameters are passed as [M,1] columns → a [TM,1] block
  broadcasts along lanes natively;
- per-COLUMN parameters as [C,N] rows → a [1,N] slice broadcasts along
  sublanes natively;
- target descriptors arrive pre-transposed [8,N] so each word slice is
  lane-oriented.
No transposes or sublane shuffles occur inside the kernel.

Gate semantics (superset of every projection-search call site):
    allowed[i,j] = row_ok[i] & col_ok[j]
                 & |col_u[j]-row_u[i]| < row_rw[i]
                 & |col_v[j]-row_v[i]| < row_rw[i]
                 & row_lo[i] <= col_oct[j] <= row_hi[i]
                 & (col_ur[j] <= 0 | |row_ur[i]-col_ur[j]| <= row_rur[i])
Call sites without a virtual-stereo check pass row_rur = +inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BIG = 1 << 20  # plain int: jnp constants must not be closure-captured by the kernel


def _popcount_u32(v):
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _make_kernel(chi2_gate: bool):
    def kernel(a_ref, bT_ref, rowf_ref, rowi_ref, colf_ref, coli_ref, out_ref):
        TM = a_ref.shape[0]
        N = bT_ref.shape[1]

        acc = jnp.zeros((TM, N), jnp.int32)
        for w in range(8):
            x = a_ref[:, w : w + 1] ^ bT_ref[w : w + 1, :]  # [TM,1]^[1,N] -> [TM,N]
            acc = acc + _popcount_u32(x)

        r_u = rowf_ref[:, 0:1]
        r_v = rowf_ref[:, 1:2]
        r_rw = rowf_ref[:, 2:3]
        r_ur = rowf_ref[:, 3:4]
        r_rur = rowf_ref[:, 4:5]
        r_lo = rowi_ref[:, 0:1]
        r_hi = rowi_ref[:, 1:2]
        r_ok = rowi_ref[:, 2:3] > 0

        c_u = colf_ref[0:1, :]
        c_v = colf_ref[1:2, :]
        c_ur = colf_ref[2:3, :]
        c_isig2 = colf_ref[3:4, :]
        c_oct = coli_ref[0:1, :]
        c_ok = coli_ref[1:2, :] > 0

        du = c_u - r_u
        dv = c_v - r_v
        allowed = (
            r_ok & c_ok
            & (jnp.abs(du) < r_rw)
            & (jnp.abs(dv) < r_rw)
            & (c_oct >= r_lo) & (c_oct <= r_hi)
        )
        if chi2_gate:
            # fuse-style per-pair chi2 reprojection gate (matcher.cpp:
            # 1080-1099): stereo keypoints (uRight >= 0) add the
            # right-coordinate error and use the 3-dof bound
            e2 = du * du + dv * dv
            dur = r_ur - c_ur
            # Mosaic can't select_n on i1 vectors (trunci i8->i1 unsupported),
            # so select f32 err/bound and compare once instead of selecting
            # between two boolean gates.
            stereo = c_ur >= 0.0
            err = jnp.where(stereo, e2 + dur * dur, e2)
            bound = jnp.where(stereo, 7.815, 5.991)
            allowed &= err * c_isig2 <= bound
        else:
            # virtual-stereo window gate (matcher.cpp:88-95); monocular
            # targets (uRight <= 0) pass unconditionally
            allowed &= (c_ur <= 0.0) | (jnp.abs(r_ur - c_ur) <= r_rur)
        D = jnp.where(allowed, acc, BIG)

        iota = jax.lax.broadcasted_iota(jnp.int32, (TM, N), 1)
        best_d = jnp.min(D, axis=1, keepdims=True)
        best_i = jnp.min(jnp.where(D == best_d, iota, N), axis=1, keepdims=True)
        D2 = jnp.where(iota == best_i, BIG, D)
        second_d = jnp.min(D2, axis=1, keepdims=True)
        second_i = jnp.min(jnp.where(D2 == second_d, iota, N), axis=1, keepdims=True)

        out_ref[:, 0:1] = best_i
        out_ref[:, 1:2] = best_d
        out_ref[:, 2:3] = second_i
        out_ref[:, 3:4] = second_d

    return kernel


@functools.partial(jax.jit, static_argnames=("chi2_gate", "interpret"))
def masked_top2_pallas(
    a_desc: jnp.ndarray,   # [M,8] uint32 source descriptors
    b_desc: jnp.ndarray,   # [N,8] uint32 target descriptors
    row_u: jnp.ndarray,    # [M] f32 projected u of each source
    row_v: jnp.ndarray,    # [M] f32
    row_rw: jnp.ndarray,   # [M] f32 window radius (already scale-expanded)
    row_ur: jnp.ndarray,   # [M] f32 predicted right-image u
    row_rur: jnp.ndarray,  # [M] f32 stereo tolerance (+inf disables)
    row_lo: jnp.ndarray,   # [M] i32 lowest allowed target octave
    row_hi: jnp.ndarray,   # [M] i32 highest allowed target octave
    row_ok: jnp.ndarray,   # [M] bool
    col_u: jnp.ndarray,    # [N] f32 target keypoint u
    col_v: jnp.ndarray,    # [N] f32
    col_ur: jnp.ndarray,   # [N] f32 target uRight (<=0: monocular)
    col_oct: jnp.ndarray,  # [N] i32 target octave
    col_ok: jnp.ndarray,   # [N] bool
    col_isig2: jnp.ndarray | None = None,  # [N] f32 1/sigma2 (chi2 mode)
    chi2_gate: bool = False,
    interpret: bool = False,
):
    """Returns (best_i, best_d, second_i, second_d), each [M] i32.

    best_d == 1<<20 marks a row with no allowed pair (the caller's
    `<= threshold` gate rejects it, matching the XLA argmin-on-BIG path).
    Tie-breaking picks the lowest target index, same as jnp.argmin.
    chi2_gate=True swaps the stereo-window gate for the fuse-style per-pair
    chi2 reprojection bound (needs col_isig2; col_ur >= 0 marks stereo).
    """
    M = a_desc.shape[0]
    N = b_desc.shape[0]
    TM = 256 if M % 256 == 0 else 128
    assert M % TM == 0 and N % 128 == 0, (M, N)
    if col_isig2 is None:
        col_isig2 = jnp.zeros((N,), jnp.float32)

    rowf = jnp.stack(
        [row_u, row_v, row_rw, row_ur, row_rur], axis=1
    ).astype(jnp.float32)                                     # [M,5]
    rowi = jnp.stack(
        [row_lo, row_hi, row_ok.astype(jnp.int32)], axis=1
    ).astype(jnp.int32)                                       # [M,3]
    colf = jnp.stack(
        [col_u, col_v, col_ur, col_isig2], axis=0
    ).astype(jnp.float32)                                      # [4,N]
    coli = jnp.stack(
        [col_oct.astype(jnp.int32), col_ok.astype(jnp.int32)], axis=0
    )                                                          # [2,N]
    bT = b_desc.T                                              # [8,N]

    grid = (M // TM,)
    out = pl.pallas_call(
        _make_kernel(chi2_gate),
        out_shape=jax.ShapeDtypeStruct((M, 4), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, N), lambda i: (0, 0)),
            pl.BlockSpec((TM, 5), lambda i: (i, 0)),
            pl.BlockSpec((TM, 3), lambda i: (i, 0)),
            pl.BlockSpec((4, N), lambda i: (0, 0)),
            pl.BlockSpec((2, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, 4), lambda i: (i, 0)),
        interpret=interpret,
    )(a_desc, bT, rowf, rowi, colf, coli)
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3]


def masked_top2_xla(
    a_desc, b_desc, row_u, row_v, row_rw, row_ur, row_rur,
    row_lo, row_hi, row_ok, col_u, col_v, col_ur, col_oct, col_ok,
    col_isig2=None, chi2_gate: bool = False,
):
    """Reference XLA formulation (materialized [M,N]) — numerical oracle
    for the kernel and the production path off-TPU."""
    from . import hamming

    du = col_u[None, :] - row_u[:, None]
    dv = col_v[None, :] - row_v[:, None]
    allowed = (
        row_ok[:, None] & col_ok[None, :]
        & (jnp.abs(du) < row_rw[:, None])
        & (jnp.abs(dv) < row_rw[:, None])
        & (col_oct[None, :] >= row_lo[:, None])
        & (col_oct[None, :] <= row_hi[:, None])
    )
    if chi2_gate:
        e2 = du * du + dv * dv
        dur = row_ur[:, None] - col_ur[None, :]
        e2s = e2 + dur * dur
        allowed &= jnp.where(
            col_ur[None, :] >= 0.0,
            e2s * col_isig2[None, :] <= 7.815,
            e2 * col_isig2[None, :] <= 5.991,
        )
    else:
        allowed &= (col_ur[None, :] <= 0.0) | (
            jnp.abs(row_ur[:, None] - col_ur[None, :]) <= row_rur[:, None]
        )
    D = jnp.where(allowed, hamming.distance_matrix(a_desc, b_desc), BIG)
    best = jnp.argmin(D, axis=1).astype(jnp.int32)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    D2 = D.at[jnp.arange(D.shape[0]), best].set(BIG)
    second = jnp.argmin(D2, axis=1).astype(jnp.int32)
    second_d = jnp.take_along_axis(D2, second[:, None], axis=1)[:, 0]
    return best, best_d, second, second_d


def masked_top2(*args, **kwargs):
    """Platform dispatch: Pallas on TPU (128-aligned shapes), XLA elsewhere."""
    M, N = args[0].shape[0], args[1].shape[0]
    if jax.default_backend() == "tpu" and M % 128 == 0 and N % 128 == 0:
        return masked_top2_pallas(*args, **kwargs)
    return masked_top2_xla(*args, **kwargs)


@functools.partial(jax.jit, static_argnames=("chi2_gate", "interpret"))
def masked_top2_nb_pallas(
    a_desc: jnp.ndarray,   # [B,M,8] uint32 source descriptors per neighbor
    b_desc: jnp.ndarray,   # [B,N,8] uint32 target descriptors per neighbor
    row_u, row_v, row_rw, row_ur, row_rur,   # [B,M] f32
    row_lo, row_hi,                           # [B,M] i32
    row_ok,                                   # [B,M] bool
    col_u, col_v, col_ur,                     # [B,N] f32
    col_oct,                                  # [B,N] i32
    col_ok,                                   # [B,N] bool
    col_isig2: jnp.ndarray | None = None,     # [B,N] f32
    chi2_gate: bool = False,
    interpret: bool = False,
):
    """Neighbor-batched masked_top2: B independent [M,N] searches in ONE
    kernel dispatch (the two-hop fuse runs 16 of them per keyframe; a
    lax.fori_loop of per-neighbor calls paid ~20 ms/KF of map-state copies
    through the loop-carried cond, measured round 4).

    The kernel body is the SAME as masked_top2_pallas — the neighbor axis
    folds into the grid, and the column-side BlockSpec index maps select
    each neighbor's column block (i // row_blocks)."""
    B, M = a_desc.shape[:2]
    N = b_desc.shape[1]
    TM = 256 if M % 256 == 0 else 128
    assert M % TM == 0 and N % 128 == 0, (B, M, N)
    if col_isig2 is None:
        col_isig2 = jnp.zeros((B, N), jnp.float32)

    rowf = jnp.stack(
        [row_u, row_v, row_rw, row_ur, row_rur], axis=2
    ).astype(jnp.float32).reshape(B * M, 5)
    rowi = jnp.stack(
        [row_lo, row_hi, row_ok.astype(jnp.int32)], axis=2
    ).astype(jnp.int32).reshape(B * M, 3)
    # column-parameter planes pad to 8 sublanes: a (4,N)/(2,N) block is
    # only legal when it equals the whole array (single-neighbor call);
    # per-neighbor blocks must be sublane-divisible for Mosaic
    zf = jnp.zeros((B, 4, N), jnp.float32)
    colf = jnp.concatenate(
        [jnp.stack([col_u, col_v, col_ur, col_isig2], axis=1
                   ).astype(jnp.float32), zf], axis=1
    ).reshape(B * 8, N)
    zi = jnp.zeros((B, 6, N), jnp.int32)
    coli = jnp.concatenate(
        [jnp.stack([col_oct.astype(jnp.int32), col_ok.astype(jnp.int32)],
                   axis=1), zi], axis=1
    ).reshape(B * 8, N)
    bT = jnp.swapaxes(b_desc, 1, 2).reshape(B * 8, N)
    a = a_desc.reshape(B * M, 8)

    RB = M // TM
    grid = (B * RB,)
    out = pl.pallas_call(
        _make_kernel(chi2_gate),
        out_shape=jax.ShapeDtypeStruct((B * M, 4), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, N), lambda i: (i // RB, 0)),
            pl.BlockSpec((TM, 5), lambda i: (i, 0)),
            pl.BlockSpec((TM, 3), lambda i: (i, 0)),
            pl.BlockSpec((8, N), lambda i: (i // RB, 0)),
            pl.BlockSpec((8, N), lambda i: (i // RB, 0)),
        ],
        out_specs=pl.BlockSpec((TM, 4), lambda i: (i, 0)),
        interpret=interpret,
    )(a, bT, rowf, rowi, colf, coli)
    out = out.reshape(B, M, 4)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]


def masked_top2_nb(*args, **kwargs):
    """Platform dispatch for the neighbor-batched search: Pallas on TPU,
    vmapped XLA oracle elsewhere."""
    B, M = args[0].shape[:2]
    N = args[1].shape[1]
    if jax.default_backend() == "tpu" and M % 128 == 0 and N % 128 == 0:
        return masked_top2_nb_pallas(*args, **kwargs)
    chi2_gate = kwargs.pop("chi2_gate", False)
    kwargs.pop("interpret", None)
    isig2 = kwargs.pop("col_isig2", None)
    assert not kwargs, kwargs
    if isig2 is None:
        return jax.vmap(
            lambda *a: masked_top2_xla(*a, chi2_gate=chi2_gate)
        )(*args)
    return jax.vmap(
        lambda *a: masked_top2_xla(
            *a[:-1], col_isig2=a[-1], chi2_gate=chi2_gate)
    )(*args, isig2)


# ---------------------------------------------------------------------------
# Epipolar-gated top-1 (searchForTriangulation, matcher.cpp:867-1010)
#
# The triangulation search gates each (kp1, kp2) pair on the distance of kp2
# to kp1's epipolar line l = [lx,ly,lz] in image 2 (matcher.cpp:1306-1324):
#     (lx*u2 + ly*v2 + lz)^2 / (lx^2+ly^2) < 3.84 * sigma2(oct2)
# which is rank-1 separable in PRODUCT form:
#     num^2 < den_row * thr_col.
# (The division form is only defined via a max(den, eps) clamp; the product
# form treats a degenerate zero line as "no match", identical in practice —
# both sides use the product form so kernel and oracle agree bit-exactly.)
# Plus the BoW featVec bucket gate (g1 == g2, unknown words escape) and the
# mono-pair epipole-proximity rejection (matcher.cpp:924-934).
# ---------------------------------------------------------------------------


def _make_epi_kernel():
    def kernel(a_ref, bT_ref, rowf_ref, rowi_ref, colf_ref, coli_ref, out_ref):
        TM = a_ref.shape[0]
        N = bT_ref.shape[1]

        acc = jnp.zeros((TM, N), jnp.int32)
        for w in range(8):
            x = a_ref[:, w : w + 1] ^ bT_ref[w : w + 1, :]
            acc = acc + _popcount_u32(x)

        r_lx = rowf_ref[:, 0:1]
        r_ly = rowf_ref[:, 1:2]
        r_lz = rowf_ref[:, 2:3]
        r_den = rowf_ref[:, 3:4]
        r_g = rowi_ref[:, 0:1]
        r_ok = rowi_ref[:, 1:2] > 0
        r_mono = rowi_ref[:, 2:3] > 0

        c_u = colf_ref[0:1, :]
        c_v = colf_ref[1:2, :]
        c_thr = colf_ref[2:3, :]
        c_g = coli_ref[0:1, :]
        c_ok = coli_ref[1:2, :] > 0
        c_flag = coli_ref[2:3, :] > 0  # mono2 & epipole-close

        num = r_lx * c_u + r_ly * c_v + r_lz
        allowed = (
            r_ok & c_ok
            & (num * num < r_den * c_thr)
            & ((r_g == c_g) | (r_g < 0) | (c_g < 0))
            & ~(r_mono & c_flag)
        )
        D = jnp.where(allowed, acc, BIG)

        iota = jax.lax.broadcasted_iota(jnp.int32, (TM, N), 1)
        best_d = jnp.min(D, axis=1, keepdims=True)
        best_i = jnp.min(jnp.where(D == best_d, iota, N), axis=1, keepdims=True)
        out_ref[:, 0:1] = best_i
        out_ref[:, 1:2] = best_d
        # top-1 kernel: pad the shared [M,4] output layout with duplicates
        out_ref[:, 2:3] = best_i
        out_ref[:, 3:4] = best_d

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_top1_epi_pallas(
    a_desc: jnp.ndarray,   # [M,8] uint32 kp1 descriptors
    b_desc: jnp.ndarray,   # [N,8] uint32 kp2 descriptors
    row_l: jnp.ndarray,    # [M,3] epipolar line of kp1 in image 2
    row_den: jnp.ndarray,  # [M] lx^2 + ly^2
    row_g: jnp.ndarray,    # [M] i32 featVec bucket (-1 unknown)
    row_ok: jnp.ndarray,   # [M] bool (unmatched + valid)
    row_mono: jnp.ndarray,  # [M] bool (uRight < 0)
    col_u: jnp.ndarray,    # [N] f32
    col_v: jnp.ndarray,    # [N] f32
    col_thr: jnp.ndarray,  # [N] f32 3.84 * sigma2(oct2)
    col_g: jnp.ndarray,    # [N] i32
    col_ok: jnp.ndarray,   # [N] bool
    col_flag: jnp.ndarray,  # [N] bool (mono2 & epipole-close)
    interpret: bool = False,
):
    """Returns (best_i, best_d), each [M] i32 (BIG marks no allowed pair)."""
    M = a_desc.shape[0]
    N = b_desc.shape[0]
    TM = 256 if M % 256 == 0 else 128
    assert M % TM == 0 and N % 128 == 0, (M, N)

    rowf = jnp.concatenate(
        [row_l.astype(jnp.float32), row_den[:, None].astype(jnp.float32)], axis=1
    )                                                          # [M,4]
    rowi = jnp.stack(
        [row_g.astype(jnp.int32), row_ok.astype(jnp.int32),
         row_mono.astype(jnp.int32)], axis=1
    )                                                          # [M,3]
    colf = jnp.stack([col_u, col_v, col_thr], axis=0).astype(jnp.float32)
    coli = jnp.stack(
        [col_g.astype(jnp.int32), col_ok.astype(jnp.int32),
         col_flag.astype(jnp.int32)], axis=0
    )
    bT = b_desc.T

    out = pl.pallas_call(
        _make_epi_kernel(),
        out_shape=jax.ShapeDtypeStruct((M, 4), jnp.int32),
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, N), lambda i: (0, 0)),
            pl.BlockSpec((TM, 4), lambda i: (i, 0)),
            pl.BlockSpec((TM, 3), lambda i: (i, 0)),
            pl.BlockSpec((3, N), lambda i: (0, 0)),
            pl.BlockSpec((3, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, 4), lambda i: (i, 0)),
        interpret=interpret,
    )(a_desc, bT, rowf, rowi, colf, coli)
    return out[:, 0], out[:, 1]


def masked_top1_epi_xla(
    a_desc, b_desc, row_l, row_den, row_g, row_ok, row_mono,
    col_u, col_v, col_thr, col_g, col_ok, col_flag,
):
    """Materialized-[M,N] oracle / off-TPU path (same product-form gate)."""
    from . import hamming

    num = (
        row_l[:, 0:1] * col_u[None, :]
        + row_l[:, 1:2] * col_v[None, :]
        + row_l[:, 2:3]
    )
    allowed = (
        row_ok[:, None] & col_ok[None, :]
        & (num * num < row_den[:, None] * col_thr[None, :])
        & ((row_g[:, None] == col_g[None, :])
           | (row_g < 0)[:, None] | (col_g < 0)[None, :])
        & ~(row_mono[:, None] & col_flag[None, :])
    )
    D = jnp.where(allowed, hamming.distance_matrix(a_desc, b_desc), BIG)
    best = jnp.argmin(D, axis=1).astype(jnp.int32)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    return best, best_d


def masked_top1_epi(*args, **kwargs):
    """Platform dispatch: Pallas on TPU (128-aligned shapes), XLA elsewhere."""
    M, N = args[0].shape[0], args[1].shape[0]
    if jax.default_backend() == "tpu" and M % 128 == 0 and N % 128 == 0:
        return masked_top1_epi_pallas(*args, **kwargs)
    return masked_top1_epi_xla(*args, **kwargs)
