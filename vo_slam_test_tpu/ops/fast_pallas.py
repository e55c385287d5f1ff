"""Fused FAST-9/16 score + NMS as a Pallas TPU kernel.

The XLA formulation (ops/fast.py) materializes a [L,H,W,16] neighbor stack —
~1.5 GB of HBM traffic per frame across its fusions, the second-largest cost
in the extraction profile. This kernel runs the whole computation in one
VMEM pass: each program DMAs a row-tile (with a 4-row halo) of one pyramid
level, computes the 16 ring differences, the cyclic 9-window minima, the
corner score and the 3x3 non-max suppression entirely on-chip, and writes
one [TILE_H, W] block of NMS-kept scores.

Semantics are identical to fast.fast_score + fast.nms3x3; parity is tested
in tests/test_fast_pallas.py (f32 in-kernel: Mosaic's lane rotate needs
32-bit data, and the data never leaves VMEM so the width costs nothing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE16

TILE_H = 40   # output rows per program
HALO = 4      # 3 (FAST radius) + 1 (NMS)


def _score_rows(tile: jnp.ndarray) -> jnp.ndarray:
    """tile: [TILE_H + 2, W + 8] bf16 (one extra ring of 3+1 rows handled by
    the caller slicing) -> FAST raw score V for the interior rows.

    The caller passes rows [y-3 .. y+TILE+3] and columns padded by 4; here
    we slice statically so every shifted view stays in registers/VMEM.
    """
    # tile has TILE_H + 2*3 rows and W + 2*4 cols of valid context
    H = tile.shape[0] - 6
    W = tile.shape[1] - 8
    center = tile[3 : 3 + H, 4 : 4 + W]
    ds = []
    for (dx, dy) in CIRCLE16:
        nb = tile[3 + dy : 3 + dy + H, 4 + dx : 4 + dx + W]
        ds.append(center - nb)

    def win9_min(v):
        w2 = [jnp.minimum(v[i], v[(i + 1) % 16]) for i in range(16)]
        w4 = [jnp.minimum(w2[i], w2[(i + 2) % 16]) for i in range(16)]
        w8 = [jnp.minimum(w4[i], w4[(i + 4) % 16]) for i in range(16)]
        return [jnp.minimum(w8[i], v[(i + 8) % 16]) for i in range(16)]

    dark = win9_min(ds)
    bright = win9_min([-d for d in ds])
    m = dark[0]
    for w in dark[1:] + bright:
        m = jnp.maximum(m, w)
    zero = jnp.zeros_like(m)
    return jnp.maximum(m, zero)


def _kernel_raw(levels_ref, out_ref, tile_ref, sem):
    """Raw dense scores, no NMS — the cell-local NMS (reference cv::FAST
    window semantics, fast.py round 5) runs in XLA on this output."""
    _kernel_common(levels_ref, out_ref, tile_ref, sem, with_nms=False)


def _kernel(levels_ref, out_ref, tile_ref, sem):
    _kernel_common(levels_ref, out_ref, tile_ref, sem, with_nms=True)


def _kernel_common(levels_ref, out_ref, tile_ref, sem, with_nms):
    li = pl.program_id(0)
    ti = pl.program_id(1)
    # DMA the tile + halo from HBM into VMEM scratch
    row0 = ti * TILE_H
    copy = pltpu.make_async_copy(
        levels_ref.at[li, pl.ds(row0, TILE_H + 2 * HALO), :],
        tile_ref,
        sem,
    )
    copy.start()
    copy.wait()

    t = tile_ref[:]  # f32: Mosaic lane-rotate requires 32-bit data
    # x-shifts via lane roll (wrap garbage lives in the 16 px border the
    # caller masks anyway); y-shifts via static sublane slices of the halo
    TH2 = TILE_H + 2  # score rows (NMS needs +-1)

    def shifted(dy, dx):
        # output score row -1 lives at tile row HALO-1=3; offset by dy
        rows = t[(dy + 3) : (dy + 3) + TH2, :]
        W = rows.shape[1]
        return pltpu.roll(rows, shift=(-dx) % W, axis=1)

    center = shifted(0, 0)
    ds = [center - shifted(dy, dx) for (dx, dy) in CIRCLE16]

    def win9_min(v):
        w2 = [jnp.minimum(v[i], v[(i + 1) % 16]) for i in range(16)]
        w4 = [jnp.minimum(w2[i], w2[(i + 2) % 16]) for i in range(16)]
        w8 = [jnp.minimum(w4[i], w4[(i + 4) % 16]) for i in range(16)]
        return [jnp.minimum(w8[i], v[(i + 8) % 16]) for i in range(16)]

    dark = win9_min(ds)
    bright = win9_min([-d for d in ds])
    m = dark[0]
    for w in dark[1:] + bright:
        m = jnp.maximum(m, w)
    s = jnp.maximum(m, jnp.zeros_like(m))  # [TILE_H + 2, W]

    inner = s[1:-1, :]
    if not with_nms:
        out_ref[0, :, :] = inner.astype(jnp.float32)
        return
    keep = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = pltpu.roll(
                s[1 + dy : 1 + dy + TILE_H, :], shift=(-dx) % s.shape[1], axis=1
            )
            k = inner > nb
            keep = k if keep is None else (keep & k)
    out = jnp.where(keep, inner, jnp.zeros_like(inner))
    out_ref[0, :, :] = out.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "with_nms"))
def fast_score_nms_pallas(
    levels: jnp.ndarray, interpret: bool = False, with_nms: bool = True
) -> jnp.ndarray:
    """[L, H, W] f32 pyramid batch -> [L, H, W] f32 FAST scores.

    with_nms=True matches jnp.where(nms3x3(fast_score(x)), fast_score(x), 0)
    away from the image borders (first/last 4 rows/cols are zeroed; callers
    mask a 16 px border anyway). with_nms=False returns the raw score map
    for the reference-faithful cell-local NMS in fast.detect_pyramid.
    """
    L, H, W = levels.shape
    n_tiles = H // TILE_H  # H=480, TILE_H=40 -> 12
    assert H % TILE_H == 0, (H, TILE_H)

    # pad rows so every tile can fetch its halo
    padded = jnp.pad(levels, ((0, 0), (HALO, HALO), (0, 0)))

    out = pl.pallas_call(
        _kernel if with_nms else _kernel_raw,
        out_shape=jax.ShapeDtypeStruct((L, H, W), jnp.float32),
        grid=(L, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, W), lambda li, ti: (li, ti, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * HALO, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out
