"""FAST-9/16 corner detection as a batched, fixed-shape XLA program.

The reference tiles each pyramid level into ~30 px cells and calls cv::FAST
per cell with a high threshold, retrying the cell at a low threshold when
empty (reference: ORBextractor.cpp:775-837). On TPU we invert the structure:
one dense score map over the whole padded level batch (VPU-friendly shifted
comparisons, no data-dependent control flow), 3x3 NMS, then a per-cell
two-threshold select and top-K compaction — all fixed shapes.

Score semantics match OpenCV's cornerScore<16>: the raw score V is the
largest threshold at which the pixel is still a corner; detection at
threshold t keeps V > t; the reported response is V - 1.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import PyramidSpec, level_valid_mask

# 16-point Bresenham circle of radius 3, OpenCV ordering (dx, dy),
# index 0 at 12 o'clock, clockwise.
CIRCLE16 = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)

CELL = 30  # reference cell size W (ORBextractor.cpp:775)
DETECT_BORDER = 16  # EDGE_THRESHOLD - 3: FAST runs inside this inset


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so out[y, x] = in[y + dy, x + dx] (wrap; borders masked later)."""
    return jnp.roll(x, shift=(-dy, -dx), axis=(-2, -1))


def fast_score(levels: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] f32 image(s) -> [..., H, W] f32 raw corner score V.

    V = max over the 32 contiguous 9-arcs (16 bright + 16 dark) of the
    minimum absolute center/ring difference inside the arc; 0 if the pixel
    is not a FAST-9 corner at threshold 0. Borders (radius 3) are invalid
    and must be masked by the caller.

    Computed in bf16: pixel values are integers in [0, 255] (the pyramid is
    u8-quantized), so differences/mins/maxes are EXACT in bf16 while the
    memory-bound 16-neighbor stack moves half the bytes.
    """
    center = levels.astype(jnp.bfloat16)
    neigh = jnp.stack([_shift2d(center, dy, dx) for (dx, dy) in CIRCLE16], axis=-1)
    d = center[..., None] - neigh  # > t everywhere on an arc => dark corner

    def window9_min(v):
        # cyclic windowed min over the last axis (16), window 9, via doubling
        w2 = jnp.minimum(v, jnp.roll(v, -1, axis=-1))
        w4 = jnp.minimum(w2, jnp.roll(w2, -2, axis=-1))
        w8 = jnp.minimum(w4, jnp.roll(w4, -4, axis=-1))
        return jnp.minimum(w8, jnp.roll(v, -8, axis=-1))

    dark = jnp.max(window9_min(d), axis=-1)
    bright = jnp.max(window9_min(-d), axis=-1)
    return jnp.maximum(jnp.maximum(dark, bright), 0.0).astype(jnp.float32)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep pixels strictly greater than all 8 neighbors (OpenCV FAST NMS)."""
    best = score
    keep = jnp.ones(score.shape, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            keep &= score > _shift2d(score, dy, dx)
    return keep


class CellCandidates(NamedTuple):
    """Fixed-shape per-cell top-K FAST candidates for the whole pyramid."""

    ys: jnp.ndarray      # [L, C, K] int32 level-image y
    xs: jnp.ndarray      # [L, C, K] int32 level-image x
    response: jnp.ndarray  # [L, C, K] f32 (V - 1, OpenCV response)
    valid: jnp.ndarray   # [L, C, K] bool


def cell_grid_shape(spec: PyramidSpec) -> Tuple[int, int]:
    h, w = spec.sizes[0]
    ncy = -(-(h - 2 * DETECT_BORDER) // CELL)
    ncx = -(-(w - 2 * DETECT_BORDER) // CELL)
    return ncy, ncx


@functools.partial(jax.jit, static_argnames=("spec", "top_k", "use_pallas"))
def detect_pyramid(
    levels: jnp.ndarray,
    spec: PyramidSpec,
    threshold_hi: float = 20.0,
    threshold_lo: float = 7.0,
    top_k: int = 8,
    use_pallas: bool = None,
) -> CellCandidates:
    """Dense FAST + NMS + per-cell two-threshold top-K over all levels.

    Returns padded candidate arrays; the host-side quadtree distributor
    (frontend/distribute.py) consumes them to pick the final per-level set.
    On TPU the score+NMS stage runs as the fused Pallas kernel
    (ops/fast_pallas.py, ~2.5x the XLA formulation); elsewhere the XLA path.
    """
    L = levels.shape[0]
    H, W = spec.sizes[0]
    if use_pallas is None:
        from .fast_pallas import TILE_H

        use_pallas = jax.default_backend() == "tpu" and H % TILE_H == 0

    valid = jnp.asarray(level_valid_mask(spec, border=DETECT_BORDER))
    if use_pallas:
        from .fast_pallas import fast_score_nms_pallas

        score_kept = jnp.where(valid, fast_score_nms_pallas(levels), 0.0)
        score_kept = jnp.where(score_kept > threshold_lo, score_kept, 0.0)
    else:
        score = fast_score(levels)
        # mask: inside each level's detection region (border 16, like the
        # reference's minBorder/maxBorder) — also kills the roll wraparound.
        score = jnp.where(valid, score, 0.0)
        # low-threshold corners, NMS on the low map (see module docstring)
        corner_lo = score > threshold_lo
        keep = nms3x3(score) & corner_lo
        score_kept = jnp.where(keep, score, 0.0)

    # cell decomposition over the detection region
    ncy, ncx = cell_grid_shape(spec)
    pad_y = DETECT_BORDER + ncy * CELL - H
    pad_x = DETECT_BORDER + ncx * CELL - W
    s = jnp.pad(score_kept, ((0, 0), (0, max(pad_y, 0)), (0, max(pad_x, 0))))
    s = s[:, DETECT_BORDER : DETECT_BORDER + ncy * CELL, DETECT_BORDER : DETECT_BORDER + ncx * CELL]
    cells = s.reshape(L, ncy, CELL, ncx, CELL).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(L, ncy * ncx, CELL * CELL)

    # two-threshold retry: if the cell has any high-threshold corner, only
    # those count; otherwise fall back to low-threshold corners.
    has_hi = jnp.any(cells > threshold_hi, axis=-1, keepdims=True)
    eligible = jnp.where(has_hi, jnp.where(cells > threshold_hi, cells, 0.0), cells)

    # top-K by K iterated argmaxes: lax.top_k lowers to a FULL SORT of the
    # 900-wide cell axis (measured 1.5 ms/frame on v5e); K=8 masked argmax
    # passes do the same selection (same first-index tie-break) in a few
    # cheap reduce+select sweeps
    iota = jnp.arange(eligible.shape[-1], dtype=jnp.int32)
    cur = eligible
    vals_l, idx_l = [], []
    for _ in range(top_k):
        i = jnp.argmax(cur, axis=-1).astype(jnp.int32)       # [L, C]
        v = jnp.max(cur, axis=-1)
        vals_l.append(v)
        idx_l.append(i)
        cur = jnp.where(iota[None, None, :] == i[..., None], -1.0, cur)
    vals = jnp.stack(vals_l, axis=-1)                         # [L, C, K]
    idx = jnp.stack(idx_l, axis=-1)
    cy = idx // CELL
    cx = idx % CELL
    cell_ids = jnp.arange(ncy * ncx, dtype=jnp.int32)
    base_y = DETECT_BORDER + (cell_ids // ncx) * CELL
    base_x = DETECT_BORDER + (cell_ids % ncx) * CELL
    ys = base_y[None, :, None] + cy
    xs = base_x[None, :, None] + cx
    return CellCandidates(
        ys=ys.astype(jnp.int32),
        xs=xs.astype(jnp.int32),
        response=jnp.maximum(vals - 1.0, 0.0),
        valid=vals > 0.0,
    )
