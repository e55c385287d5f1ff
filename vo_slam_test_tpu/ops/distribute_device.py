"""On-device quad-tree keypoint distribution (fixed-shape, scatter-free).

TPU re-formulation of ORB-SLAM2's DistributeOctTree (reference:
ORBextractor.cpp:545-769; host parity version: frontend/distribute.py).

Key observation: the reference expands *every* splittable node each round,
so after round d the live nodes are exactly the occupied cells of a regular
(nIni*2^d x 2^d) grid, plus every candidate that became alone in its cell at
some earlier depth (those nodes stop splitting). Therefore the whole
algorithm reduces to, per depth d:

  alone(d)[i]   — no other valid candidate shares i's cell
  best(d)[i]    — no valid candidate in i's cell beats i (response, then id)
  nodes_after(d) = #cells with >=2 candidates + #candidates alone at <=d

stop at the first depth where nodes_after >= target (or nothing is
splittable), then keep one best-response candidate per node.

TPU shape: a candidate's depth-d cell key is its depth-MAX key with the low
(MAX-d) bits of each coordinate dropped — floor(f*c*2^d) == floor(f*c*2^MAX)
>> (MAX-d). So ONE pairwise XOR matrix Z[i,j] of the packed deepest-level
keys answers same-cell at EVERY depth with a mask test ((Z & m_d) == 0),
and the per-depth stats are row-reductions over [M,M] — wide, fusable, and
entirely scatter/segment free (the earlier segment-sum formulation was ~7 ms
of small serialized scatters per frame; a vmapped variant was slower still).

Deviation from the reference (documented): the reference's finishing round
splits only the densest nodes until *exactly* target nodes exist; we split
the whole final depth and then cap to the target by response. Validated to
give equivalent tracking accuracy on synthetic sequences. Cell assignment
derives from the depth-7 f32 product, which can differ from per-depth
rounding by one cell for candidates within 1 ulp of a boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DEPTH = 7  # 4^7 cells >> any per-level target the reference uses


def distribute_level(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    resp: jnp.ndarray,
    valid: jnp.ndarray,
    bounds,            # (min_x, max_x, min_y, max_y), floats or traced
    target,            # int or traced scalar
    n_ini: int = 1,    # static root-cell count (round(w/h); 1 for 4:3)
) -> jnp.ndarray:
    """Returns a keep-mask [M] selecting <= target spatially distributed
    candidates (best response per quad-tree node)."""
    min_x, max_x, min_y, max_y = bounds
    w = max_x - min_x
    h = max_y - min_y
    M = xs.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)
    fx = (xs.astype(jnp.float32) - min_x) / w
    fy = (ys.astype(jnp.float32) - min_y) / h

    ncx = n_ini << MAX_DEPTH
    ncy = 1 << MAX_DEPTH
    cx = jnp.clip((fx * ncx).astype(jnp.int32), 0, ncx - 1)
    cy = jnp.clip((fy * ncy).astype(jnp.int32), 0, ncy - 1)
    # packed pairwise key difference: XOR acts per field (no carries)
    Z = ((cy[:, None] ^ cy[None, :]) << 16) | (cx[:, None] ^ cx[None, :])

    r = jnp.where(valid, resp, -jnp.inf)
    # j dominates i: higher response, ties to the lower index (matches the
    # segment_max + first-index selection of the reference formulation)
    better = valid[None, :] & (
        (r[None, :] > r[:, None])
        | ((r[None, :] == r[:, None]) & (idx[None, :] < idx[:, None]))
    )
    other = valid[None, :] & (idx[None, :] != idx[:, None])

    first_single = jnp.full((M,), MAX_DEPTH + 1, jnp.int32)
    live = []
    keep_rows = []
    shared_rows = []
    for d in range(MAX_DEPTH + 1):
        s = MAX_DEPTH - d
        hi = 0xFFFF & ~((1 << s) - 1)
        m_py = (hi << 16) | hi          # mask covering both packed fields
        m_d = jnp.int32(m_py - (1 << 32) if m_py >= (1 << 31) else m_py)
        same = (Z & m_d) == 0
        has_other = jnp.any(same & other, axis=1)   # cell count >= 2
        dominated = jnp.any(same & better, axis=1)
        best_here = valid & ~dominated
        alone = valid & ~has_other
        first_single = jnp.where(alone & (first_single > d), d, first_single)
        live.append(jnp.sum((best_here & has_other).astype(jnp.int32)))
        shared_rows.append(has_other)
        keep_rows.append(best_here)

    live_v = jnp.stack(live)  # [D+1]
    singles_cum = jnp.stack(
        [jnp.sum((valid & (first_single <= d)).astype(jnp.int32)) for d in range(MAX_DEPTH + 1)]
    )
    nodes_after = live_v + singles_cum
    reached = (nodes_after >= target) | (live_v == 0)
    # first depth satisfying the stop condition (argmax of bool finds first True)
    stop_d = jnp.argmax(reached).astype(jnp.int32)
    stop_d = jnp.where(jnp.any(reached), stop_d, MAX_DEPTH)

    keep_by_depth = jnp.stack(
        [
            (valid & (first_single <= d)) | (keep_rows[d] & shared_rows[d])
            for d in range(MAX_DEPTH + 1)
        ]
    )  # [D+1, M]
    keep = keep_by_depth[stop_d]

    # cap to target by response (see module docstring)
    r_kept = jnp.where(keep, resp, -jnp.inf)
    order = jnp.argsort(-r_kept)
    rank = jnp.empty_like(order).at[order].set(jnp.arange(M))
    return keep & (rank < target)
