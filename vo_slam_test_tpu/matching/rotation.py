"""Rotation-consistency filter shared by the matchers.

Reference: matcher.cpp builds a 30-bin histogram of keypoint angle
differences and keeps only matches in the top-3 bins, dropping bins 2/3 when
they hold < 0.1x the best bin's votes (matcher.cpp:1258-1304, `pdf` binning
matcher.cpp:14,116-121).

TPU form: one-hot scatter-add for the histogram, a top-3 reduction, and a
per-match keep mask — no per-bin lists.
"""

from __future__ import annotations

import jax.numpy as jnp

HISTO_LENGTH = 30
_PDF = HISTO_LENGTH / 360.0


def rotation_bins(angle_a: jnp.ndarray, angle_b: jnp.ndarray) -> jnp.ndarray:
    """Histogram bin of each match's angle difference (cvRound semantics)."""
    rot = angle_a - angle_b
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    b = jnp.rint(rot * _PDF).astype(jnp.int32)
    return jnp.where(b == HISTO_LENGTH, 0, b)


def rotation_consistency_mask(bins: jnp.ndarray, matched: jnp.ndarray) -> jnp.ndarray:
    """matched: [N] bool; returns keep mask restricted to the top-3 bins."""
    onehot = (bins[:, None] == jnp.arange(HISTO_LENGTH)[None, :]) & matched[:, None]
    counts = jnp.sum(onehot.astype(jnp.int32), axis=0)  # [30]
    top3 = jnp.sort(counts)[-3:][::-1]  # c1 >= c2 >= c3
    c1, c2, c3 = top3[0], top3[1], top3[2]
    # drop bins 2/3 when under 10% of the best (matcher.cpp:1295-1303)
    keep2 = c2.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
    keep3 = c3.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
    thresh = jnp.where(keep3, c3, jnp.where(keep2, c2, c1))
    bin_kept = counts >= jnp.maximum(thresh, 1)
    # ties can admit >3 bins; restrict to the 3 largest by count like the
    # reference's explicit ind1/2/3 selection
    order = jnp.argsort(-counts)
    rank = jnp.empty_like(order).at[order].set(jnp.arange(HISTO_LENGTH))
    bin_kept &= rank < 3
    return matched & bin_kept[bins]
