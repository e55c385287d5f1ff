"""BoW scoring and candidate retrieval over the dense keyframe set.

The reference keeps an inverted index word->keyframes and walks it per query
(map.h:21, map.cpp:101-333). On TPU the index is unnecessary: scoring a
query against EVERY keyframe is one [K,N] searchsorted + masked reductions —
the dense scan costs less than the pointer walk it replaces.

Formulas match Map::score's L1 metric (map.cpp:335-376):
    s = sum over shared words of (|v1| + |v2| - |v1 - v2|) / 2
with L1-normalized tf-idf BoW vectors, and the relocalization candidate
cascade (shared-word counting, 0.8*max cut, covisible-group score
accumulation, 0.75*best-group cut; map.cpp:101-208).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

PAD_WORD = jnp.int32(1 << 30)  # sort-to-the-end sentinel for word arrays


def bow_vector(words: jnp.ndarray, idf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-keypoint word ids [N] (-1 invalid) -> (sorted unique words [N]
    padded with PAD_WORD, L1-normalized tf-idf weights [N])."""
    N = words.shape[0]
    w = jnp.where(words >= 0, words, PAD_WORD)
    sw = jnp.sort(w)
    valid = sw < PAD_WORD
    first = jnp.concatenate([jnp.ones((1,), bool), sw[1:] != sw[:-1]]) & valid
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(valid, gid, N)
    contrib = jnp.where(valid, idf[jnp.clip(sw, 0, idf.shape[0] - 1)], 0.0)
    sums = jax.ops.segment_sum(contrib, seg, num_segments=N + 1)[:N]
    uniq = jnp.full((N + 1,), PAD_WORD, jnp.int32).at[seg].min(sw)[:N]
    total = jnp.maximum(jnp.sum(contrib), 1e-12)
    return uniq, sums / total


def scores_vs_keyframes(
    uniq_q: jnp.ndarray, wgt_q: jnp.ndarray,
    kf_bow_word: jnp.ndarray, kf_bow_weight: jnp.ndarray,
    kf_valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (L1 scores [K], shared-word counts [K]) of the query vs every KF."""
    N = uniq_q.shape[0]
    pos = jnp.clip(jnp.searchsorted(uniq_q, kf_bow_word), 0, N - 1)
    hit = (uniq_q[pos] == kf_bow_word) & (kf_bow_word < PAD_WORD)
    vq = jnp.where(hit, wgt_q[pos], 0.0)
    vk = jnp.where(hit, kf_bow_weight, 0.0)
    term = 0.5 * (jnp.abs(vq) + jnp.abs(vk) - jnp.abs(vq - vk))
    score = jnp.sum(term, axis=1) * kf_valid
    shared = jnp.sum(hit.astype(jnp.int32), axis=1) * kf_valid.astype(jnp.int32)
    return score, shared


def _top10_covisibles(covis: jnp.ndarray, kf_valid: jnp.ndarray) -> jnp.ndarray:
    """[K,10] neighbor indices (self-padded when fewer)."""
    w = jnp.where(kf_valid[None, :], covis, 0)
    order = jnp.argsort(-w, axis=1)[:, :10]
    has = jnp.take_along_axis(w, order, axis=1) > 0
    self_ids = jnp.broadcast_to(jnp.arange(covis.shape[0])[:, None], order.shape)
    return jnp.where(has, order, self_ids)


def reloc_candidates(
    scores: jnp.ndarray, shared: jnp.ndarray,
    covis: jnp.ndarray, kf_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Relocalization candidate mask [K] (map.cpp:101-208)."""
    K = scores.shape[0]
    sharing = (shared > 0) & kf_valid
    max_common = jnp.max(jnp.where(sharing, shared, 0))
    min_common = 0.8 * max_common.astype(jnp.float32)
    selected = sharing & (shared.astype(jnp.float32) > min_common)

    nb = _top10_covisibles(covis, kf_valid)           # [K,10]
    nb_score = jnp.where(sharing[nb], scores[nb], 0.0)
    group_score = scores + jnp.sum(nb_score, axis=1)
    # best member of each group (self vs sharing neighbors)
    cand_scores = jnp.concatenate([scores[:, None], nb_score], axis=1)  # [K,11]
    cand_ids = jnp.concatenate([jnp.arange(K)[:, None], nb], axis=1)
    best_member = jnp.take_along_axis(cand_ids, jnp.argmax(cand_scores, axis=1)[:, None], axis=1)[:, 0]

    best_group = jnp.max(jnp.where(selected, group_score, 0.0))
    passing = selected & (group_score > 0.75 * best_group)
    mask = jnp.zeros((K,), bool).at[jnp.where(passing, best_member, K - 1)].max(passing)
    return mask & kf_valid


def loop_candidates(
    scores: jnp.ndarray, shared: jnp.ndarray,
    covis: jnp.ndarray, kf_valid: jnp.ndarray,
    query_kf: jnp.ndarray, min_score: jnp.ndarray,
) -> jnp.ndarray:
    """Loop candidate mask (map.cpp:210-333): like relocalization but the
    query's connected group is excluded and candidates must score >=
    min_score (the query's worst covisible score)."""
    K = scores.shape[0]
    connected = covis[query_kf] > 0
    eligible = kf_valid & ~connected & (jnp.arange(K) != query_kf)
    sharing = (shared > 0) & eligible
    max_common = jnp.max(jnp.where(sharing, shared, 0))
    min_common = 0.8 * max_common.astype(jnp.float32)
    selected = sharing & (shared.astype(jnp.float32) > min_common) & (scores >= min_score)

    nb = _top10_covisibles(covis, kf_valid)
    nb_score = jnp.where(sharing[nb], scores[nb], 0.0)
    group_score = scores + jnp.sum(nb_score, axis=1)
    cand_scores = jnp.concatenate([scores[:, None], nb_score], axis=1)
    cand_ids = jnp.concatenate([jnp.arange(K)[:, None], nb], axis=1)
    best_member = jnp.take_along_axis(cand_ids, jnp.argmax(cand_scores, axis=1)[:, None], axis=1)[:, 0]

    best_group = jnp.max(jnp.where(selected, group_score, 0.0))
    passing = selected & (group_score > 0.75 * best_group)
    mask = jnp.zeros((K,), bool).at[jnp.where(passing, best_member, K - 1)].max(passing)
    return mask & eligible
