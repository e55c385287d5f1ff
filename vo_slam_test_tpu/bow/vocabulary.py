"""Binary bag-of-words vocabulary as dense array trees (DBoW3 equivalent).

The reference depends on DBoW3 for: per-frame BoW transform at tree level 3
(frame.cpp:249-254), L1 similarity scoring and candidate retrieval
(map.cpp:101-376), and scene-specific vocabulary creation from tracked
descriptors (map.cpp:60-99).

TPU-native design:
- the k-branch, L-level tree is stored as one dense centroid array per
  level ([k^l, 8] uint32); children of node n are n*k .. n*k+k-1;
- ``transform`` descends all descriptors in parallel: at each level one
  gather of k child centroids + a popcount argmin — no pointer chasing;
- words are leaves (ids in [0, k^L)); the "node at level 3" feature groups
  the reference uses for matching (featVec) are just word_id >> shift;
- creation is hierarchical binary k-means (majority-bit centroids, k-means++
  style farthest seeding with a fixed PRNG), vectorized over all clusters of
  a level at once via segment ops.

Storage format: .npz (centroids per level + idf weights). A DBoW3 binary is
not loadable here (no DBoW3 on this machine); scene vocabularies are built
with build_vocabulary — the capability the reference added over stock
ORB-SLAM2.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming


@dataclasses.dataclass(eq=False)
class Vocabulary:
    k: int                      # branching factor
    levels: int                 # depth (words live at this level)
    centroids: List[jnp.ndarray]  # level l: [k^(l+1), 8] u32 (level 0 = first split)
    idf: jnp.ndarray            # [k^levels] f32 word weights
    node_valid: List[jnp.ndarray]  # level l: [k^(l+1)] bool

    @property
    def n_words(self) -> int:
        return self.k**self.levels

    def save(self, path: str) -> None:
        data = {"k": self.k, "levels": self.levels, "idf": np.asarray(self.idf)}
        for i, c in enumerate(self.centroids):
            data[f"c{i}"] = np.asarray(c)
            data[f"v{i}"] = np.asarray(self.node_valid[i])
        np.savez_compressed(path, **data)

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        z = np.load(path)
        k = int(z["k"]); levels = int(z["levels"])
        cents = [jnp.asarray(z[f"c{i}"]) for i in range(levels)]
        valid = [jnp.asarray(z[f"v{i}"]) for i in range(levels)]
        return cls(k=k, levels=levels, centroids=cents, idf=jnp.asarray(z["idf"]), node_valid=valid)


# pytree registration so a Vocabulary can cross jit boundaries (k/levels
# ride as static aux data)
jax.tree_util.register_pytree_node(
    Vocabulary,
    lambda v: ((tuple(v.centroids), v.idf, tuple(v.node_valid)), (v.k, v.levels)),
    lambda aux, ch: Vocabulary(
        k=aux[0], levels=aux[1], centroids=list(ch[0]), idf=ch[1], node_valid=list(ch[2])
    ),
)


def transform(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[N,8] u32 descriptors -> [N] i32 word ids (-1 for invalid slots).

    Equivalent of DBoW3 Vocabulary::transform as used at frame.cpp:249-254.
    """
    N = desc.shape[0]
    node = jnp.zeros((N,), jnp.int32)
    for lvl in range(voc.levels):
        cents = voc.centroids[lvl]          # [k^(l+1), 8]
        ok = voc.node_valid[lvl]
        base = node * voc.k
        child_ids = base[:, None] + jnp.arange(voc.k, dtype=jnp.int32)[None, :]  # [N,k]
        cand = cents[child_ids]             # [N,k,8]
        d = jnp.sum(hamming.popcount_u32(cand ^ desc[:, None, :]), axis=-1)      # [N,k]
        d = jnp.where(ok[child_ids], d, 1 << 20)
        node = jnp.take_along_axis(child_ids, jnp.argmin(d, axis=1)[:, None], axis=1)[:, 0]
    return jnp.where(valid, node, -1)


def feature_groups(voc: Vocabulary, words: jnp.ndarray, group_level: int = 3) -> jnp.ndarray:
    """Word ids -> node ids at ``group_level`` (the featVec buckets the
    reference matches within, frame.cpp:253 'levelsup' semantics)."""
    shift = voc.levels - group_level
    return jnp.where(words >= 0, words // (voc.k**shift), -1)


# ---------------------------------------------------------------------------
# creation: hierarchical binary k-means (map.cpp:60-99 capability)
# ---------------------------------------------------------------------------


def _majority_centroids(desc_bits: np.ndarray, assign: np.ndarray, n_clusters: int) -> np.ndarray:
    """Majority vote per bit. desc_bits [M,256] u8, assign [M] -> [C,256]."""
    sums = np.zeros((n_clusters, 256), np.int64)
    np.add.at(sums, assign, desc_bits.astype(np.int64))
    counts = np.bincount(assign, minlength=n_clusters)[:, None]
    return (sums * 2 > counts).astype(np.uint8)


def _pack(bits: np.ndarray) -> np.ndarray:
    """[..., 256] {0,1} -> [..., 8] u32 matching brief.py packing."""
    b = bits.reshape(bits.shape[:-1] + (8, 32)).astype(np.uint32)
    return (b << np.arange(32, dtype=np.uint32)).sum(-1).astype(np.uint32)


def _unpack(words: np.ndarray) -> np.ndarray:
    bits = (words[..., :, None] >> np.arange(32, dtype=np.uint32)) & 1
    return bits.reshape(words.shape[:-1] + (256,)).astype(np.uint8)


def build_vocabulary(
    descriptors: np.ndarray,
    k: int = 10,
    levels: int = 4,
    iters: int = 8,
    seed: int = 0,
) -> Vocabulary:
    """Hierarchical binary k-means over [M,8] u32 descriptors.

    Deterministic (fixed seed): candidate-retrieval trigger frames depend on
    the vocabulary, and the reference's protocol requires reproducible runs.
    """
    rng = np.random.default_rng(seed)
    M = descriptors.shape[0]
    bits = _unpack(descriptors)  # [M,256]

    assign = np.zeros(M, np.int64)  # node id at current level
    centroids: List[np.ndarray] = []
    valids: List[np.ndarray] = []

    for lvl in range(levels):
        n_parent = k**lvl
        n_child = k ** (lvl + 1)
        child_assign = np.zeros(M, np.int64)
        cents = np.zeros((n_child, 8), np.uint32)
        valid = np.zeros(n_child, bool)
        for p in range(n_parent):
            sel = np.nonzero(assign == p)[0]
            if sel.size == 0:
                continue
            sub = descriptors[sel]
            kk = min(k, sel.size)
            # k-means++ style seeding: first random, rest farthest
            seeds = [sub[rng.integers(sel.size)]]
            dmin = None
            for _ in range(1, kk):
                D = np.unpackbits((sub ^ seeds[-1][None]).view(np.uint8), axis=1).sum(1)
                dmin = D if dmin is None else np.minimum(dmin, D)
                seeds.append(sub[int(np.argmax(dmin))])
            cent = np.stack(seeds)
            sub_bits = bits[sel]
            a = np.zeros(sel.size, np.int64)
            for _ in range(iters):
                Dm = np.stack(
                    [np.unpackbits((sub ^ c[None]).view(np.uint8), axis=1).sum(1) for c in cent],
                    axis=1,
                )
                a_new = Dm.argmin(1)
                if (a_new == a).all():
                    a = a_new
                    break
                a = a_new
                cent = _pack(_majority_centroids(sub_bits, a, kk).astype(np.uint8))
            cents[p * k : p * k + kk] = cent
            valid[p * k : p * k + kk] = True
            child_assign[sel] = p * k + a
        assign = child_assign
        centroids.append(jnp.asarray(cents))
        valids.append(jnp.asarray(valid))

    # idf weights (DBoW3 TF_IDF default): log(M / n_i)
    n_words = k**levels
    counts = np.bincount(assign, minlength=n_words).astype(np.float64)
    idf = np.where(counts > 0, np.log(max(M, 1) / np.maximum(counts, 1)), 0.0)
    return Vocabulary(
        k=k, levels=levels, centroids=centroids,
        idf=jnp.asarray(idf.astype(np.float32)), node_valid=valids,
    )
