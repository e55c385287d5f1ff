"""BoW vocabulary, transform, scoring, retrieval."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu.bow import retrieval, vocabulary as V


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    # 3 "scene clusters" of descriptors: random prototypes + bit noise
    protos = rng.integers(0, 2**32, size=(30, 8), dtype=np.uint32)
    descs = []
    for i in range(3000):
        p = protos[i % 30].copy()
        # flip ~12 random bits
        for _ in range(12):
            w = rng.integers(0, 8)
            p[w] ^= np.uint32(1 << rng.integers(0, 32))
        descs.append(p)
    return np.stack(descs)


@pytest.fixture(scope="module")
def voc(corpus):
    return V.build_vocabulary(corpus, k=5, levels=3, seed=1)


class TestVocabulary:
    def test_build_and_transform(self, corpus, voc):
        assert voc.n_words == 125
        words = np.asarray(
            V.transform(voc, jnp.asarray(corpus[:500]), jnp.ones(500, bool))
        )
        assert words.min() >= 0 and words.max() < 125
        # same prototype -> usually same word
        same = sum(words[i] == words[i + 30] for i in range(200))
        assert same > 120, same

    def test_transform_invalid_masked(self, voc, corpus):
        valid = np.zeros(10, bool)
        valid[:3] = True
        words = np.asarray(V.transform(voc, jnp.asarray(corpus[:10]), jnp.asarray(valid)))
        assert (words[3:] == -1).all()
        assert (words[:3] >= 0).all()

    def test_save_load_roundtrip(self, voc, corpus, tmp_path):
        path = str(tmp_path / "voc.npz")
        voc.save(path)
        voc2 = V.Vocabulary.load(path)
        w1 = np.asarray(V.transform(voc, jnp.asarray(corpus[:100]), jnp.ones(100, bool)))
        w2 = np.asarray(V.transform(voc2, jnp.asarray(corpus[:100]), jnp.ones(100, bool)))
        np.testing.assert_array_equal(w1, w2)

    def test_feature_groups(self, voc):
        words = jnp.asarray([0, 5, 24, 124, -1])
        g = np.asarray(V.feature_groups(voc, words, levels_up=1))
        assert g[0] == 0 and g[-1] == -1
        assert g[3] == 124 // 5

    def test_feature_groups_shallow_vocab_collapses_to_root(self, voc):
        """levels <= levels_up -> one bucket (DBoW levelsup semantics:
        frame.cpp:253 goes 3 levels up from the leaves; a 3-level scene
        vocabulary then imposes no bucket restriction)."""
        words = jnp.asarray([0, 5, 24, 124])
        g = np.asarray(V.feature_groups(voc, words))  # default levels_up=3
        assert (g == 0).all(), g


class TestRetrieval:
    def test_bow_vector_normalized(self, voc):
        words = jnp.asarray(np.array([3, 3, 5, 7, -1, 7, 7, 2], np.int32))
        uniq, wgt = retrieval.bow_vector(words, voc.idf)
        uniq = np.asarray(uniq); wgt = np.asarray(wgt)
        valid = uniq < (1 << 30)
        assert sorted(uniq[valid].tolist()) == [2, 3, 5, 7]
        assert wgt[valid].sum() == pytest.approx(1.0, abs=1e-5)

    def test_self_score_is_one(self, voc, corpus):
        words = V.transform(voc, jnp.asarray(corpus[:200]), jnp.ones(200, bool))
        uniq, wgt = retrieval.bow_vector(words, voc.idf)
        score, shared = retrieval.scores_vs_keyframes(
            uniq, wgt, uniq[None], wgt[None], jnp.ones((1,)),
        )
        assert float(score[0]) == pytest.approx(1.0, abs=1e-4)

    def test_similar_frames_score_higher(self, voc, corpus):
        def vec(sl):
            w = V.transform(voc, jnp.asarray(sl), jnp.ones(len(sl), bool))
            return retrieval.bow_vector(w, voc.idf)
        uq, wq = vec(corpus[:300])
        u_sim, w_sim = vec(corpus[30:330])   # heavy overlap in prototypes
        rng = np.random.default_rng(5)
        other = rng.integers(0, 2**32, size=(300, 8), dtype=np.uint32)
        u_rand, w_rand = vec(other)
        kfw = jnp.stack([u_sim, u_rand])
        kfwt = jnp.stack([w_sim, w_rand])
        score, shared = retrieval.scores_vs_keyframes(uq, wq, kfw, kfwt, jnp.ones((2,)))
        assert float(score[0]) > float(score[1]) * 1.5
        assert int(shared[0]) > int(shared[1])

    def test_reloc_candidates_pick_similar(self, voc, corpus):
        K = 8
        def vec(sl):
            w = V.transform(voc, jnp.asarray(sl), jnp.ones(len(sl), bool))
            return retrieval.bow_vector(w, voc.idf)
        uq, wq = vec(corpus[:300])
        rng = np.random.default_rng(7)
        kf_words, kf_wgts = [], []
        for k in range(K):
            if k == 3:
                u, w = vec(corpus[10:310])  # the similar one
            else:
                u, w = vec(rng.integers(0, 2**32, size=(300, 8), dtype=np.uint32))
            kf_words.append(u); kf_wgts.append(w)
        kfw = jnp.stack(kf_words); kfwt = jnp.stack(kf_wgts)
        valid = jnp.ones((K,))
        score, shared = retrieval.scores_vs_keyframes(uq, wq, kfw, kfwt, valid)
        covis = jnp.zeros((K, K), jnp.int32)
        mask = np.asarray(retrieval.reloc_candidates(score, shared, covis, valid.astype(bool)))
        assert mask[3]
        assert mask.sum() <= 3


class TestDbowText:
    def test_text_roundtrip(self, voc, corpus, tmp_path):
        p = str(tmp_path / "voc.txt")
        V.save_dbow_text(voc, p)
        voc2 = V.load_dbow_text(p)
        q = jnp.asarray(corpus[:400])
        ok = jnp.ones(400, bool)
        w1 = np.asarray(V.transform(voc, q, ok))
        w2 = np.asarray(V.transform(voc2, q, ok))
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_allclose(np.asarray(voc.idf), np.asarray(voc2.idf), rtol=1e-6)

    def test_gz_roundtrip(self, voc, corpus, tmp_path):
        p = str(tmp_path / "voc.txt.gz")
        V.save_dbow_text(voc, p)
        voc2 = V.load_dbow_text(p)
        q = jnp.asarray(corpus[:100])
        ok = jnp.ones(100, bool)
        np.testing.assert_array_equal(
            np.asarray(V.transform(voc, q, ok)), np.asarray(V.transform(voc2, q, ok))
        )

    def test_ragged_tree_shallow_leaf(self, tmp_path):
        """A DBoW leaf above the final level must still become a word."""
        # metrically consistent tree: cluster A near all-zeros, cluster B
        # near all-ones, so greedy descent lands each centroid on itself
        d = np.zeros((4, 32), np.int64)
        d[1:] = 255
        d[2, 0] = 254
        d[3, 31] = 253
        def line(par, leaf, desc, w):
            return f"{par} {leaf} " + " ".join(str(int(b)) for b in desc) + f" {w}"
        txt = "\n".join([
            "2 2 0 0",
            line(0, 1, d[0], 0.7),   # node 1: leaf at depth 1
            line(0, 0, d[1], 0.0),   # node 2: interior
            line(2, 1, d[2], 0.5),   # node 3: leaf at depth 2
            line(2, 1, d[3], 0.3),   # node 4: leaf at depth 2
        ])
        p = tmp_path / "ragged.txt"
        p.write_text(txt + "\n")
        voc = V.load_dbow_text(str(p))
        assert voc.k == 2 and voc.levels == 2
        packed = d.astype(np.uint8).view("<u4").reshape(4, 8)
        q = jnp.asarray(packed[[0, 2, 3]])  # the three leaves
        words = np.asarray(V.transform(voc, q, jnp.ones(3, bool)))
        assert len(set(words.tolist())) == 3  # nodes 1 (propagated), 3, 4
        idf = np.asarray(voc.idf)
        assert np.allclose([idf[w] for w in words], [0.7, 0.5, 0.3])


class TestSynthVocabulary:
    """ORBvoc-shaped synthetic vocabulary: structure and transform costs of
    k=10 L=6 without a training artifact (bench parity, vo_run.cpp:86-90)."""

    def test_transform_full_depth(self):
        from vo_slam_test_tpu.bow.vocabulary import (
            feature_groups, synth_vocabulary, transform,
        )

        voc = synth_vocabulary(k=10, levels=3, seed=1)  # small-scale shape
        assert voc.n_words == 1000
        rng = np.random.default_rng(0)
        desc = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint32))
        valid = jnp.asarray(np.arange(64) < 60)
        words = np.asarray(transform(voc, desc, valid))
        assert ((words[:60] >= 0) & (words[:60] < 1000)).all()
        assert (words[60:] == -1).all()
        # realistic sparsity: random descriptors spread over many words
        assert len(set(words[:60].tolist())) > 30
        groups = np.asarray(feature_groups(voc, jnp.asarray(words)))
        assert ((groups[:60] >= 0) & (groups[:60] < 1)).all() or (
            (groups[:60] >= 0)).all()

    def test_full_scale_shapes(self):
        from vo_slam_test_tpu.bow.vocabulary import synth_vocabulary

        voc = synth_vocabulary(k=10, levels=6, seed=0)
        assert voc.n_words == 10**6
        assert voc.centroids[-1].shape == (10**6, 8)
        assert voc.idf.shape == (10**6,)
