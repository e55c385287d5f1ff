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
        g = np.asarray(V.feature_groups(voc, words, group_level=2))
        assert g[0] == 0 and g[-1] == -1
        assert g[3] == 124 // 5


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
