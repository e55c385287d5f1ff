"""Loop detection: candidate cascade + consistency-group tracking.

Reference semantics (loopClosing.cpp:95-174): a candidate group that
intersects no previous group is pushed with count 0; an intersecting one
inherits prev_count + 1; confirmation requires count >= 3 — i.e. the
FOURTH consecutive detection confirms.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu.bow import retrieval
from vo_slam_test_tpu.pipeline import loop_closing as LC
from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map

CAPS = MapCaps(max_kf=16, max_pt=512, max_obs=8, n_feat=64)


def make_map_with_loop():
    """KFs 0..12; 0-2 and 9-12 see the same 'place' (shared words); the two
    clusters are not covisible with each other."""
    rng = np.random.default_rng(0)
    m = empty_map(CAPS)
    N = CAPS.n_feat

    kf_bow_word = np.full((CAPS.max_kf, N), 1 << 30, np.int64)
    kf_bow_weight = np.zeros((CAPS.max_kf, N), np.float32)
    covis = np.zeros((CAPS.max_kf, CAPS.max_kf), np.int32)
    valid = np.zeros(CAPS.max_kf, bool)

    place_words = np.sort(rng.choice(4096, 40, replace=False))
    for k in range(13):
        valid[k] = True
        if k <= 2 or k >= 9:
            words = place_words.copy()
        else:
            words = np.sort(rng.choice(4096, 40, replace=False))
        kf_bow_word[k, :40] = words
        kf_bow_weight[k, :40] = 1.0 / 40
    for group in [(0, 1, 2), (3, 4, 5, 6, 7, 8), (9, 10, 11, 12)]:
        for a in group:
            for b in group:
                if a != b:
                    covis[a, b] = 50

    m = m.replace(
        kf_bow_word=jnp.asarray(kf_bow_word.astype(np.int32)),
        kf_bow_weight=jnp.asarray(kf_bow_weight),
        covis=jnp.asarray(covis),
        kf_valid=jnp.asarray(valid),
        # creation-ordered sequence numbers: the loop gap gate counts
        # insertion order (kf_seq), matching the reference's KeyFrame::id_
        kf_seq=jnp.asarray(np.where(valid, np.arange(CAPS.max_kf), -1).astype(np.int32)),
        n_kf=jnp.asarray(13, jnp.int32),
    )
    return m


class TestLoopDetect:
    def test_fourth_consecutive_detection_confirms(self):
        m = make_map_with_loop()
        ls = LC.empty_loop_state(CAPS)
        results = []
        for kf in [9, 10, 11, 12]:
            ls, cands, _gens = LC.detect_step(
                m, ls, jnp.asarray(True), jnp.asarray(kf, jnp.int32), CAPS
            )
            c = np.asarray(cands)
            results.append(int(c[c >= 0][0]) if (c >= 0).any() else -1)
        # counts 0, 1, 2 accumulate; the fourth detection reaches 3 (the
        # reference pushes the first group with count 0, loopClosing.cpp:160)
        assert results[0] == -1
        assert results[1] == -1
        assert results[2] == -1
        assert results[3] in (0, 1, 2), results

    def test_no_keyframe_noop(self):
        m = make_map_with_loop()
        ls = LC.empty_loop_state(CAPS)
        ls2, cands, _gens = LC.detect_step(
            m, ls, jnp.asarray(False), jnp.asarray(5, jnp.int32), CAPS
        )
        assert (np.asarray(cands) == -1).all()
        np.testing.assert_array_equal(np.asarray(ls2.counts), np.asarray(ls.counts))

    def test_connected_candidates_excluded(self):
        """A KF covisible with the query must never be a loop candidate."""
        m = make_map_with_loop()
        covis = np.array(m.covis)
        for q in (9, 10, 11, 12):
            for c in (0, 1, 2):
                covis[q, c] = covis[c, q] = 30
        m = m.replace(covis=jnp.asarray(covis))
        ls = LC.empty_loop_state(CAPS)
        for kf in [9, 10, 11, 12]:
            ls, cands, _gens = LC.detect_step(m, ls, jnp.asarray(True), jnp.asarray(kf, jnp.int32), CAPS)
        assert (np.asarray(cands) == -1).all()

    def test_alternating_groups_both_accumulate(self):
        """Two disjoint candidate neighborhoods present in every round must
        accumulate consistency independently (the reference tracks a VECTOR
        of groups, loopClosing.cpp:95-174) — a single rolling slot would
        reset one with the other."""
        rng = np.random.default_rng(1)
        m = empty_map(CAPS)
        N = CAPS.n_feat
        kf_bow_word = np.full((CAPS.max_kf, N), 1 << 30, np.int64)
        kf_bow_weight = np.zeros((CAPS.max_kf, N), np.float32)
        covis = np.zeros((CAPS.max_kf, CAPS.max_kf), np.int32)
        valid = np.zeros(CAPS.max_kf, bool)

        words_a = np.sort(rng.choice(2048, 40, replace=False))
        words_b = np.sort(rng.choice(np.arange(2048, 4096), 40, replace=False))
        both = np.sort(np.concatenate([words_a[:20], words_b[:20]]))
        # clusters A = 0-2, B = 3-5 are two distinct places; the query
        # cluster 9-12 shares words with BOTH, so both clusters come back as
        # candidates on every detection round.
        for k in range(13):
            valid[k] = True
            if k <= 2:
                words = words_a
            elif k <= 5:
                words = words_b
            elif k >= 9:
                words = both
            else:
                words = np.sort(rng.choice(8192, 40, replace=False) + 8192)
            kf_bow_word[k, :40] = words
            kf_bow_weight[k, :40] = 1.0 / 40
        for group in [(0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11, 12)]:
            for a in group:
                for b in group:
                    if a != b:
                        covis[a, b] = 50
        # a weakly-covisible dissimilar neighbor drags the query's
        # min-covis-score gate down (the reference's minScore is the lowest
        # score among covisibles, loopClosing.cpp:68-83)
        for q in (9, 10, 11, 12):
            covis[q, 6] = covis[6, q] = 20
        m = m.replace(
            kf_bow_word=jnp.asarray(kf_bow_word.astype(np.int32)),
            kf_bow_weight=jnp.asarray(kf_bow_weight),
            covis=jnp.asarray(covis),
            kf_valid=jnp.asarray(valid),
            kf_seq=jnp.asarray(np.where(valid, np.arange(CAPS.max_kf), -1).astype(np.int32)),
            n_kf=jnp.asarray(13, jnp.int32),
        )
        ls = LC.empty_loop_state(CAPS)
        results = []
        for kf in [9, 10, 11, 12]:
            ls, cands, _gens = LC.detect_step(
                m, ls, jnp.asarray(True), jnp.asarray(kf, jnp.int32), CAPS
            )
            c = np.asarray(cands)
            results.append(int(c[c >= 0][0]) if (c >= 0).any() else -1)
        counts = np.asarray(ls.counts)
        # after the final round both surviving candidate groups carry the
        # full consistency count
        assert (counts >= 3).sum() >= 2, counts
        assert results[3] in (0, 1, 2, 3, 4, 5), results


class TestConsistencyGroupDedup:
    """advance_consistency vs a literal transcription of the reference's
    group-update loop (loopClosing.cpp:95-174), including the
    vbConsistentGroup dedup: a previous group is claimed by the FIRST
    candidate intersecting it; later candidates sharing it push nothing
    (unless they intersect another unclaimed group or nothing at all)."""

    @staticmethod
    def oracle(cand_groups, top_ok, prev_groups, prev_counts, n_prev):
        """loopClosing.cpp:108-163 verbatim (sets -> boolean rows)."""
        curr = []          # list of (group_row, count)
        flags = [False] * n_prev
        cand_counts = []
        for i in range(cand_groups.shape[0]):
            if not top_ok[i]:
                cand_counts.append(0)
                continue
            some = False
            best = 0
            for j in range(n_prev):
                if (cand_groups[i] & prev_groups[j]).any():
                    some = True
                    cnt = prev_counts[j] + 1
                    best = max(best, cnt)
                    if not flags[j]:
                        curr.append((cand_groups[i].copy(), cnt))
                        flags[j] = True
            if not some:
                curr.append((cand_groups[i].copy(), 0))
            cand_counts.append(best)
        return curr, cand_counts

    def _run_both(self, cand_groups, top_ok, prev_groups, prev_counts, n_prev):
        from vo_slam_test_tpu.pipeline.loop_closing import (
            MAX_GROUPS, advance_consistency,
        )

        K = cand_groups.shape[1]
        pg = np.zeros((MAX_GROUPS, K), bool)
        pc = np.zeros((MAX_GROUPS,), np.int32)
        pg[:n_prev] = prev_groups[:n_prev]
        pc[:n_prev] = prev_counts[:n_prev]
        g, c, n, cc = advance_consistency(
            jnp.asarray(cand_groups), jnp.asarray(top_ok),
            jnp.asarray(pg), jnp.asarray(pc), jnp.asarray(n_prev),
        )
        want, want_cc = self.oracle(
            cand_groups, top_ok, prev_groups, prev_counts, n_prev
        )
        want = want[:MAX_GROUPS]
        assert int(n) == len(want), (int(n), len(want))
        got_g, got_c = np.asarray(g), np.asarray(c)
        # entry order: claimed previous groups (by j) first, then
        # no-intersection candidates (by i) — the oracle emits in candidate
        # order, so compare as multisets of (group-bytes, count)
        got = sorted(
            (got_g[k].tobytes(), int(got_c[k])) for k in range(len(want))
        )
        exp = sorted((w[0].tobytes(), int(w[1])) for w in want)
        assert got == exp
        np.testing.assert_array_equal(np.asarray(cc), np.asarray(want_cc))

    def test_two_candidates_share_one_previous_group(self):
        K, C = 16, 8
        cand_groups = np.zeros((C, K), bool)
        top_ok = np.zeros((C,), bool)
        # candidates 0 and 1 both intersect previous group 0 (KF 3)
        cand_groups[0, [3, 4]] = True
        cand_groups[1, [3, 7]] = True
        top_ok[:2] = True
        prev_groups = np.zeros((4, K), bool)
        prev_groups[0, [2, 3]] = True
        prev_counts = np.array([1, 0, 0, 0], np.int32)
        self._run_both(cand_groups, top_ok, prev_groups, prev_counts, 1)

    def test_candidate_with_no_intersection_seeds_fresh_group(self):
        K, C = 16, 8
        cand_groups = np.zeros((C, K), bool)
        top_ok = np.zeros((C,), bool)
        cand_groups[0, [1, 2]] = True   # intersects prev 0
        cand_groups[1, [9, 10]] = True  # intersects nothing -> count 0
        top_ok[:2] = True
        prev_groups = np.zeros((4, K), bool)
        prev_groups[0, [2]] = True
        prev_counts = np.array([2, 0, 0, 0], np.int32)
        self._run_both(cand_groups, top_ok, prev_groups, prev_counts, 1)

    def test_randomized_against_oracle(self):
        rng = np.random.default_rng(7)
        for trial in range(50):
            K = 24
            C = 8
            n_prev = int(rng.integers(0, 12))
            cand_groups = rng.random((C, K)) < 0.12
            top_ok = np.arange(C) < rng.integers(0, C + 1)
            cand_groups &= top_ok[:, None]
            # every live candidate group contains at least itself
            for i in range(C):
                if top_ok[i]:
                    cand_groups[i, rng.integers(0, K)] = True
            prev_groups = rng.random((12, K)) < 0.12
            prev_counts = rng.integers(0, 4, 12).astype(np.int32)
            self._run_both(
                cand_groups, top_ok, prev_groups, prev_counts, n_prev
            )
