"""Oracle test for the jitted drift injector (utils/drift.py).

The oracle is an independent host-side numpy transcription of the island
split — the same semantics the loop-closure e2e uses (tests/test_loop_e2e.py
drift_island): rigid transform of island KFs/points, severed cross-island
bindings/observers/covisibility, stale tracker bindings cleared.
"""

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map
from vo_slam_test_tpu.utils.drift import inject_drift

CAPS = MapCaps(max_kf=12, max_pt=64, max_obs=6, n_feat=16)


def random_map(seed):
    rng = np.random.default_rng(seed)
    K, P, O, N = CAPS.max_kf, CAPS.max_pt, CAPS.max_obs, CAPS.n_feat
    m = empty_map(CAPS)
    kf_valid = rng.random(K) < 0.8
    pt_valid = rng.random(P) < 0.7
    pt_ref = np.where(
        pt_valid, rng.integers(0, K, P), rng.integers(-1, K, P)
    ).astype(np.int32)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(K, 3)).astype(np.float32)
    kf_mp = rng.integers(-1, P, size=(K, N)).astype(np.int32)
    obs_kf = rng.integers(-1, K, size=(P, O)).astype(np.int32)
    obs_kp = np.where(obs_kf >= 0, rng.integers(0, N, (P, O)), -1).astype(np.int32)
    covis = rng.integers(0, 30, size=(K, K)).astype(np.int32)
    # creation-ordered slots (kf_seq == slot index, all slots): the
    # slot-based host oracle below matches the production seq-based island
    # selection exactly in this regime; seq-vs-slot divergence under
    # recycling is covered by test_seq_based_selection_under_recycling
    kf_seq = np.arange(K, dtype=np.int32)
    return m.replace(
        kf_seq=jnp.asarray(kf_seq),
        kf_valid=jnp.asarray(kf_valid), pt_valid=jnp.asarray(pt_valid),
        pt_ref_kf=jnp.asarray(pt_ref), kf_pose=jnp.asarray(poses),
        pt_pos=jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32)),
        kf_mp=jnp.asarray(kf_mp), pt_obs_kf=jnp.asarray(obs_kf),
        pt_obs_kp=jnp.asarray(obs_kp),
        pt_obs_cnt=jnp.asarray((obs_kf >= 0).sum(1).astype(np.int32)),
        covis=jnp.asarray(covis),
    )


def oracle(m, assign, kf_cut, D):
    K = m.kf_valid.shape[0]
    kf_sel = np.zeros(K, bool)
    kf_sel[kf_cut:] = True
    kf_sel &= np.asarray(m.kf_valid)
    ref = np.asarray(m.pt_ref_kf)
    pt_sel = (ref >= 0) & kf_sel[np.clip(ref, 0, K - 1)] & np.asarray(m.pt_valid)

    poses = np.asarray(m.kf_pose)
    new_poses = np.where(
        kf_sel[:, None, None], poses @ np.linalg.inv(D), poses
    )
    pts = np.asarray(m.pt_pos)
    new_pts = np.where(pt_sel[:, None], pts @ D[:3, :3].T + D[:3, 3], pts)

    kf_mp = np.asarray(m.kf_mp)
    bound_old = (kf_mp >= 0) & ~pt_sel[np.clip(kf_mp, 0, pt_sel.size - 1)]
    kf_mp = np.where(kf_sel[:, None] & bound_old, -1, kf_mp)

    obs_kf = np.asarray(m.pt_obs_kf)
    obs_kp = np.asarray(m.pt_obs_kp)
    obs_cross = (
        (obs_kf >= 0) & kf_sel[np.clip(obs_kf, 0, K - 1)] & ~pt_sel[:, None]
    )
    new_obs_kf = np.where(obs_cross, -1, obs_kf)
    new_obs_kp = np.where(obs_cross, -1, obs_kp)
    new_cnt = np.maximum(
        np.asarray(m.pt_obs_cnt) - obs_cross.sum(1).astype(np.int32), 0
    )
    covis = np.where(
        kf_sel[:, None] ^ kf_sel[None, :], 0, np.asarray(m.covis)
    )
    stale = (assign >= 0) & ~pt_sel[np.clip(assign, 0, pt_sel.size - 1)]
    new_assign = np.where(stale, -1, assign)
    return new_poses, new_pts, kf_mp, new_obs_kf, new_obs_kp, new_cnt, covis, new_assign


class TestInjectDrift:
    def test_matches_host_oracle(self):
        rng = np.random.default_rng(0)
        for seed in range(5):
            m = random_map(seed)
            assign = rng.integers(-1, CAPS.max_pt, CAPS.n_feat).astype(np.int32)
            kf_cut = int(rng.integers(1, CAPS.max_kf - 1))
            th = rng.normal() * 0.1
            D = np.eye(4, dtype=np.float32)
            D[:3, :3] = np.array(
                [[np.cos(th), -np.sin(th), 0],
                 [np.sin(th), np.cos(th), 0],
                 [0, 0, 1]], np.float32)
            D[:3, 3] = rng.normal(size=3).astype(np.float32)

            nm, na = inject_drift(m, jnp.asarray(assign),
                                  jnp.asarray(kf_cut, jnp.int32),
                                  jnp.asarray(D))
            (poses, pts, kf_mp, obs_kf, obs_kp, cnt, covis,
             assign_o) = oracle(m, assign, kf_cut, D)
            np.testing.assert_allclose(np.asarray(nm.kf_pose), poses, atol=1e-5)
            np.testing.assert_allclose(np.asarray(nm.pt_pos), pts, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(nm.kf_mp), kf_mp)
            np.testing.assert_array_equal(np.asarray(nm.pt_obs_kf), obs_kf)
            np.testing.assert_array_equal(np.asarray(nm.pt_obs_kp), obs_kp)
            np.testing.assert_array_equal(np.asarray(nm.pt_obs_cnt), cnt)
            np.testing.assert_array_equal(np.asarray(nm.covis), covis)
            np.testing.assert_array_equal(np.asarray(na), assign_o)

    def test_seq_based_selection_under_recycling(self):
        """A recycled LOW slot created AFTER the cut belongs to the new
        island: selection follows kf_seq (creation order), not slot index
        (mirrors the pt_ref_kf rationale in the docstring)."""
        m = random_map(3)
        K = CAPS.max_kf
        # slot 0 was recycled: created last (seq K+5), slot K-2 is the cut
        seq = np.arange(K, dtype=np.int32)
        seq[0] = K + 5
        kf_valid = np.ones(K, bool)
        m = m.replace(kf_seq=jnp.asarray(seq), kf_valid=jnp.asarray(kf_valid))
        D = np.eye(4, dtype=np.float32)
        D[:3, 3] = [0.3, -0.1, 0.2]
        kf_cut = K - 2
        nm, _ = inject_drift(
            m, jnp.full((CAPS.n_feat,), -1, jnp.int32),
            jnp.asarray(kf_cut, jnp.int32), jnp.asarray(D))
        poses = np.asarray(m.kf_pose)
        new_poses = np.asarray(nm.kf_pose)
        Dinv = np.linalg.inv(D)
        # recycled slot 0 (seq K+5 >= seq[kf_cut]) IS drifted
        np.testing.assert_allclose(new_poses[0], poses[0] @ Dinv, atol=1e-5)
        # an old slot below the cut is NOT
        np.testing.assert_allclose(new_poses[1], poses[1], atol=1e-6)
        # the cut slot and above are drifted
        np.testing.assert_allclose(
            new_poses[kf_cut], poses[kf_cut] @ Dinv, atol=1e-5)

    def test_projections_invariant(self):
        """T' X' == T X for island pairs: tracking continues seamlessly."""
        m = random_map(7)
        D = np.eye(4, dtype=np.float32)
        D[:3, 3] = [0.5, 0.2, -0.1]
        kf_cut = 4
        nm, _ = inject_drift(
            m, jnp.full((CAPS.n_feat,), -1, jnp.int32),
            jnp.asarray(kf_cut, jnp.int32), jnp.asarray(D))
        kf_sel = np.zeros(CAPS.max_kf, bool)
        kf_sel[kf_cut:] = True
        kf_sel &= np.asarray(m.kf_valid)
        ref = np.asarray(m.pt_ref_kf)
        pt_sel = (
            (ref >= 0) & kf_sel[np.clip(ref, 0, CAPS.max_kf - 1)]
            & np.asarray(m.pt_valid)
        )
        k = int(np.nonzero(kf_sel)[0][0])
        p = np.nonzero(pt_sel)[0]
        xh = np.concatenate([np.asarray(m.pt_pos)[p], np.ones((p.size, 1))], 1)
        xh2 = np.concatenate([np.asarray(nm.pt_pos)[p], np.ones((p.size, 1))], 1)
        before = xh @ np.asarray(m.kf_pose)[k].T
        after = xh2 @ np.asarray(nm.kf_pose)[k].T
        np.testing.assert_allclose(after, before, atol=1e-4)
