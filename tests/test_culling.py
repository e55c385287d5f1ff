"""Unit tests for point erasure and keyframe culling.

The keyframe-redundancy decision (localMapping.cpp:434-494) is checked
against a brute-force numpy oracle: a connected keyframe dies when >90% of
its close bound points are observed >=3 more times elsewhere at octave <=
own+1. The jitted implementation computes the same counts via a compacted
per-point octave histogram — the oracle guards that reformulation.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

from synth_map import build  # noqa: E402

from vo_slam_test_tpu.slam_map import culling  # noqa: E402
from vo_slam_test_tpu.slam_map.map_state import MapCaps  # noqa: E402

CAPS = MapCaps(max_kf=32, max_pt=1024, max_obs=8, n_feat=128)


def oracle_cull(m, curr_kf, cam):
    """Brute-force redundancy decision per reference semantics."""
    K, N = np.asarray(m.kf_mp).shape
    covis = np.asarray(m.covis)
    kf_valid = np.asarray(m.kf_valid)
    kf_mp = np.asarray(m.kf_mp)
    kp_valid = np.asarray(m.kf_kp_valid)
    depth = np.asarray(m.kf_depth)
    octv = np.asarray(m.kf_octave)
    obs_kf = np.asarray(m.pt_obs_kf)
    obs_kp = np.asarray(m.pt_obs_kp)
    obs_cnt = np.asarray(m.pt_obs_cnt)
    th = float(cam.th_depth)

    out = np.zeros(K, bool)
    for c in range(K):
        if c == 0 or c == curr_kf or not kf_valid[c] or covis[curr_kf, c] <= 0:
            continue
        mp_cnt = re_obs = 0
        for n in range(N):
            p = kf_mp[c, n]
            if p < 0 or not kp_valid[c, n]:
                continue
            d = depth[c, n]
            if not (0 < d <= th):
                continue
            mp_cnt += 1
            if obs_cnt[p] <= 3:
                continue
            lvl = octv[c, n] + 1
            cnt = 0
            for o in range(obs_kf.shape[1]):
                k = obs_kf[p, o]
                if k < 0 or k == c:
                    continue
                if octv[k, obs_kp[p, o]] <= lvl:
                    cnt += 1
            if cnt >= 3:
                re_obs += 1
        if mp_cnt > 0 and re_obs > 0.9 * mp_cnt:
            out[c] = True
    return out


class TestEntanglement:
    def test_erase_points_unbinds_and_invalidates(self):
        m, cam = build(CAPS, n_kf=8, n_pt=200, seed=1)
        bad_ids = [5, 17, 42]
        bad = np.zeros(CAPS.max_pt, bool)
        bad[bad_ids] = True
        m2 = culling.erase_points(m, jnp.asarray(bad))
        pv = np.asarray(m2.pt_valid)
        assert not pv[bad_ids].any()
        kf_mp = np.asarray(m2.kf_mp)
        assert not np.isin(kf_mp, bad_ids).any()
        assert (np.asarray(m2.pt_obs_kf)[bad_ids] == -1).all()
        assert (np.asarray(m2.pt_obs_cnt)[bad_ids] == 0).all()
        # untouched points keep their bindings
        before = np.asarray(m.pt_obs_cnt)
        after = np.asarray(m2.pt_obs_cnt)
        keep = np.asarray(m.pt_valid) & ~bad
        np.testing.assert_array_equal(before[keep], after[keep])

    def test_erase_respects_cap(self):
        m, cam = build(CAPS, n_kf=8, n_pt=400, seed=2)
        bad = np.asarray(m.pt_valid).copy()
        m2 = culling.erase_points(m, jnp.asarray(bad), max_erase=64)
        # exactly 64 died, the rest stay consistently alive
        assert int((np.asarray(m.pt_valid) & ~np.asarray(m2.pt_valid)).sum()) == 64
        alive = np.asarray(m2.pt_valid)
        obs = np.asarray(m2.pt_obs_kf)
        assert (obs[alive] >= 0).any()


class TestCullKeyframes:
    def test_matches_numpy_oracle(self):
        m, cam = build(CAPS, n_kf=12, n_pt=600, seed=3)
        curr = int(np.asarray(m.n_kf)) - 1
        expect = oracle_cull(m, curr, cam)
        before = np.asarray(m.kf_valid)
        m2 = culling.cull_keyframes(m, jnp.asarray(curr, jnp.int32), CAPS, cam)
        after = np.asarray(m2.kf_valid)
        np.testing.assert_array_equal(before & ~after, expect)

    def test_redundant_keyframe_dies_and_observations_cleared(self):
        m, cam = build(CAPS, n_kf=10, n_pt=500, seed=4)
        curr = int(np.asarray(m.n_kf)) - 1
        # force one connected keyframe to be redundant: give its keypoints
        # the coarsest octave (so every other observation counts toward the
        # <= octave+1 gate) — its well-observed close points then all pass
        covis = np.asarray(m.covis)
        cands = [
            c for c in range(1, curr)
            if covis[curr, c] > 0 and bool(np.asarray(m.kf_valid)[c])
        ]
        c = cands[0]
        octv = np.asarray(m.kf_octave).copy()
        octv[c] = 7
        # ...and push its weakly-observed close points beyond thDepth so the
        # close set consists purely of well-observed points
        depth = np.asarray(m.kf_depth).copy()
        kf_mp = np.asarray(m.kf_mp)
        weak = (kf_mp[c] >= 0) & (
            np.asarray(m.pt_obs_cnt)[np.maximum(kf_mp[c], 0)] <= 3
        )
        depth[c, weak] = float(cam.th_depth) + 1.0
        m = m.replace(kf_octave=jnp.asarray(octv), kf_depth=jnp.asarray(depth))
        expect = oracle_cull(m, curr, cam)
        assert expect.any(), "constructed map must contain a redundant KF"
        gen_before = np.asarray(m.kf_gen).copy()  # m is donated below
        m2 = culling.cull_keyframes(m, jnp.asarray(curr, jnp.int32), CAPS, cam)
        culled = np.nonzero(expect)[0]
        obs = np.asarray(m2.pt_obs_kf)
        assert not np.isin(obs, culled).any(), "stale observations of culled KFs"
        # archives written for trajectory recovery
        assert (np.asarray(m2.cull_gen)[culled] == gen_before[culled]).all()

    def test_cull_consistency_obs_counts(self):
        m, cam = build(CAPS, n_kf=12, n_pt=600, seed=5)
        curr = int(np.asarray(m.n_kf)) - 1
        m2 = culling.cull_keyframes(m, jnp.asarray(curr, jnp.int32), CAPS, cam)
        obs = np.asarray(m2.pt_obs_kf)
        cnt = np.asarray(m2.pt_obs_cnt)
        live = np.asarray(m2.pt_valid)
        np.testing.assert_array_equal((obs[live] >= 0).sum(1), cnt[live])


class TestCovisibleReparenting:
    """keyframe.cpp:431-483: children of a culled keyframe attach greedily
    to the highest-weight covisible candidate (candidate set = culled KF's
    parent + already-attached children), so a child covisible only with its
    sibling chains off the sibling instead of collapsing onto the
    grandparent."""

    def test_child_chains_off_sibling(self):
        m, cam = build(CAPS, n_kf=10, n_pt=500, seed=4)
        curr = int(np.asarray(m.n_kf)) - 1
        covis = np.asarray(m.covis).copy()
        cands = [
            c for c in range(1, curr)
            if covis[curr, c] > 0 and bool(np.asarray(m.kf_valid)[c])
        ]
        c = cands[0]
        # force c redundant (same construction as the cull test above)
        octv = np.asarray(m.kf_octave).copy()
        octv[c] = 7
        depth = np.asarray(m.kf_depth).copy()
        kf_mp = np.asarray(m.kf_mp)
        weak = (kf_mp[c] >= 0) & (
            np.asarray(m.pt_obs_cnt)[np.maximum(kf_mp[c], 0)] <= 3
        )
        depth[c, weak] = float(cam.th_depth) + 1.0

        # two children of c; x1 covisible with the grandparent g, x2
        # covisible ONLY with x1
        parent = np.asarray(m.parent).copy()
        g = parent[c]
        assert g >= 0
        x1, x2 = [k for k in range(1, 10) if k not in (c, g)][:2]
        parent[x1] = c
        parent[x2] = c
        covis[x1, g] = covis[g, x1] = 50
        covis[x2, :] = covis[:, x2] = 0
        covis[x2, x1] = covis[x1, x2] = 40
        covis[x2, c] = covis[c, x2] = 30   # link to the dying KF: ignored
        m = m.replace(
            kf_octave=jnp.asarray(octv), kf_depth=jnp.asarray(depth),
            parent=jnp.asarray(parent), covis=jnp.asarray(covis),
        )
        expect = oracle_cull(m, curr, cam)
        assert expect[c], "c must be culled for the scenario to exercise"

        pose = np.asarray(m.kf_pose).copy()  # m is donated below
        m2 = culling.cull_keyframes(m, jnp.asarray(curr, jnp.int32), CAPS, cam)
        assert not bool(np.asarray(m2.kf_valid)[c])
        p2 = np.asarray(m2.parent)
        assert p2[x1] == g, (p2[x1], g)
        assert p2[x2] == x1, (p2[x2], x1)   # chained, not grandparented
        # Tcp archive for trajectory recovery through c
        assert np.asarray(m2.cull_parent)[c] == g
        tcp = np.asarray(m2.kf_tcp)[c]
        np.testing.assert_allclose(
            tcp, pose[c] @ np.linalg.inv(pose[g]), atol=1e-5
        )
