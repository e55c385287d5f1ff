"""Equivalence: batched neighbor fuse vs the sequential per-neighbor loop.

fuse_curr_into_neighbors runs all B neighbor searches against the PRE-fuse
map in one dispatch (see its docstring for the documented divergence
classes); on a merge-free instance it must produce EXACTLY the map the
sequential fuse_into_keyframe loop produces — bindings, observation lists,
and counts included. Reference semantics: localMapping.cpp:363-432 +
matcher.cpp:1012-1133.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax.numpy as jnp
import numpy as np

from synth_map import build
from vo_slam_test_tpu.slam_map import fuse
from vo_slam_test_tpu.slam_map.map_state import MapCaps

CAPS = MapCaps(max_kf=32, max_pt=4096)
SF = jnp.asarray((1.2 ** np.arange(8)).astype(np.float32))


def _merge_free_instance():
    """A map where the current KF's points fuse into UNBOUND slots of the
    neighbors (pure case-A fuse). synth_map alone never fuses — its
    constant (0,0,-1) point normals fail the viewing-angle gate and its
    random octaves fail the scale-band gate — so the instance is
    engineered: normals point along the ref-KF viewing ray, neighbor
    bindings are cleared, and each neighbor gets explicit matchable
    keypoints (exact projection, predicted octave, the point's own
    descriptor) for a slice of the current keyframe's points."""
    m, cam = build(CAPS, n_kf=12, n_pt=1200, seed=3)
    kf_id = jnp.asarray(11, jnp.int32)
    nb_mask = fuse.two_hop_neighbors(m, kf_id)
    nb_np = np.asarray(nb_mask)
    kf_mp = np.asarray(m.kf_mp).copy()
    kf_mp[nb_np] = -1
    # drop the severed observations so obs lists stay consistent
    obs_kf = np.asarray(m.pt_obs_kf).copy()
    obs_kp = np.asarray(m.pt_obs_kp).copy()
    sever = (obs_kf >= 0) & nb_np[np.clip(obs_kf, 0, nb_np.size - 1)]
    obs_kf[sever] = -1
    obs_kp[sever] = -1
    cnt = (obs_kf >= 0).sum(1).astype(np.int32)

    # normals along the viewing ray so the 0.5*dist cone gate passes
    poses = np.asarray(m.kf_pose)
    pt_pos = np.asarray(m.pt_pos)
    ref = np.asarray(m.pt_ref_kf)
    ow = np.stack([-poses[k, :3, :3].T @ poses[k, :3, 3]
                   for k in range(poses.shape[0])])
    line = pt_pos - ow[np.clip(ref, 0, poses.shape[0] - 1)]
    nrm = line / np.maximum(np.linalg.norm(line, axis=1, keepdims=True), 1e-9)

    # explicit matchable keypoints in each neighbor for the current KF's
    # first bound points
    kf_uv = np.asarray(m.kf_uv_und).copy()
    kf_oct = np.asarray(m.kf_octave).copy()
    kf_ur = np.asarray(m.kf_u_right).copy()
    kf_desc = np.asarray(m.kf_desc).copy()
    kf_ok = np.asarray(m.kf_kp_valid).copy()
    pt_desc = np.asarray(m.pt_desc)
    pmax = np.asarray(m.pt_max_dist)
    pmin = np.asarray(m.pt_min_dist)
    fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
    sf = np.asarray(SF)
    cands = [p for p in np.asarray(m.kf_mp[11]).tolist() if p >= 0][:120]
    for nb in np.nonzero(nb_np)[0]:
        slot = 900  # past every synth-filled slot
        for p in cands:
            pc = poses[nb, :3, :3] @ pt_pos[p] + poses[nb, :3, 3]
            if pc[2] <= 0.1 or slot >= kf_uv.shape[1]:
                continue
            u = fx * pc[0] / pc[2] + cx
            v = fy * pc[1] / pc[2] + cy
            if not (1 <= u < cam.width - 1 and 1 <= v < cam.height - 1):
                continue
            dist = np.linalg.norm(pt_pos[p] - ow[nb])
            if not (pmin[p] <= dist <= pmax[p]):
                continue
            pred = int(np.clip(np.ceil(
                np.log(max(pmax[p] / max(dist, 1e-9), 1e-9))
                / np.log(sf[1])), 0, 7))
            kf_uv[nb, slot] = (u, v)
            kf_oct[nb, slot] = pred
            kf_ur[nb, slot] = u - float(cam.bf) / pc[2]
            kf_desc[nb, slot] = pt_desc[p]
            kf_ok[nb, slot] = True
            slot += 1

    m = m.replace(
        kf_mp=jnp.asarray(kf_mp),
        pt_obs_kf=jnp.asarray(obs_kf),
        pt_obs_kp=jnp.asarray(obs_kp),
        pt_obs_cnt=jnp.asarray(cnt),
        pt_normal=jnp.asarray(nrm.astype(np.float32)),
        kf_uv_und=jnp.asarray(kf_uv),
        kf_octave=jnp.asarray(kf_oct),
        kf_u_right=jnp.asarray(kf_ur),
        kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_ok),
    )
    return m, cam, kf_id, nb_mask


class TestBatchedNeighborFuse:
    def test_matches_sequential_loop_merge_free(self):
        m, cam, kf_id, nb_mask = _merge_free_instance()
        nb_ids = fuse._compact_ids(nb_mask, 16)
        assert int(np.asarray(nb_ids >= 0).sum()) >= 3, nb_ids

        import jax

        _copy = lambda x: jax.tree.map(jnp.copy, x)  # noqa: E731
        P = CAPS.max_pt
        row = jnp.copy(m.kf_mp[kf_id])
        curr_pts = jnp.zeros((P,), bool).at[jnp.maximum(row, 0)].max(row >= 0)

        # donation inside the fuse paths consumes the input map buffers
        got = fuse.fuse_curr_into_neighbors(
            _copy(m), kf_id, nb_ids, CAPS, cam, SF)

        # sequential oracle: the pre-round-4 fori_loop body, one neighbor
        # at a time in ascending slot order
        want = _copy(m)
        for nb in np.asarray(nb_ids).tolist():
            if nb < 0:
                continue
            want = fuse.fuse_into_keyframe(
                want, jnp.asarray(nb, jnp.int32), curr_pts, CAPS, cam, SF,
                max_cand=CAPS.n_feat,
            )

        np.testing.assert_array_equal(
            np.asarray(got.kf_mp), np.asarray(want.kf_mp))
        np.testing.assert_array_equal(
            np.asarray(got.pt_obs_cnt), np.asarray(want.pt_obs_cnt))
        # observation SETS per point must agree (slot order may differ
        # only if free-slot ranks diverge; assert full equality — the
        # batched rank walk reproduces the sequential first-free order)
        np.testing.assert_array_equal(
            np.asarray(got.pt_obs_kf), np.asarray(want.pt_obs_kf))
        np.testing.assert_array_equal(
            np.asarray(got.pt_obs_kp), np.asarray(want.pt_obs_kp))
        np.testing.assert_array_equal(
            np.asarray(got.pt_valid), np.asarray(want.pt_valid))
        # sanity: the fuse actually did something
        assert int((np.asarray(got.kf_mp) != np.asarray(m.kf_mp)).sum()) > 0

    def test_merge_conflicts_stay_consistent(self):
        """Merge-heavy instance WITH cross-neighbor conflicts: the same
        decoy point is bound at the matchable slot of SEVERAL neighbors, so
        one batched pass produces merge rows sharing losers/winners across
        neighbors (the class that corrupted the room-orbit pilot: a point
        erased by one row while another row rewired observations onto it).
        The disjoint-row filter must keep the map invariant-clean:
        no binding to a dead point, every observation agreeing with kf_mp,
        counts exact — and merges must actually fire."""
        m, cam, kf_id, nb_mask = _merge_free_instance()
        nb_np = np.nonzero(np.asarray(nb_mask))[0]
        kf_mp = np.asarray(m.kf_mp).copy()
        obs_kf = np.asarray(m.pt_obs_kf).copy()
        obs_kp = np.asarray(m.pt_obs_kp).copy()
        valid = np.asarray(m.pt_valid)

        # decoy pool: live points NOT in the current keyframe and not
        # observed by any neighbor (keeps the pre-fuse map consistent)
        in_curr = np.zeros(valid.shape, bool)
        row11 = kf_mp[int(kf_id)]
        in_curr[row11[row11 >= 0]] = True
        in_nb = np.isin(obs_kf, nb_np).any(axis=1)
        pool = np.nonzero(valid & ~in_curr & ~in_nb)[0][:40]
        assert pool.size >= 8, pool.size

        # bind each engineered slot (>=900) to a decoy — the SAME decoy for
        # the same slot offset across neighbors, maximizing shared-point
        # merge rows; decoy obs lists get the new entry appended
        n_bound = 0
        for nb in nb_np:
            sl = np.nonzero(np.asarray(m.kf_kp_valid)[nb, 900:])[0] + 900
            for j, s in enumerate(sl[:24]):
                q = pool[j % pool.size]
                free = np.nonzero(obs_kf[q] < 0)[0]
                if free.size == 0:
                    continue
                kf_mp[nb, s] = q
                obs_kf[q, free[0]] = nb
                obs_kp[q, free[0]] = s
                n_bound += 1
        assert n_bound >= 16, n_bound
        m = m.replace(
            kf_mp=jnp.asarray(kf_mp),
            pt_obs_kf=jnp.asarray(obs_kf),
            pt_obs_kp=jnp.asarray(obs_kp),
            pt_obs_cnt=jnp.asarray((obs_kf >= 0).sum(1).astype(np.int32)),
        )
        live_before = int(valid.sum())

        nb_ids = fuse._compact_ids(nb_mask, 16)
        got = fuse.fuse_curr_into_neighbors(m, kf_id, nb_ids, CAPS, cam, SF)

        kf_mp2 = np.asarray(got.kf_mp)
        obs_kf2 = np.asarray(got.pt_obs_kf)
        obs_kp2 = np.asarray(got.pt_obs_kp)
        cnt2 = np.asarray(got.pt_obs_cnt)
        valid2 = np.asarray(got.pt_valid)
        assert int(valid2.sum()) < live_before, "no merge fired"
        # 1. no keyframe slot binds a dead point
        bound = kf_mp2[np.asarray(got.kf_valid)]
        bound = bound[bound >= 0]
        assert valid2[bound].all(), "dangling binding to erased point"
        # 2./3. every observation agrees with kf_mp; counts exact
        for p in np.nonzero(valid2)[0]:
            for o in range(obs_kf2.shape[1]):
                kf, kp = obs_kf2[p, o], obs_kp2[p, o]
                if kf >= 0:
                    assert kf_mp2[kf, kp] == p, (p, o, kf, kp, kf_mp2[kf, kp])
            assert cnt2[p] == (obs_kf2[p] >= 0).sum(), p

    def test_search_in_neighbors_still_consistent(self):
        """Full two-hop fuse on an untouched synthetic map: observation
        lists, counts, and bindings stay mutually consistent."""
        m, cam = build(CAPS, n_kf=12, n_pt=1200, seed=5)
        kf_id = jnp.asarray(11, jnp.int32)
        m2 = fuse.search_in_neighbors(m, kf_id, CAPS, cam, SF)
        kf_mp = np.asarray(m2.kf_mp)
        obs_kf = np.asarray(m2.pt_obs_kf)
        obs_kp = np.asarray(m2.pt_obs_kp)
        cnt = np.asarray(m2.pt_obs_cnt)
        valid = np.asarray(m2.pt_valid)
        # every observation row agrees with the keyframe binding table
        P, O = obs_kf.shape
        for p in np.nonzero(valid)[0][:400]:
            for o in range(O):
                kf, kp = obs_kf[p, o], obs_kp[p, o]
                if kf < 0:
                    continue
                assert kf_mp[kf, kp] == p, (p, o, kf, kp, kf_mp[kf, kp])
            assert cnt[p] == (obs_kf[p] >= 0).sum(), p
