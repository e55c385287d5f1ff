"""Capacity lifecycle: culled keyframe/point slots are recycled.

The reference's map is unbounded (map.h:16-17) with erase/replace protocols;
the fixed-shape TPU map must keep inserting past max_kf/max_pt inserts by
reusing invalid rows (round 1 froze KF creation at max_kf insertions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.frontend.frame import FrameFeatures
from vo_slam_test_tpu.slam_map import insert as map_insert
from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map

CAPS = MapCaps(max_kf=8, max_pt=256, max_obs=8, n_feat=32)


def make_feats(seed=0, n_valid=20):
    rng = np.random.default_rng(seed)
    N = CAPS.n_feat
    uv = rng.uniform([50, 50], [600, 430], (N, 2)).astype(np.float32)
    return FrameFeatures(
        uv=jnp.asarray(uv), uv_und=jnp.asarray(uv),
        response=jnp.ones((N,)), angle=jnp.zeros((N,)),
        octave=jnp.zeros((N,), jnp.int32),
        depth=jnp.full((N,), 2.0),
        u_right=jnp.full((N,), -1.0),
        desc=jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32)),
        valid=jnp.asarray(np.arange(N) < n_valid),
    )


def cam():
    return Camera.from_config(
        SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0)
    )


def insert(m, seed, T=None):
    feats = make_feats(seed)
    N = CAPS.n_feat
    return map_insert.insert_keyframe(
        m, CAPS, feats,
        jnp.eye(4) if T is None else T,
        jnp.asarray(float(seed)), jnp.asarray(seed, jnp.int32),
        jnp.full((N,), -1, jnp.int32),
        feats.valid,
        cam(), jnp.asarray(1.2 ** np.arange(8), jnp.float32),
    )


class TestCapacityLifecycle:
    def test_kf_slot_reuse_bumps_generation(self):
        m = empty_map(CAPS)
        for i in range(CAPS.max_kf):
            m, kid = insert(m, i)
            assert int(kid) == i
        # map full: free slot 3 (simulating a cull) and insert again
        m = m.replace(kf_valid=m.kf_valid.at[3].set(False))
        gen3 = int(np.asarray(m.kf_gen)[3])
        m, kid = insert(m, 100)
        assert int(kid) == 3, int(kid)
        assert bool(np.asarray(m.kf_valid)[3])
        assert int(np.asarray(m.kf_gen)[3]) == gen3 + 1
        # loop edges of the recycled slot were cleared
        assert not np.asarray(m.loop_edges)[3].any()

    def test_point_slots_recycled(self):
        m = empty_map(CAPS)
        P = CAPS.max_pt
        # nearly fill the point table
        valid = np.zeros(P, bool)
        valid[: P - 40] = True
        m = m.replace(pt_valid=jnp.asarray(valid), n_pt=jnp.asarray(P - 40, jnp.int32))
        want = jnp.asarray(np.arange(CAPS.n_feat) < 30)
        ids = np.asarray(map_insert.allocate_point_slots(m, want))
        got = ids[np.asarray(want)]
        assert (got >= 0).all()
        assert (got >= P - 40).all() and (got < P - 1).all()  # P-1 = dump row
        # free a few culled rows in the middle: they are recycled first
        valid[5] = valid[17] = False
        m = m.replace(pt_valid=jnp.asarray(valid))
        ids2 = np.asarray(map_insert.allocate_point_slots(m, want))
        got2 = ids2[np.asarray(want)]
        assert got2[0] == 5 and got2[1] == 17, got2[:4]

    def test_full_map_allocates_nothing(self):
        m = empty_map(CAPS)
        m = m.replace(pt_valid=jnp.ones((CAPS.max_pt,), bool))
        want = jnp.asarray(np.arange(CAPS.n_feat) < 10)
        ids = np.asarray(map_insert.allocate_point_slots(m, want))
        assert (ids[np.asarray(want)] == -1).all()


class TestGenerationGuards:
    def test_insert_into_full_map_is_noop(self):
        """argmax(~kf_valid) on an all-valid mask is 0 — without the guard a
        capacity-unaware call site would overwrite the gauge keyframe."""
        m = empty_map(CAPS)
        for i in range(CAPS.max_kf):
            m, _ = insert(m, i)
        pose0 = np.asarray(m.kf_pose[0]).copy()
        n_pt_before = int(np.asarray(m.n_pt))
        m2, kid = insert(m, 99, T=jnp.asarray(np.diag([1, 1, 1, 1.0]).astype(np.float32)))
        assert int(kid) == -1
        np.testing.assert_array_equal(np.asarray(m2.kf_pose[0]), pose0)
        assert int(np.asarray(m2.n_pt)) == n_pt_before
        assert int(np.asarray(m2.n_kf_ever)) == CAPS.max_kf

    def test_kf_seq_is_creation_ordered_across_recycling(self):
        m = empty_map(CAPS)
        for i in range(CAPS.max_kf):
            m, _ = insert(m, i)
        m = m.replace(kf_valid=m.kf_valid.at[2].set(False))
        m, kid = insert(m, 50)
        assert int(kid) == 2
        # the recycled low slot carries a HIGH sequence number
        assert int(np.asarray(m.kf_seq[2])) == CAPS.max_kf
        assert int(np.asarray(m.kf_gen[2])) == 2

    def test_pt_gen_bumps_on_slot_reuse(self):
        m = empty_map(CAPS)
        m, _ = insert(m, 0)
        gen_before = np.asarray(m.pt_gen).copy()
        # kill point slot 5 and re-insert: the slot is recycled
        m = m.replace(pt_valid=m.pt_valid.at[5].set(False))
        m, _ = insert(m, 1)
        assert bool(np.asarray(m.pt_valid[5]))
        assert int(np.asarray(m.pt_gen[5])) == int(gen_before[5]) + 1


class TestTrajectoryRecovery:
    """recover_frame_pose: generation-checked Tcp parent-chain walk."""

    def _arrays(self, K=4):
        return dict(
            kf_pose=np.tile(np.eye(4, dtype=np.float32), (K, 1, 1)),
            kf_valid=np.ones(K, bool),
            kf_gen=np.ones(K, np.int32),
            cull_parent=np.full(K, -1, np.int32),
            cull_parent_gen=np.full(K, -1, np.int32),
            cull_gen=np.full(K, -1, np.int32),
            kf_tcp=np.tile(np.eye(4, dtype=np.float32), (K, 1, 1)),
        )

    def test_live_matching_gen_composes(self):
        from vo_slam_test_tpu.pipeline.system import recover_frame_pose
        a = self._arrays()
        a["kf_pose"][1, :3, 3] = [1.0, 0, 0]
        T_cr = np.eye(4, dtype=np.float32)
        raw = np.full((4, 4), 9.0, np.float32)
        out = recover_frame_pose(1, 1, T_cr, raw, **a)
        np.testing.assert_allclose(out[:3, 3], [1.0, 0, 0])

    def test_culled_chain_walks_through_archive(self):
        from vo_slam_test_tpu.pipeline.system import recover_frame_pose
        a = self._arrays()
        # KF1 (gen 1) culled, archived: Tcp shifts by +2 in x, parent=0 (gen 1)
        a["kf_valid"][1] = False
        a["cull_gen"][1] = 1
        a["cull_parent"][1] = 0
        a["cull_parent_gen"][1] = 1
        a["kf_tcp"][1, :3, 3] = [2.0, 0, 0]
        out = recover_frame_pose(1, 1, np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32), **a)
        np.testing.assert_allclose(out[:3, 3], [2.0, 0, 0])

    def test_reused_parent_slot_refuses_wrong_generation(self):
        from vo_slam_test_tpu.pipeline.system import recover_frame_pose
        a = self._arrays()
        # KF1 culled at gen 1, its archived parent was KF0 gen 1 — but KF0's
        # slot has since been culled and reused (now gen 2). Composing
        # through it would emit a wrong pose; the walk must bail to raw.
        a["kf_valid"][1] = False
        a["cull_gen"][1] = 1
        a["cull_parent"][1] = 0
        a["cull_parent_gen"][1] = 1
        a["kf_gen"][0] = 2          # reused slot
        a["cull_gen"][0] = -1       # gen-1 archive never written / lost
        raw = np.diag([1, 1, 1, 1.0]).astype(np.float32)
        raw[:3, 3] = [7.0, 7, 7]
        out = recover_frame_pose(1, 1, np.eye(4, dtype=np.float32), raw, **a)
        np.testing.assert_allclose(out[:3, 3], [7.0, 7, 7])

    def test_reused_ref_slot_with_lost_archive_bails(self):
        from vo_slam_test_tpu.pipeline.system import recover_frame_pose
        a = self._arrays()
        # frame referenced gen 1 of slot 2; slot now live at gen 3 and the
        # archive describes gen 2's cull — composing would be wrong
        a["kf_gen"][2] = 3
        a["cull_gen"][2] = 2
        raw = np.eye(4, dtype=np.float32)
        raw[:3, 3] = [5.0, 0, 0]
        out = recover_frame_pose(2, 1, np.eye(4, dtype=np.float32), raw, **a)
        np.testing.assert_allclose(out[:3, 3], [5.0, 0, 0])
