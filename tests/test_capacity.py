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
