"""interruptBA scheduling: the in-chunk per-event stop rule.

Round-5 semantics (localMapping.cpp:538-541 + optimizer_ceres.cpp:594):
a keyframe event's local BA is SKIPPED ENTIRELY when another keyframe is
already waiting behind it — within a chunk, event k stops iff any later
frame of the same chunk created a keyframe. The old host-side backlog>=2
heuristic measured dispatch pipelining (permanently backlogged in steady
state) and starved every BA; it survives only as the forced test hook.
"""

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.pipeline.system import SlamSystem, chunk_ba_stops


class TestChunkBaStops:
    def _stops(self, did):
        return np.asarray(chunk_ba_stops(jnp.asarray(did, bool))).tolist()

    def test_single_kf_runs_full(self):
        s = self._stops([0, 0, 1, 0, 0, 0, 0, 0])
        assert s[2] is False  # only KF: BA runs full

    def test_earlier_kf_yields_to_later(self):
        # two KFs in one chunk: the first skips, the second runs
        s = self._stops([0, 1, 0, 0, 0, 1, 0, 0])
        assert s[1] is True and s[5] is False

    def test_three_kfs_only_last_runs(self):
        s = self._stops([1, 0, 1, 0, 0, 0, 1, 0])
        assert s[0] and s[2] and not s[6]

    def test_no_kfs(self):
        assert self._stops([0] * 8) == [False] * 8

    def test_chunk_of_one(self):
        assert self._stops([1]) == [False]


class TestForcedHook:
    def _sys(self):
        s = object.__new__(SlamSystem)
        s._interrupt_false = jnp.asarray(False)
        s._interrupt_true = jnp.asarray(True)
        s._force_interrupt_ba = None
        s.n_ba_interrupts = 0
        return s

    def test_default_is_false(self):
        assert not bool(self._sys()._ba_interrupt())

    def test_force_hook_overrides(self):
        s = self._sys()
        s._force_interrupt_ba = True
        assert bool(s._ba_interrupt())
        s._force_interrupt_ba = False
        assert not bool(s._ba_interrupt())
