"""Host-side scheduler logic: interruptBA backlog detection.

Fast tier (no jit compiles beyond two cached scalars): the decision logic
of SlamSystem._ba_interrupt over fake device refs.
"""

from vo_slam_test_tpu.pipeline.system import SlamSystem

class _FakeRef:
    def __init__(self):
        self.ready = False

    def is_ready(self):
        return self.ready


class TestInterruptScheduler:
    """Host-side interruptBA raising (localMapping.cpp:538-541 analogue):
    the flag goes up for the next background dispatch exactly when >=2
    earlier background programs are still executing (one in flight is
    normal async pipelining; two means mapping is falling behind), and
    clears as soon as the backlog drains."""

    def _sys(self):
        s = object.__new__(SlamSystem)
        import jax.numpy as jnp

        s._interrupt_false = jnp.asarray(False)
        s._interrupt_true = jnp.asarray(True)
        s._force_interrupt_ba = None
        s._bg_refs = []
        s.n_ba_interrupts = 0
        return s

    def test_backlog_raises_and_drains(self):
        s = self._sys()
        assert not bool(s._ba_interrupt())          # empty: no backlog
        r1, r2, r3 = _FakeRef(), _FakeRef(), _FakeRef()
        s._note_bg_dispatch(r1)
        assert not bool(s._ba_interrupt())          # one in flight: normal
        s._note_bg_dispatch(r2)
        assert bool(s._ba_interrupt())              # two unfinished: backlog
        assert s.n_ba_interrupts == 1
        s._note_bg_dispatch(r3)
        r1.ready = True                              # oldest completes
        assert bool(s._ba_interrupt())              # still two unfinished
        r2.ready = True
        assert not bool(s._ba_interrupt())          # backlog drained
        assert s.n_ba_interrupts == 2

    def test_force_hook_overrides(self):
        s = self._sys()
        s._force_interrupt_ba = True
        assert bool(s._ba_interrupt())
        s._force_interrupt_ba = False
        s._note_bg_dispatch(_FakeRef())
        s._note_bg_dispatch(_FakeRef())
        assert not bool(s._ba_interrupt())

    def test_ref_list_bounded(self):
        s = self._sys()
        for _ in range(30):
            s._note_bg_dispatch(_FakeRef())
        assert len(s._bg_refs) <= 8
