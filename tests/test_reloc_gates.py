"""Differential test of the relocalization top-up gate cascade.

Fast tier: stubbed top-up functions, no SlamSystem compile.
"""

import jax.numpy as jnp
import numpy as np


class TestTopupCascadeDifferential:
    """reloc_topup_cascade vs a literal python transcription of the
    reference's relocalization top-up branches (visualOdometry.cpp:352-384),
    property-tested over randomized (n0, add1, n1, add2, n2) grids with
    stubbed top-up functions. The cascade must pick the same final
    inlier count — and therefore the same >=50 accept decision — for every
    combination of gate outcomes."""

    @staticmethod
    def reference(n0, add1, n1, add2, n2):
        """visualOdometry.cpp:352-384 verbatim (n0 < 50 assumed: the
        caller's gate)."""
        inliers = n0
        if n0 + add1 >= 50:
            inliers = n1
            if 30 < inliers < 50:
                if inliers + add2 >= 50:
                    inliers = n2
        return inliers

    def test_randomized_grid(self):
        import itertools

        import jax

        from vo_slam_test_tpu.pipeline.system import reloc_topup_cascade

        import jax as _jax

        # tag poses/kp so we can verify WHICH stage's state was adopted
        T0, T1, T2 = (jnp.eye(4) * (i + 1.0) for i in range(3))
        kp0, kp1, kp2 = (jnp.full((4,), i, jnp.int32) for i in range(3))

        @_jax.jit  # traced ONCE over scalar inputs; 300 cases replay it
        def cascade(n0, add1, n1, add2, n2):
            topup1 = lambda T, kp: (T1, kp1, n1, add1)
            topup2 = lambda T, kp: (T2, kp2, n2, add2)
            return reloc_topup_cascade(topup1, topup2, T0, kp0, n0)

        def run(n0, add1, n1, add2, n2):
            T, kp, n = cascade(
                *(jnp.asarray(v, jnp.int32) for v in (n0, add1, n1, add2, n2))
            )
            return int(n), int(np.asarray(kp)[0])

        grid = [0, 9, 10, 29, 30, 31, 49, 50, 51, 80]
        rng = np.random.default_rng(3)
        cases = list(itertools.product(grid, [0, 15, 40], grid, [0, 15, 40], grid))
        rng.shuffle(cases)
        for n0, add1, n1, add2, n2 in cases[:300]:
            if n0 >= 50:
                continue  # caller gate
            want = self.reference(n0, add1, n1, add2, n2)
            got_n, got_stage = run(n0, add1, n1, add2, n2)
            assert got_n == want, (n0, add1, n1, add2, n2, got_n, want)
            # adopted state matches the stage the count came from
            exp_stage = {n0: 0, n1: 1, n2: 2}
            # (ambiguous when counts collide; only check when unique)
            vals = [n0, n1, n2]
            if vals.count(want) == 1:
                assert got_stage == exp_stage[want]
