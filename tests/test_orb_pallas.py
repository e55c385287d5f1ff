"""Pallas fused orientation+descriptor kernel vs the XLA formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu.ops import brief, orientation
from vo_slam_test_tpu.ops.orb_pallas import orb_angle_desc_pallas
from vo_slam_test_tpu.ops.pyramid import PyramidSpec, build_pyramid


class TestOrbPallas:
    def test_matches_xla_interpret(self, synthetic_seq):
        gray, _, _ = synthetic_seq[0]
        spec = PyramidSpec(640, 480, 2, 1.2)
        pyr = build_pyramid(jnp.asarray(gray), spec)
        rng = np.random.default_rng(5)
        n = 64
        ys = jnp.asarray(rng.integers(16, 380, n), jnp.int32)
        xs = jnp.asarray(rng.integers(16, 510, n), jnp.int32)
        lv = jnp.asarray(rng.integers(0, 2, n), jnp.int32)

        ang_ref = np.asarray(orientation.ic_angle(pyr.raw, lv, ys, xs))
        desc_ref = np.asarray(brief.compute_descriptors(pyr.blur, lv, ys, xs, jnp.asarray(ang_ref)))

        ang, desc = orb_angle_desc_pallas(pyr.raw, pyr.blur, lv, ys, xs, interpret=True)
        ang = np.asarray(ang); desc = np.asarray(desc)
        d = np.abs(ang - ang_ref); d = np.minimum(d, 360 - d)
        assert d.max() < 0.01, d.max()
        flips = np.unpackbits((desc ^ desc_ref).view(np.uint8), axis=1).sum(1)
        assert flips.max() <= 2, flips.max()  # rint ties on blurred values
