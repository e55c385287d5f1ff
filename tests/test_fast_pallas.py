"""Pallas fused FAST+NMS kernel vs the XLA reference formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu.ops import fast
from vo_slam_test_tpu.ops.fast_pallas import fast_score_nms_pallas


class TestFastPallas:
    def test_matches_xla_interpret(self, synthetic_seq):
        gray, _, _ = synthetic_seq[0]
        levels = jnp.asarray(np.stack([gray, gray[::-1]]).astype(np.float32))
        ref_score = fast.fast_score(levels)
        ref = np.asarray(jnp.where(fast.nms3x3(ref_score), ref_score, 0.0))
        ours = np.asarray(fast_score_nms_pallas(levels, interpret=True))
        # ignore a 5 px border (kernel zero-pads the halo, XLA roll wraps)
        b = 5
        np.testing.assert_allclose(ours[:, b:-b, b:-b], ref[:, b:-b, b:-b], atol=1e-3)
