"""Device quad-tree distribution: properties + host-quadtree agreement."""

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.ops.distribute_device import distribute_level

BOUNDS = (16.0, 624.0, 16.0, 464.0)


def random_cands(rng, M=2520, n_valid=None, clustered=False):
    if clustered:
        centers = rng.uniform([60, 60], [580, 420], (6, 2))
        pts = centers[rng.integers(0, 6, M)] + rng.normal(0, 12, (M, 2))
        xs = np.clip(pts[:, 0], 16, 623.9).astype(np.float32)
        ys = np.clip(pts[:, 1], 16, 463.9).astype(np.float32)
    else:
        xs = rng.uniform(16, 624, M).astype(np.float32)
        ys = rng.uniform(16, 464, M).astype(np.float32)
    resp = rng.uniform(1, 200, M).astype(np.float32)
    valid = np.zeros(M, bool)
    valid[rng.choice(M, n_valid or M // 2, replace=False)] = True
    return xs, ys, resp, valid


class TestDistributeLevel:
    def test_respects_target_and_validity(self):
        rng = np.random.default_rng(0)
        xs, ys, resp, valid = random_cands(rng)
        for target in (10, 100, 500):
            keep = np.asarray(
                distribute_level(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(resp),
                                 jnp.asarray(valid), BOUNDS, target)
            )
            assert keep.sum() <= target
            assert not (keep & ~valid).any()

    def test_spatial_spread(self):
        """With clustered input and a moderate target the kept points must
        cover multiple clusters, not just the best-response one."""
        rng = np.random.default_rng(1)
        xs, ys, resp, valid = random_cands(rng, clustered=True, n_valid=2000)
        keep = np.asarray(
            distribute_level(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(resp),
                             jnp.asarray(valid), BOUNDS, 60)
        )
        assert keep.sum() >= 50
        # kept candidates span most of the image, not one blob
        kx, ky = xs[keep], ys[keep]
        assert kx.max() - kx.min() > 250
        assert ky.max() - ky.min() > 180

    def test_sparse_input_all_kept(self):
        """Fewer candidates than target -> every valid candidate survives
        (each becomes its own node)."""
        rng = np.random.default_rng(2)
        xs, ys, resp, valid = random_cands(rng, n_valid=40)
        keep = np.asarray(
            distribute_level(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(resp),
                             jnp.asarray(valid), BOUNDS, 500)
        )
        assert keep.sum() == 40

    def test_best_response_per_cell(self):
        """Two candidates in the same fine cell: only the stronger stays
        when the target forces splitting down to them."""
        M = 64
        xs = np.full(M, 100.0, np.float32)
        ys = np.full(M, 100.0, np.float32)
        xs[:32] = np.linspace(20, 600, 32)   # spread 32 singles
        ys[:32] = np.linspace(20, 460, 32)
        # slots 32..63 all at (100,100)±0.5 — same deepest cell
        xs[32:] = 100.0 + np.linspace(0, 0.5, 32)
        resp = np.arange(M, dtype=np.float32)
        valid = np.ones(M, bool)
        keep = np.asarray(
            distribute_level(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(resp),
                             jnp.asarray(valid), BOUNDS, 60)
        )
        kept_cluster = np.nonzero(keep[32:])[0]
        assert len(kept_cluster) == 1
        assert kept_cluster[0] == 31  # the highest response in the cluster
