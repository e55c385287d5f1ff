"""Parity: fused masked-Hamming top-2 Pallas kernel vs the XLA oracle."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu.ops import match_pallas as MP


def _random_instance(rng, M, N, stereo=True):
    a = jnp.asarray(rng.integers(0, 2**32, size=(M, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32))
    # clustered projections so windows sometimes contain many / one / zero
    row_u = jnp.asarray(rng.uniform(0, 640, M), jnp.float32)
    row_v = jnp.asarray(rng.uniform(0, 480, M), jnp.float32)
    row_rw = jnp.asarray(rng.uniform(5, 120, M), jnp.float32)
    row_ur = jnp.asarray(rng.uniform(-10, 640, M), jnp.float32)
    if stereo:
        row_rur = jnp.asarray(rng.uniform(5, 120, M), jnp.float32)
    else:
        row_rur = jnp.full((M,), jnp.inf, jnp.float32)
    row_lo = jnp.asarray(rng.integers(-1, 4, M), jnp.int32)
    row_hi = row_lo + jnp.asarray(rng.integers(0, 3, M), jnp.int32)
    row_ok = jnp.asarray(rng.random(M) < 0.85)
    col_u = jnp.asarray(rng.uniform(0, 640, N), jnp.float32)
    col_v = jnp.asarray(rng.uniform(0, 480, N), jnp.float32)
    col_ur = jnp.asarray(
        np.where(rng.random(N) < 0.4, -1.0, rng.uniform(0, 640, N)), jnp.float32
    )
    col_oct = jnp.asarray(rng.integers(0, 8, N), jnp.int32)
    col_ok = jnp.asarray(rng.random(N) < 0.9)
    return (a, b, row_u, row_v, row_rw, row_ur, row_rur,
            row_lo, row_hi, row_ok, col_u, col_v, col_ur, col_oct, col_ok)


class TestMaskedTop2:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_interpret_matches_xla(self, seed):
        rng = np.random.default_rng(seed)
        args = _random_instance(rng, M=256, N=128, stereo=(seed != 1))
        got = MP.masked_top2_pallas(*args, interpret=True)
        want = MP.masked_top2_xla(*args)
        for g, w, name in zip(got, want, ["best_i", "best_d", "second_i", "second_d"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)

    @pytest.mark.parametrize("seed", [4, 5])
    def test_chi2_mode_matches_xla(self, seed):
        rng = np.random.default_rng(seed)
        args = _random_instance(rng, M=256, N=128)
        isig2 = jnp.asarray(rng.uniform(0.01, 1.0, 128), jnp.float32)
        got = MP.masked_top2_pallas(
            *args, col_isig2=isig2, chi2_gate=True, interpret=True
        )
        want = MP.masked_top2_xla(*args, col_isig2=isig2, chi2_gate=True)
        for g, w, name in zip(got, want, ["best_i", "best_d", "second_i", "second_d"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)

    def test_no_allowed_pair_row_is_big(self):
        rng = np.random.default_rng(3)
        args = list(_random_instance(rng, M=128, N=128))
        args[9] = jnp.zeros((128,), bool)  # row_ok all False
        got_i, got_d, _, got_d2 = MP.masked_top2_pallas(*args, interpret=True)
        assert np.all(np.asarray(got_d) == (1 << 20))
        assert np.all(np.asarray(got_d2) == (1 << 20))

    @pytest.mark.parametrize("seed", [6, 7])
    def test_epipolar_mode_matches_xla(self, seed):
        rng = np.random.default_rng(seed)
        M = N = 128
        a = jnp.asarray(rng.integers(0, 2**32, size=(M, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32))
        row_l = jnp.asarray(rng.normal(0, 1, (M, 3)), jnp.float32)
        row_den = row_l[:, 0] ** 2 + row_l[:, 1] ** 2
        # small bucket range so buckets collide; ~20% unknown (-1)
        row_g = jnp.asarray(
            np.where(rng.random(M) < 0.2, -1, rng.integers(0, 6, M)), jnp.int32
        )
        col_g = jnp.asarray(
            np.where(rng.random(N) < 0.2, -1, rng.integers(0, 6, N)), jnp.int32
        )
        args = (
            a, b, row_l, row_den, row_g,
            jnp.asarray(rng.random(M) < 0.9),
            jnp.asarray(rng.random(M) < 0.5),
            jnp.asarray(rng.uniform(0, 640, N), jnp.float32),
            jnp.asarray(rng.uniform(0, 480, N), jnp.float32),
            jnp.asarray(rng.uniform(1, 500, N) ** 2, jnp.float32),
            col_g,
            jnp.asarray(rng.random(N) < 0.9),
            jnp.asarray(rng.random(N) < 0.3),
        )
        got = MP.masked_top1_epi_pallas(*args, interpret=True)
        want = MP.masked_top1_epi_xla(*args)
        for g, w, name in zip(got, want, ["best_i", "best_d"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)

    def test_tie_breaks_to_lowest_index(self):
        # identical descriptors everywhere -> distance 0 ties across all
        # allowed columns; both paths must pick the lowest column index
        M, N = 128, 128
        a = jnp.zeros((M, 8), jnp.uint32)
        b = jnp.zeros((N, 8), jnp.uint32)
        z = jnp.zeros((M,), jnp.float32)
        big = jnp.full((M,), 1e6, jnp.float32)
        args = (
            a, b, z, z, big, z, jnp.full((M,), jnp.inf, jnp.float32),
            jnp.zeros((M,), jnp.int32), jnp.full((M,), 8, jnp.int32),
            jnp.ones((M,), bool),
            jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32),
            jnp.full((N,), -1.0, jnp.float32), jnp.zeros((N,), jnp.int32),
            jnp.ones((N,), bool),
        )
        got = MP.masked_top2_pallas(*args, interpret=True)
        want = MP.masked_top2_xla(*args)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        assert np.all(np.asarray(got[0]) == 0)
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))


class TestProductionShapes:
    """Parity at the REAL call-site shapes — these exercise the TM=256
    tile path and the full-width N=1024 lane layout that the smaller cases
    (M=256, N=128) cannot reach. Interpret mode vectorizes, so even
    [4096,1024] is seconds on CPU."""

    def test_local_map_shape(self):
        rng = np.random.default_rng(7)
        args = _random_instance(rng, M=4096, N=1024)
        got = MP.masked_top2_pallas(*args, interpret=True)
        want = MP.masked_top2_xla(*args)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_frame_shape_chi2(self):
        rng = np.random.default_rng(8)
        args = _random_instance(rng, M=1024, N=1024)
        isig2 = jnp.asarray(rng.uniform(0.1, 1.0, 1024), jnp.float32)
        got = MP.masked_top2_pallas(*args, col_isig2=isig2, chi2_gate=True,
                                    interpret=True)
        want = MP.masked_top2_xla(*args, col_isig2=isig2, chi2_gate=True)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


class TestNeighborBatched:
    """masked_top2_nb: B independent searches in one grid — must equal the
    per-neighbor oracle exactly, including the per-neighbor column gates."""

    @pytest.mark.parametrize("seed,chi2", [(11, False), (12, True)])
    def test_nb_matches_per_neighbor_oracle(self, seed, chi2):
        rng = np.random.default_rng(seed)
        B, M, N = 4, 256, 128
        per = [_random_instance(rng, M, N) for _ in range(B)]
        args = [jnp.stack([p[i] for p in per]) for i in range(15)]
        kw = {}
        if chi2:
            kw = {"col_isig2": jnp.asarray(
                rng.uniform(0.01, 1.0, (B, N)), jnp.float32)}
        got = MP.masked_top2_nb_pallas(*args, chi2_gate=chi2,
                                       interpret=True, **kw)
        for b in range(B):
            want = MP.masked_top2_xla(
                *per[b], chi2_gate=chi2,
                col_isig2=kw["col_isig2"][b] if chi2 else None,
            )
            for g, w, name in zip(got, want,
                                  ["best_i", "best_d", "second_i", "second_d"]):
                np.testing.assert_array_equal(
                    np.asarray(g[b]), np.asarray(w), err_msg=f"b={b} {name}")

    def test_nb_production_shape(self):
        """The fuse call-site shape: B=16 neighbors x [1024,1024]."""
        rng = np.random.default_rng(13)
        B, M, N = 16, 1024, 1024
        per = [_random_instance(rng, M, N) for _ in range(B)]
        args = [jnp.stack([p[i] for p in per]) for i in range(15)]
        isig2 = jnp.asarray(rng.uniform(0.1, 1.0, (B, N)), jnp.float32)
        got = MP.masked_top2_nb_pallas(*args, col_isig2=isig2,
                                       chi2_gate=True, interpret=True)
        b = 9  # spot-check one mid-batch neighbor fully
        want = MP.masked_top2_xla(*per[b], col_isig2=isig2[b], chi2_gate=True)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g[b]), np.asarray(w))
