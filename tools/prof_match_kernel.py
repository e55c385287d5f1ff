"""Micro-benchmark: fused masked-Hamming kernels vs the XLA formulation on
the real TPU, at production shapes.

- local-map search shape [4096, 1024] (window mode, top-2)
- frame search shape [1024, 1024] (window mode)
- fuse shape [1024, 1024] (chi2 mode)
- triangulation shape [1024, 1024] (epipolar mode)

Usage: python tools/prof_match_kernel.py
"""
import sys, time; sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_slam_test_tpu.ops import match_pallas as MP

rng = np.random.default_rng(0)


def window_args(M, N):
    a = jnp.asarray(rng.integers(0, 2**32, size=(M, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32))
    f = lambda s, lo, hi: jnp.asarray(rng.uniform(lo, hi, s), jnp.float32)
    return (a, b, f(M, 0, 640), f(M, 0, 480), f(M, 5, 60), f(M, 0, 640),
            f(M, 5, 60),
            jnp.asarray(rng.integers(0, 7, M), jnp.int32),
            jnp.asarray(rng.integers(0, 7, M) + 1, jnp.int32),
            jnp.ones((M,), bool),
            f(N, 0, 640), f(N, 0, 480), f(N, -1, 640),
            jnp.asarray(rng.integers(0, 8, N), jnp.int32),
            jnp.ones((N,), bool))


def epi_args(M, N):
    a = jnp.asarray(rng.integers(0, 2**32, size=(M, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32))
    l = jnp.asarray(rng.normal(0, 1, (M, 3)), jnp.float32)
    return (a, b, l, l[:, 0] ** 2 + l[:, 1] ** 2,
            jnp.asarray(rng.integers(0, 64, M), jnp.int32),
            jnp.ones((M,), bool), jnp.asarray(rng.random(M) < 0.5),
            jnp.asarray(rng.uniform(0, 640, N), jnp.float32),
            jnp.asarray(rng.uniform(0, 480, N), jnp.float32),
            jnp.asarray(rng.uniform(1, 400, N), jnp.float32),
            jnp.asarray(rng.integers(0, 64, N), jnp.int32),
            jnp.ones((N,), bool), jnp.asarray(rng.random(N) < 0.3))


def bench(name, fn, args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:42s} {ms:8.3f} ms")
    return out, ms


print("backend:", jax.default_backend())
for M, N, tag in [(4096, 1024, "local-map"), (1024, 1024, "frame")]:
    args = window_args(M, N)
    op, _ = bench(f"pallas window [{M}x{N}] ({tag})",
                  jax.jit(lambda *a: MP.masked_top2_pallas(*a)), args)
    ox, _ = bench(f"xla    window [{M}x{N}] ({tag})",
                  jax.jit(lambda *a: MP.masked_top2_xla(*a)), args)
    same = all(np.array_equal(np.asarray(p), np.asarray(x))
               for p, x in zip(op, ox))
    print(f"  parity on TPU: {'OK' if same else 'MISMATCH'}")

args = window_args(1024, 1024)
isig2 = jnp.asarray(rng.uniform(0.01, 1.0, 1024), jnp.float32)
op, _ = bench("pallas chi2 [1024x1024] (fuse)",
              jax.jit(lambda *a: MP.masked_top2_pallas(
                  *a, col_isig2=isig2, chi2_gate=True)), args)
ox, _ = bench("xla    chi2 [1024x1024] (fuse)",
              jax.jit(lambda *a: MP.masked_top2_xla(
                  *a, col_isig2=isig2, chi2_gate=True)), args)
print("  parity on TPU:",
      "OK" if all(np.array_equal(np.asarray(p), np.asarray(x))
                  for p, x in zip(op, ox)) else "MISMATCH")

eargs = epi_args(1024, 1024)
op, _ = bench("pallas epi [1024x1024] (triangulation)",
              jax.jit(lambda *a: MP.masked_top1_epi_pallas(*a)), eargs)
ox, _ = bench("xla    epi [1024x1024] (triangulation)",
              jax.jit(lambda *a: MP.masked_top1_epi_xla(*a)), eargs)
print("  parity on TPU:",
      "OK" if all(np.array_equal(np.asarray(p), np.asarray(x))
                  for p, x in zip(op, ox)) else "MISMATCH")
