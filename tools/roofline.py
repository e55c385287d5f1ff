"""MFU/roofline accounting for the dominant kernels (VERDICT r4 #2).

For each hot kernel: analytic FLOPs + HBM bytes per invocation, measured
device time (amortized over queued executions, tunnel RTT excluded), and
the achieved fraction of the v5e peak — answering "is this cost
compressible or at the hardware bound?".

v5e (TPU v5 lite, 1 chip): ~197 TFLOP/s bf16 MXU, ~98 TFLOP/s f32
(3-pass), HBM ~819 GB/s. The package pins matmul precision HIGHEST, so
f32 matmuls pay the multi-pass cost.

Usage (TPU): python tools/roofline.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np
import jax
import jax.numpy as jnp

from synth_map import build
from vo_slam_test_tpu.slam_map import fuse, triangulate
from vo_slam_test_tpu.slam_map.map_state import MapCaps
from vo_slam_test_tpu.solvers import local_ba
from vo_slam_test_tpu.ops import match_pallas
from vo_slam_test_tpu.ops.pyramid import PyramidSpec, build_pyramid
from vo_slam_test_tpu.ops import fast

PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 2  # 3-pass f32 on the MXU, ~half bf16 throughput
HBM_BW = 819e9

caps = MapCaps()
m, cam = build(caps, n_kf=43, n_pt=3500)
sf = jnp.asarray((1.2 ** np.arange(8)).astype(np.float32))
ils2 = 1.0 / (sf * sf)
kid = jnp.asarray(42, jnp.int32)

_copy = jax.jit(lambda x: jax.tree.map(jnp.copy, x))


def measure(fn, arg, reps=8):
    jax.block_until_ready(fn(arg))
    args = [_copy(arg) for _ in range(reps)]
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    outs = [fn(a) for a in args]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1000.0


def report(name, ms, flops, bytes_):
    tf = flops / (ms / 1e3) / 1e12
    gbs = bytes_ / (ms / 1e3) / 1e9
    pct_c = 100.0 * tf * 1e12 / PEAK_F32
    pct_m = 100.0 * gbs * 1e9 / HBM_BW
    bound = "HBM" if pct_m > pct_c else "compute"
    print(f"{name:26s} {ms:8.2f} ms  {tf:7.2f} TF/s ({pct_c:5.1f}% f32 peak)  "
          f"{gbs:7.1f} GB/s ({pct_m:5.1f}% BW)  -> {bound}-bound side")


# ---------------------------------------------------------------------------
# local BA: one LM iteration at the production [O=12, L=8192, W=24] layout
# ---------------------------------------------------------------------------
O, L, W = local_ba.O_BA, local_ba.L_PT, local_ba.W_KF
OL = O * L

# per-iteration FLOPs (dominant einsums; residual/jacobian geometry ~small):
#   Hll  [3,3,L]: 9*OL mul-add        bl: 3*OL
#   Gpp + Hpp GEMM: 36*OL (build) + 2*36*OL*W
#   bp GEMM: 2*6*OL*W
#   cross: 18*OL;  Wc einsum: 2*18*OL*W (one-hot matmul)
#   WHinv: [W,6,3,L]x[3,3,L]: 2*W*18*3*L
#   S_off: [W,6,3,L]x[W,6,3,L] -> [W6,W6]: 2*(6W)^2*3*L
#   rhs, dx_pt, cost evals: ~30*OL
ba_flops_iter = (
    2 * (9 + 3 + 36 + 18 + 30) * OL
    + 2 * 36 * OL * W + 2 * 6 * OL * W + 2 * 18 * OL * W
    + 2 * W * 54 * L + 2 * (6 * W) ** 2 * 3 * L
)
# per-iteration HBM traffic (f32): the [O,L] planes (~10 reads/writes) and
# the [W,6,3,L] Wc/WHinv intermediates (2 arrays, written+read)
ba_bytes_iter = 4 * (10 * OL + 2 * 2 * (W * 18 * L))

ba_fn = jax.jit(lambda mm: local_ba.local_bundle_adjust(mm, kid, caps, cam, ils2))
ms = measure(ba_fn, m)
# iterations actually run: ftol exits make this data-dependent; the
# synthetic map converges fast — count via the iters variant once
_, n1, n2 = jax.jit(lambda mm: local_ba.local_bundle_adjust_iters(
    mm, kid, caps, cam, ils2))(_copy(m))
iters = int(n1) + int(n2)
print(f"[local_ba] measured {ms:.1f} ms for {iters} LM iterations "
      f"(+build/classify/write-back)")
report("local_ba per-LM-iter", ms / max(iters + 2, 1), ba_flops_iter, ba_bytes_iter)

# ---------------------------------------------------------------------------
# masked_top2 (local-map search shape M=4096 x N=1024)
# ---------------------------------------------------------------------------
M, N = 4096, 1024
rng = np.random.default_rng(0)
a_desc = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32))
b_desc = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
rf = lambda n: jnp.asarray(rng.random(n, dtype=np.float32) * 400)
args = dict(
    row_u=rf(M), row_v=rf(M), row_rw=rf(M) * 0 + 50.0, row_ur=rf(M),
    row_rur=rf(M) * 0 + 50.0,
    row_lo=jnp.zeros((M,), jnp.int32), row_hi=jnp.full((M,), 7, jnp.int32),
    row_ok=jnp.ones((M,), bool),
    col_u=rf(N), col_v=rf(N), col_ur=rf(N),
    col_oct=jnp.zeros((N,), jnp.int32), col_ok=jnp.ones((N,), bool),
)
mt_fn = jax.jit(lambda ad: match_pallas.masked_top2(ad, b_desc, **args))
ms = measure(mt_fn, a_desc)
# per pair: 8 XOR + 8 popcount + add-reduce ~ 24 ops; plus gate arithmetic ~12
mt_flops = M * N * 36
mt_bytes = 4 * (M * 8 + N * 8 + 6 * (M + N))  # descriptors + geometry, VMEM-resident matrix
report("masked_top2 4096x1024", ms, mt_flops, mt_bytes)

# ---------------------------------------------------------------------------
# FAST score over the full pyramid batch
# ---------------------------------------------------------------------------
spec = PyramidSpec(640, 480, 8, 1.2)
img = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
pyr = build_pyramid(img, spec)
from vo_slam_test_tpu.ops.pyramid import interior
levels = interior(pyr.raw, spec)
fs_fn = jax.jit(lambda lv: fast.fast_score(lv))
ms = measure(fs_fn, levels)
LHW = int(np.prod(levels.shape))
# 16 shifted diffs + 2x windowed-min doubling chains (~8 min ops x2) + maxes
fs_flops = LHW * (16 + 2 * 8 * 16 + 16)
fs_bytes = 2 * LHW * (16 + 4)  # bf16 reads of shifted stacks + writes
report("fast_score [8,H,W]", ms, fs_flops, fs_bytes)

# ---------------------------------------------------------------------------
# fuse: the batched neighbor search (B=16 masked_top2_nb shape)
# ---------------------------------------------------------------------------
fu_fn = jax.jit(lambda mm: fuse.search_in_neighbors(mm, kid, caps, cam, sf))
ms = measure(fu_fn, m)
B = 16
fu_flops = B * caps.n_feat * caps.n_feat * 36 + 2 * caps.max_pt * 50
fu_bytes = 4 * (B * caps.n_feat * 16 + caps.max_pt * 60)
report("fuse (search_in_neighbors)", ms, fu_flops, fu_bytes)

# ---------------------------------------------------------------------------
# triangulation (BoW-bucketed pair search + geometry)
# ---------------------------------------------------------------------------
tr_fn = jax.jit(lambda mm: triangulate.create_new_map_points(
    mm, kid, caps, cam, sf, bow_group_div=jnp.asarray(1000, jnp.int32)))
ms = measure(tr_fn, m)
tr_flops = caps.n_feat * caps.n_feat * 40 + caps.n_feat * 2000
tr_bytes = 4 * caps.max_pt * 80
report("triangulate", ms, tr_flops, tr_bytes)

print("\nNotes: FLOP/byte models are analytic (dominant terms only); "
      "percentages are vs f32-path peak / HBM peak. A kernel far from both "
      "bounds is latency/glue-bound (fusion or layout work can compress it); "
      "near the HBM bound only layout changes (smaller padded shapes, bf16 "
      "where exact) help.")
