"""Wall-time each background-chain component on the TPU at a realistic
KF-dense map scale (the 240-frame orbit pilot ends at ~43 KFs / ~3.4k
points). Drives the round-4 under-load optimization (VERDICT #1).

Usage: python - [n_kf] [n_pt] < tools/prof_bg_components.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from synth_map import build
from vo_slam_test_tpu.slam_map import culling, fuse, triangulate
from vo_slam_test_tpu.slam_map.map_state import MapCaps
from vo_slam_test_tpu.solvers import local_ba
from vo_slam_test_tpu.pipeline import loop_closing

n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 43
n_pt = int(sys.argv[2]) if len(sys.argv) > 2 else 3500

caps = MapCaps()
m, cam = build(caps, n_kf=n_kf, n_pt=n_pt)
sf = jnp.asarray((1.2 ** np.arange(8)).astype(np.float32))
ils2 = 1.0 / (sf * sf)
kid = jnp.asarray(n_kf - 1, jnp.int32)
gdiv = jnp.asarray(1000, jnp.int32)

ls = loop_closing.empty_loop_state(caps)


def close_multi(mm):
    cands = jnp.asarray([0, 1, -1, -1, -1, -1, -1, -1], jnp.int32)
    gens = jnp.zeros((8,), jnp.int32)
    m2, _, done, which = loop_closing.close_step_multi(
        mm, ls, kid, mm.kf_gen[kid], cands, gens, gdiv, caps, cam, sf
    )
    return m2


def detect(mm):
    ls2, cand, cand_gen = loop_closing.detect_step(
        mm, ls, jnp.asarray(True), kid, caps
    )
    return cand


fns = {
    "cull_mp": jax.jit(lambda mm: culling.cull_map_points(mm, kid, caps)),
    "triangulate": jax.jit(lambda mm: triangulate.create_new_map_points(
        mm, kid, caps, cam, sf, bow_group_div=gdiv)),
    "fuse": jax.jit(lambda mm: fuse.search_in_neighbors(mm, kid, caps, cam, sf)),
    "local_ba": jax.jit(lambda mm: local_ba.local_bundle_adjust(
        mm, kid, caps, cam, ils2)),
    # construction-only slice of local_ba (the LM loop is Pallas-bound;
    # if this dominates, the gathers in build_problem_ol are the target)
    "ba_build": jax.jit(lambda mm: local_ba.build_problem_ol(
        mm, kid, caps, ils2)),
    "cull_kf": jax.jit(lambda mm: culling.cull_keyframes(mm, kid, caps, cam)),
    "detect": jax.jit(detect),
    "close_2cand": jax.jit(close_multi),
}

# whole background_chunk programs: the fixed per-chunk cost (scan + cond
# glue + detect gating for 8 frames) vs one realistic KF event — the gap
# between the component sum and the real run's background total
from vo_slam_test_tpu.pipeline.system import background_chunk  # noqa: E402

_did0 = jnp.zeros((8,), bool)
_did1 = _did0.at[3].set(True)
_kid8 = jnp.full((8,), int(kid), jnp.int32)
_false = jnp.asarray(False)


def _bg(did):
    def f(mm):
        return background_chunk(
            mm, loop_closing.empty_loop_state(caps), did, _kid8, _false,
            gdiv, caps, cam, sf, True, inline_close=True,
        )[0]
    return f


fns["bg_chunk_noop"] = _bg(_did0)
fns["bg_chunk_1kf"] = _bg(_did1)

# the full mapping chain as ONE program (the work branch of the per-frame
# cond): if this exceeds the component sum, the overhead lives in the
# chain's composition; if it matches, the excess is scan/cond packaging
from vo_slam_test_tpu.pipeline.system import mapping_step  # noqa: E402

fns["mapping_1kf"] = lambda mm: mapping_step(
    mm, jnp.asarray(True), kid, caps, cam, sf,
    interrupt_ba=_false, bow_group_div=gdiv,
)

_copy = jax.jit(lambda x: jax.tree.map(jnp.copy, x))

# amortized device time: queue N independent (copy -> fn) executions and
# block ONCE — per-call tunnel RTT (~15-30 ms, which dominated the old
# per-call blocking numbers) spreads over N; copy cost is measured
# separately and subtracted
N = 8
jax.block_until_ready(_copy(m))
t0 = time.perf_counter()
cs = [_copy(m) for _ in range(N)]
jax.block_until_ready(cs)
copy_ms = (time.perf_counter() - t0) / N * 1000
del cs
print(f"{'(map copy)':12s} {copy_ms:8.1f} ms", flush=True)

for name, fn in fns.items():
    try:
        jax.block_until_ready(fn(_copy(m)))  # warm/compile
        t0 = time.perf_counter()
        rs = [fn(_copy(m)) for _ in range(N)]
        jax.block_until_ready(rs)
        span = (time.perf_counter() - t0) / N * 1000
        del rs
        print(f"{name:12s} {span - copy_ms:8.1f} ms  "
              f"(span {span:.1f} incl. copy {copy_ms:.1f})", flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue profiling
        print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
