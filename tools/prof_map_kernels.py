"""Micro-profile the mapping-chain kernels on a synthetic filled map.

The tunneled runtime adds ~25-30 ms per BLOCKING call, so each op is timed
by the slope between a short and a long chain of applications (the RTT
cancels): cost = (T(n2) - T(n1)) / (n2 - n1).
"""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")

import numpy as np
import jax, jax.numpy as jnp

from synth_map import build
from vo_slam_test_tpu.slam_map import culling, fuse, triangulate
from vo_slam_test_tpu.slam_map.map_state import MapCaps
from vo_slam_test_tpu.solvers import local_ba

caps = MapCaps()
m, cam = build(caps)
sf = jnp.asarray((1.2 ** np.arange(8)).astype(np.float32))
ils2 = 1.0 / (sf * sf)
kid = jnp.asarray(int(np.asarray(m.n_kf)) - 1, jnp.int32)
print("KFs", int(np.asarray(m.kf_valid).sum()), "pts", int(np.asarray(m.pt_valid).sum()),
      "device", jax.devices()[0])

_copy_jit = jax.jit(lambda x: jax.tree.map(jnp.copy, x))


def chain_time(f, n, reps=4):
    best = 1e9
    for _ in range(reps):
        mm = _copy_jit(m)
        jax.block_until_ready(mm)
        t0 = time.perf_counter()
        for _ in range(n):
            mm = f(mm)
        jax.block_until_ready(mm)
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(name, f, n1=1, n2=6):
    f(_copy_jit(m))  # compile
    t1 = chain_time(f, n1)
    t2 = chain_time(f, n2)
    print(f"{name}: {(t2 - t1) / (n2 - n1) * 1000:.2f} ms  (raw1 {t1*1000:.1f})")


f_cp = jax.jit(lambda mm: culling.cull_map_points(mm, kid, caps))
f_tri = jax.jit(lambda mm: triangulate.create_new_map_points(mm, kid, caps, cam, sf))
f_fuse = jax.jit(lambda mm: fuse.search_in_neighbors(mm, kid, caps, cam, sf))
f_ba = jax.jit(lambda mm: local_ba.local_bundle_adjust(mm, kid, caps, cam, ils2))
f_ck = jax.jit(lambda mm: culling.cull_keyframes(mm, kid, caps, cam))

row = m.kf_mp[kid]
P = caps.max_pt
curr = jnp.zeros((P,), bool).at[jnp.maximum(row, 0)].max(row >= 0)
f1 = jax.jit(lambda mm: fuse.fuse_into_keyframe(mm, kid - 1, curr, caps, cam, sf, max_cand=caps.n_feat))
f2 = jax.jit(lambda mm: fuse.fuse_into_keyframe(mm, kid - 1, curr, caps, cam, sf))


def ck_gather(mm):
    K, N = mm.kf_mp.shape
    connected = (mm.covis[kid] > 0) & mm.kf_valid
    C = 32
    pos = jnp.cumsum(connected.astype(jnp.int32)) - 1
    slot = jnp.where(connected & (pos < C), pos, C)
    cand_ids = jnp.full((C + 1,), -1, jnp.int32).at[slot].set(jnp.arange(K, dtype=jnp.int32))[:C]
    cid = jnp.maximum(cand_ids, 0)
    pt = mm.kf_mp[cid]
    safe_pt = jnp.maximum(pt, 0)
    oct_b = mm.kf_octave[jnp.maximum(mm.pt_obs_kf[safe_pt], 0), jnp.maximum(mm.pt_obs_kp[safe_pt], 0)]
    return mm.replace(n_pt=mm.n_pt + (oct_b.sum() % 1))


def ck_erase(mm):
    return culling.erase_points(mm, mm.pt_valid & (jnp.arange(P) % 997 == 0))


f_g = jax.jit(ck_gather)
f_e = jax.jit(ck_erase)

timeit("null copy", _copy_jit)
timeit("cull_points", f_cp)
timeit("triangulate", f_tri)
timeit("fuse(all)", f_fuse)
timeit("local_ba", f_ba)
timeit("cull_kfs", f_ck)
timeit("fuse_one(N=1024)", f1)
timeit("fuse_one(4096)", f2)
timeit("cull_kfs [C,N,O] gather", f_g)
timeit("erase_points", f_e)
