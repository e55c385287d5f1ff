"""Xplane op-level trace of one mapping kernel on a synthetic map.

Usage: python tools/prof_trace2.py [fuse|fuse1|cullkf|ba|tri|track]
"""
import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import os, glob, collections
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

target = sys.argv[1] if len(sys.argv) > 1 else "ba"
_copy = jax.jit(lambda x: jax.tree.map(jnp.copy, x))
P = caps.max_pt
row = m.kf_mp[kid]
curr = jnp.zeros((P,), bool).at[jnp.maximum(row, 0)].max(row >= 0)

fns = {
    "fuse": lambda mm: fuse.search_in_neighbors(mm, kid, caps, cam, sf),
    "fuse1": lambda mm: fuse.fuse_into_keyframe(mm, kid - 1, curr, caps, cam, sf, max_cand=caps.n_feat),
    "cullkf": lambda mm: culling.cull_keyframes(mm, kid, caps, cam),
    "ba": lambda mm: local_ba.local_bundle_adjust(mm, kid, caps, cam, ils2),
    "tri": lambda mm: triangulate.create_new_map_points(mm, kid, caps, cam, sf),
    "babuild": lambda mm: local_ba.build_problem_ol(mm, kid, caps, ils2),
}
f_ba = jax.jit(fns[target])
r = f_ba(_copy(m)); jax.block_until_ready(r)

td = "/tmp/batrace"
os.system(f"rm -rf {td}")
with jax.profiler.trace(td):
    r = f_ba(_copy(m))
    jax.block_until_ready(r)

from tensorflow.tsl.profiler.protobuf import xplane_pb2
path = glob.glob(td + "/**/*.xplane.pb", recursive=True)[0]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    evm = {i: em.name for i, em in plane.event_metadata.items()}
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        for ev in line.events:
            name = evm.get(ev.metadata_id, "?")
            agg[name] += ev.duration_ps / 1e9   # ms
            cnt[name] += 1
    total = sum(agg.values())
    print(f"plane {plane.name}: total {total:.1f} ms")
    for name, ms in agg.most_common(30):
        print(f"  {ms:8.2f} ms x{cnt[name]:4d}  {name[:110]}")
