import sys; sys.path.insert(0, "/root/repo")
import os, glob, collections
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
import numpy as np
import jax, jax.numpy as jnp
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.solvers import local_ba

n = 24
seq = SyntheticRGBD(n_frames=n, seed=0, motion_scale=0.4)
cfg = SlamConfig(camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
                 camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0)
s = SlamSystem(cfg)
for i in range(n):
    g, d, ts = seq[i]
    s.track(g, d, ts)
m = s.map
kid = jnp.asarray(int(np.asarray(m.n_kf)) - 1, jnp.int32)
caps, cam, sf = s.caps, s.camera, s.scale_factors
ils2 = 1.0 / (sf * sf)
from vo_slam_test_tpu.slam_map import fuse, culling
import sys as _sys
target = _sys.argv[1] if len(_sys.argv) > 1 else "ba"
_copy = jax.jit(lambda x: jax.tree.map(jnp.copy, x))
if target == "fuse":
    f_ba = jax.jit(lambda mm: fuse.search_in_neighbors(mm, kid, caps, cam, sf))
elif target == "cullkf":
    f_ba = jax.jit(lambda mm: culling.cull_keyframes(mm, kid, caps, cam))
else:
    f_ba = jax.jit(lambda mm: local_ba.local_bundle_adjust(mm, kid, caps, cam, ils2))
r = f_ba(_copy(m)); jax.tree.leaves(r)[0].block_until_ready()

td = "/tmp/batrace"
os.system(f"rm -rf {td}")
with jax.profiler.trace(td):
    r = f_ba(_copy(m))
    jax.tree.leaves(r)[0].block_until_ready()

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
    for name, ms in agg.most_common(25):
        print(f"  {ms:8.2f} ms x{cnt[name]:4d}  {name[:110]}")
