import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.pipeline.system import SlamSystem, mapping_step
from vo_slam_test_tpu.solvers import local_ba
from vo_slam_test_tpu.slam_map import culling, fuse, triangulate

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
print("KFs", int(np.asarray(m.kf_valid).sum()), "pts", int(np.asarray(m.pt_valid).sum()))

_copy_jit = jax.jit(lambda x: jax.tree.map(jnp.copy, x))

def mcopy(x):
    return _copy_jit(x)

def timeit(name, fn, reps=6):
    def block(o):
        jax.tree.leaves(o)[0].block_until_ready()
    outs = fn()  # compile
    block(outs)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn()
        block(outs)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms")
    return outs

true_flag = jnp.asarray(True)
timeit("copy_map", lambda: mcopy(m))
f_cp = jax.jit(lambda mm: culling.cull_map_points(mm, kid, caps))
f_tri = jax.jit(lambda mm: triangulate.create_new_map_points(mm, kid, caps, cam, sf))
f_fuse = jax.jit(lambda mm: fuse.search_in_neighbors(mm, kid, caps, cam, sf))
f_ba = jax.jit(lambda mm: local_ba.local_bundle_adjust(mm, kid, caps, cam, ils2))
f_ck = jax.jit(lambda mm: culling.cull_keyframes(mm, kid, caps, cam))
timeit("cull_points", lambda: f_cp(mcopy(m)))
timeit("triangulate", lambda: f_tri(mcopy(m)))
timeit("fuse", lambda: f_fuse(mcopy(m)))
timeit("local_ba", lambda: f_ba(mcopy(m)))
timeit("cull_kfs", lambda: f_ck(mcopy(m)))
timeit("mapping_step(all)", lambda: mapping_step(mcopy(m), true_flag, kid, caps, cam, sf))
