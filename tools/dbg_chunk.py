"""Ad-hoc: chunk-mode tracking vs per-frame tracking on a short synthetic
sequence (CPU). Expect: both track 8/8, similar ATE, same KF count."""
import sys, os; sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
import numpy as np
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.datasets.tum import ate_rmse
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps

seq = SyntheticRGBD(n_frames=8, seed=21, motion_scale=0.5)
cfg = SlamConfig(
    camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
    camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
)
gt = np.stack([seq.poses[i] for i in range(len(seq))])

for chunk in (1, 4):
    s = SlamSystem(cfg, caps=MapCaps(max_kf=32, max_pt=8192), chunk=chunk)
    for i in range(len(seq)):
        g, d, ts = seq[i]
        s.track(g, d, ts)
    traj, stats, _ = s.results()
    rmse = ate_rmse(s.timestamps, gt, s.timestamps, traj)
    print(f"chunk={chunk}: ok={sum(st.ok for st in stats)}/{len(seq)} "
          f"kfs={s.n_keyframes} pts={s.n_points} ate={rmse*100:.3f}cm")
    assert sum(st.ok for st in stats) == len(seq)
    assert rmse < 0.02
print("CHUNK-OK")
