"""Phase-split of the chunked bench loop on the real TPU: track-loop wall
vs results() wall, plus cProfile of the track loop."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from vo_slam_test_tpu.bow.vocabulary import build_vocabulary
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.pipeline.system import SlamSystem

n_frames = 40
seq = SyntheticRGBD(n_frames=n_frames, seed=0, motion_scale=0.4)
cfg = SlamConfig(
    camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
    camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
)
frames = [
    (g, (d * cfg.camera_depthScale).astype(np.uint16), t)
    for g, d, t in (seq[i] for i in range(n_frames))
]
from vo_slam_test_tpu.bow.vocabulary import synth_vocabulary

voc = synth_vocabulary(k=10, levels=6, seed=0)  # bench's ORBvoc-scale tree

def make():
    return SlamSystem(cfg, vocabulary=voc, chunk=8)

# warm
w = make()
for f in frames:
    w.track(*f)
w.results()

import jax
for trial in range(3):
    tr = make()
    t0 = time.perf_counter()
    for f in frames:
        tr.track(*f)
    t1 = time.perf_counter()
    jax.block_until_ready(tr.map.kf_pose)
    t2 = time.perf_counter()
    tr.results()
    t3 = time.perf_counter()
    print(f"trial{trial}: track-loop {1e3*(t1-t0):.1f} ms, device-drain "
          f"{1e3*(t2-t1):.1f} ms, results {1e3*(t3-t2):.1f} ms")

import cProfile, pstats, io
tr = make()
pr = cProfile.Profile()
pr.enable()
for f in frames:
    tr.track(*f)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(22)
print(s.getvalue())
