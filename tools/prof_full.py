"""Op-level xplane trace of the FULL pipeline (bench.py workload) on the
real TPU: aggregates device time per executable and, inside the tracking
executable (track_chunk), per fused-op — the view that exposes which
track-side kernels to attack next.

Usage: python tools/prof_full.py [n_frames]
"""
import sys, os; sys.path.insert(0, "/root/repo")
import collections
import glob

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
import numpy as np
import jax

from vo_slam_test_tpu.bow.vocabulary import synth_vocabulary
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.pipeline.system import SlamSystem

n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
seq = SyntheticRGBD(n_frames=n, seed=0, motion_scale=0.4)
cfg = SlamConfig(camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx,
                 camera_cy=seq.cy, camera_k1=0, camera_k2=0, camera_p1=0,
                 camera_p2=0, camera_k3=0)
frames = [
    (g, (d * cfg.camera_depthScale).astype(np.uint16), t)
    for g, d, t in (seq[i] for i in range(n))
]
voc = synth_vocabulary(k=10, levels=6, seed=0)

def run():
    s = SlamSystem(cfg, vocabulary=voc, chunk=8)
    for f in frames:
        s.track(*f)
    s._flush()
    jax.block_until_ready(s._outs[-1].T_c_w)
    jax.block_until_ready(s.map.kf_pose)
    return s

run()  # warm/compile
td = "/tmp/fulltrace"
os.system(f"rm -rf {td}")
with jax.profiler.trace(td):
    run()

from tensorflow.tsl.profiler.protobuf import xplane_pb2
path = sorted(glob.glob(td + "/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
        continue
    evm = {i: em.name for i, em in plane.event_metadata.items()}
    per_exec = collections.Counter()
    per_exec_n = collections.Counter()
    track_ops = collections.Counter()
    track_ops_n = collections.Counter()
    # line 0 usually carries executable-level "jit_*" events; op lines carry
    # fused op names. We bucket ops into the enclosing executable by time.
    execs = []  # (start, end, name)
    for line in plane.lines:
        for ev in line.events:
            name = evm.get(ev.metadata_id, "?")
            if name.startswith("jit_"):
                base = name.split("(")[0]
                per_exec[base] += ev.duration_ps / 1e9
                per_exec_n[base] += 1
                execs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, base))
    execs.sort()
    starts = [e[0] for e in execs]
    import bisect
    for line in plane.lines:
        for ev in line.events:
            name = evm.get(ev.metadata_id, "?")
            if name.startswith("jit_"):
                continue
            i = bisect.bisect_right(starts, ev.offset_ps) - 1
            if i >= 0 and ev.offset_ps < execs[i][1] and "track" in execs[i][2]:
                track_ops[name] += ev.duration_ps / 1e9
                track_ops_n[name] += 1
    total = sum(per_exec.values())
    print(f"plane {plane.name}: device total {total:.1f} ms over {n} frames "
          f"({total/n:.2f} ms/frame)")
    for name, ms in per_exec.most_common(12):
        print(f"  {ms:8.1f} ms x{per_exec_n[name]:4d}  {name[:90]}")
    if track_ops:
        t = sum(track_ops.values())
        print(f"-- ops inside tracking executables: {t:.1f} ms "
              f"({t/n:.2f} ms/frame)")
        for name, ms in track_ops.most_common(40):
            print(f"  {ms:8.2f} ms x{track_ops_n[name]:5d}  {name[:110]}")
