"""Scenario validator for the loop-closure e2e variants (runs on TPU).

Usage: python tools/dbg_loop_scenarios.py [base|reloc]

  base  — the test_loop_e2e pan scenario at the REDUCED caps (32, 8192)
          the suite wants (VERDICT r3 #6c: the 24-min e2e's cost was
          mostly the 64/16384-cap compiles + per-frame map work).
  reloc — loop-after-reloc (VERDICT r3 #6b): a kidnap (black frames)
          interrupts the pan leg, BoW relocalization recovers, and the
          drift-injected island must STILL close at the revisit — the
          interaction the reference exercises on fr2_360_kidnap +
          fr1_room back-to-back.
  churn — tests/test_churn.py's exact configuration (max_kf=14, no
          vocabulary, no drift): lifetime KF demand exceeds the cap,
          culling must free slots and recycling must fire.

Validates scenario engineering in minutes (TPU compile cache) before the
CPU suite pays ~15 min per run. DBG_CPU=1 forces CPU.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

if os.environ.get("DBG_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)

import numpy as np

from test_loop_e2e import drift_island, pan_trajectory, se3
from vo_slam_test_tpu.bow.vocabulary import build_vocabulary
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps


def build_frames(seq, scenario, kidnap_at=18, n_black=2):
    """(gray, depth, ts, gt_pose|None) per frame. For 'reloc' the pan leg
    is interrupted by black frames (sensor dropout -> LOST), then resumes
    two frames BACK (view overlap for relocalization).

    kidnap_at=18 / n_black=2 / resume-2-back keeps the cut (orig 19) and
    injection (orig 27) hooks on chunk=4 dispatch boundaries: orig i maps
    to j = i + 4 for i >= 16, so orig 19 -> j=23 and orig 27 -> j=31 —
    the chunk buffer is empty right after track() there and NO mid-run
    _flush (which would compile the per-frame program) is needed."""
    frames = []
    for i in range(len(seq)):
        g, d, ts = seq[i]
        frames.append((g, d, ts, seq.poses[i], i))
    if scenario == "base":
        return frames
    black_g = np.zeros_like(frames[0][0])
    black_d = np.zeros_like(frames[0][1])
    out = frames[:kidnap_at]
    t0 = frames[kidnap_at - 1][2]
    for j in range(n_black):
        out.append((black_g, black_d, t0 + 0.2 * (j + 1), None, -1))
    # resume two frames back: the return viewpoint is already mapped
    for g, d, ts, p, i in frames[kidnap_at - 2:]:
        out.append((g, d, ts + 2.0, p, i))
    return out


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "base"
    traj = pan_trajectory()
    seq = SyntheticRGBD(seed=41, trajectory=traj)
    cfg = SlamConfig(
        camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
        camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
        camera_fps=3,
    )
    # ALL scenarios need the vocabulary: the pan legs move ~0.2 m/frame,
    # beyond cold-model motion-only tracking — the BoW ref-KF fallback
    # (visualOdometry.cpp:227-231) is what carries frame 1 (measured: the
    # no-vocab variant loses tracking immediately at ANY cap)
    ext = OrbExtractor(Camera.from_config(cfg), n_features=1000)
    descs = []
    for i in (0, 6, 12, 20, 26, 36, 50):
        g, d, _ = seq[i]
        f = ext(g, d)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = build_vocabulary(np.concatenate(descs),
                           k=int(os.environ.get("DBG_VOC_K", "8")),
                           levels=int(os.environ.get("DBG_VOC_L", "3")), seed=3)

    caps = MapCaps(
        max_kf=int(os.environ.get("DBG_KF", "14" if scenario == "churn" else "32")),
        max_pt=int(os.environ.get("DBG_PT", "8192")))
    sys_ = SlamSystem(cfg, caps=caps, vocabulary=voc, chunk=4,
                      drain_chunk=1)

    frames = build_frames(seq, "base" if scenario == "churn" else scenario)
    drift = se3(tx=0.5, ty=0.2, ry=-0.08)
    kf_cut = None
    cut_done = scenario == "churn"  # no drift/loop in churn mode
    pre_poses = island = None
    for j, (g, d, ts, _gt, orig_i) in enumerate(frames):
        sys_.track(g, d, ts)
        if orig_i == 19 and kf_cut is None:
            assert not sys_._chunk_buf, (j, len(sys_._chunk_buf))
            kf_cut = int(np.asarray(sys_.map.n_kf))
            print(f"j={j} (orig {orig_i}): kf_cut={kf_cut}")
        if orig_i == 27 and not cut_done:
            assert not sys_._chunk_buf, (j, len(sys_._chunk_buf))
            pre_poses = np.asarray(sys_.map.kf_pose).copy()
            pre_valid = np.asarray(sys_.map.kf_valid).copy()
            nk, npts = drift_island(sys_, max(kf_cut, 1), drift)
            island = pre_valid.copy()
            island[:kf_cut] = False
            print(f"j={j}: drift injected over {nk} KFs, {npts} pts")
            cut_done = True

    traj_est, stats, _ = sys_.results()
    oks = [s.ok for s in stats]
    n_kf_ever = int(np.asarray(sys_.map.n_kf_ever))
    live = int(np.asarray(sys_.map.kf_valid).sum())
    print(f"tracked {sum(oks)}/{len(frames)}  oks={''.join(str(int(o)) for o in oks)}")
    print(f"KFs ever={n_kf_ever} live={live} (cap {caps.max_kf})  "
          f"reloc_frames={sys_.reloc_frames}")
    print(f"loop_closures={sys_.loop_closures}  attempts={sys_.loop_attempts}")
    print(f"loop_edges any: {bool(np.asarray(sys_.map.loop_edges).any())}")
    if island is not None and len(sys_.loop_closures):
        final_poses = np.asarray(sys_.map.kf_pose)
        alive = island & np.asarray(sys_.map.kf_valid)
        if alive.any():
            res = np.linalg.norm(
                final_poses[alive][:, :3, 3] - pre_poses[alive][:, :3, 3],
                axis=1)
            print(f"island residual median {np.median(res):.3f} m over "
                  f"{int(alive.sum())} live island KFs "
                  f"(drift mag {np.linalg.norm(drift[:3, 3]):.3f} m)")
        else:
            print("island fully culled by run end (residual n/a)")
    kf_gen = np.asarray(sys_.map.kf_gen)
    print(f"kf slots recycled={(kf_gen > 1).sum()} (max gen {kf_gen.max()})")
    gt_rows = [(j, f[3]) for j, f in enumerate(frames) if f[3] is not None]
    gt = np.stack([p for _, p in gt_rows])
    est = np.stack(traj_est)[[j for j, _ in gt_rows]]
    terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    print(f"t_err: median {np.median(terr):.3f} max {terr.max():.3f} m")


if __name__ == "__main__":
    main()
