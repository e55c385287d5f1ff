"""Pilot: KF cadence + closure firing of the room-orbit scenario.

Drives SlamSystem over datasets.room_orbit_trajectory in the "room" scene
and prints keyframe-creation cadence, loop-closure attempts, and the
steady-state tracking wall time — the tuning loop for the KF-dense
sustained benchmark (fr1_room duty cycle: ~1 KF per 5-10 frames,
reference vo_run.cpp:105-137).

Frames are PRE-RENDERED before the timed loop (the host ray-caster costs
~325 ms/frame on this 1-core box — the analogue of cv::imread, untimed in
the reference at vo_run.cpp:109-110) and cached on disk keyed by the
scenario parameters.

Usage: python tools/pilot_kfdense.py [n_frames] [loops] [fps] [drift_at]
PILOT_TPU=1 runs on the real chip (compile cache works there; CPU compiles
of slam_step take ~10 min and the cache must stay off, see conftest.py).
Uses the bench configuration (ORBvoc-scale synth vocabulary, chunk=8) so
the TPU compile cache is shared with bench.py.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if not os.environ.get("PILOT_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets.synthetic import SyntheticRGBD, room_orbit_trajectory
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.utils.drift import inject_drift
from vo_slam_test_tpu import lie


from vo_slam_test_tpu.datasets.staging import render_all, scene_vocabulary


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    loops = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    fps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    drift_at = int(sys.argv[4]) if len(sys.argv) > 4 else -1
    chunk = int(os.environ.get("PILOT_CHUNK", "8"))
    # churn mode (VERDICT r3 #2): a reduced keyframe cap makes lifetime
    # inserts exceed max_kf within a practical frame budget, driving slot
    # recycling + covis reparenting + Tcp recovery under sustained load
    max_kf = int(os.environ.get("PILOT_MAXKF", "256"))

    texture = float(os.environ.get("PILOT_TEXTURE", "1.0"))
    seed = int(os.environ.get("PILOT_SEED", "7"))
    dwell = float(os.environ.get("PILOT_DWELL", "0.0"))
    scenario = os.environ.get("PILOT_SCENARIO", "orbit")
    if scenario == "pan":
        from vo_slam_test_tpu.datasets.synthetic import pan_return_trajectory

        traj = pan_return_trajectory(n_frames)
    else:
        traj = room_orbit_trajectory(n_frames, loops=loops, dwell=dwell)
    seq = SyntheticRGBD(trajectory=traj, scene="room", seed=seed,
                        texture_corners=texture)
    cfg = SlamConfig(
        camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
        camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
        camera_fps=fps,
    )
    tag = "pan" if scenario == "pan" else f"orbit{loops}"
    grays, depths, times = render_all(seq, n_frames, tag)
    voc = scene_vocabulary(cfg, grays, depths, f"{tag}_{n_frames}",
                           repo_fallback="tools/data/bench_voc.npz")
    from vo_slam_test_tpu.slam_map.map_state import MapCaps

    sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=max_kf), vocabulary=voc,
                      chunk=chunk)

    D = np.asarray(lie.se3_exp(jnp.asarray(
        [0.5, 0.2, 0.0, 0.0, -0.08, 0.0], jnp.float32)))

    trace_ctx = None
    if os.environ.get("PILOT_TRACE"):
        import contextlib

        trace_dir = "/tmp/pilot_trace"
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
        trace_ctx = jax.profiler.trace(trace_dir)
        trace_ctx.__enter__()

    # pre-stage frames in device HBM before the timed loop — the bench.py
    # accounting (the reference's cv::imread places pixels in RAM before
    # its timer starts, vo_run.cpp:109-123; per-frame H2D of ~1.5 MB
    # through the tunnel otherwise lands on the tracking critical path)
    grays = [jax.device_put(np.ascontiguousarray(g)) for g in grays]
    depths = [jax.device_put(d) for d in depths]
    jax.block_until_ready(depths[-1])

    t0 = time.time()
    t_half = None
    per_frame = []
    for i in range(n_frames):
        tf = time.perf_counter()
        sys_.track(grays[i], depths[i], times[i])
        per_frame.append(time.perf_counter() - tf)
        if i == n_frames // 2:
            t_half = time.time()  # steady state: compiles amortized
        if i == drift_at:
            sys_._flush()
            cut = jnp.maximum(sys_.map.n_kf // 2, 1)
            m2, a2 = inject_drift(sys_.map, sys_.state.assign_real,
                                  cut, jnp.asarray(D, jnp.float32))
            sys_.map = m2
            sys_.state = sys_.state.replace(assign_real=a2)
            print(f"[pilot] injected drift at f{i}, cut={int(cut)}", flush=True)
        if i % 40 == 39:
            print(f"[pilot] f{i+1}  ({(time.time()-t0)/(i+1)*1000:.0f} ms/f)",
                  flush=True)
    jax.block_until_ready(sys_.map.kf_pose)
    wall = time.time() - t0
    steady = (time.time() - t_half) / (n_frames - n_frames // 2 - 1)
    # NOTE: 'steady' is DISTORTED by host run-ahead (the host finishes
    # dispatching long before the device drains the backlog, so t_half is
    # early and the window carries most of the run's device work); the
    # authoritative throughput number is the warm pass below — a fresh
    # tracker over the same staged frames with every compile cached,
    # exactly bench.py's measured run
    warm_wall = None
    if not os.environ.get("PILOT_NO_WARM"):
        sys2 = SlamSystem(cfg, caps=MapCaps(max_kf=max_kf), vocabulary=voc,
                          chunk=chunk)
        tw = time.time()
        for i in range(n_frames):
            sys2.track(grays[i], depths[i], times[i])
        sys2._flush()
        jax.block_until_ready(sys2._outs[-1].T_c_w)
        jax.block_until_ready(sys2.map.kf_pose)
        warm_wall = time.time() - tw
        sys2.results()  # fold close outcomes for the closure check
        print(f"WARM full pass: {warm_wall/n_frames*1000:.2f} ms/f "
              f"(closures {sys2.loop_closures})", flush=True)
    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from bench import background_device_ms

        bg_ms, dev_total = background_device_ms("/tmp/pilot_trace")
        print(f"[pilot] device total {dev_total:.0f} ms "
              f"({dev_total/n_frames:.1f}/f), background {bg_ms:.0f} ms "
              f"({bg_ms/n_frames:.1f}/f)", flush=True)

    traj_est, stats, _kf_traj = sys_.results()
    from vo_slam_test_tpu.datasets.tum import ate_rmse

    gt = np.stack([seq.poses[i] for i in range(n_frames)])
    ate = ate_rmse(times, gt, times, traj_est)
    oks = sum(s.ok for s in stats)
    made = np.concatenate(
        [np.asarray(o.made_kf).ravel() for o in sys_._outs])[:n_frames]
    kf_frames = np.nonzero(made)[0]
    gaps = np.diff(kf_frames)
    n_kf = int(np.asarray(sys_.map.n_kf))
    n_valid = int(np.asarray(sys_.map.kf_valid).sum())
    print(f"wall {wall/n_frames*1000:.1f} ms/f  "
          f"steady(2nd half) {steady*1000:.1f} ms/f")
    # host-side profile: where does a chunk's wall time go? (track() is
    # async-dispatch only — a slow phase means the HOST blocked there)
    pf = np.asarray(per_frame[n_frames // 2:]) * 1000
    by_phase = [pf[j::chunk].mean() for j in range(chunk)]
    print(f"host ms by (i mod chunk), steady half: "
          f"{[f'{b:.1f}' for b in by_phase]}  "
          f"(dispatch frame = {chunk - 1})")
    print(f"tracked {oks}/{n_frames}, KFs created={made.sum()} "
          f"(live={n_valid}, n_kf={n_kf}), ATE={ate*100:.2f}cm")
    ok_arr = np.asarray([bool(s.ok) for s in stats])
    n_match = np.concatenate(
        [np.asarray(o.n_matches).ravel() for o in sys_._outs])[:n_frames]
    n_inl = np.concatenate(
        [np.asarray(o.n_inliers).ravel() for o in sys_._outs])[:n_frames]
    if not ok_arr.all():
        bad = np.nonzero(~ok_arr)[0]
        spans = np.split(bad, np.nonzero(np.diff(bad) > 1)[0] + 1)
        print(f"LOST spans: {[(int(s[0]), int(s[-1])) for s in spans]}")
        for s in spans[:4]:
            f0 = int(s[0])
            lo = max(f0 - 3, 0)
            print(f"  around f{f0}: matches {n_match[lo:f0+2].tolist()} "
                  f"inliers {n_inl[lo:f0+2].tolist()}")
    print(f"KF frames: {kf_frames.tolist()}")
    if len(gaps):
        print(f"KF gaps: median {np.median(gaps):.0f} "
              f"mean {gaps.mean():.1f} max {gaps.max()}")
    print(f"loop attempts (frame, cand, ok): {sys_.loop_attempts}")
    print(f"loop closures at frames: {sys_.loop_closures}")
    if sys_.ba_iters:
        its = np.asarray([(a, b) for _, a, b in sys_.ba_iters])
        print(f"BA LM iterations per KF event (pass1+pass2): "
              f"total {its.sum()}, mean {its.sum(1).mean():.1f}, "
              f"median {np.median(its.sum(1)):.0f}, max {its.sum(1).max()}, "
              f"pass1 mean {its[:,0].mean():.1f}, pass2 mean {its[:,1].mean():.1f}; "
              f"interrupts={sys_.n_ba_interrupts}")
        print(f"BA iters by event: {[(f, a, b) for f, a, b in sys_.ba_iters]}")
    # churn metrics (VERDICT #2): lifetime inserts vs cap, slot recycling
    kf_gen = np.asarray(sys_.map.kf_gen)
    pt_gen = np.asarray(sys_.map.pt_gen)
    ever = int(np.asarray(sys_.map.n_kf_ever))
    print(f"churn: KF inserts ever={ever} (cap {sys_.caps.max_kf}), "
          f"culled={ever - n_valid}, recycled slots={(kf_gen > 1).sum()} "
          f"(max gen {kf_gen.max()}), "
          f"pt recycled={(pt_gen > 1).sum()} (max gen {pt_gen.max()}), "
          f"live points={int(np.asarray(sys_.map.pt_valid).sum())}")


if __name__ == "__main__":
    main()
