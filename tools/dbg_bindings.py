"""Track per-KF live map-point binding counts over the orbit run.

The round-5 closure investigation: loop candidates at the revisit hold only
35-95 live bindings (of ~1000 keypoints), so searchByBoW cannot reach the
>=20 gate even though raw frame-to-frame matchability is healthy (292
ratio-test matches f0<->f160). This instrument answers WHEN and HOW FAST a
keyframe's bindings decay.

Usage: python tools/dbg_bindings.py [n_frames]   (TPU; DBG_CPU=1 for CPU)
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("DBG_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets.staging import render_all, scene_vocabulary
from vo_slam_test_tpu.datasets.synthetic import SyntheticRGBD, room_orbit_trajectory
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps


@jax.jit
def kf_binding_counts(m):
    bound = (m.kf_mp >= 0) & m.kf_kp_valid
    # cull_map_points predicates evaluated on the live map: how many
    # currently-recent points would die by which rule
    curr = jnp.maximum(m.n_kf_ever - 1, 0)
    recent = m.pt_valid & (m.pt_ref_kf >= 0)
    ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(m.pt_visible, 1)
    r_kill = recent & (ratio < 0.25)
    o_kill = recent & (m.pt_obs_cnt <= 3)
    return (jnp.sum(bound, axis=1), jnp.sum(m.pt_valid),
            jnp.sum(recent), jnp.sum(r_kill), jnp.sum(o_kill),
            jnp.sum(m.pt_valid & (m.pt_obs_cnt <= 2)),
            jnp.sum(jnp.where(m.pt_valid, m.pt_obs_cnt, 0)),
            m.kf_mp[:16], m.pt_valid)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    traj = room_orbit_trajectory(n_frames, loops=1.5)
    seq = SyntheticRGBD(trajectory=traj, scene="room", seed=7)
    cfg = SlamConfig(
        camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
        camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
        camera_fps=30,
    )
    grays, depths, times = render_all(seq, n_frames, "orbit1.5")
    voc = scene_vocabulary(cfg, grays, depths, f"orbit1.5_{n_frames}",
                           repo_fallback="tools/data/bench_voc.npz")
    s = SlamSystem(cfg, caps=MapCaps(), vocabulary=voc, chunk=8)

    snaps = []
    for i in range(n_frames):
        s.track(np.asarray(grays[i]), np.asarray(depths[i]), float(times[i]))
        if (i + 1) % 16 == 0:
            s._flush()
            out = kf_binding_counts(s.map)
            snaps.append((i, np.asarray(out[0]).copy(),
                          tuple(int(x) for x in out[1:7]),
                          np.asarray(out[7]).copy(), np.asarray(out[8]).copy()))
    s._flush()
    out = kf_binding_counts(s.map)
    snaps.append((n_frames - 1, np.asarray(out[0]).copy(),
                  tuple(int(x) for x in out[1:7]),
                  np.asarray(out[7]).copy(), np.asarray(out[8]).copy()))

    _ = s.results()
    ninl = np.concatenate([np.atleast_1d(np.asarray(o.n_inliers)).ravel()
                           for o in s._outs])[:n_frames]
    nmat = np.concatenate([np.atleast_1d(np.asarray(o.n_matches)).ravel()
                           for o in s._outs])[:n_frames]
    print(f"tracking n_matches median {np.median(nmat):.0f} "
          f"p10 {np.percentile(nmat,10):.0f}; n_inliers median "
          f"{np.median(ninl):.0f} p10 {np.percentile(ninl,10):.0f}")
    print(f"tracked, KFs ever={int(np.asarray(s.map.n_kf_ever))}, "
          f"live points={snaps[-1][2][0]}")
    print("frame | pts recent r<.25 obs<=3 obs<=2 mean_obs | bindings of KF slots 0..9")
    for i, c, st, _, _ in snaps:
        npts, nrec, nrk, nok, no2, obs_sum = st
        print(f"f{i:4d} | {npts:5d} {nrec:5d} {nrk:5d} {nok:5d} {no2:5d} "
              f"{obs_sum/max(npts,1):5.2f} | {c[:10].tolist()}")
    # binding-loss attribution between consecutive snapshots:
    # a binding (s,kp) present before and -1 now was lost either because
    # the point DIED (pt_valid now False) or was UNBOUND while the point
    # lives (BA chi2 erasure / fuse winner path)
    print("snapshot-diff binding loss per slot 0..9: (died, unbound-live)")
    for a, b in zip(snaps[:-1], snaps[1:]):
        mp0, pv1, mp1 = a[3], b[4], b[3]
        rows = []
        for sl in range(10):
            was = mp0[sl] >= 0
            lost = was & (mp1[sl] < 0)
            pts = mp0[sl][lost]
            died = int((~pv1[pts]).sum())
            rows.append((died, int(lost.sum()) - died))
        print(f"f{a[0]:3d}->f{b[0]:3d}: {rows}")
    # decay summary for the first 6 slots
    first = {k: None for k in range(6)}
    for i, c, *_ in snaps:
        for k in range(6):
            if first[k] is None and c[k] > 0:
                first[k] = c[k]
    last = snaps[-1][1]
    for k in range(6):
        if first[k]:
            print(f"KF slot {k}: peak-ish {first[k]} -> final {last[k]} "
                  f"({100.0*last[k]/max(first[k],1):.0f}%)")


if __name__ == "__main__":
    main()
