import sys, os; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
# Default: run on the REAL TPU — compiles go through the remote compiler
# ONCE and persist in ~/.cache/jax_vo_slam_tpu, so scenario iterations are
# minutes, not the ~15 min of fresh CPU compiles per run (the CPU persistent
# cache is unusable: the axon interposer poisons it with mismatched AOT
# artifacts — conftest.py). DBG_CPU=1 forces CPU (cache off, slow, hermetic).
import jax
if os.environ.get("DBG_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)
import numpy as np
import jax.numpy as jnp
from test_loop_e2e import drift_island, se3
import numpy as _np

def pan_trajectory():
    # settle: a 2D Lissajous sweep over the back wall (lateral + vertical
    # + dolly, INSIDE the box scene: right wall x=1.5, floor y=0.8) — each
    # frame reveals fresh wall regions, so ~10 keyframes accumulate before
    # the pan and the revisit keyframes land past the reference's
    # kf_seq >= last_loop + 10 detection gate (loopClosing.cpp:63-67) with
    # room for 3+ consecutive detection rounds
    # recede from the wall: every frame brings new peripheral area into
    # the frustum, so keyframes keep being created (~10 by pan start)
    settle = [se3(tx=0.12 * _np.sin(0.8 * i),
                  ty=0.1 * _np.sin(1.3 * i),
                  tz=-0.15 * i,
                  ry=0.05 * _np.sin(1.1 * i))
              for i in range(14)]
    z0 = -0.15 * 13
    yaws = (
        [0.1 + 0.133 * i for i in range(12)]
        + [1.7] * 4
        + [1.7 - 0.133 * i for i in range(12)]
        + [0.1 - 0.02 * i for i in range(4)]
    )
    # pan at the settle-end depth (no teleports mid-sequence)
    pan = [se3(tx=0.05 * _np.sin(3 * y), tz=z0, ry=y) for y in yaws]
    # home: KEEP receding over the old wall — detection needs a keyframe
    # per consistency round, and keyframes follow new view area
    home = [se3(tx=0.1 * _np.sin(0.9 * i + 2), ty=0.1 * _np.sin(1.1 * i),
                tz=z0 - 0.15 * (i + 1), ry=0.04 * _np.sin(1.3 * i))
            for i in range(14)]
    return _np.stack(settle + pan + home)
from vo_slam_test_tpu.bow.vocabulary import build_vocabulary
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps

traj = pan_trajectory()
seq = SyntheticRGBD(seed=41, trajectory=traj)
cfg = SlamConfig(camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
                 camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
                 camera_fps=3)
ext = OrbExtractor(Camera.from_config(cfg), n_features=1000)
descs = []
for i in (0, 6, 12, 20, 26, 36, 50):
    g, d, _ = seq[i]
    f = ext(g, d)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = build_vocabulary(np.concatenate(descs), k=8, levels=3, seed=3)
sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=64, max_pt=16384), vocabulary=voc,
                  drain_chunk=1)

# trace every close_step attempt with the gate diagnostics
from vo_slam_test_tpu.pipeline import loop_closing as _LC
_orig_close = _LC.close_step
def _close_dbg(m, ls, kf_id, cand, *a, **k):
    ki, ci = int(np.asarray(kf_id)), int(np.asarray(cand))
    print(f"   pre-close: kf{ki} valid={bool(np.asarray(m.kf_valid[ki]))} "
          f"gen={int(np.asarray(m.kf_gen[ki]))} cand{ci} "
          f"valid={bool(np.asarray(m.kf_valid[ci]))} "
          f"gen={int(np.asarray(m.kf_gen[ci]))} "
          f"expect kf_gen={int(np.asarray(k.get('kf_gen_expect', -1)))} "
          f"cand_gen={int(np.asarray(k.get('cand_gen_expect', -1)))}")
    m2, ls2, acc, info = _orig_close(m, ls, kf_id, cand, *a, **k, diag=True)
    print(f"   close_step kf={int(np.asarray(kf_id))} cand={int(np.asarray(cand))} "
          f"accept={bool(np.asarray(acc))} "
          f"gates[gen={bool(np.asarray(info['gen_ok']))} "
          f"gap={bool(np.asarray(info['gap_ok']))} "
          f"bow={int(np.asarray(info['n_bow']))}/20 "
          f"ransac={int(np.asarray(info['n_ransac']))}/20 "
          f"ref={int(np.asarray(info['n_ref']))}/20 "
          f"proj={int(np.asarray(info['total']))}/40]")
    return m2, ls2, acc
_LC.close_step = _close_dbg
# large drift: revisit must NOT re-anchor onto the old undrifted points
# (0.12 m was within the high-octave local-search windows — tracking
# silently healed the island and no loop was left to close). The rotation
# must shift the image the SAME direction as the translation: with
# (tx=0.45, ry=+0.06) the f*tx/z and f*ry terms cancel near z~5m and far
# wall points re-matched; opposite-sign ry makes the minimum offset
# f*|ry| ~ 42 px > the largest (43 px) high-octave search window only
# when combined with the translation term, so no depth can cancel.
drift = se3(tx=0.5, ty=0.2, ry=-0.08)
kf_cut = pt_cut = None
cut_done = False
for i in range(len(seq)):
    g, d, ts = seq[i]
    sys_.track(g, d, ts)
    if i == 20:
        kf_cut = int(np.asarray(sys_.map.n_kf))
        print(f"frame {i}: island cut recorded kf_cut={kf_cut}")
    if i == 27 and not cut_done:
        pre_poses = np.asarray(sys_.map.kf_pose).copy()   # pre-injection
        pre_valid = np.asarray(sys_.map.kf_valid).copy()
        nk, npts = drift_island(sys_, kf_cut, drift)
        island = pre_valid.copy(); island[:kf_cut] = False
        # also shift the tracking state if its ref KF is in the island:
        # T_cr is relative so it follows the ref pose automatically
        print(f"frame {i}: drift injected over {nk} KFs, {npts} pts")
        cut_done = True
    if i in (8, 17, 24, 31, 38, 45, 52, 59):
        mm = sys_.map
        ref = np.asarray(mm.pt_ref_kf); pv = np.asarray(mm.pt_valid)
        old = pv & (ref >= 0) & (ref <= 3)
        print(f"   [i={i}] live pts total={int(pv.sum())} old-island={int(old.sum())} "
              f"obs_hist={np.bincount(np.asarray(mm.pt_obs_cnt)[pv], minlength=5)[:5].tolist()}")
    o = sys_._outs[-1]
    counts = np.asarray(sys_.loop_state.counts)
    print(f"f{i:02d} ok={int(np.asarray(o.ok))} kf={int(np.asarray(o.made_kf))} "
          f"ref={int(np.asarray(o.ref_kf))} inl={int(np.asarray(o.n_inliers))} "
          f"lc={counts[counts>0].tolist()}")
traj_est, stats, _ = sys_.results()
print("loop_closures:", sys_.loop_closures)
print("loop_edges any:", bool(np.asarray(sys_.map.loop_edges).any()))
counts = np.asarray(sys_.loop_state.counts)
print("final consistency counts:", counts[counts > 0])
gt = np.stack([seq.poses[i] for i in range(len(seq))])
t_err = np.linalg.norm(np.stack(traj_est)[:, :3, 3] - gt[:, :3, 3], axis=1)
print("t_err full:", np.round(t_err, 3).tolist())

# island-pose recovery: the injected drift is RIGID, so a perfect closure
# returns every island keyframe to its recorded pre-injection pose —
# independent of the natural drift the estimator accumulated vs gt
final_poses = np.asarray(sys_.map.kf_pose)
drift_mag = np.linalg.norm(drift[:3, 3])
rec = np.linalg.norm(final_poses[island][:, :3, 3] - pre_poses[island][:, :3, 3], axis=1)
print(f"island recovery: |D|={drift_mag:.3f} residual per-KF t err "
      f"{np.round(rec, 3).tolist()}")

