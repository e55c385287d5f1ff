"""End-to-end loop closure through the full SlamSystem.

A panning trajectory views the back wall, sweeps to the side wall and
returns. Mid-pan — when the start region is fully out of view — the test
injects accumulated drift the way real systems acquire it: every keyframe
and map point created after the pan start (plus the tracking state's
reference) is rigidly transformed by D. Projections are invariant under
the transform, so tracking continues seamlessly in the drifted island;
on return, the old (undrifted) wall points no longer match (off by D, far
beyond the search radii), so the revisit spawns fresh keyframes whose BoW
vectors recall the old place: detect_step accumulates consistency, and
close_step must verify the Sim3 (which equals D), correct the drifted
island, and pull the trajectory back — post-closure ATE < pre-closure ATE.

This drives the same cascade as the reference's LoopClosing thread on
fr1_room (loopClosing.cpp:17-37): detection -> consistency -> Sim3 RANSAC
-> refine -> >=40 projection gate -> correctLoop -> essential graph.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.bow.vocabulary import build_vocabulary
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps

pytestmark = pytest.mark.slow  # multi-minute: full SlamSystem compiles


def se3(tx=0.0, ty=0.0, tz=0.0, rx=0.0, ry=0.0, rz=0.0):
    return np.asarray(
        lie.se3_exp(jnp.asarray([tx, ty, tz, rx, ry, rz], jnp.float32))
    )


def pan_trajectory():
    """T_w_c list: hold on the back wall, pan fully onto the side wall
    (the start view leaves the frustum entirely), pan home."""
    yaws = (
        [0.02 * i for i in range(6)]                  # settle
        + [0.1 + 0.133 * i for i in range(12)]        # pan out to ~1.7 rad
        + [1.7] * 4                                   # hold on the side wall
        + [1.7 - 0.133 * i for i in range(12)]        # pan back
        + [0.1 - 0.02 * i for i in range(6)]          # home
    )
    return np.stack([se3(tx=0.05 * np.sin(3 * y), ry=y) for y in yaws])


def drift_island(sys_, kf_cut, D):
    """Rigidly move every keyframe at or after kf_cut AND every point whose
    reference keyframe is in that set by the world-side drift D (p' = D p,
    T' = T D^-1): projections are invariant, so tracking continues; the map
    now has two inconsistent islands. Points are selected by pt_ref_kf —
    slot recycling means point ids are NOT creation-ordered."""
    m = sys_.map
    kf_sel = np.zeros(m.kf_valid.shape[0], bool)
    kf_sel[kf_cut:] = True
    kf_sel &= np.asarray(m.kf_valid)
    ref = np.asarray(m.pt_ref_kf)
    pt_sel = (ref >= 0) & kf_sel[np.clip(ref, 0, kf_sel.size - 1)]
    pt_sel &= np.asarray(m.pt_valid)

    D_j = jnp.asarray(D, jnp.float32)
    D_inv = jnp.asarray(np.linalg.inv(D), jnp.float32)
    poses = np.asarray(m.kf_pose)
    new_poses = jnp.where(
        jnp.asarray(kf_sel)[:, None, None], jnp.asarray(poses) @ D_inv, m.kf_pose
    )
    pts_h = m.pt_pos @ D_j[:3, :3].T + D_j[:3, 3]
    new_pts = jnp.where(jnp.asarray(pt_sel)[:, None], pts_h, m.pt_pos)
    sys_.map = m.replace(kf_pose=new_poses, pt_pos=new_pts)
    return int(kf_sel.sum()), int(pt_sel.sum())


class TestLoopClosureE2E:
    def test_pan_loop_fires_and_corrects(self):
        traj = pan_trajectory()
        seq = SyntheticRGBD(seed=41, trajectory=traj)
        cfg = SlamConfig(
            camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
            camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
            # a small fps = small max-frame-gap: the reference's gap rule
            # (visualOdometry.cpp:397-461) then keeps keyframe cadence high
            # enough for the >=10-KF loop gap and 4 consecutive detections
            camera_fps=3,
        )
        # vocabulary spanning both views
        ext = OrbExtractor(Camera.from_config(cfg), n_features=1000)
        descs = []
        for i in (0, 8, 13, 18, 30):
            g, d, _ = seq[i]
            f = ext(g, d)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        voc = build_vocabulary(np.concatenate(descs), k=8, levels=3, seed=3)

        sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=64, max_pt=16384), vocabulary=voc)

        drift = se3(tx=0.25, ty=0.1, ry=0.04)
        cut_done = False
        for i in range(len(seq)):
            g, d, ts = seq[i]
            sys_.track(g, d, ts)
            if i == 19 and not cut_done:
                # fully turned: the start view is out of the frustum, so
                # the island split cannot be re-anchored by old points
                kf_cut = int(np.asarray(sys_.map.n_kf)) - 2
                nk, npts = drift_island(sys_, max(kf_cut, 1), drift)
                assert nk >= 1 and npts > 50, (nk, npts)
                cut_done = True

        traj_est, stats, _ = sys_.results()
        oks = [s.ok for s in stats]
        assert sum(oks) > 0.9 * len(seq), oks

        # the loop must have fired and installed loop edges
        assert sys_.loop_closures, "loop closure never fired"
        assert bool(np.asarray(sys_.map.loop_edges).any())

        # post-closure trajectory must beat the drift magnitude: without
        # correction the drifted island is off by ~0.28 m
        gt = np.stack([seq.poses[i] for i in range(len(seq))])
        t_err = np.linalg.norm(
            np.stack(traj_est)[:, :3, 3] - gt[:, :3, 3], axis=1
        )
        # frames tracked in the drifted island before correction would sit
        # at ~|drift|; after the essential graph they must come back
        assert np.median(t_err[-6:]) < 0.12, t_err[-10:]
