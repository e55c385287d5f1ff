"""Scale-invariance distance band of the frustum gates.

Round-5 regression: the reference gates projection searches on
[0.8*minDistance, 1.2*maxDistance] (mappoint.cpp:391-401
getMin/MaxDistanceThreshold, used by frame.cpp:169-172 and every
matcher::searchByProjection/fuse site). An octave-0 point has
maxDistance == its spawn distance EXACTLY, so without the 1.2 slack it
goes invisible the moment the camera backs away at all — new points then
never collect a third observation and are culled (obs<=3 at ref_kf+2),
which collapsed every keyframe's bindings from ~900 to ~90 within three
KF events and killed loop-closure candidate matching (n_bow 8-13 vs the
>=20 gate) on the orbit scenario.
"""

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.slam_map.local_map import search_local_points
from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map


def _setup(cam_z):
    caps = MapCaps(max_kf=4, max_pt=64, max_obs=4, n_feat=64)
    cam = Camera.from_config(
        SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0))
    m = empty_map(caps)
    scale_factors = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    # one octave-0 point spawned from a camera at the origin, 2 m away
    spawn_dist = 2.0
    m = m.replace(
        pt_valid=m.pt_valid.at[0].set(True),
        pt_pos=m.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, spawn_dist])),
        pt_normal=m.pt_normal.at[0].set(jnp.asarray([0.0, 0.0, 1.0])),
        pt_min_dist=m.pt_min_dist.at[0].set(spawn_dist / float(scale_factors[-1])),
        pt_max_dist=m.pt_max_dist.at[0].set(spawn_dist),  # octave 0: == dist
        pt_desc=m.pt_desc.at[0].set(jnp.full((8,), jnp.uint32(0xA5A5A5A5))),
    )
    # camera center at world (0,0,-cam_z); T_c_w maps world -> camera, so
    # t = -R C = (0,0,+cam_z) and the point sits at depth 2 + cam_z
    T = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(cam_z)
    N = caps.n_feat
    # one target keypoint at the principal point (the projection), octave 0
    tgt_uv = jnp.zeros((N, 2), jnp.float32).at[0].set(
        jnp.asarray([float(cam.cx), float(cam.cy)]))
    tgt_valid = jnp.zeros((N,), bool).at[0].set(True)
    lm = search_local_points(
        m, T,
        candidate_mask=m.pt_valid,
        tgt_uv_und=tgt_uv,
        tgt_u_right=jnp.full((N,), -1.0),
        tgt_octave=jnp.zeros((N,), jnp.int32),
        tgt_desc=jnp.zeros((N, 8), jnp.uint32).at[0].set(
            jnp.full((8,), jnp.uint32(0xA5A5A5A5))),
        tgt_valid=tgt_valid,
        tgt_blocked=jnp.zeros((N,), bool),
        scale_factors=scale_factors,
        th_radius=1.0,
        cam=cam,
    )
    return lm


def test_within_1p2_slack_is_visible_and_matched():
    # camera backed up 0.3 m: dist 2.3 <= 1.2 * 2.0 — the reference keeps
    # this point in frustum; without the slack it was invisible
    lm = _setup(cam_z=0.3)
    assert bool(np.asarray(lm.visible_mask)[0])
    assert int(np.asarray(lm.assign)[0]) == 0


def test_beyond_1p2_slack_is_invisible():
    lm = _setup(cam_z=0.6)  # dist 2.6 > 2.4
    assert not bool(np.asarray(lm.visible_mask)[0])


def test_below_0p8_min_is_invisible():
    # min_dist = 2/1.2^7 = 0.558; 0.8*min = 0.447. Camera moved forward to
    # 0.5 m: inside [0.8*min, 1.2*max] — visible; at 0.4 m — not.
    lm = _setup(cam_z=-1.5)   # dist 0.5 >= 0.447
    assert bool(np.asarray(lm.visible_mask)[0])
    lm = _setup(cam_z=-1.6)   # dist 0.4 < 0.447
    assert not bool(np.asarray(lm.visible_mask)[0])
