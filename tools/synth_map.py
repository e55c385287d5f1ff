"""Synthetic filled MapState for kernel profiling (no SlamSystem warmup).

Builds a consistent map: V valid keyframes on a smooth trajectory, Q valid
points, each observed by a run of consecutive keyframes, kf_mp bindings and
pt_obs_* lists mutually consistent, covisibility from shared counts.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.slam_map.map_state import MapCaps, empty_map


def build(caps=MapCaps(), n_kf=40, n_pt=8000, seed=0, span_max=7):
    rng = np.random.default_rng(seed)
    K, P, O, N = caps.max_kf, caps.max_pt, caps.max_obs, caps.n_feat
    n_kf = min(n_kf, K)
    n_pt = min(n_pt, P - 1)

    cfg = SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0)
    cam = Camera.from_config(cfg)
    fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))

    # smooth forward trajectory
    kf_pose = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(n_kf):
        kf_pose[k, 0, 3] = -0.08 * k        # t_c_w translation
        th = 0.01 * k
        c, s = np.cos(th), np.sin(th)
        kf_pose[k, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    pt_pos = np.zeros((P, 3), np.float32)
    pt_pos[:n_pt] = rng.uniform([-3, -2, 1.5], [6, 2, 7], (n_pt, 3))
    pt_desc = np.zeros((P, 8), np.uint32)
    pt_desc[:n_pt] = rng.integers(0, 2**32, (n_pt, 8), dtype=np.uint32)

    # each point observed by a run of consecutive KFs
    first = rng.integers(0, n_kf, n_pt)
    span = rng.integers(2, min(span_max, O), n_pt)

    pt_obs_kf = np.full((P, O), -1, np.int32)
    pt_obs_kp = np.full((P, O), -1, np.int32)
    kf_mp = np.full((K, N), -1, np.int32)
    kf_uv = np.zeros((K, N, 2), np.float32)
    kf_oct = np.zeros((K, N), np.int32)
    kf_depth = np.full((K, N), -1.0, np.float32)
    kf_ur = np.full((K, N), -1.0, np.float32)
    kf_desc = np.zeros((K, N, 8), np.uint32)
    kf_kp_valid = np.zeros((K, N), bool)
    next_kp = np.zeros(K, np.int32)

    for p in range(n_pt):
        oi = 0
        for k in range(first[p], min(first[p] + span[p], n_kf)):
            kp = next_kp[k]
            if kp >= N:
                continue
            pc = kf_pose[k, :3, :3] @ pt_pos[p] + kf_pose[k, :3, 3]
            if pc[2] <= 0.1:
                continue
            u = fx * pc[0] / pc[2] + cx
            v = fy * pc[1] / pc[2] + cy
            if not (0 <= u < cam.width and 0 <= v < cam.height):
                continue
            kf_uv[k, kp] = (u, v)
            kf_oct[k, kp] = rng.integers(0, 8)
            kf_depth[k, kp] = pc[2]
            kf_ur[k, kp] = u - float(cam.bf) / pc[2]
            kf_desc[k, kp] = pt_desc[p] ^ rng.integers(0, 2, 8).astype(np.uint32)
            kf_kp_valid[k, kp] = True
            kf_mp[k, kp] = p
            pt_obs_kf[p, oi] = k
            pt_obs_kp[p, oi] = kp
            next_kp[k] += 1
            oi += 1
            if oi >= O:
                break

    obs_cnt = (pt_obs_kf[:, :] >= 0).sum(1).astype(np.int32)
    # covisibility
    covis = np.zeros((K, K), np.int32)
    for p in range(n_pt):
        ks = pt_obs_kf[p][pt_obs_kf[p] >= 0]
        for a in ks:
            for b in ks:
                if a != b:
                    covis[a, b] += 1

    ow = np.stack([-kf_pose[k, :3, :3].T @ kf_pose[k, :3, 3] for k in range(K)])
    ref = np.where(obs_cnt > 0, pt_obs_kf[:, 0], -1)
    d = np.linalg.norm(pt_pos - ow[np.maximum(ref, 0)], axis=1)

    m = empty_map(caps)
    m = m.replace(
        kf_pose=jnp.asarray(kf_pose),
        kf_valid=jnp.asarray(np.arange(K) < n_kf),
        kf_seq=jnp.asarray(np.where(np.arange(K) < n_kf, np.arange(K), -1).astype(np.int32)),
        kf_gen=jnp.asarray((np.arange(K) < n_kf).astype(np.int32)),
        kf_uv_und=jnp.asarray(kf_uv),
        kf_octave=jnp.asarray(kf_oct),
        kf_depth=jnp.asarray(kf_depth),
        kf_u_right=jnp.asarray(kf_ur),
        kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_kp_valid),
        kf_mp=jnp.asarray(kf_mp),
        covis=jnp.asarray(covis),
        parent=jnp.asarray(np.concatenate([[-1], np.arange(n_kf - 1), np.full(K - n_kf, -1)]).astype(np.int32)),
        pt_pos=jnp.asarray(pt_pos),
        pt_normal=jnp.asarray(np.tile(np.array([0, 0, -1.0], np.float32), (P, 1))),
        pt_desc=jnp.asarray(pt_desc),
        pt_min_dist=jnp.asarray((0.5 * d).astype(np.float32)),
        pt_max_dist=jnp.asarray((2.5 * d).astype(np.float32)),
        pt_ref_kf=jnp.asarray(ref.astype(np.int32)),
        pt_obs_kf=jnp.asarray(pt_obs_kf),
        pt_obs_kp=jnp.asarray(pt_obs_kp),
        pt_obs_cnt=jnp.asarray(obs_cnt),
        pt_found=jnp.asarray((obs_cnt + 1).astype(np.int32)),
        pt_visible=jnp.asarray((obs_cnt + 2).astype(np.int32)),
        pt_valid=jnp.asarray(obs_cnt > 0),
        pt_gen=jnp.asarray((obs_cnt > 0).astype(np.int32)),
        n_kf=jnp.asarray(n_kf, jnp.int32),
        n_pt=jnp.asarray(n_pt, jnp.int32),
        n_kf_ever=jnp.asarray(n_kf, jnp.int32),
    )
    return m, cam
