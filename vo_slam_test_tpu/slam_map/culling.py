"""Map-point and keyframe culling (one jit each).

- cull_map_points: the reference's recent-point filter
  (localMapping.cpp:496-524): erase when foundRatio < 0.25, or when the
  point is older than 2 keyframes with obs <= 3. "Recent" is tracked by the
  creating keyframe id (pt_ref_kf) instead of a host-side list.
- cull_keyframes: redundancy erasure (localMapping.cpp:434-494): a
  connected keyframe dies when >90% of its close tracked points are seen
  >= 3 more times at the same-or-finer (level+1) octave elsewhere.
  Erasure removes the KF's observations, zeroes its covisibility, and
  reparents its spanning-tree children to its own parent, recording Tcp
  (child-relative-to-parent) for trajectory recovery like
  keyframe.cpp:400-491 / vo_run.cpp:207-226.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import lie
from ..camera import Camera
from .map_state import MapCaps, MapState


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def cull_map_points(m: MapState, curr_kf: jnp.ndarray, caps: MapCaps) -> MapState:
    P = caps.max_pt
    recent = m.pt_valid & (m.pt_ref_kf >= 0) & (curr_kf <= m.pt_ref_kf + 3)
    found_ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(m.pt_visible, 1).astype(jnp.float32)
    bad = recent & (found_ratio < 0.25)
    bad |= recent & (curr_kf > m.pt_ref_kf + 2) & (m.pt_obs_cnt <= 3)
    return erase_points(m, bad)


def erase_points(m: MapState, bad: jnp.ndarray) -> MapState:
    """Invalidate points and unbind their keypoint slots in every observer
    (mappoint eraseMapPoint, mappoint.cpp:362-381)."""
    K, N = m.kf_mp.shape
    # clear kf_mp slots via the observer lists
    obs_kf = m.pt_obs_kf  # [P,O]
    obs_kp = m.pt_obs_kp
    kill = bad[:, None] & (obs_kf >= 0)
    kf_w = jnp.where(kill, obs_kf, K - 1).reshape(-1)
    kp_w = jnp.where(kill, obs_kp, N - 1).reshape(-1)
    # only clear where the slot actually references the dying point
    P = bad.shape[0]
    pt_of = jnp.broadcast_to(jnp.arange(P)[:, None], kill.shape).reshape(-1)
    hit = kill.reshape(-1) & (m.kf_mp[kf_w, kp_w] == pt_of)
    m = m.replace(
        kf_mp=m.kf_mp.at[kf_w, kp_w].set(jnp.where(hit, -1, m.kf_mp[kf_w, kp_w])),
        pt_valid=m.pt_valid & ~bad,
        pt_obs_kf=jnp.where(bad[:, None], -1, m.pt_obs_kf),
        pt_obs_kp=jnp.where(bad[:, None], -1, m.pt_obs_kp),
        pt_obs_cnt=jnp.where(bad, 0, m.pt_obs_cnt),
    )
    return m


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def cull_keyframes(m: MapState, curr_kf: jnp.ndarray, caps: MapCaps, cam: Camera) -> MapState:
    """Erase redundant keyframes connected to curr_kf."""
    K, N = m.kf_mp.shape
    P = caps.max_pt
    min_obs = 3

    connected = (m.covis[curr_kf] > 0) & m.kf_valid
    connected &= jnp.arange(K) != 0  # never cull KF 0 (localMapping.cpp:445)
    connected &= jnp.arange(K) != curr_kf

    # compact the candidate set: the redundancy check gathers [cand, N, O]
    # observer octaves, which is only affordable over the <=32 connected
    # keyframes rather than the whole table
    C = min(32, K)
    pos = jnp.cumsum(connected.astype(jnp.int32)) - 1
    slot = jnp.where(connected & (pos < C), pos, C)
    cand_ids = (
        jnp.full((C + 1,), -1, jnp.int32).at[slot].set(jnp.arange(K, dtype=jnp.int32))[:C]
    )
    cid = jnp.maximum(cand_ids, 0)
    c_ok = cand_ids >= 0

    pt = m.kf_mp[cid]                               # [C,N]
    has = (pt >= 0) & m.kf_kp_valid[cid]
    close = has & (m.kf_depth[cid] > 0) & (m.kf_depth[cid] <= cam.th_depth)
    safe_pt = jnp.maximum(pt, 0)
    obs_kf = m.pt_obs_kf                            # [P,O]
    obs_kp = m.pt_obs_kp
    obs_ok = obs_kf >= 0
    # per-candidate observer octaves: gather [C,N,O]
    oct_b = m.kf_octave[
        jnp.maximum(obs_kf[safe_pt], 0), jnp.maximum(obs_kp[safe_pt], 0)
    ]                                               # [C,N,O]
    kf_b = obs_kf[safe_pt]
    lvl = m.kf_octave[cid] + 1                      # [C,N]
    cnt = jnp.sum(
        (
            obs_ok[safe_pt]
            & (oct_b <= lvl[:, :, None])
            & (kf_b != cid[:, None, None])
        ).astype(jnp.int32),
        axis=-1,
    )  # [C,N]
    well_obs = close & (m.pt_obs_cnt[safe_pt] > min_obs) & (cnt >= min_obs)

    mp_cnt = jnp.sum(close.astype(jnp.int32), axis=1)
    re_obs = jnp.sum(well_obs.astype(jnp.int32), axis=1)
    cull_c = c_ok & (re_obs.astype(jnp.float32) > 0.9 * mp_cnt.astype(jnp.float32)) & (mp_cnt > 0)
    cull = jnp.zeros((K,), bool).at[jnp.where(cull_c, cid, K - 1)].max(cull_c)
    cull &= connected

    # ---- erase culled keyframes -------------------------------------------
    # remove their observations from points
    kill_obs = cull[jnp.maximum(obs_kf, 0)] & obs_ok      # [P,O]
    m = m.replace(
        pt_obs_kf=jnp.where(kill_obs, -1, obs_kf),
        pt_obs_kp=jnp.where(kill_obs, -1, obs_kp),
        pt_obs_cnt=m.pt_obs_cnt - jnp.sum(kill_obs.astype(jnp.int32), axis=1),
    )
    # points left with obs<=2 from an erase die too (mappoint.cpp:353)
    touched = jnp.any(kill_obs, axis=1)
    m = erase_points(m, touched & (m.pt_obs_cnt <= 2) & m.pt_valid)

    # Tcp for trajectory recovery + spanning-tree reparenting
    parent = m.parent
    safe_par = jnp.maximum(parent, 0)
    T_cp = jnp.einsum("kij,kjl->kil", m.kf_pose, jax.vmap(lie.se3_inverse)(m.kf_pose[safe_par]))
    kf_tcp = jnp.where(cull[:, None, None], T_cp, m.kf_tcp)
    # children of a culled KF move to its parent (simplified reparenting;
    # the reference re-selects among covisible candidates keyframe.cpp:400-470)
    par_of_parent = parent[safe_par]
    new_parent = jnp.where(
        (parent >= 0) & cull[safe_par],
        jnp.where(cull[jnp.maximum(par_of_parent, 0)], -1, par_of_parent),
        parent,
    )
    m = m.replace(
        kf_valid=m.kf_valid & ~cull,
        kf_mp=jnp.where(cull[:, None], -1, m.kf_mp),
        covis=jnp.where(cull[:, None] | cull[None, :], 0, m.covis),
        parent=new_parent,
        kf_tcp=kf_tcp,
        # archive the cull-time parent alongside kf_tcp: the live parent
        # array mutates (reparenting, slot reuse) but trajectory recovery
        # through a culled keyframe needs the chain as it was at cull time
        cull_parent=jnp.where(cull, parent, m.cull_parent),
        loop_edges=m.loop_edges & ~cull[:, None] & ~cull[None, :],
    )
    return m
