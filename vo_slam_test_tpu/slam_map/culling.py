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


MAX_ERASE = 4096  # dying points handled per erase call. A single chain
# stage never kills more than a few hundred (recent-point culling windows,
# merge losers, obs<=2 cascades); overflow leaves the excess points VALID
# (consistent map, merely less culling) rather than corrupting state.


def erase_points(m: MapState, bad: jnp.ndarray, max_erase: int = MAX_ERASE) -> MapState:
    """Invalidate points and unbind their keypoint slots in every observer
    (mappoint eraseMapPoint, mappoint.cpp:362-381).

    The dying set is compacted to max_erase rows first: the kf_mp unbind
    scatter then touches [E,O] slots instead of [P,O] — the whole-table
    scatter was ~9 ms/call on v5e and ran a dozen times per mapping chain.
    Call sites whose dying set is structurally bounded (fuse merges: one
    loser per candidate row) pass a tighter cap."""
    K, N = m.kf_mp.shape
    P, O = m.pt_obs_kf.shape
    bad = bad & m.pt_valid
    pos = jnp.cumsum(bad.astype(jnp.int32)) - 1
    slot = jnp.where(bad & (pos < max_erase), pos, max_erase)
    ids = (
        jnp.full((max_erase + 1,), -1, jnp.int32)
        .at[slot].set(jnp.arange(P, dtype=jnp.int32))[:max_erase]
    )
    ok = ids >= 0
    sid = jnp.maximum(ids, 0)
    # the compacted subset IS the effective dying set (cap overflow keeps
    # the rest alive, see MAX_ERASE note)
    bad_eff = jnp.zeros((P,), bool).at[jnp.where(ok, sid, P - 1)].max(ok)
    bad_eff = bad_eff.at[P - 1].set(False)

    obs_kf = m.pt_obs_kf[sid]   # [E,O]
    obs_kp = m.pt_obs_kp[sid]
    kill = ok[:, None] & (obs_kf >= 0)
    kf_w = jnp.where(kill, obs_kf, K - 1).reshape(-1)
    kp_w = jnp.where(kill, obs_kp, N - 1).reshape(-1)
    # only clear where the slot actually references the dying point
    pt_of = jnp.broadcast_to(sid[:, None], kill.shape).reshape(-1)
    hit = kill.reshape(-1) & (m.kf_mp[kf_w, kp_w] == pt_of)
    rows = jnp.where(ok, sid, P - 1)
    m = m.replace(
        kf_mp=m.kf_mp.at[kf_w, kp_w].set(jnp.where(hit, -1, m.kf_mp[kf_w, kp_w])),
        pt_valid=m.pt_valid & ~bad_eff,
        pt_obs_kf=m.pt_obs_kf.at[rows].set(
            jnp.where(ok[:, None], -1, m.pt_obs_kf[rows])
        ),
        pt_obs_kp=m.pt_obs_kp.at[rows].set(
            jnp.where(ok[:, None], -1, m.pt_obs_kp[rows])
        ),
        pt_obs_cnt=m.pt_obs_cnt.at[rows].set(jnp.where(ok, 0, m.pt_obs_cnt[rows])),
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
    # keyframes carrying a loop edge are never erased: addLoopEdge sets
    # notEraseLoopDetecting_ permanently and setEraseLoopDetectingKF only
    # clears it when loopEdges_ is empty (keyframe.cpp:528-533,547-556)
    connected &= ~jnp.any(m.loop_edges, axis=1)

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

    # The redundancy count and the post-cull observation removal both only
    # touch points BOUND TO A CANDIDATE (every observation of keyframe c
    # lives on a point in kf_mp[c] by the add/erase invariants). Compact
    # that union to E rows: the whole-table [P,O] / [C,N,O] gathers this
    # replaces were ~13 ms of the 22 ms call on v5e. E overflow merely
    # undercounts redundancy (fewer culls) — never corrupts.
    E = 8192
    O = m.pt_obs_kf.shape[1]
    bound = jnp.zeros((P,), bool).at[jnp.where(has, pt, P - 1).reshape(-1)].max(
        has.reshape(-1)
    ).at[P - 1].set(False)
    bound &= m.pt_valid
    epos = jnp.cumsum(bound.astype(jnp.int32)) - 1
    eslot_w = jnp.where(bound & (epos < E), epos, E)
    eids = (
        jnp.full((E + 1,), -1, jnp.int32)
        .at[eslot_w].set(jnp.arange(P, dtype=jnp.int32))[:E]
    )
    e_ok = eids >= 0
    esafe = jnp.maximum(eids, 0)
    # inverse map point id -> compact slot (E = absent); invalid rows dump
    # to P-1 (never in the bound set) to avoid scatter collisions
    eslot = jnp.full((P,), E, jnp.int32).at[jnp.where(e_ok, esafe, P - 1)].set(
        jnp.where(e_ok, jnp.arange(E, dtype=jnp.int32), E)
    )

    obs_kf_e = m.pt_obs_kf[esafe]                   # [E,O]
    obs_kp_e = m.pt_obs_kp[esafe]
    obs_ok_e = e_ok[:, None] & (obs_kf_e >= 0)
    oct_e = m.kf_octave[jnp.maximum(obs_kf_e, 0), jnp.maximum(obs_kp_e, 0)]

    # cumulative octave histogram per point: cum[e, l] = #observers with
    # octave <= l. The per-candidate count "observers at <= own octave + 1,
    # excluding the candidate" is then cum[pt, min(lvl,7)] - 1 (the
    # candidate's own observation always satisfies oct <= oct+1).
    n_lvl = 8
    cum = jnp.sum(
        (oct_e[:, :, None] <= jnp.arange(n_lvl)[None, None, :])
        & obs_ok_e[:, :, None],
        axis=1,
    ).astype(jnp.int32)                             # [E, n_lvl]
    cum_p = jnp.concatenate([cum, jnp.zeros((1, n_lvl), jnp.int32)])  # pad row
    lvl = jnp.clip(m.kf_octave[cid] + 1, 0, n_lvl - 1)  # [C,N]
    cnt = cum_p[eslot[safe_pt], lvl] - 1            # [C,N]
    well_obs = close & (m.pt_obs_cnt[safe_pt] > min_obs) & (cnt >= min_obs)
    well_obs &= eslot[safe_pt] < E                  # uncounted (overflow) rows

    mp_cnt = jnp.sum(close.astype(jnp.int32), axis=1)
    re_obs = jnp.sum(well_obs.astype(jnp.int32), axis=1)
    cull_c = c_ok & (re_obs.astype(jnp.float32) > 0.9 * mp_cnt.astype(jnp.float32)) & (mp_cnt > 0)
    cull = jnp.zeros((K,), bool).at[jnp.where(cull_c, cid, K - 1)].max(cull_c)
    cull &= connected

    # ---- erase culled keyframes -------------------------------------------
    # remove their observations from points. Every observation of a culled
    # keyframe lives on a point bound in its kf_mp row (add/erase
    # invariants), so compacting the CULLED candidates' bound points — at
    # most n_culled x N, and n_culled is almost always 0-2 — covers the
    # whole kill set with a tight [E2,O] working set.
    E2 = 4096
    kill_bound = has & cull_c[:, None]              # [C,N]
    bound2 = (
        jnp.zeros((P,), bool)
        .at[jnp.where(kill_bound, pt, P - 1).reshape(-1)]
        .max(kill_bound.reshape(-1))
        .at[P - 1].set(False)
    )
    kpos = jnp.cumsum(bound2.astype(jnp.int32)) - 1
    kslot_w = jnp.where(bound2 & (kpos < E2), kpos, E2)
    kids = (
        jnp.full((E2 + 1,), -1, jnp.int32)
        .at[kslot_w].set(jnp.arange(P, dtype=jnp.int32))[:E2]
    )
    k_ok = kids >= 0
    ksafe = jnp.maximum(kids, 0)
    obs_kf_k = m.pt_obs_kf[ksafe]                   # [E2,O]
    obs_kp_k = m.pt_obs_kp[ksafe]
    obs_ok_k = k_ok[:, None] & (obs_kf_k >= 0)
    kill_k = cull[jnp.maximum(obs_kf_k, 0)] & obs_ok_k
    krows = jnp.where(k_ok, ksafe, P - 1)
    m = m.replace(
        pt_obs_kf=m.pt_obs_kf.at[krows].set(jnp.where(kill_k, -1, obs_kf_k)),
        pt_obs_kp=m.pt_obs_kp.at[krows].set(jnp.where(kill_k, -1, obs_kp_k)),
        pt_obs_cnt=m.pt_obs_cnt.at[krows].add(
            -jnp.sum(kill_k.astype(jnp.int32), axis=1)
        ),
    )
    # points left with obs<=2 from an erase die too (mappoint.cpp:353)
    touched = (
        jnp.zeros((P,), bool)
        .at[krows].max(jnp.any(kill_k, axis=1))
        .at[P - 1].set(False)
    )
    m = erase_points(m, touched & (m.pt_obs_cnt <= 2) & m.pt_valid)

    # Tcp for trajectory recovery + spanning-tree reparenting
    parent = m.parent
    safe_par = jnp.maximum(parent, 0)
    T_cp = jnp.einsum("kij,kjl->kil", m.kf_pose, jax.vmap(lie.se3_inverse)(m.kf_pose[safe_par]))
    kf_tcp = jnp.where(cull[:, None, None], T_cp, m.kf_tcp)
    # spanning-tree reparenting (keyframe.cpp:431-483): children of a
    # culled keyframe attach GREEDILY to the highest-covisibility-weight
    # candidate, where the candidate set starts as {culled KF's parent}
    # and each newly attached child joins it — so siblings can chain off
    # each other instead of all collapsing onto the grandparent. Children
    # with no covisible candidate fall back to the culled KF's parent
    # (keyframe.cpp:479-483), or its grandparent if that parent died in
    # the same batch (the reference erases sequentially and never sees
    # this case).
    # fallback baseline first (also covers culled KFs beyond the CU cap)
    par_of_parent = parent[safe_par]
    new_parent = jnp.where(
        (parent >= 0) & cull[safe_par],
        jnp.where(cull[jnp.maximum(par_of_parent, 0)], -1, par_of_parent),
        parent,
    )
    # greedy covisible re-selection for the first CU culled keyframes
    # (redundancy culling kills 0-2 per call; CU=4 is headroom). Each
    # greedy step is one masked [K,K] argmax — CU*CH short serial steps.
    CU, CH = 4, 8
    cull_cnt = jnp.cumsum(cull_c.astype(jnp.int32)) - 1
    cull_slot = jnp.where(cull_c & (cull_cnt < CU), cull_cnt, CU)
    culled_ids = (
        jnp.full((CU + 1,), -1, jnp.int32)
        .at[cull_slot].set(cid)[:CU]
    )
    live_after = m.kf_valid & ~cull
    covis_w = jnp.where(
        live_after[:, None] & live_after[None, :], m.covis, 0
    )

    def reparent_one(i, par_arr):
        c = jnp.maximum(culled_ids[i], 0)
        do = culled_ids[i] >= 0
        gp = parent[c]
        gp_ok = (gp >= 0) & ~cull[jnp.maximum(gp, 0)]
        children0 = do & (parent == c) & live_after
        cand0 = jnp.zeros((K,), bool).at[jnp.maximum(gp, 0)].set(gp_ok & do)

        def step(_, st):
            par_arr, children, cand = st
            Wm = jnp.where(children[:, None] & cand[None, :], covis_w, 0)
            best = jnp.argmax(Wm)
            bx = (best // K).astype(jnp.int32)
            bw = (best % K).astype(jnp.int32)
            ok = Wm.reshape(-1)[best] > 0
            par_arr = jnp.where(ok, par_arr.at[bx].set(bw), par_arr)
            cand = cand.at[bx].max(ok)
            children = children.at[bx].set(children[bx] & ~ok)
            return par_arr, children, cand

        par_arr, _, _ = jax.lax.fori_loop(
            0, CH, step, (par_arr, children0, cand0)
        )
        return par_arr

    new_parent = jax.lax.fori_loop(0, CU, reparent_one, new_parent)
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
        # ...and the parent's generation: if the parent slot is later culled
        # and reused, the archived (kf_tcp, cull_parent) of THAT slot
        # describes a different keyframe chain — the recovery walk checks
        # this and declines to compose a wrong pose
        cull_parent_gen=jnp.where(
            cull, jnp.where(parent >= 0, m.kf_gen[safe_par], -1), m.cull_parent_gen
        ),
        cull_gen=jnp.where(cull, m.kf_gen, m.cull_gen),
        loop_edges=m.loop_edges & ~cull[:, None] & ~cull[None, :],
    )
    return m
