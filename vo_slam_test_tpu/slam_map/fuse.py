"""Map-point fusion (one jit per target keyframe).

Covers Matcher::fuseMapPoints (reference: matcher.cpp:1012-1133) and
LocalMapping::searchInNeighbors' two-hop orchestration
(localMapping.cpp:363-432), including MapPoint::replaceMapPoint's
observation rewiring (mappoint.cpp:214-253).

Candidate points are projected into the target keyframe; keypoints within
the predicted-scale window pass per-pair chi2 reprojection gates
(5.991/7.815) BEFORE the Hamming test (best <= TH_LOW=50). A match into an
empty slot binds the point; a match onto an occupied slot merges the two
points, the one with more observations winning, with the loser's
observations rewired slot-by-slot onto the winner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import lie
from ..camera import Camera
from ..ops import match_pallas
from .map_state import MapCaps, MapState
from .culling import erase_points

MAX_FUSE = 4096
TH_LOW = 50
MERGE_CAP = 1024  # fuse merges actually handled per batched pass; overflow
# leaves the extra pairs unmerged (both points stay live — the next fuse
# pass around either keyframe retries), never corrupts state. Must not
# exceed erase_points' max_erase capacity in _replace_points (1024), or
# overflow losers would keep pt_valid=True after their observations were
# rewired onto the winner.


def _free_slot_order(free: jnp.ndarray) -> jnp.ndarray:
    """[n,O] bool -> [n,O] i32: out[:, r] = column index of the r-th FREE
    slot. Valid only for r < nfree (0-garbage elsewhere — every caller
    gates on rank < nfree). Sort-free equivalent of
    argsort(where(free,0,1), stable): TPU sorts at [n,24] shapes measured
    milliseconds; this is a cumsum + one scatter."""
    n, O = free.shape
    rank = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    rk = jnp.where(free, rank, O)
    return (
        jnp.zeros((n, O + 1), jnp.int32)
        .at[rows, rk]
        .max(jnp.broadcast_to(jnp.arange(O, dtype=jnp.int32)[None], free.shape))
    )[:, :O]


def _compact_ids(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask & (pos < size), pos, size)
    return jnp.full((size + 1,), -1, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32)
    )[:size]


@functools.partial(
    jax.jit, static_argnames=("caps", "max_cand"), donate_argnums=(0,)
)
def fuse_into_keyframe(
    m: MapState,
    kf_id: jnp.ndarray,
    cand_mask: jnp.ndarray,   # [P] candidate points to fuse into kf_id
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    threshold: float = 3.0,
    max_cand: int = MAX_FUSE,
) -> MapState:
    """max_cand sizes the compacted candidate set (and so the
    [max_cand, N] distance matrix — the dominant cost). Fusing ONE
    keyframe's points into a neighbor needs only N rows; the default
    MAX_FUSE covers multi-keyframe candidate unions."""
    P = caps.max_pt
    N = caps.n_feat
    K = m.kf_valid.shape[0]
    O = m.pt_obs_kf.shape[1]

    T = m.kf_pose[kf_id]
    R, t = T[:3, :3], T[:3, 3]
    ow = -R.T @ t

    # exclude points already observed by this keyframe (matcher.cpp:1029)
    seen_here = jnp.any(m.pt_obs_kf == kf_id, axis=1)
    cand = cand_mask & m.pt_valid & ~seen_here

    pc = m.pt_pos @ R.T + t
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[:, 0] / safe_z + cam.cx
    v = cam.fy * pc[:, 1] / safe_z + cam.cy
    ur = u - cam.bf / safe_z
    line = m.pt_pos - ow
    dist = jnp.linalg.norm(line, axis=-1)
    view_ok = jnp.sum(line * m.pt_normal, axis=-1) >= 0.5 * dist
    cand &= (
        (z > 0) & (u > 0) & (u < cam.width) & (v > 0) & (v < cam.height)
        # 0.8/1.2 invariance slack (mappoint.cpp:391-401)
        & (dist >= 0.8 * m.pt_min_dist) & (dist <= 1.2 * m.pt_max_dist) & view_ok
    )
    ratio = m.pt_max_dist / jnp.maximum(dist, 1e-9)
    pred = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factors[1])).astype(jnp.int32),
        0, scale_factors.shape[0] - 1,
    )

    ids = _compact_ids(cand, max_cand)
    ok = ids >= 0
    sid = jnp.maximum(ids, 0)
    c_u, c_v, c_ur = u[sid], v[sid], ur[sid]
    c_pred = pred[sid]
    c_desc = m.pt_desc[sid]
    radius = threshold * scale_factors[c_pred]

    kp_uv = m.kf_uv_und[kf_id]
    kp_oct = m.kf_octave[kf_id]
    kp_ur = m.kf_u_right[kf_id]
    kp_ok = m.kf_kp_valid[kf_id]
    inv_sig2 = 1.0 / scale_factors[kp_oct] ** 2

    # fused masked-Hamming top-1 with the per-pair chi2 reprojection gate
    # (ops/match_pallas.py chi2 mode): window + octave band + chi2 + the
    # [max_cand, N] distance matrix all stay in VMEM on TPU
    best, best_d, _, _ = match_pallas.masked_top2(
        c_desc, m.kf_desc[kf_id],
        c_u, c_v, radius, c_ur, jnp.zeros_like(c_ur),
        c_pred - 1, c_pred, ok,
        kp_uv[:, 0], kp_uv[:, 1], kp_ur, kp_oct, kp_ok,
        col_isig2=inv_sig2, chi2_gate=True,
    )
    matched = best_d <= TH_LOW

    # dedup per keypoint: lowest candidate slot wins
    src_ids = jnp.arange(max_cand, dtype=jnp.int32)
    claim = (
        jnp.full((N + 1,), max_cand, jnp.int32)
        .at[jnp.where(matched, best, N)]
        .min(jnp.where(matched, src_ids, max_cand))[:N]
    )
    matched &= claim[jnp.maximum(best, 0)] == src_ids

    cand_pt = ids                       # [MAX_FUSE]
    kp_sel = best
    org = m.kf_mp[kf_id, jnp.maximum(kp_sel, 0)]  # existing binding (-1 empty)
    org_live = (org >= 0) & m.pt_valid[jnp.maximum(org, 0)]

    # --- case A: empty slot -> bind candidate --------------------------------
    # Dummy lanes scatter one-past-the-end (col N of a widened row, sliced
    # away) so they can never collide with a genuine bind of keypoint N-1:
    # duplicate-index .set with conflicting values is nondeterministic in XLA.
    bindA = matched & ~org_live
    kp_w = jnp.where(bindA, kp_sel, N)
    row_new = jnp.pad(m.kf_mp[kf_id], (0, 1)).at[kp_w].set(cand_pt)[:N]
    m = m.replace(kf_mp=m.kf_mp.at[kf_id].set(row_new))
    # append observation (kf_id, kp) to each bound candidate
    free = m.pt_obs_kf[jnp.maximum(cand_pt, 0)] < 0
    slot = jnp.argmax(free, axis=1)
    can_app = bindA & jnp.any(free, axis=1)
    pr = jnp.where(can_app, cand_pt, P - 1)
    pcol = jnp.where(can_app, slot, O - 1)
    m = m.replace(
        pt_obs_kf=m.pt_obs_kf.at[pr, pcol].set(jnp.where(can_app, kf_id, m.pt_obs_kf[pr, pcol])),
        pt_obs_kp=m.pt_obs_kp.at[pr, pcol].set(jnp.where(can_app, kp_sel, m.pt_obs_kp[pr, pcol])),
        pt_obs_cnt=m.pt_obs_cnt.at[jnp.where(bindA, cand_pt, P - 1)].add(jnp.where(bindA, 1, 0)),
    )

    # --- case B: occupied slot -> merge, more observations wins --------------
    merge = matched & org_live & (org != cand_pt)
    org_s = jnp.maximum(org, 0)
    cand_s = jnp.maximum(cand_pt, 0)
    org_wins = m.pt_obs_cnt[org_s] > m.pt_obs_cnt[cand_s]
    winner = jnp.where(org_wins, org_s, cand_s)
    loser = jnp.where(org_wins, cand_s, org_s)
    m = _replace_points(m, loser, winner, merge)
    return m


def _replace_points(m: MapState, loser: jnp.ndarray, winner: jnp.ndarray, mask: jnp.ndarray) -> MapState:
    """Rewire each loser's observations onto its winner, then erase the loser
    (mappoint.cpp:214-253). loser/winner: [n] point ids; mask: [n]."""
    P, O = m.pt_obs_kf.shape
    K, N = m.kf_mp.shape

    # found/visible transfer
    l_s = jnp.where(mask, loser, P - 1)
    m = m.replace(
        pt_found=m.pt_found.at[jnp.where(mask, winner, P - 1)].add(
            jnp.where(mask, m.pt_found[l_s], 0)
        ),
        pt_visible=m.pt_visible.at[jnp.where(mask, winner, P - 1)].add(
            jnp.where(mask, m.pt_visible[l_s], 0)
        ),
    )

    # batched over all O loser slots at once (a fori_loop over slots cost
    # ~24x4 serialized scatters; this form needs 3). If the same winner
    # appears in two merge rows, colliding free-slot writes lose one
    # observation — the per-slot loop had the same collision class.
    l_rows = jnp.where(mask, loser, P - 1)
    w_rows_id = jnp.where(mask, winner, P - 1)
    lkf = m.pt_obs_kf[l_rows]                       # [n,O]
    lkp = m.pt_obs_kp[l_rows]
    has = mask[:, None] & (lkf >= 0)
    wkf = m.pt_obs_kf[w_rows_id]                    # [n,O]
    dup = jnp.any(lkf[:, :, None] == wkf[:, None, :], axis=2) & has
    move = has & ~dup

    # rebind (move) or clear (dup) every touched keyframe slot; dummy lanes
    # go one-past-the-end in the keypoint axis (col N, sliced away) so they
    # can never collide with a genuine write to keypoint N-1
    kf_w = jnp.where(has, lkf, K - 1)
    kp_w = jnp.where(has, lkp, N)
    new_val = jnp.broadcast_to(jnp.where(move, winner[:, None], -1), has.shape)
    m = m.replace(
        kf_mp=jnp.pad(m.kf_mp, ((0, 0), (0, 1)))
        .at[kf_w, kp_w].set(new_val)[:, :N]
    )

    # append moved observations into the winner's free slots: the r-th move
    # of a row lands in the r-th free slot
    rank = jnp.cumsum(move.astype(jnp.int32), axis=1) - 1      # [n,O]
    free = wkf < 0
    forder = _free_slot_order(free)
    nfree = jnp.sum(free.astype(jnp.int32), axis=1)
    can = move & (rank < nfree[:, None])
    slot = jnp.take_along_axis(forder, jnp.clip(rank, 0, O - 1), axis=1)
    pr = jnp.where(can, winner[:, None], P - 1)
    pc_ = jnp.where(can, slot, O - 1)
    m = m.replace(
        pt_obs_kf=m.pt_obs_kf.at[pr, pc_].set(jnp.where(can, lkf, m.pt_obs_kf[pr, pc_])),
        pt_obs_kp=m.pt_obs_kp.at[pr, pc_].set(jnp.where(can, lkp, m.pt_obs_kp[pr, pc_])),
        pt_obs_cnt=m.pt_obs_cnt.at[jnp.where(mask, winner, P - 1)].add(
            jnp.where(mask, jnp.sum(can.astype(jnp.int32), axis=1), 0)
        ),
    )
    # erase losers (at most one per merge row — n bounds the dying set)
    bad = jnp.zeros((P,), bool).at[jnp.where(mask, loser, P - 1)].max(mask)
    bad = bad.at[P - 1].set(False)
    return erase_points(m, bad, max_erase=min(loser.shape[0], 1024))


def fuse_curr_into_neighbors(
    m: MapState,
    kf_id: jnp.ndarray,
    nb_ids: jnp.ndarray,      # [B] neighbor keyframe ids, -1 padded
    caps: MapCaps,
    cam: Camera,
    scale_factors: jnp.ndarray,
    threshold: float = 3.0,
) -> MapState:
    """Fuse the current keyframe's points into ALL B neighbors in one pass
    (the forward half of localMapping.cpp:363-432). Replaces a
    lax.fori_loop of per-neighbor fuse_into_keyframe calls whose
    loop-carried cond copied the whole map state every iteration
    (measured ~20 ms/KF of pure copies at 43 KFs); the B independent [N,N]
    masked-Hamming searches run as ONE kernel dispatch
    (match_pallas.masked_top2_nb) and the bind/merge updates apply as
    batched scatters.

    Deviation from the sequential loop (documented, collision-rare): all B
    neighbor searches read the PRE-fuse map, so a point merged away by
    neighbor i is still a candidate for neighbor j>i; the reference
    processes neighbors sequentially (its Fuse calls mutate between
    iterations). Cross-neighbor collisions fall into the same lost-update
    classes _replace_points already tolerates."""
    P = caps.max_pt
    N = caps.n_feat
    O = m.pt_obs_kf.shape[1]
    B = nb_ids.shape[0]

    row = m.kf_mp[kf_id]                       # [N] candidate point per slot
    pid = jnp.maximum(row, 0)
    base_ok = (row >= 0) & m.pt_valid[pid]
    p_pos = m.pt_pos[pid]                      # [N,3]
    p_norm = m.pt_normal[pid]
    p_min, p_max = m.pt_min_dist[pid], m.pt_max_dist[pid]
    p_desc = m.pt_desc[pid]                    # [N,8]
    p_obs = m.pt_obs_kf[pid]                   # [N,O]

    nb = jnp.maximum(nb_ids, 0)                # [B]
    nb_ok = nb_ids >= 0
    T = m.kf_pose[nb]                          # [B,4,4]
    R, t = T[:, :3, :3], T[:, :3, 3]
    ow = -jnp.einsum("bji,bj->bi", R, t)       # [B,3] camera centers
    pc = jnp.einsum("bij,nj->bni", R, p_pos) + t[:, None, :]   # [B,N,3]
    z = pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[..., 0] / safe_z + cam.cx
    v = cam.fy * pc[..., 1] / safe_z + cam.cy
    ur = u - cam.bf / safe_z
    line = p_pos[None, :, :] - ow[:, None, :]  # [B,N,3]
    dist = jnp.linalg.norm(line, axis=-1)
    view_ok = jnp.sum(line * p_norm[None], axis=-1) >= 0.5 * dist
    # exclude points already observed by each neighbor (matcher.cpp:1029)
    seen = jnp.any(p_obs[None, :, :] == nb[:, None, None], axis=-1)  # [B,N]
    cand = (
        base_ok[None] & nb_ok[:, None] & ~seen
        & (z > 0) & (u > 0) & (u < cam.width) & (v > 0) & (v < cam.height)
        # 0.8/1.2 invariance slack (mappoint.cpp:391-401)
        & (dist >= 0.8 * p_min[None]) & (dist <= 1.2 * p_max[None]) & view_ok
    )
    ratio = p_max[None] / jnp.maximum(dist, 1e-9)
    pred = jnp.clip(
        jnp.ceil(
            jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factors[1])
        ).astype(jnp.int32),
        0, scale_factors.shape[0] - 1,
    )
    radius = threshold * scale_factors[pred]

    kp_uv = m.kf_uv_und[nb]                    # [B,N,2]
    kp_oct = m.kf_octave[nb]
    kp_ur = m.kf_u_right[nb]
    kp_ok = m.kf_kp_valid[nb] & nb_ok[:, None]
    inv_sig2 = 1.0 / scale_factors[kp_oct] ** 2

    best, best_d, _, _ = match_pallas.masked_top2_nb(
        jnp.broadcast_to(p_desc[None], (B, N, 8)), m.kf_desc[nb],
        u, v, radius, ur, jnp.zeros_like(ur),
        pred - 1, pred, cand,
        kp_uv[..., 0], kp_uv[..., 1], kp_ur, kp_oct, kp_ok,
        col_isig2=inv_sig2, chi2_gate=True,
    )
    matched = best_d <= TH_LOW                 # [B,N]

    # per-neighbor dedup: lowest candidate slot wins
    src_ids = jnp.arange(N, dtype=jnp.int32)
    brows = jnp.arange(B, dtype=jnp.int32)[:, None]
    claim = (
        jnp.full((B, N + 1), N, jnp.int32)
        .at[brows, jnp.where(matched, best, N)]
        .min(jnp.where(matched, src_ids[None], N))[:, :N]
    )
    matched &= claim[brows, jnp.maximum(best, 0)] == src_ids[None]

    cand_pt = jnp.broadcast_to(row[None], (B, N))
    org = m.kf_mp[nb[:, None], jnp.maximum(best, 0)]   # [B,N]
    org_live = (org >= 0) & m.pt_valid[jnp.maximum(org, 0)]

    # --- case A: empty slot -> bind candidate (batched over neighbors) ----
    # Dummy lanes scatter one-past-the-end (col N of a widened kf_mp view,
    # sliced away) so they can never collide with a genuine bind of
    # keypoint N-1 of the same neighbor (duplicate-index .set with
    # conflicting values is nondeterministic in XLA)
    bindA = matched & ~org_live
    kp_w = jnp.where(bindA, best, N)
    nb_rows = jnp.broadcast_to(nb[:, None], (B, N))
    m = m.replace(
        kf_mp=jnp.pad(m.kf_mp, ((0, 0), (0, 1)))
        .at[nb_rows, kp_w].set(cand_pt)[:, :N]
    )
    # append observation (nb, kp) to each bound candidate: a candidate may
    # bind in SEVERAL neighbors — its r-th bind (over the neighbor axis)
    # lands in the r-th free observation slot
    free = m.pt_obs_kf[pid] < 0                # [N,O]
    forder = _free_slot_order(free)            # r-th free slot per row
    nfree = jnp.sum(free.astype(jnp.int32), axis=1)          # [N]
    rank = jnp.cumsum(bindA.astype(jnp.int32), axis=0) - 1   # [B,N]
    can_app = bindA & (rank < nfree[None])
    slot = forder[src_ids[None], jnp.clip(rank, 0, O - 1)]   # [B,N]
    pr = jnp.where(can_app, cand_pt, P - 1)
    pcol = jnp.where(can_app, slot, O - 1)
    m = m.replace(
        pt_obs_kf=m.pt_obs_kf.at[pr, pcol].set(
            jnp.where(can_app, nb_rows, m.pt_obs_kf[pr, pcol])
        ),
        pt_obs_kp=m.pt_obs_kp.at[pr, pcol].set(
            jnp.where(can_app, best, m.pt_obs_kp[pr, pcol])
        ),
        pt_obs_cnt=m.pt_obs_cnt.at[jnp.where(can_app, cand_pt, P - 1)].add(
            jnp.where(can_app, 1, 0)
        ),
    )

    # --- case B: occupied slot -> merge, more observations wins -----------
    merge = matched & org_live & (org != cand_pt)
    org_s = jnp.maximum(org, 0)
    cand_s = jnp.maximum(cand_pt, 0)
    org_wins = m.pt_obs_cnt[org_s] > m.pt_obs_cnt[cand_s]
    winner = jnp.where(org_wins, org_s, cand_s)
    loser = jnp.where(org_wins, cand_s, org_s)
    # merges are RARE (dozens per keyframe): compact the [B*N] merge set to
    # MERGE_CAP rows before the observation-rewiring pass — the flat form
    # paid [B*N,O] gathers + an [B*N,O,O] dup matrix (measured +15 ms/KF)
    mid = _compact_ids(merge.reshape(-1), MERGE_CAP)
    mok = mid >= 0
    ms_ = jnp.maximum(mid, 0)
    l_ids = jnp.where(mok, loser.reshape(-1)[ms_], P - 1)
    w_ids = jnp.where(mok, winner.reshape(-1)[ms_], P - 1)
    # cross-neighbor conflict resolution: every point may appear in at most
    # ONE merge row per pass. The sequential reference chains these (c
    # merges into o1, then a later neighbor merges o2 into the SURVIVOR),
    # but _replace_points applies all rows against one snapshot — a point
    # that is loser in one row and winner in another would have fresh
    # observations rewired onto it while it is being erased, leaving
    # dangling kf_mp entries on a dead point (measured on the room-orbit
    # pilot: live points 3376 -> 2237, ATE 1.34 -> 18.2 cm). First row
    # touching a point wins; dropped rows retry on the next fuse pass
    # around either keyframe, like the MERGE_CAP overflow.
    rows = jnp.arange(MERGE_CAP, dtype=jnp.int32)
    row_of = jnp.where(mok, rows, MERGE_CAP)
    first = (
        jnp.full((P,), MERGE_CAP, jnp.int32)
        .at[l_ids].min(row_of)
        .at[w_ids].min(row_of)
    )
    keep = mok & (first[l_ids] == rows) & (first[w_ids] == rows)
    return _replace_points(
        m,
        jnp.where(keep, l_ids, P - 1),
        jnp.where(keep, w_ids, P - 1),
        keep,
    )


def two_hop_neighbors(m: MapState, kf_id: jnp.ndarray) -> jnp.ndarray:
    """[K] mask: 10 best covisibles + 5 best covisibles of each
    (localMapping.cpp:365-390), excluding kf_id."""
    K = m.kf_valid.shape[0]
    w = jnp.where(m.kf_valid[None, :], m.covis, 0)
    first = jnp.argsort(-w[kf_id])[:10]
    first_ok = w[kf_id][first] > 0
    mask = jnp.zeros((K,), bool).at[jnp.where(first_ok, first, K - 1)].max(first_ok)
    # second hop
    second = jnp.argsort(-w[first], axis=1)[:, :5]              # [10,5]
    sec_ok = jnp.take_along_axis(w[first], second, axis=1) > 0
    sec_ok &= first_ok[:, None]
    mask = mask.at[jnp.where(sec_ok, second, K - 1)].max(sec_ok)
    mask = mask.at[kf_id].set(False)
    return mask & m.kf_valid


def search_in_neighbors(
    m: MapState, kf_id: jnp.ndarray, caps: MapCaps, cam: Camera, scale_factors: jnp.ndarray
) -> MapState:
    """Two-hop fuse around a new keyframe (localMapping.cpp:363-432):
    fuse the KF's points into every neighbor, then every neighbor's points
    into the KF, then refresh the touched points and the covisibility row."""
    from .insert import refresh_points
    from .map_state import covis_row_for

    P = caps.max_pt
    K = m.kf_valid.shape[0]
    nb_mask = two_hop_neighbors(m, kf_id)
    nb_ids = _compact_ids(nb_mask, 16)  # [16], -1 padded

    # current keyframe's points -> all neighbors, one batched dispatch
    m = fuse_curr_into_neighbors(m, kf_id, nb_ids, caps, cam, scale_factors)

    # neighbors' points -> current keyframe
    rows_on = nb_mask[:, None] & (m.kf_mp >= 0)
    flat_pt = jnp.where(rows_on, m.kf_mp, P - 1).reshape(-1)
    nb_pts = jnp.zeros((P,), bool).at[flat_pt].max(rows_on.reshape(-1))
    m = fuse_into_keyframe(m, kf_id, nb_pts, caps, cam, scale_factors)

    # refresh stats of the KF's (possibly replaced) points + covisibility
    row2 = m.kf_mp[kf_id]
    touched = jnp.zeros((P,), bool).at[jnp.maximum(row2, 0)].max(row2 >= 0)
    m = refresh_points(m, touched, scale_factors)
    w = covis_row_for(m, touched).at[kf_id].set(0)
    m = m.replace(covis=m.covis.at[kf_id, :].set(w).at[:, kf_id].set(w))
    return m
