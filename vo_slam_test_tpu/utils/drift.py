"""Device-side drift injection: scenario instrumentation for loop-closure
benchmarks and tests.

On real data, revisiting a place after a long excursion presents the loop
closer with two mutually inconsistent map islands: the old one, and a new
one displaced by accumulated drift, with every cross-island association
long since culled (stale observations fail their projection gates within
frames). Synthetic sequences track too well to accumulate that drift, so
KF-dense benchmarks inject it: one rigid transform applied to everything
created after a cut keyframe, with cross-island links severed exactly the
way culling would have severed them. Projections are invariant under the
transform (T' X' = T D^-1 D X = T X), so tracking continues seamlessly in
the drifted island — the loop closer must detect the revisit by BoW and
recover D as the closure Sim3 (the cascade of loopClosing.cpp:178-348).

The whole edit is ONE jitted device program taking the cut as a device
scalar, so a mid-run injection costs a single dispatch with no host
readback — it can sit inside a timed benchmark window without perturbing
the measurement. Semantics are oracle-tested against an independent host
transcription in tests/test_drift.py and are identical to the host-side
drift_island instrument in tests/test_loop_e2e.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..slam_map.map_state import MapState


@jax.jit
def inject_drift(m: MapState, assign_real: jnp.ndarray, kf_cut: jnp.ndarray,
                 D: jnp.ndarray):
    """Rigidly move every keyframe created at-or-after the keyframe in slot
    kf_cut and every point whose reference keyframe is in that set by the
    world-side drift D (p' = D p, T' = T D^-1), and sever all cross-island
    links.

    Island membership follows CREATION ORDER, not slot order: keyframes by
    kf_seq >= kf_seq[kf_cut] (culling recycles slots, so slot ids are not
    creation-ordered), points by pt_ref_kf for the same reason. Severed links: island KF
    keypoint bindings to old points (kf_mp), old-island observer entries of
    island KFs on old points (pt_obs_*), island<->old covisibility edges
    (so old KFs qualify as loop candidates — the reference's connected-KF
    exclusion, loopClosing.cpp:78-85), and the tracker's last-frame
    bindings to old points (assign_real). Spanning-tree parents are kept:
    drift accumulates along the tree in the reference too, and the
    essential graph relies on the seam edge's pre-drift measurement.

    Args:
      m: map state.
      assign_real: the tracker's [N] last-frame point bindings
        (SlamTrackState.assign_real).
      kf_cut: i32 device scalar — slot of the first island keyframe (its
        kf_seq defines the creation-order cut).
      D: [4,4] f32 rigid world-side drift.

    Returns (new_map, new_assign_real).
    """
    K = m.kf_valid.shape[0]
    D = jnp.asarray(D, jnp.float32)
    D_inv = jnp.linalg.inv(D)

    cut_seq = m.kf_seq[jnp.clip(kf_cut, 0, K - 1)]
    kf_sel = (m.kf_seq >= cut_seq) & m.kf_valid
    ref = m.pt_ref_kf
    pt_sel = (ref >= 0) & kf_sel[jnp.clip(ref, 0, K - 1)] & m.pt_valid

    new_poses = jnp.where(kf_sel[:, None, None], m.kf_pose @ D_inv, m.kf_pose)
    pts_moved = m.pt_pos @ D[:3, :3].T + D[:3, 3]
    new_pts = jnp.where(pt_sel[:, None], pts_moved, m.pt_pos)

    P = pt_sel.shape[0]
    kf_mp = m.kf_mp
    bound_old = (kf_mp >= 0) & ~pt_sel[jnp.clip(kf_mp, 0, P - 1)]
    kf_mp = jnp.where(kf_sel[:, None] & bound_old, -1, kf_mp)

    obs_kf = m.pt_obs_kf
    obs_cross = (
        (obs_kf >= 0) & kf_sel[jnp.clip(obs_kf, 0, K - 1)] & ~pt_sel[:, None]
    )
    new_obs_kf = jnp.where(obs_cross, -1, obs_kf)
    new_obs_kp = jnp.where(obs_cross, -1, m.pt_obs_kp)
    new_cnt = jnp.maximum(
        m.pt_obs_cnt - obs_cross.sum(1).astype(jnp.int32), 0
    )

    covis = jnp.where(kf_sel[:, None] ^ kf_sel[None, :], 0, m.covis)

    new_m = m.replace(
        kf_pose=new_poses, pt_pos=new_pts, kf_mp=kf_mp,
        pt_obs_kf=new_obs_kf, pt_obs_kp=new_obs_kp, pt_obs_cnt=new_cnt,
        covis=covis,
    )

    stale = (assign_real >= 0) & ~pt_sel[jnp.clip(assign_real, 0, P - 1)]
    new_assign = jnp.where(stale, -1, assign_real)
    return new_m, new_assign
