"""Windowed local bundle adjustment with Schur elimination (one jit).

Re-designs the reference's Ceres local BA (reference:
optimizer_ceres.cpp:446-808) for TPU:

- window = newest KF + covisible keyframes (top-W by weight; the reference
  takes all connected KFs — W=24 covers the TUM sequences after culling);
  fixed KFs = other observers of the window's points (top-F)
  (optimizer_ceres.cpp:449-528);
- all residual blocks are padded arrays; analytic Jacobians (the same math
  as LocalBAProjectUV/LocalBAStereoProjectUVD, optimizer_ceres.cpp:316-444);
- Levenberg-Marquardt where each iteration solves the normal equations by
  *dense block* Schur complement: the pose-pose Hessian is block-diagonal
  [W,6,6], point blocks [P,3,3] are inverted in closed form, and the
  reduced camera system is a single (W*6)^2 Cholesky — tiny for the MXU;
- the reference's two-pass structure: pass 1 with Huber
  (sqrt(5.991)/sqrt(7.815)) and 5 iterations, outlier edge removal by chi2
  (5.991/7.815) + positive-depth check, pass 2 with 10 iterations and no
  robust loss (optimizer_ceres.cpp:583-699);
- write-back of window poses and point positions + erasure of outlier
  observations, including the reference's obs<=2 point invalidation
  (optimizer_ceres.cpp:757-804, mappoint.cpp:353).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import lie
from ..camera import Camera
from ..slam_map.map_state import MapCaps, MapState
from ..utils import linalg
from .pose_only import CHI2_MONO, CHI2_STEREO

W_KF = 24       # optimized window keyframes
F_KF = 40       # fixed keyframes
L_PT = 8192     # local points
N_OBS = 24576   # observation slots


class BAProblem(NamedTuple):
    kf_ids: jnp.ndarray      # [W+F] i32 (window first; -1 pad)
    kf_fixed: jnp.ndarray    # [W+F] bool
    pt_ids: jnp.ndarray      # [L] i32 (-1 pad)
    # observations
    o_kf: jnp.ndarray        # [M] i32 index into kf_ids (-1 pad)
    o_pt: jnp.ndarray        # [M] i32 index into pt_ids
    o_uv: jnp.ndarray        # [M,2]
    o_ur: jnp.ndarray        # [M] (-1 mono)
    o_inv_sigma2: jnp.ndarray  # [M]
    o_valid: jnp.ndarray     # [M] bool


def _compact(mask: jnp.ndarray, size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mask [n] -> (ids [size] of set positions (-1 pad), count)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask & (pos < size), pos, size)
    ids = jnp.full((size + 1,), -1, jnp.int32).at[slot].set(jnp.arange(n, dtype=jnp.int32))
    return ids[:size], jnp.minimum(jnp.sum(mask.astype(jnp.int32)), size)


def build_problem(
    m: MapState,
    center_kf: jnp.ndarray,
    caps: MapCaps,
    inv_level_sigma2: jnp.ndarray | None = None,
) -> BAProblem:
    """Select window/fixed keyframes, local points and observations.

    inv_level_sigma2: [levels] per-octave weights from the configured
    pyramid (1/scale_factor^(2*octave)); defaults to scale_factor 1.2."""
    K = m.kf_valid.shape[0]
    P = m.pt_valid.shape[0]
    N = m.kf_mp.shape[1]
    wk = min(W_KF, K)
    fk = min(F_KF, K)
    l_pt = min(L_PT, P)
    n_obs = min(N_OBS, K * N)

    # window: center + covisibles by weight (optimizer_ceres.cpp:449-463)
    w_row = m.covis[center_kf] * m.kf_valid.astype(jnp.int32)
    w_row = w_row.at[center_kf].set(jnp.int32(1 << 20))  # center always first
    order = jnp.argsort(-w_row)
    win_ids = jnp.where(w_row[order][:wk] > 0, order[:wk], -1).astype(jnp.int32)
    in_window = jnp.zeros((K,), bool).at[jnp.maximum(win_ids, 0)].max(win_ids >= 0)

    # local points: observed by window KFs
    rows_on = in_window[:, None] & (m.kf_mp >= 0) & m.kf_kp_valid  # [K,N]
    flat_pt = jnp.where(rows_on, m.kf_mp, P - 1).reshape(-1)
    pt_mask = jnp.zeros((P,), bool).at[flat_pt].max(rows_on.reshape(-1))
    pt_mask &= m.pt_valid
    pt_ids, _ = _compact(pt_mask, l_pt)
    # pads (-1) scatter to a dump row, NOT to index 0
    pt_slot = (
        jnp.full((P + 1,), -1, jnp.int32)
        .at[jnp.where(pt_ids >= 0, pt_ids, P)]
        .set(jnp.arange(l_pt, dtype=jnp.int32))[:P]
    )
    in_local = pt_slot >= 0

    # fixed KFs: observers of local points outside the window (:502-528)
    sees_local = in_local[jnp.maximum(m.kf_mp, 0)] & (m.kf_mp >= 0)  # [K,N]
    kf_sees = jnp.any(sees_local, axis=1) & m.kf_valid
    fixed_mask = kf_sees & ~in_window
    fix_ids, _ = _compact(fixed_mask, fk)

    kf_ids = jnp.concatenate([win_ids, fix_ids])
    kf_fixed = jnp.concatenate([jnp.zeros((wk,), bool), jnp.ones((fk,), bool)])
    # gauge anchor: with no out-of-window observers the problem is
    # gauge-free (can happen early, when every KF is covisible); pin the
    # lowest-id window keyframe (the reference relies on fixed observers
    # always existing, optimizer_ceres.cpp:502-528)
    has_fixed = jnp.any(fix_ids >= 0)
    lowest = jnp.argmin(jnp.where(win_ids >= 0, win_ids, jnp.int32(1 << 30)))
    kf_fixed = kf_fixed.at[lowest].set(jnp.where(has_fixed, kf_fixed[lowest], True))
    kf_slot = (
        jnp.full((K + 1,), -1, jnp.int32)
        .at[jnp.where(kf_ids >= 0, kf_ids, K)]
        .set(jnp.arange(wk + fk, dtype=jnp.int32))[:K]
    )

    # observations: every (kf in window|fixed, kp) seeing a local point
    obs_on = (kf_slot[:, None] >= 0) & sees_local  # [K,N]
    flat_on = obs_on.reshape(-1)
    o_lin, _ = _compact(flat_on, n_obs)
    o_k = jnp.where(o_lin >= 0, o_lin // N, 0)
    o_n = jnp.where(o_lin >= 0, o_lin % N, 0)
    o_ok = o_lin >= 0
    return BAProblem(
        kf_ids=kf_ids,
        kf_fixed=kf_fixed,
        pt_ids=pt_ids,
        o_kf=jnp.where(o_ok, kf_slot[o_k], -1),
        o_pt=jnp.where(o_ok, pt_slot[jnp.maximum(m.kf_mp[o_k, o_n], 0)], -1),
        o_uv=m.kf_uv_und[o_k, o_n],
        o_ur=jnp.where(o_ok, m.kf_u_right[o_k, o_n], -1.0),
        o_inv_sigma2=(
            1.0 / (1.2 ** (2.0 * m.kf_octave[o_k, o_n].astype(jnp.float32)))
            if inv_level_sigma2 is None
            else inv_level_sigma2[m.kf_octave[o_k, o_n]]
        ),
        o_valid=o_ok,
    )


def _residuals(poses, points, prob: BAProblem, cam: Camera):
    """e [M,3] (row 3 zeroed for mono), pc [M,3]."""
    kf = jnp.maximum(prob.o_kf, 0)
    pt = jnp.maximum(prob.o_pt, 0)
    T = poses[kf]                       # [M,4,4]
    X = points[pt]                      # [M,3]
    pc = jnp.einsum("mij,mj->mi", T[:, :3, :3], X) + T[:, :3, 3]
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    invz = 1.0 / safe_z
    u = cam.fx * pc[:, 0] * invz + cam.cx
    v = cam.fy * pc[:, 1] * invz + cam.cy
    ur = u - cam.bf * invz
    stereo = prob.o_ur >= 0
    e = jnp.stack(
        [u - prob.o_uv[:, 0], v - prob.o_uv[:, 1], jnp.where(stereo, ur - prob.o_ur, 0.0)],
        axis=-1,
    )
    return e, pc, stereo


def _jacobians(poses, points, prob: BAProblem, cam: Camera):
    """J_pose [M,3,6] (left-mult twist), J_pt [M,3,3], e [M,3], stereo [M]."""
    e, pc, stereo = _residuals(poses, points, prob, cam)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    invz = 1.0 / safe_z
    invz2 = invz * invz
    zero = jnp.zeros_like(x)
    du = jnp.stack([cam.fx * invz, zero, -cam.fx * x * invz2], -1)
    dv = jnp.stack([zero, cam.fy * invz, -cam.fy * y * invz2], -1)
    dur = du + jnp.stack([zero, zero, cam.bf * invz2], -1)
    dproj = jnp.stack([du, dv, jnp.where(stereo[:, None], dur, 0.0)], -2)  # [M,3,3]
    # pose: d pc/d twist = [I | -hat(pc)]
    dpc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:1] + (3, 3)), -lie.hat(pc)],
        axis=-1,
    )
    J_pose = dproj @ dpc
    # point: d pc/d X = R
    kf = jnp.maximum(prob.o_kf, 0)
    R = poses[kf][:, :3, :3]
    J_pt = dproj @ R
    return J_pose, J_pt, e, stereo


def _lm_pass(
    poses0, points0, prob: BAProblem, cam: Camera, active, use_huber: bool, iters: int,
    wk: int,
):
    """One LM pass; returns (poses, points). wk = static window size."""
    M = prob.o_valid.shape[0]
    Wp = wk
    L = points0.shape[0]

    inv_sig = jnp.sqrt(prob.o_inv_sigma2)
    d_mono = jnp.sqrt(CHI2_MONO)
    d_stereo = jnp.sqrt(CHI2_STEREO)

    def cost_of(poses, points):
        e, _, stereo = _residuals(poses, points, prob, cam)
        ew = e * inv_sig[:, None]
        s2 = jnp.sum(ew * ew, -1)
        if use_huber:
            delta = jnp.where(stereo, d_stereo, d_mono)
            s = jnp.sqrt(s2 + 1e-12)
            rho = jnp.where(s <= delta, s2, 2 * delta * s - delta * delta)
        else:
            rho = s2
        return jnp.sum(jnp.where(active, rho, 0.0))

    def body(state):
        poses, points, lam, it, done = state
        J_pose, J_pt, e, stereo = _jacobians(poses, points, prob, cam)
        ew = e * inv_sig[:, None]
        Jp = J_pose * inv_sig[:, None, None]
        Jl = J_pt * inv_sig[:, None, None]
        if use_huber:
            nrm = jnp.sqrt(jnp.sum(ew * ew, -1) + 1e-12)
            delta = jnp.where(stereo, d_stereo, d_mono)
            wrob = jnp.minimum(1.0, delta / nrm)
        else:
            wrob = jnp.ones((M,), e.dtype)
        w = active.astype(e.dtype) * wrob
        # fixed poses contribute residuals but no pose variables
        kf = jnp.maximum(prob.o_kf, 0)
        pt = jnp.maximum(prob.o_pt, 0)
        pose_var = (~prob.kf_fixed[kf]) & (prob.o_kf >= 0) & (kf < Wp)

        wp = w * pose_var.astype(e.dtype)
        # block-diagonal pose Hessian [W,6,6] and gradient [W,6]
        Hpp = jax.ops.segment_sum(
            wp[:, None, None] * jnp.einsum("mri,mrj->mij", Jp, Jp), kf, num_segments=prob.kf_fixed.shape[0]
        )[:Wp]
        bp = jax.ops.segment_sum(
            wp[:, None] * jnp.einsum("mri,mr->mi", Jp, ew), kf, num_segments=prob.kf_fixed.shape[0]
        )[:Wp]
        # point Hessian blocks [L,3,3] and gradient [L,3]
        Hll = jax.ops.segment_sum(
            w[:, None, None] * jnp.einsum("mri,mrj->mij", Jl, Jl), pt, num_segments=L
        )
        bl = jax.ops.segment_sum(
            w[:, None] * jnp.einsum("mri,mr->mi", Jl, ew), pt, num_segments=L
        )
        # cross terms W[k,p] in dense [W,L,6,3] via scatter-add
        cross_obs = wp[:, None, None] * jnp.einsum("mri,mrj->mij", Jp, Jl)  # [M,6,3]
        Wc = jnp.zeros((Wp, L, 6, 3), e.dtype).at[
            jnp.where(pose_var, kf, 0), jnp.where(pose_var, pt, 0)
        ].add(jnp.where(pose_var[:, None, None], cross_obs, 0.0))

        # damping
        lamI3 = lam * jnp.eye(3, dtype=e.dtype)
        Hll_d = Hll + lamI3[None] + 1e-8 * jnp.eye(3, dtype=e.dtype)[None]
        Hll_inv = linalg.inv3x3(Hll_d)  # closed form; LU batches crawl on TPU
        lamI6 = lam * jnp.eye(6, dtype=e.dtype)
        Hpp_d = Hpp + lamI6[None]

        # Schur: S = blockdiag(Hpp) - W Hll^-1 W^T  over the point index
        WHinv = jnp.einsum("kpij,pjl->kpil", Wc, Hll_inv)          # [W,L,6,3]
        S_off = jnp.einsum("kpil,qpml->kiqm", WHinv, Wc)            # [W,6,W,6]
        S = -S_off
        S = S.at[jnp.arange(Wp), :, jnp.arange(Wp), :].add(Hpp_d)
        rhs = bp - jnp.einsum("kpil,pl->ki", WHinv, bl)             # [W,6]

        Sd = S.reshape(Wp * 6, Wp * 6) + 1e-7 * jnp.eye(Wp * 6, dtype=e.dtype)
        # SPD after damping: Cholesky halves the cost of the LU path on TPU
        chol = jnp.linalg.cholesky(Sd)
        dx_pose = -jax.scipy.linalg.cho_solve((chol, True), rhs.reshape(-1)).reshape(Wp, 6)
        # back-substitute points: dx_l = -Hll^-1 (bl + W^T dx_p)
        Wt_dx = jnp.einsum("kpil,ki->pl", Wc, dx_pose)
        dx_pt = -jnp.einsum("pij,pj->pi", Hll_inv, bl + Wt_dx)

        new_win = lie.se3_exp(dx_pose) @ poses[:Wp]
        poses_new = jnp.concatenate([new_win, poses[Wp:]], axis=0)
        points_new = points + dx_pt

        # old cost from the residuals already in hand
        s2_old = jnp.sum(ew * ew, -1)
        if use_huber:
            delta_o = jnp.where(stereo, d_stereo, d_mono)
            so = jnp.sqrt(s2_old + 1e-12)
            rho_old = jnp.where(so <= delta_o, s2_old, 2 * delta_o * so - delta_o * delta_o)
        else:
            rho_old = s2_old
        c_old = jnp.sum(jnp.where(active, rho_old, 0.0))
        c_new = cost_of(poses_new, points_new)
        improved = c_new < c_old
        poses = jnp.where(improved, poses_new, poses)
        points = jnp.where(improved, points_new, points)
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-8), jnp.minimum(lam * 4.0, 1e8))
        done = jnp.maximum(jnp.max(jnp.abs(dx_pose)), jnp.max(jnp.abs(dx_pt))) < 1e-7
        return poses, points, lam, it + 1, done

    def cond(state):
        return (state[3] < iters) & (~state[4])

    poses, points, _, _, _ = jax.lax.while_loop(
        cond, body, (poses0, points0, jnp.asarray(1e-4, poses0.dtype), jnp.asarray(0), jnp.asarray(False))
    )
    return poses, points


def _classify_obs(poses, points, prob: BAProblem, cam: Camera):
    """chi2 + positive-depth gates per observation (optimizer_ceres.cpp:627-699)."""
    e, pc, stereo = _residuals(poses, points, prob, cam)
    e2 = jnp.sum(e[:, :2] ** 2, -1)
    chi2 = jnp.where(stereo, e2 + e[:, 2] ** 2, e2) * prob.o_inv_sigma2
    gate = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
    return prob.o_valid & (chi2 <= gate) & (pc[:, 2] > 0)


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def local_bundle_adjust(
    m: MapState,
    center_kf: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    inv_level_sigma2: jnp.ndarray | None = None,
) -> MapState:
    """Run windowed local BA around center_kf and write results into the map."""
    prob = build_problem(m, center_kf, caps, inv_level_sigma2)
    poses = m.kf_pose[jnp.maximum(prob.kf_ids, 0)]
    points = m.pt_pos[jnp.maximum(prob.pt_ids, 0)]

    # pass 1: Huber, 5 iters (optimizer_ceres.cpp:597-607)
    wk = min(W_KF, m.kf_valid.shape[0])
    poses, points = _lm_pass(poses, points, prob, cam, prob.o_valid, True, 5, wk)
    inl = _classify_obs(poses, points, prob, cam)
    # pass 2: inliers only, 10 iters, no loss (:659-668)
    poses, points = _lm_pass(poses, points, prob, cam, inl, False, 10, wk)
    final_inl = _classify_obs(poses, points, prob, cam)

    # ---- write back window poses + point positions -------------------------
    win_ok = (prob.kf_ids >= 0) & (~prob.kf_fixed)
    kf_rows = jnp.where(win_ok, prob.kf_ids, m.kf_valid.shape[0] - 1)
    new_poses = jnp.where(win_ok[:, None, None], lie.orthonormalize(poses), m.kf_pose[kf_rows])
    m = m.replace(kf_pose=m.kf_pose.at[kf_rows].set(new_poses))

    pt_ok = prob.pt_ids >= 0
    pt_rows = jnp.where(pt_ok, prob.pt_ids, m.pt_valid.shape[0] - 1)
    new_pts = jnp.where(pt_ok[:, None], points, m.pt_pos[pt_rows])
    m = m.replace(pt_pos=m.pt_pos.at[pt_rows].set(new_pts))

    # ---- erase outlier observations (:757-789) ----------------------------
    bad = prob.o_valid & ~final_inl
    kf_global = prob.kf_ids[jnp.maximum(prob.o_kf, 0)]
    pt_global = prob.pt_ids[jnp.maximum(prob.o_pt, 0)]
    kp_of_obs = _obs_kp_lookup(m, kf_global, pt_global, bad)
    K = m.kf_valid.shape[0]
    N = m.kf_mp.shape[1]
    kf_w = jnp.where(bad, kf_global, K - 1)
    kp_w = jnp.where(bad, kp_of_obs, N - 1)
    kf_mp = m.kf_mp.at[kf_w, kp_w].set(jnp.where(bad, -1, m.kf_mp[kf_w, kp_w]))
    m = m.replace(kf_mp=kf_mp)
    # remove from the point's observer list
    O = m.pt_obs_kf.shape[1]
    match = (m.pt_obs_kf[jnp.maximum(pt_global, 0)] == kf_global[:, None]) & bad[:, None]
    slot = jnp.argmax(match, axis=1)
    has = jnp.any(match, axis=1)
    prow = jnp.where(has, pt_global, m.pt_valid.shape[0] - 1)
    pcol = jnp.where(has, slot, O - 1)
    m = m.replace(
        pt_obs_kf=m.pt_obs_kf.at[prow, pcol].set(jnp.where(has, -1, m.pt_obs_kf[prow, pcol])),
        pt_obs_kp=m.pt_obs_kp.at[prow, pcol].set(jnp.where(has, -1, m.pt_obs_kp[prow, pcol])),
        pt_obs_cnt=m.pt_obs_cnt.at[jnp.where(has, pt_global, m.pt_valid.shape[0] - 1)].add(
            jnp.where(has, -1, 0)
        ),
    )
    # obs<=2 -> point erased... only for points whose obs was touched
    # (mappoint.cpp:353: auto-erase at obs<=2 after an erase)
    touched = jnp.zeros((m.pt_valid.shape[0],), bool).at[jnp.maximum(pt_global, 0)].max(has)
    low = touched & (m.pt_obs_cnt <= 2)
    m = m.replace(pt_valid=m.pt_valid & ~low)
    return m


def _obs_kp_lookup(m: MapState, kf_global, pt_global, mask):
    """Find the keypoint index of (kf, point) from the observer lists."""
    safe_pt = jnp.maximum(pt_global, 0)
    hit = (m.pt_obs_kf[safe_pt] == kf_global[:, None]) & mask[:, None]
    slot = jnp.argmax(hit, axis=1)
    kp = jnp.take_along_axis(m.pt_obs_kp[safe_pt], slot[:, None], axis=1)[:, 0]
    return jnp.where(jnp.any(hit, axis=1), kp, 0)
