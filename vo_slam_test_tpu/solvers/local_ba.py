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




# ---------------------------------------------------------------------------
# Dense [blk, O, L] observation layout — the TPU-fast path
#
# Two lessons from per-op TPU traces of earlier layouts:
#   1. segment-sum / scatter-add accumulations serialize into row-wise DMAs
#      (~12 ms per LM iteration on the flat [M] layout);
#   2. arrays whose LAST TWO dims are small blocks ([M,6,6], [L,O,6,3], ...)
#      tile to (8,128) with 20-40x padding waste, so even "dense" einsums
#      crawl (~26 ms/iteration on an [L,O,blk] layout).
# This layout keeps block dims LEADING and the big point axis LAST
# ([6,6,O,L] etc. -> (O,L) tiles map onto (8,128) exactly), observations as
# per-point observer slots straight from pt_obs_kf/pt_obs_kp (capped at
# O_BA), and replaces every gather/scatter in the iteration with one-hot
# contractions and batched GEMMs:
#   camera-frame points:  Y = R_w X_l + t_w as one [WF,3,L] GEMM, selected
#                         per observation by the observer one-hot;
#   Hll/bl:               dense reduction over the O axis;
#   Hpp/bp:               [W, O*L] x [O*L, blk] GEMM on the window one-hot;
#   cross/Schur products: small-contraction einsums over (O | 3) with L in
#                         vector lanes.
# No scatters and no per-iteration gathers anywhere.
# ---------------------------------------------------------------------------

O_BA = 12  # observer slots per point entering BA (valid-first compaction)


class BAProblemOL(NamedTuple):
    kf_ids: jnp.ndarray      # [WF] i32 (window first; -1 pad)
    kf_fixed: jnp.ndarray    # [WF] bool
    pt_ids: jnp.ndarray      # [L] i32 (-1 pad)
    o_slot: jnp.ndarray      # [O,L] i32 index into kf_ids (-1 invalid)
    o_kp: jnp.ndarray        # [O,L] i32 keypoint in that keyframe
    o_col: jnp.ndarray       # [O,L] i32 original pt_obs column (for erasure)
    o_uv: jnp.ndarray        # [2,O,L]
    o_ur: jnp.ndarray        # [O,L] (-1 mono)
    o_inv_sigma2: jnp.ndarray  # [O,L]
    o_valid: jnp.ndarray     # [O,L] bool
    oh_all: jnp.ndarray      # [WF,O,L] f32 observer one-hot (valid obs)
    oh_win: jnp.ndarray      # [W,O,L] f32 one-hot where the pose varies


def build_problem_ol(
    m: MapState,
    center_kf: jnp.ndarray,
    caps: MapCaps,
    inv_level_sigma2: jnp.ndarray | None = None,
) -> BAProblemOL:
    """Window/fixed/point selection as build_problem; observations from the
    per-point observer lists (valid-first, capped at O_BA slots)."""
    K = m.kf_valid.shape[0]
    P = m.pt_valid.shape[0]
    wk = min(W_KF, K)
    fk = min(F_KF, K)
    l_pt = min(L_PT, P)

    w_row = m.covis[center_kf] * m.kf_valid.astype(jnp.int32)
    w_row = w_row.at[center_kf].set(jnp.int32(1 << 20))
    order = jnp.argsort(-w_row)
    win_ids = jnp.where(w_row[order][:wk] > 0, order[:wk], -1).astype(jnp.int32)
    in_window = jnp.zeros((K,), bool).at[jnp.maximum(win_ids, 0)].max(win_ids >= 0)

    rows_on = in_window[:, None] & (m.kf_mp >= 0) & m.kf_kp_valid
    flat_pt = jnp.where(rows_on, m.kf_mp, P - 1).reshape(-1)
    pt_mask = jnp.zeros((P,), bool).at[flat_pt].max(rows_on.reshape(-1))
    pt_mask &= m.pt_valid
    pt_ids, _ = _compact(pt_mask, l_pt)
    in_local = jnp.zeros((P,), bool).at[jnp.maximum(pt_ids, 0)].max(pt_ids >= 0)

    sees_local = in_local[jnp.maximum(m.kf_mp, 0)] & (m.kf_mp >= 0)
    kf_sees = jnp.any(sees_local, axis=1) & m.kf_valid
    fixed_mask = kf_sees & ~in_window
    fix_ids, _ = _compact(fixed_mask, fk)

    kf_ids = jnp.concatenate([win_ids, fix_ids])
    kf_fixed = jnp.concatenate([jnp.zeros((wk,), bool), jnp.ones((fk,), bool)])
    has_fixed = jnp.any(fix_ids >= 0)
    lowest = jnp.argmin(jnp.where(win_ids >= 0, win_ids, jnp.int32(1 << 30)))
    kf_fixed = kf_fixed.at[lowest].set(jnp.where(has_fixed, kf_fixed[lowest], True))
    kf_slot = (
        jnp.full((K + 1,), -1, jnp.int32)
        .at[jnp.where(kf_ids >= 0, kf_ids, K)]
        .set(jnp.arange(wk + fk, dtype=jnp.int32))[:K]
    )

    # observations from the observer lists, valid-first into O_BA slots
    pid = jnp.maximum(pt_ids, 0)                     # [L]
    okf = m.pt_obs_kf[pid]                           # [L,O_map]
    okp = m.pt_obs_kp[pid]
    okf_s = jnp.maximum(okf, 0)
    okp_s = jnp.maximum(okp, 0)
    slot = jnp.where(okf >= 0, kf_slot[okf_s], -1)
    valid_full = (
        (pt_ids >= 0)[:, None]
        & (okf >= 0) & (okp >= 0) & (slot >= 0)
        & m.kf_kp_valid[okf_s, okp_s]
        & (m.kf_mp[okf_s, okp_s] == pid[:, None])    # list consistent with map
    )
    o_map = okf.shape[1]
    o_ba = min(O_BA, o_map)
    # valid-first compaction WITHOUT a sort (TPU sorts of [L,O] are the
    # dominant cost of this builder): the r-th valid column of row p is
    # the one whose running valid-count equals r — scatter each column
    # index into its rank slot
    rank = jnp.cumsum(valid_full.astype(jnp.int32), axis=1) - 1   # [L,O]
    rows = jnp.arange(pid.shape[0], dtype=jnp.int32)[:, None]
    rk = jnp.where(valid_full & (rank < o_ba), rank, o_ba)
    col = (
        jnp.zeros((pid.shape[0], o_ba + 1), jnp.int32)
        .at[rows, rk]
        .max(jnp.broadcast_to(jnp.arange(o_map, dtype=jnp.int32)[None],
                              valid_full.shape))[:, :o_ba]
    )
    valid_c = rank[rows, jnp.minimum(col, o_map - 1)] == jnp.arange(
        o_ba, dtype=jnp.int32)[None]
    valid_c &= jnp.take_along_axis(valid_full, col, axis=1)
    take = lambda a: jnp.take_along_axis(a, col, axis=1)
    okf_c, okp_c, slot_c = take(okf_s), take(okp_s), take(slot)

    octave = m.kf_octave[okf_c, okp_c]
    inv_sig2 = (
        1.0 / (1.2 ** (2.0 * octave.astype(jnp.float32)))
        if inv_level_sigma2 is None
        else inv_level_sigma2[octave]
    )
    uv = m.kf_uv_und[okf_c, okp_c]                   # [L,O,2]
    ur = jnp.where(valid_c, m.kf_u_right[okf_c, okp_c], -1.0)

    slot_t = jnp.where(valid_c, slot_c, -1).T        # [O,L]
    valid_t = valid_c.T
    pose_var = valid_t & (slot_t >= 0) & (slot_t < wk) & ~kf_fixed[jnp.maximum(slot_t, 0)]
    oh_all = (
        jax.nn.one_hot(jnp.where(valid_t, slot_t, wk + fk), wk + fk + 1,
                       dtype=jnp.float32, axis=0)[: wk + fk]
    )
    oh_win = (
        jax.nn.one_hot(jnp.where(pose_var, slot_t, wk), wk + 1,
                       dtype=jnp.float32, axis=0)[:wk]
    )
    return BAProblemOL(
        kf_ids=kf_ids,
        kf_fixed=kf_fixed,
        pt_ids=pt_ids,
        o_slot=slot_t,
        o_kp=okp_c.T,
        o_col=col.astype(jnp.int32).T,
        o_uv=jnp.transpose(uv, (2, 0, 1))[:, :, :].transpose(0, 2, 1),  # [2,O,L]
        o_ur=ur.T,
        o_inv_sigma2=inv_sig2.T,
        o_valid=valid_t,
        oh_all=oh_all,
        oh_win=oh_win,
    )


def _inv3x3_ol(H):
    """Closed-form inverse of [3,3,L] SPD blocks (component-wise adjugate)."""
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 0], H[1, 1], H[1, 2]
    g, h, i = H[2, 0], H[2, 1], H[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    row0 = jnp.stack([A, -(b * i - c * h), (b * f - c * e)], 0)
    row1 = jnp.stack([B, (a * i - c * g), -(a * f - c * d)], 0)
    row2 = jnp.stack([C, -(a * h - b * g), (a * e - b * d)], 0)
    return jnp.stack([row0, row1, row2], 0) * inv_det[None, None]


def _pc_ol(poses, points, prob: BAProblemOL):
    """Camera-frame coordinates per observation: [3,O,L]."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    Y = jnp.einsum("wcb,lb->wcl", R, points) + t[:, :, None]   # [WF,3,L]
    return jnp.einsum("wol,wcl->col", prob.oh_all, Y)


def _residuals_ol(poses, points, prob: BAProblemOL, cam: Camera):
    """e [3,O,L] (row 3 zeroed for mono), pc [3,O,L], stereo [O,L]."""
    pc = _pc_ol(poses, points, prob)
    z = pc[2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    invz = 1.0 / safe_z
    u = cam.fx * pc[0] * invz + cam.cx
    v = cam.fy * pc[1] * invz + cam.cy
    ur = u - cam.bf * invz
    stereo = prob.o_ur >= 0
    e = jnp.stack(
        [u - prob.o_uv[0], v - prob.o_uv[1],
         jnp.where(stereo, ur - prob.o_ur, 0.0)], 0)
    return e, pc, stereo


def _jacobians_ol(poses, points, prob: BAProblemOL, cam: Camera):
    """J_pose [3,6,O,L], J_pt [3,3,O,L], e [3,O,L], stereo [O,L]."""
    e, pc, stereo = _residuals_ol(poses, points, prob, cam)
    x, y, z = pc[0], pc[1], pc[2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    invz = 1.0 / safe_z
    invz2 = invz * invz
    zero = jnp.zeros_like(x)
    du = jnp.stack([cam.fx * invz, zero, -cam.fx * x * invz2], 0)   # [3,O,L]
    dv = jnp.stack([zero, cam.fy * invz, -cam.fy * y * invz2], 0)
    dur = du + jnp.stack([zero, zero, cam.bf * invz2], 0)
    dproj = jnp.stack([du, dv, jnp.where(stereo[None], dur, 0.0)], 0)  # [r,b,O,L]
    one = jnp.ones_like(x)
    # dpc/dtwist = [I | -hat(pc)] as [b, c=6, O, L]
    b0 = jnp.stack([one, zero, zero, zero, z, -y], 0)
    b1 = jnp.stack([zero, one, zero, -z, zero, x], 0)
    b2 = jnp.stack([zero, zero, one, y, -x, zero], 0)
    dpc = jnp.stack([b0, b1, b2], 0)                                  # [3,6,O,L]
    J_pose = jnp.einsum("rbol,bcol->rcol", dproj, dpc)                # [3,6,O,L]
    R_lo = jnp.einsum("wol,wbj->bjol", prob.oh_all, poses[:, :3, :3])  # [3,3,O,L]
    J_pt = jnp.einsum("rbol,bjol->rjol", dproj, R_lo)                 # [3,3,O,L]
    return J_pose, J_pt, e, stereo


def _lm_pass_ol(
    poses0, points0, prob: BAProblemOL, cam: Camera, active, use_huber: bool,
    iters: int, wk: int, axis: str | None = None,
):
    """One LM pass over the dense [blk,O,L] layout; returns (poses, points).

    axis: mesh axis name when running under shard_map with the point axis L
    sharded across devices. The point-side terms (Hll, bl, Hll_inv, dx_pt)
    are per-point and stay shard-local; only the pose-side reductions over
    L (Hpp, bp, the Schur off-diagonal, rhs, costs) cross the mesh — each a
    psum of a [W,6]-sized block over ICI, so communication is O(model),
    not O(observations)."""
    Wp = wk
    inv_sig = jnp.sqrt(prob.o_inv_sigma2)          # [O,L]
    d_mono = jnp.sqrt(CHI2_MONO)
    d_stereo = jnp.sqrt(CHI2_STEREO)
    W_, O, L = prob.oh_win.shape
    oh2 = prob.oh_win.reshape(Wp, O * L)
    psum = (lambda x: jax.lax.psum(x, axis)) if axis else (lambda x: x)
    pmax = (lambda x: jax.lax.pmax(x, axis)) if axis else (lambda x: x)

    def rho_sum(e, stereo, act):
        ew = e * inv_sig[None]
        s2 = jnp.sum(ew * ew, 0)                   # [O,L]
        if use_huber:
            delta = jnp.where(stereo, d_stereo, d_mono)
            s = jnp.sqrt(s2 + 1e-12)
            rho = jnp.where(s <= delta, s2, 2 * delta * s - delta * delta)
        else:
            rho = s2
        return psum(jnp.sum(jnp.where(act, rho, 0.0)))

    def cost_of(poses, points):
        e, _, stereo = _residuals_ol(poses, points, prob, cam)
        return rho_sum(e, stereo, active)

    def body(state):
        poses, points, lam, it, done = state
        J_pose, J_pt, e, stereo = _jacobians_ol(poses, points, prob, cam)
        ew = e * inv_sig[None]
        Jp = J_pose * inv_sig[None, None]
        Jl = J_pt * inv_sig[None, None]
        if use_huber:
            nrm = jnp.sqrt(jnp.sum(ew * ew, 0) + 1e-12)
            delta = jnp.where(stereo, d_stereo, d_mono)
            wrob = jnp.minimum(1.0, delta / nrm)
        else:
            wrob = jnp.ones((O, L), e.dtype)
        w = active.astype(e.dtype) * wrob          # [O,L]

        # point blocks: dense O-axis reductions, L in lanes
        Hll = jnp.einsum("riol,rjol,ol->ijl", Jl, Jl, w)     # [3,3,L]
        bl = jnp.einsum("riol,rol,ol->il", Jl, ew, w)        # [3,L]

        # pose blocks: one [W, O*L] x [O*L, blk] GEMM each
        Jpw = Jp * w[None, None]
        Gpp = jnp.einsum("riol,rjol->ijol", Jpw, Jp).reshape(36, O * L)
        Hpp = psum((oh2 @ Gpp.T).reshape(Wp, 6, 6))
        gp = jnp.einsum("riol,rol->iol", Jpw, ew).reshape(6, O * L)
        bp = psum(oh2 @ gp.T)                                 # [W,6]
        cross = jnp.einsum("riol,rjol->ijol", Jpw, Jl)        # [6,3,O,L]
        Wc = jnp.einsum("wol,ijol->wijl", prob.oh_win, cross)  # [W,6,3,L]

        lam3 = lam + 0.0
        Hll_d = Hll.at[0, 0].add(lam3 + 1e-8).at[1, 1].add(lam3 + 1e-8).at[2, 2].add(lam3 + 1e-8)
        Hll_inv = _inv3x3_ol(Hll_d)                           # [3,3,L]
        lamI6 = lam * jnp.eye(6, dtype=e.dtype)
        Hpp_d = Hpp + lamI6[None]

        WHinv = jnp.einsum("wikl,kjl->wijl", Wc, Hll_inv)     # [W,6,3,L]
        S_off = psum(jnp.einsum("wikl,vmkl->wivm", WHinv, Wc))  # [W,6,W,6]
        S = -S_off
        S = S.at[jnp.arange(Wp), :, jnp.arange(Wp), :].add(Hpp_d)
        rhs = bp - psum(jnp.einsum("wikl,kl->wi", WHinv, bl))

        Sd = S.reshape(Wp * 6, Wp * 6) + 1e-7 * jnp.eye(Wp * 6, dtype=e.dtype)
        chol = jnp.linalg.cholesky(Sd)
        dx_pose = -jax.scipy.linalg.cho_solve((chol, True), rhs.reshape(-1)).reshape(Wp, 6)
        Wt_dx = jnp.einsum("wikl,wi->kl", Wc, dx_pose)        # [3,L]
        dx_pt = -jnp.einsum("ijl,jl->il", Hll_inv, bl + Wt_dx)

        new_win = lie.se3_exp(dx_pose) @ poses[:Wp]
        poses_new = jnp.concatenate([new_win, poses[Wp:]], axis=0)
        points_new = points + dx_pt.T

        c_old = rho_sum(e, stereo, active)
        c_new = cost_of(poses_new, points_new)
        improved = c_new < c_old
        poses = jnp.where(improved, poses_new, poses)
        points = jnp.where(improved, points_new, points)
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-8), jnp.minimum(lam * 4.0, 1e8))
        done = (
            jnp.maximum(jnp.max(jnp.abs(dx_pose)), pmax(jnp.max(jnp.abs(dx_pt))))
            < 1e-7
        )
        # Ceres-style function tolerance (the reference's Solver default,
        # 1e-6 relative decrease): saves the tail iterations whose cost is
        # pure launch overhead once converged
        done |= improved & ((c_old - c_new) < 1e-6 * jnp.maximum(c_old, 1e-12))
        return poses, points, lam, it + 1, done

    def cond(state):
        return (state[3] < iters) & (~state[4])

    poses, points, _, it, _ = jax.lax.while_loop(
        cond, body,
        (poses0, points0, jnp.asarray(1e-4, poses0.dtype), jnp.asarray(0), jnp.asarray(False)),
    )
    return poses, points, it


def _lm_pass_pallas(
    poses0, points0, prob: BAProblemOL, cam: Camera, active, use_huber: bool,
    iters: int, wk: int, interpret: bool = False, axis: str | None = None,
):
    """The Pallas-kernel LM pass (ops/ba_pallas.py): numerically equivalent
    to _lm_pass_ol, used on the TPU backend where XLA's layout choices for
    the small-block tensors are pathological.

    axis: mesh axis for L-sharded execution under shard_map — the kernels
    accumulate over the local point shard; the [W,6]-sized pose-side blocks
    and costs psum over ICI (see _lm_pass_ol)."""
    from ..ops import ba_pallas

    WF = prob.kf_ids.shape[0]
    O, L = prob.o_valid.shape
    act = active.astype(jnp.float32)
    povar = jnp.sum(prob.oh_win, axis=0)
    u_row = prob.o_uv[0]
    v_row = prob.o_uv[1]
    fx, fy, cx, cy, bf = cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
    psum = (lambda x: jax.lax.psum(x, axis)) if axis else (lambda x: x)
    pmax = (lambda x: jax.lax.pmax(x, axis)) if axis else (lambda x: x)

    def body(state):
        poses, points, lam, it, done = state
        posesT = poses.reshape(WF, 16).T
        X = points.T
        Hpp36, bp, S_red, rhs_red, cost_old, Hinv, bl, Wc = ba_pallas.ba_accumulate(
            lam, posesT, X, prob.o_slot, u_row, v_row, prob.o_ur,
            prob.o_inv_sigma2, act, povar,
            fx, fy, cx, cy, bf,
            WF=WF, wk=wk, O=O, use_huber=use_huber, interpret=interpret,
        )
        Hpp36, bp, S_red, rhs_red, cost_old = (
            psum(Hpp36), psum(bp), psum(S_red), psum(rhs_red), psum(cost_old)
        )
        Hpp = Hpp36.reshape(wk, 6, 6) + lam * jnp.eye(6, dtype=poses.dtype)[None]
        S = -S_red.reshape(wk, 6, wk, 6)
        S = S.at[jnp.arange(wk), :, jnp.arange(wk), :].add(Hpp)
        rhs = bp - rhs_red.reshape(wk, 6)
        Sd = S.reshape(wk * 6, wk * 6) + 1e-7 * jnp.eye(wk * 6, dtype=poses.dtype)
        chol = jnp.linalg.cholesky(Sd)
        dx_pose = -jax.scipy.linalg.cho_solve((chol, True), rhs.reshape(-1)).reshape(wk, 6)
        dx_pt = ba_pallas.ba_backsub(Wc, Hinv, bl, dx_pose, wk=wk, interpret=interpret)

        new_win = lie.se3_exp(dx_pose) @ poses[:wk]
        poses_new = jnp.concatenate([new_win, poses[wk:]], axis=0)
        points_new = points + dx_pt.T

        cost_new = psum(ba_pallas.ba_cost(
            poses_new.reshape(WF, 16).T, points_new.T, prob.o_slot,
            u_row, v_row, prob.o_ur, prob.o_inv_sigma2, act,
            fx, fy, cx, cy, bf,
            WF=WF, O=O, use_huber=use_huber, interpret=interpret,
        ))
        improved = cost_new[0, 0] < cost_old[0, 0]
        poses = jnp.where(improved, poses_new, poses)
        points = jnp.where(improved, points_new, points)
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-8), jnp.minimum(lam * 4.0, 1e8))
        done = (
            jnp.maximum(jnp.max(jnp.abs(dx_pose)), pmax(jnp.max(jnp.abs(dx_pt))))
            < 1e-7
        )
        # Ceres-style function tolerance (1e-6 relative decrease), see
        # _lm_pass_ol
        done |= improved & (
            (cost_old[0, 0] - cost_new[0, 0])
            < 1e-6 * jnp.maximum(cost_old[0, 0], 1e-12)
        )
        return poses, points, lam, it + 1, done

    def cond(state):
        return (state[3] < iters) & (~state[4])

    poses, points, _, it, _ = jax.lax.while_loop(
        cond, body,
        (poses0, points0, jnp.asarray(1e-4, poses0.dtype), jnp.asarray(0), jnp.asarray(False)),
    )
    return poses, points, it


def _classify_ol(poses, points, prob: BAProblemOL, cam: Camera):
    e, pc, stereo = _residuals_ol(poses, points, prob, cam)
    e2 = jnp.sum(e[:2] ** 2, 0)
    chi2 = jnp.where(stereo, e2 + e[2] ** 2, e2) * prob.o_inv_sigma2
    gate = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
    return prob.o_valid & (chi2 <= gate) & (pc[2] > 0)


def _ba_iters(stop):
    if stop is None:
        return 5, 10
    stop_i = stop.astype(jnp.int32)
    return jnp.where(stop_i > 0, 0, 5), jnp.where(stop_i > 0, 0, 10)


def _ba_optimize(poses, points, prob, cam, wk, it1, it2, axis=None):
    """The two-pass LM optimization (optimizer_ceres.cpp:583-699): pass 1
    Huber 5 iters, chi2 reclassification, pass 2 inliers-only 10 iters.
    Runs shard-local when axis names a mesh axis (L sharded).

    Also returns the iteration counts each pass actually ran (the
    ftol/steptol early exits make these data-dependent) — the load
    diagnostic behind the per-event `ba_iters` record in SlamSystem."""
    lm_pass = _lm_pass_pallas if jax.default_backend() == "tpu" else _lm_pass_ol
    poses, points, n1 = lm_pass(
        poses, points, prob, cam, prob.o_valid, True, it1, wk, axis=axis
    )
    inl = _classify_ol(poses, points, prob, cam)
    poses, points, n2 = lm_pass(poses, points, prob, cam, inl, False, it2, wk, axis=axis)
    final_inl = _classify_ol(poses, points, prob, cam)
    return poses, points, final_inl, n1, n2


def _local_ba_impl(
    m: MapState,
    center_kf: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    inv_level_sigma2: jnp.ndarray | None = None,
    stop: jnp.ndarray | None = None,
):
    if stop is None:
        return _local_ba_run(m, center_kf, caps, cam, inv_level_sigma2)
    # the reference's interruptBA semantics: the stop flag is read at the
    # solver's ENTRY (optimizer_ceres.cpp:594 `if (stopFlag) return;`) and
    # the whole local BA — optimization, outlier erasure, write-back — is
    # skipped, leaving the map untouched
    zero = jnp.asarray(0, jnp.int32)
    return jax.lax.cond(
        stop,
        lambda mm: (mm, zero, zero),
        lambda mm: _local_ba_run(mm, center_kf, caps, cam, inv_level_sigma2),
        m,
    )


def _local_ba_run(m, center_kf, caps, cam, inv_level_sigma2):
    prob = build_problem_ol(m, center_kf, caps, inv_level_sigma2)
    poses = m.kf_pose[jnp.maximum(prob.kf_ids, 0)]
    points = m.pt_pos[jnp.maximum(prob.pt_ids, 0)]
    it1, it2 = _ba_iters(None)
    wk = min(W_KF, m.kf_valid.shape[0])
    poses, points, final_inl, n1, n2 = _ba_optimize(
        poses, points, prob, cam, wk, it1, it2)
    return _ba_write_back(m, prob, poses, points, final_inl), n1, n2


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def local_bundle_adjust(
    m: MapState,
    center_kf: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    inv_level_sigma2: jnp.ndarray | None = None,
    stop: jnp.ndarray | None = None,
) -> MapState:
    """Run windowed local BA around center_kf and write results into the map.

    stop: optional device bool — the reference's interruptBA analogue
    (localMapping.cpp:538-541): the flag is read at the solver's ENTRY
    (optimizer_ceres.cpp:594 `if (stopFlag) return;`) and a raised flag
    skips the ENTIRE local BA — no optimization, no outlier erasure, no
    write-back — exactly the reference's yield-to-the-new-keyframe
    behavior (round-5 revision; the old one-iteration-per-pass analogue
    both diverged from the reference and starved BA under load)."""
    return _local_ba_impl(m, center_kf, caps, cam, inv_level_sigma2, stop)[0]


@functools.partial(jax.jit, static_argnames=("caps",), donate_argnums=(0,))
def local_bundle_adjust_iters(
    m: MapState,
    center_kf: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    inv_level_sigma2: jnp.ndarray | None = None,
    stop: jnp.ndarray | None = None,
):
    """local_bundle_adjust variant that also returns (n_iter_pass1,
    n_iter_pass2) the LM passes actually ran — per-event load diagnostics
    threaded through background_chunk's packed rows."""
    return _local_ba_impl(m, center_kf, caps, cam, inv_level_sigma2, stop)


def _ba_write_back(m, prob, poses, points, final_inl):
    """Window poses + point positions into the map; erase outlier edges."""
    # ---- write back window poses + point positions -------------------------
    win_ok = (prob.kf_ids >= 0) & (~prob.kf_fixed)
    kf_rows = jnp.where(win_ok, prob.kf_ids, m.kf_valid.shape[0] - 1)
    new_poses = jnp.where(win_ok[:, None, None], lie.orthonormalize(poses), m.kf_pose[kf_rows])
    m = m.replace(kf_pose=m.kf_pose.at[kf_rows].set(new_poses))

    P = m.pt_valid.shape[0]
    pt_ok = prob.pt_ids >= 0
    pt_rows = jnp.where(pt_ok, prob.pt_ids, P - 1)
    new_pts = jnp.where(pt_ok[:, None], points, m.pt_pos[pt_rows])
    m = m.replace(pt_pos=m.pt_pos.at[pt_rows].set(new_pts))

    # ---- erase outlier observations (:757-789) ----------------------------
    # o_col maps each BA slot back to its pt_obs column, so no lookup needed
    bad = (prob.o_valid & ~final_inl).T                 # [L,O_BA]
    import os as _os
    if _os.environ.get("VO_DBG_NO_BA_ERASE"):  # diagnosis only: keep all edges
        bad = jnp.zeros_like(bad)
    K = m.kf_valid.shape[0]
    N = m.kf_mp.shape[1]
    O = m.pt_obs_kf.shape[1]
    kf_global = prob.kf_ids[jnp.maximum(prob.o_slot, 0)].T  # [L,O_BA]
    kp_t = prob.o_kp.T
    col_t = prob.o_col.T
    kf_w = jnp.where(bad, kf_global, K - 1)
    kp_w = jnp.where(bad, kp_t, N - 1)
    kf_mp = m.kf_mp.at[kf_w, kp_w].set(jnp.where(bad, -1, m.kf_mp[kf_w, kp_w]))
    m = m.replace(kf_mp=kf_mp)

    pid = jnp.maximum(prob.pt_ids, 0)
    prow = jnp.where(bad, pid[:, None], P - 1)
    pcol = jnp.where(bad, col_t, O - 1)
    m = m.replace(
        pt_obs_kf=m.pt_obs_kf.at[prow, pcol].set(
            jnp.where(bad, -1, m.pt_obs_kf[prow, pcol])
        ),
        pt_obs_kp=m.pt_obs_kp.at[prow, pcol].set(
            jnp.where(bad, -1, m.pt_obs_kp[prow, pcol])
        ),
        pt_obs_cnt=m.pt_obs_cnt.at[pid].add(
            -jnp.sum(bad.astype(jnp.int32), axis=1)
        ),
    )
    # obs<=2 -> point erased, only for touched points (mappoint.cpp:353)
    touched = jnp.zeros((P,), bool).at[pid].max(jnp.any(bad, axis=1))
    low = touched & (m.pt_obs_cnt <= 2)
    m = m.replace(pt_valid=m.pt_valid & ~low)
    return m


def local_bundle_adjust_mesh(
    m: MapState,
    center_kf: jnp.ndarray,
    caps: MapCaps,
    cam: Camera,
    mesh,
    inv_level_sigma2: jnp.ndarray | None = None,
    stop: jnp.ndarray | None = None,
) -> MapState:
    """The PRODUCTION local BA on a device mesh: identical semantics to
    local_bundle_adjust (same problem build, Huber two-pass LM, chi2
    outlier erasure, obs<=2 invalidation) with the LM iterations sharded
    over the mesh.

    Sharding layout: the point axis L of the [O,L] observation layout is
    split across the mesh's first axis. A point's full observer list lives
    in its own L column, so every point-side term (Hll, bl, Hll^-1, dx_pt)
    is computed entirely on the shard that owns the point — no
    communication. Only the pose-side reductions over L (Hpp [W,6,6], bp
    [W,6], the Schur off-diagonal [W,6,W,6], rhs, and the scalar costs)
    psum over ICI per LM iteration; the (W*6)^2 Cholesky solve is
    replicated. Per-chip work is O(L/n_devices), communication O(W^2) —
    independent of the observation count, which is what lets the window
    and point caps grow with chip count.

    Problem build and map write-back run replicated (they are cheap,
    gather/scatter-bound passes over the full map). Requires L divisible
    by the mesh size. Reference scope: optimizer_ceres.cpp:446-808."""
    try:  # jax >= 0.7
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if stop is not None:
        # entry-check skip, same reference semantics as local_bundle_adjust
        return jax.lax.cond(
            stop,
            lambda mm: mm,
            lambda mm: local_bundle_adjust_mesh(
                mm, center_kf, caps, cam, mesh, inv_level_sigma2, None),
            m,
        )

    ax = mesh.axis_names[0]
    prob = build_problem_ol(m, center_kf, caps, inv_level_sigma2)
    poses = m.kf_pose[jnp.maximum(prob.kf_ids, 0)]
    points = m.pt_pos[jnp.maximum(prob.pt_ids, 0)]
    it1, it2 = _ba_iters(None)
    wk = min(W_KF, m.kf_valid.shape[0])
    L = prob.pt_ids.shape[0]
    n_dev = mesh.devices.size
    assert L % n_dev == 0, (L, n_dev)

    prob_spec = BAProblemOL(
        kf_ids=P(), kf_fixed=P(), pt_ids=P(ax),
        o_slot=P(None, ax), o_kp=P(None, ax), o_col=P(None, ax),
        o_uv=P(None, None, ax), o_ur=P(None, ax),
        o_inv_sigma2=P(None, ax), o_valid=P(None, ax),
        oh_all=P(None, None, ax), oh_win=P(None, None, ax),
    )

    def optimize(poses, points, prob, it1, it2):
        return _ba_optimize(poses, points, prob, cam, wk, it1, it2, axis=ax)

    poses, points, final_inl, _, _ = jax.jit(
        shard_map(
            optimize,
            mesh=mesh,
            in_specs=(P(), P(ax), prob_spec, P(), P()),
            out_specs=(P(), P(ax), P(None, ax), P(), P()),
        )
    )(poses, points, prob, it1, it2)
    return _ba_write_back(m, prob, poses, points, final_inl)
