"""Batched EPnP absolute-pose from 2D-3D matches (one jit, no loops).

The reference relocalizes with cv::solvePnPRansac's EPnP backend
(visualOdometry.cpp:806-826). The RGB-D path in solvers/ransac.py solves
the richer 3D-3D problem when keypoint depth exists; this module covers
the depth-poor case for full parity (and any future mono/stereo use).

EPnP (Lepetit et al.) per hypothesis, all hypotheses batched:
- 4 control points (centroid + principal axes of the sample);
- barycentric coordinates per world point;
- M [2n,12] projection constraints; the 4 eigenvectors of M^T M with the
  smallest eigenvalues span the camera-frame control-point solutions;
- betas from the 6 pairwise control-point distance constraints: the
  beta_approx_1/2/3 cases of the paper, each refined by a small
  Gauss-Newton on the distance residuals, best case kept;
- R, t recovered by Horn alignment of the world vs camera control points
  (solvers/ransac.py horn_align).

Everything is fixed-shape: eigendecomposition of the symmetric 12x12 via
jnp.linalg.eigh, batch dimensions vmapped by construction. The RANSAC
wrapper mirrors ransac.ransac_pose_3d3d: 128 parallel minimal samples of
4 matches (the reference's sequential 100 iterations), 8 px gate, then one
all-inlier EPnP refinement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..camera import Camera
from .ransac import N_HYP, REPROJ_GATE, horn_align

_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _control_points(Xw: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[..., n, 3] world points (weights w) -> [..., 4, 3] control points:
    centroid + principal directions scaled by the std along each."""
    wn = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    c0 = jnp.sum(Xw * wn[..., None], -2)
    d = (Xw - c0[..., None, :]) * jnp.sqrt(wn)[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", d, d)
    eval_, evec = jnp.linalg.eigh(cov)  # ascending
    s = jnp.sqrt(jnp.maximum(eval_, 1e-12))
    axes = evec * s[..., None, :]       # columns scaled
    # degenerate (planar/linear) samples keep tiny but nonzero axes so the
    # barycentric inverse stays finite; such hypotheses lose in scoring
    return jnp.concatenate(
        [c0[..., None, :], jnp.swapaxes(axes, -1, -2) + c0[..., None, :]], axis=-2
    )


def _barycentric(Xw: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """alphas [..., n, 4] with X = sum_j alpha_j C_j, sum alpha = 1."""
    B = jnp.stack([C[..., 1, :] - C[..., 0, :],
                   C[..., 2, :] - C[..., 0, :],
                   C[..., 3, :] - C[..., 0, :]], axis=-1)  # [...,3,3]
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3))
    rel = Xw - C[..., None, 0, :]
    a123 = jnp.einsum("...ij,...nj->...ni", Binv, rel)
    a0 = 1.0 - jnp.sum(a123, -1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)


def _dist2(C: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 3] -> [..., 6] squared pairwise distances."""
    return jnp.stack(
        [jnp.sum((C[..., i, :] - C[..., j, :]) ** 2, -1) for i, j in _PAIRS], -1
    )


def _rho_v(V: jnp.ndarray) -> jnp.ndarray:
    """V [..., 4, 4, 3] (case, control point, xyz) -> pairwise difference
    vectors [..., 4, 6, 3] per null-space vector."""
    return jnp.stack(
        [V[..., :, i, :] - V[..., :, j, :] for i, j in _PAIRS], axis=-2
    )


def _betas_cases(V: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Initial betas for the paper's approx cases; V [..., 4, 4, 3] null
    vectors (index 0 = smallest eigenvalue), rho [..., 6] squared control
    distances. Returns [..., 3, 4] candidate betas (3 cases)."""
    dv = _rho_v(V)                      # [..., 4, 6, 3]
    # L entries: dot products between case vectors over the 6 pairs
    def dot(a, b):
        return jnp.sum(dv[..., a, :, :] * dv[..., b, :, :], -1)  # [...,6]

    # case 1: x = b0 v0
    b1 = jnp.sum(dot(0, 0) * rho, -1) / jnp.maximum(jnp.sum(dot(0, 0) ** 2, -1), 1e-12)
    beta1 = jnp.stack([jnp.sqrt(jnp.maximum(b1, 0.0)),
                       jnp.zeros_like(b1), jnp.zeros_like(b1), jnp.zeros_like(b1)], -1)

    # case 2: x = b0 v0 + b1 v1 ; unknowns (b0^2, b0 b1, b1^2)
    L2 = jnp.stack([dot(0, 0), 2 * dot(0, 1), dot(1, 1)], -1)  # [...,6,3]
    sol2 = jnp.linalg.solve(
        jnp.einsum("...ni,...nj->...ij", L2, L2) + 1e-9 * jnp.eye(3),
        jnp.einsum("...ni,...n->...i", L2, rho)[..., None],
    )[..., 0]
    b0_2 = jnp.sqrt(jnp.maximum(sol2[..., 0], 0.0))
    b1_2 = jnp.sqrt(jnp.maximum(sol2[..., 2], 0.0)) * jnp.sign(sol2[..., 1]) * jnp.sign(
        jnp.where(sol2[..., 0] == 0, 1.0, sol2[..., 0])
    )
    beta2 = jnp.stack([b0_2, b1_2, jnp.zeros_like(b0_2), jnp.zeros_like(b0_2)], -1)

    # case 3: x = b0 v0 + b1 v1 + b2 v2 ; unknowns (b00, b01, b11, b02, b12)
    L3 = jnp.stack([dot(0, 0), 2 * dot(0, 1), dot(1, 1), 2 * dot(0, 2), 2 * dot(1, 2)], -1)
    sol3 = jnp.linalg.solve(
        jnp.einsum("...ni,...nj->...ij", L3, L3) + 1e-9 * jnp.eye(5),
        jnp.einsum("...ni,...n->...i", L3, rho)[..., None],
    )[..., 0]
    b0_3 = jnp.sqrt(jnp.maximum(sol3[..., 0], 0.0))
    b1_3 = jnp.sqrt(jnp.maximum(sol3[..., 2], 0.0)) * jnp.sign(sol3[..., 1]) * jnp.sign(
        jnp.where(sol3[..., 0] == 0, 1.0, sol3[..., 0])
    )
    b2_3 = jnp.where(
        b0_3 > 1e-12, sol3[..., 3] / (2.0 * jnp.maximum(b0_3, 1e-12)), 0.0
    )
    beta3 = jnp.stack([b0_3, b1_3, b2_3, jnp.zeros_like(b0_3)], -1)
    return jnp.stack([beta1, beta2, beta3], axis=-2)  # [...,3,4]


def _gauss_newton_betas(V: jnp.ndarray, rho: jnp.ndarray, betas: jnp.ndarray,
                        iters: int = 6) -> jnp.ndarray:
    """Refine betas on the 6 distance residuals (paper's gauss_newton)."""
    dv = _rho_v(V)  # [..., 4, 6, 3]

    def step(b, _):
        # cc[pair] = sum_k b_k dv[k, pair]; residual = |cc|^2 - rho
        cc = jnp.einsum("...k,...kpx->...px", b, dv)          # [...,6,3]
        res = jnp.sum(cc * cc, -1) - rho                       # [...,6]
        J = 2.0 * jnp.einsum("...px,...kpx->...pk", cc, dv)    # [...,6,4]
        JtJ = jnp.einsum("...pi,...pj->...ij", J, J) + 1e-9 * jnp.eye(4)
        g = jnp.einsum("...pi,...p->...i", J, res)
        return b - jnp.linalg.solve(JtJ, g[..., None])[..., 0], None

    betas, _ = jax.lax.scan(step, betas, None, length=iters)
    return betas


def epnp_pose(
    Xw: jnp.ndarray,      # [..., n, 3] world points
    uv: jnp.ndarray,      # [..., n, 2] pixel observations (undistorted)
    w: jnp.ndarray,       # [..., n] weights/mask
    cam: Camera,
) -> jnp.ndarray:
    """EPnP pose [..., 4, 4] (T_c_w) from weighted 2D-3D matches."""
    n = Xw.shape[-2]
    C = _control_points(Xw, w)
    alpha = _barycentric(Xw, C)          # [..., n, 4]

    fu, fv, uc, vc = cam.fx, cam.fy, cam.cx, cam.cy
    aw = alpha * w[..., None]
    # M rows: [a_j fu, 0, a_j (uc-u)] and [0, a_j fv, a_j (vc-v)] per j
    zero = jnp.zeros_like(aw)
    row_u = jnp.concatenate(
        [jnp.stack([aw * fu, zero, aw * (uc - uv[..., 0:1])], -1)], -1
    )  # [..., n, 4, 3]
    row_v = jnp.stack([zero, aw * fv, aw * (vc - uv[..., 1:2])], -1)
    M = jnp.concatenate(
        [row_u.reshape(*Xw.shape[:-2], n, 12), row_v.reshape(*Xw.shape[:-2], n, 12)],
        axis=-2,
    )  # [..., 2n, 12]
    MtM = jnp.einsum("...ni,...nj->...ij", M, M)
    _, evec = jnp.linalg.eigh(MtM)                 # ascending eigenvalues
    V = jnp.swapaxes(evec[..., :, :4], -1, -2).reshape(*MtM.shape[:-2], 4, 4, 3)

    rho = _dist2(C)
    betas0 = _betas_cases(V, rho)                  # [..., 3, 4]
    V3 = jnp.broadcast_to(V[..., None, :, :, :], betas0.shape[:-1] + V.shape[-3:])
    betas = _gauss_newton_betas(V3, jnp.broadcast_to(rho[..., None, :], betas0.shape[:-1] + (6,)), betas0)

    # camera-frame control points per case; fix the sign so depths are +
    Cc = jnp.einsum("...ck,...ckpx->...cpx", betas,
                    jnp.broadcast_to(V[..., None, :, :, :],
                                     betas.shape[:-1] + V.shape[-3:]))  # [...,3,4,3]
    pc = jnp.einsum("...nj,...cjx->...cnx", alpha, Cc)      # [...,3,n,3]
    neg = jnp.sum(jnp.where(w[..., None, :] > 0, jnp.sign(pc[..., 2]), 0.0), -1) < 0
    Cc = jnp.where(neg[..., None, None], -Cc, Cc)
    pc = jnp.where(neg[..., None, None], -pc, pc)

    # per case: Horn(world ctrl -> cam ctrl), score by reprojection
    Cw = jnp.broadcast_to(C[..., None, :, :], Cc.shape)
    T = horn_align(Cw, Cc, jnp.ones(Cc.shape[:-1]))          # [...,3,4,4]
    pcs = jnp.einsum("...cij,...nj->...cni", T[..., :3, :3], Xw) + T[..., None, :3, 3]
    z = jnp.where(jnp.abs(pcs[..., 2]) < 1e-9, 1e-9, pcs[..., 2])
    u = fu * pcs[..., 0] / z + uc
    v = fv * pcs[..., 1] / z + vc
    err = ((u - uv[..., None, :, 0]) ** 2 + (v - uv[..., None, :, 1]) ** 2)
    score = jnp.sum(jnp.where(w[..., None, :] > 0, err, 0.0), -1)
    best = jnp.argmin(score, -1)
    return jnp.take_along_axis(
        T, best[..., None, None, None], axis=-3
    )[..., 0, :, :]


@functools.partial(jax.jit, static_argnames=())
def ransac_pnp(
    key: jnp.ndarray,
    Xw: jnp.ndarray,      # [N, 3] world points
    uv: jnp.ndarray,      # [N, 2] pixel observations
    valid: jnp.ndarray,   # [N] bool
    inv_sigma2: jnp.ndarray,  # [N] per-octave weights for the gate
    cam: Camera,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(T_c_w [4,4], inlier_mask [N], n_inliers i32): the cv::solvePnPRansac
    role — 128 parallel 4-point EPnP hypotheses, 8 px gate, one all-inlier
    EPnP refinement."""
    N = Xw.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    # one gumbel vector per hypothesis; top-4 guarantees distinct samples
    g = jax.random.gumbel(key, (N_HYP, N)) + logits[None, :]
    sample = jax.lax.top_k(g, 4)[1].astype(jnp.int32)            # [H,4]
    Xs = Xw[sample]                                              # [H,4,3]
    us = uv[sample]
    T = epnp_pose(Xs, us, jnp.ones((N_HYP, 4)), cam)             # [H,4,4]

    pc = jnp.einsum("hij,nj->hni", T[:, :3, :3], Xw) + T[:, None, :3, 3]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    e2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    inl = valid[None, :] & (pc[..., 2] > 0) & (
        e2 * inv_sigma2[None, :] < REPROJ_GATE**2
    )
    counts = jnp.sum(inl.astype(jnp.int32), -1)
    hbest = jnp.argmax(counts)

    # all-inlier refinement (one EPnP over the winning consensus set)
    w_ref = inl[hbest].astype(Xw.dtype)
    T_ref = epnp_pose(Xw, uv, w_ref, cam)
    pc = Xw @ T_ref[:3, :3].T + T_ref[:3, 3]
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    u = cam.fx * pc[:, 0] / z + cam.cx
    v = cam.fy * pc[:, 1] / z + cam.cy
    e2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    inl_ref = valid & (pc[:, 2] > 0) & (e2 * inv_sigma2 < REPROJ_GATE**2)
    n_ref = jnp.sum(inl_ref.astype(jnp.int32))
    better = n_ref >= counts[hbest]
    T_out = jnp.where(better, T_ref, T[hbest])
    inl_out = jnp.where(better, inl_ref, inl[hbest])
    return T_out, inl_out, jnp.maximum(n_ref, counts[hbest])
