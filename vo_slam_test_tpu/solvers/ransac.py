"""Batched RANSAC absolute-pose estimation for relocalization.

The reference calls cv::solvePnPRansac (EPnP, 100 iterations, 8 px
reprojection gate, 0.99 confidence; visualOdometry.cpp:806-826) on 2D-3D
matches. The RGB-D sensor gives metric depth for most keypoints, so the
TPU-native design solves the richer 3D-3D problem instead: every RANSAC
hypothesis is a closed-form Horn alignment of a 3-point sample, and ALL
hypotheses evaluate in parallel as one batch — no iteration loop at all.
Inliers are still scored by the reference's 8 px reprojection gate so the
accept thresholds keep their meaning.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import lie

N_HYP = 128          # reference uses 100 sequential iterations
REPROJ_GATE = 8.0    # px (visualOdometry.cpp:806)


def horn_align(p_src: jnp.ndarray, p_dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted closed-form SE3 with R from SVD of the cross-covariance.

    p_src/p_dst: [..., n, 3]; w: [..., n] weights. Returns [..., 4, 4] T with
    p_dst ~= R p_src + t.
    """
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    wn = w / wsum
    c_src = jnp.sum(p_src * wn[..., None], axis=-2)
    c_dst = jnp.sum(p_dst * wn[..., None], axis=-2)
    src_c = p_src - c_src[..., None, :]
    dst_c = p_dst - c_dst[..., None, :]
    H = jnp.einsum("...ni,...nj,...n->...ij", dst_c, src_c, wn)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.broadcast_to(jnp.eye(3), H.shape).copy()
    D = D.at[..., 2, 2].set(det)
    R = jnp.einsum("...ij,...jk,...kl->...il", U, D, Vt)
    t = c_dst - jnp.einsum("...ij,...j->...i", R, c_src)
    return lie.rt_to_mat(R, t)


@functools.partial(jax.jit, static_argnames=())
def ransac_pose_3d3d(
    p_world: jnp.ndarray,    # [N,3] map points
    p_cam: jnp.ndarray,      # [N,3] camera-frame points (from RGB-D depth)
    uv: jnp.ndarray,         # [N,2] undistorted pixels (for the inlier gate)
    valid3d: jnp.ndarray,    # [N] has depth (can be sampled)
    valid: jnp.ndarray,      # [N] participates in scoring
    fx, fy, cx, cy,
    seed: jnp.ndarray,       # i32 scalar (deterministic per frame)
):
    """Returns (T_c_w [4,4], inlier_mask [N], n_inliers)."""
    N = p_world.shape[0]
    key = jax.random.PRNGKey(seed.astype(jnp.uint32))
    # sample triples among valid3d points: one gumbel vector per hypothesis,
    # top-3 guarantees DISTINCT sample points (independent argmaxes could
    # pick the same point twice, wasting the hypothesis on a degenerate
    # alignment exactly when few candidates exist)
    logits = jnp.where(valid3d, 0.0, -1e9)
    g = jax.random.gumbel(key, (N_HYP, N)) + logits[None, :]
    _, picks = jax.lax.top_k(g, 3)                       # [B,3] distinct

    src = p_world[picks]                                  # [B,3,3]
    dst = p_cam[picks]
    w3 = jnp.ones((N_HYP, 3))
    T = horn_align(src, dst, w3)                          # [B,4,4] world->cam

    # score all hypotheses against all observations
    pc = jnp.einsum("bij,nj->bni", T[:, :3, :3], p_world) + T[:, None, :3, 3]
    z = pc[..., 2]
    good_z = z > 1e-6
    invz = 1.0 / jnp.where(good_z, z, 1.0)
    u = fx * pc[..., 0] * invz + cx
    v = fy * pc[..., 1] * invz + cy
    err2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    inl = good_z & (err2 < REPROJ_GATE**2) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)       # [B]

    best = jnp.argmax(counts)
    T_best = T[best]
    inl_best = inl[best]
    # refine with a weighted Horn over all 3D inliers
    w_ref = (inl_best & valid3d).astype(jnp.float32)
    T_ref = horn_align(p_world[None], p_cam[None], w_ref[None])[0]
    # keep refinement only if it does not lose inliers
    pc2 = p_world @ T_ref[:3, :3].T + T_ref[:3, 3]
    z2 = pc2[:, 2]
    gz = z2 > 1e-6
    invz2 = 1.0 / jnp.where(gz, z2, 1.0)
    err2b = (fx * pc2[:, 0] * invz2 + cx - uv[:, 0]) ** 2 + (
        fy * pc2[:, 1] * invz2 + cy - uv[:, 1]
    ) ** 2
    inl2 = gz & (err2b < REPROJ_GATE**2) & valid
    n2 = jnp.sum(inl2.astype(jnp.int32))
    use_ref = n2 >= counts[best]
    T_out = jnp.where(use_ref, T_ref, T_best)
    inl_out = jnp.where(use_ref, inl2, inl_best)
    return lie.orthonormalize(T_out), inl_out, jnp.maximum(n2, counts[best])
