"""Lie-group operations (SO3 / SE3 / Sim3) in JAX.

Replaces the reference's Sophus dependency (reference: common_include.h:29-32)
and its hand-written se(3) exp-action used inside the Ceres costs
(reference: optimizer_ceres.h:29-95, optimizer_ceres.cpp:44-60).

Conventions
-----------
- Rotations are 3x3 matrices, poses are 4x4 homogeneous matrices (f32/f64).
- Twists xi ∈ R^6 are ordered (rho, phi) = (translation part, rotation part),
  i.e. exp(xi) = [[exp(phi^), V(phi) rho], [0, 1]].
- Sim3 elements are (s, R, t) triples; 7-vectors are (rho, phi, sigma) with
  scale s = exp(sigma).
- All ops are pure, shape-polymorphic over leading batch dims where noted,
  and Taylor-safe near the identity so they are jit/grad friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat. W: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3), f32-stable.

    theta2 is theta^2 (avoids a sqrt gradient singularity at 0). B uses the
    half-angle identity 2 sin^2(t/2)/t^2 (no cancellation); A and C use Taylor
    expansions below t=0.5 where the direct f32 forms lose digits.
    """
    small = theta2 < 0.25  # theta < 0.5
    # double-where: unused branches must stay finite under autodiff (jacfwd
    # evaluates both; a 1/theta blowup there poisons gradients with NaN/inf)
    t2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2_safe)
    t4 = theta2 * theta2
    a = jnp.where(small, 1.0 - theta2 / 6.0 + t4 / 120.0, jnp.sin(theta) / theta)
    tiny = theta2 < _EPS
    t2_safe2 = jnp.where(tiny, 1.0, theta2)
    half_sin = jnp.sin(0.5 * jnp.sqrt(t2_safe2))
    b = jnp.where(
        tiny,
        0.5 - theta2 / 24.0,
        2.0 * half_sin * half_sin / t2_safe2,
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + t4 / 5040.0,
        (theta - jnp.sin(theta)) / (t2_safe * theta),
    )
    return a, b, c


def so3_exp(phi):
    """Rodrigues formula. phi: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Log map of SO(3). R: (..., 3, 3) -> (..., 3). Safe up to ~pi.

    cos is clipped strictly inside (-1, 1) so arccos stays differentiable;
    near-identity values take the Taylor branch where theta's exact value is
    irrelevant.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    # Near 0: phi ~ vee(R - R^T)/2 * (1 + theta^2/6). Near pi use axis from
    # diagonal of (R + I)/2 = aa^T * (1+cos)/... ; handle via symmetric part.
    skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    v = vee(skew)  # = sin(theta) * axis
    sin_t = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3
    sin_safe = jnp.where(jnp.abs(sin_t) < 1e-7, 1.0, sin_t)
    scale = jnp.where(small, 1.0 + theta**2 / 6.0, theta / sin_safe)
    phi_generic = v * scale[..., None]
    # near pi: R ~ I + 2 aa^T - ... -> axis^2 from diagonal
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2))  # symmetric part
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / jnp.where(jnp.abs(1.0 - cos_t) < _EPS, 1.0, (1.0 - cos_t))[..., None], 0.0, 1.0)
    axis = jnp.sqrt(axis2)
    # fix signs using the skew part (v = sin * axis; sin>=0 for theta in [0,pi])
    sign_src = jnp.where(jnp.abs(v) > 1e-12, jnp.sign(v), 1.0)
    # for exact pi, use off-diagonal signs: pick largest axis component as +
    axis = axis * sign_src
    phi_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], phi_pi, phi_generic)


def _left_jacobian(phi):
    """SO(3) left Jacobian V(phi) used by the SE3 exp translation part."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    _, b, c = _sinc_coeffs(theta2)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 0.25  # theta < 0.5: Taylor beats the f32 cancellation
    t2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2_safe)
    half = 0.5 * theta
    t4 = theta2 * theta2
    safe_sin = jnp.where(jnp.abs(jnp.sin(half)) < 1e-7, 1.0, jnp.sin(half))
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0 + t4 / 30240.0,
        (1.0 - half * jnp.cos(half) / safe_sin) / t2_safe,
    )
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def se3_exp(xi):
    """xi: (..., 6) twist (rho, phi) -> (..., 4, 4) homogeneous transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(phi), rho)
    return rt_to_mat(R, t)


def se3_log(T):
    """T: (..., 4, 4) -> (..., 6) twist (rho, phi)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def rt_to_mat(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = R.shape[:-2]
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T, pts):
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def transform_point(T, p):
    """Apply (..., 4, 4) to a single point (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def orthonormalize(T):
    """Project the rotation block of (..., 4, 4) poses back onto SO(3).

    Long pose chains in f32 drift off the manifold, and transpose-based
    inverses then amplify the error exponentially (observed x2.4/frame in
    tracking). A quaternion round-trip is a cheap, jit-friendly projection;
    call once per solve/compose cycle.
    """
    R = quat_to_mat(mat_to_quat(T[..., :3, :3]))
    return rt_to_mat(R, T[..., :3, 3])


# ---------------------------------------------------------------------------
# Quaternions (TUM trajectory format uses qx qy qz qw)
# ---------------------------------------------------------------------------


def mat_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) as (qx,qy,qz,qw).

    Shepperd's method, branch-free via where.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick the numerically best
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    d0 = 4.0 * jnp.maximum(qw0, _EPS)
    c0 = jnp.stack([(m21 - m12) / d0, (m02 - m20) / d0, (m10 - m01) / d0, qw0], -1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    d1 = 4.0 * jnp.maximum(qx1, _EPS)
    c1 = jnp.stack([qx1, (m01 + m10) / d1, (m02 + m20) / d1, (m21 - m12) / d1], -1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    d2 = 4.0 * jnp.maximum(qy2, _EPS)
    c2 = jnp.stack([(m01 + m10) / d2, qy2, (m12 + m21) / d2, (m02 - m20) / d2], -1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    d3 = 4.0 * jnp.maximum(qz3, _EPS)
    c3 = jnp.stack([(m02 + m20) / d3, (m12 + m21) / d3, qz3, (m10 - m01) / d3], -1)

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = jnp.where(use0, c0, jnp.where(use1, c1, jnp.where(use2, c2, c3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat(q):
    """(qx,qy,qz,qw) (..., 4) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Sim(3) — used by the loop-closing Sim3 solvers and the essential graph
# (reference: sim3Solver.cpp, optimizer_ceres.h:211-311)
# ---------------------------------------------------------------------------


def sim3_apply(s, R, t, pts):
    """Apply similarity (s, R, t) to points (..., N, 3)."""
    return s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def sim3_inverse(s, R, t):
    s_inv = 1.0 / s
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", R_inv, t)
    return s_inv, R_inv, t_inv


def sim3_compose(s1, R1, t1, s2, R2, t2):
    """(s1,R1,t1) ∘ (s2,R2,t2): first apply 2, then 1."""
    s = s1 * s2
    R = R1 @ R2
    t = s1[..., None] * jnp.einsum("...ij,...j->...i", R1, t2) + t1
    return s, R, t


def sim3_exp(xi7):
    """7-vector (rho, phi, sigma) -> (s, R, t)."""
    rho, phi, sigma = xi7[..., :3], xi7[..., 3:6], xi7[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    # W matrix for sim3 translation (Strasdat thesis); Taylor/AD-safe blend
    theta2 = jnp.sum(phi * phi, axis=-1)
    small_guard = theta2 < 1e-10
    theta = jnp.sqrt(jnp.where(small_guard, 1.0, theta2))
    theta = jnp.where(small_guard, 1e-5, theta)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi7.dtype), W.shape)
    sig = sigma
    small_sig = jnp.abs(sig) < 1e-5
    small_th = theta2 < 1e-10
    A_ = jnp.where(small_sig, 1.0 + sig / 2.0, (s - 1.0) / jnp.where(small_sig, 1.0, sig))

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    sig2 = sig * sig
    denom = sig2 + theta2
    denom = jnp.where(denom < _EPS, 1.0, denom)
    t2_safe = jnp.where(small_th, 1.0, theta2)
    a = s * sin_t
    b = s * cos_t
    c_coef = jnp.where(
        small_th,
        0.5,
        (a * sig + (1.0 - b) * theta) / (denom * theta),
    )
    d_coef = jnp.where(
        small_th,
        1.0 / 6.0,
        (A_ - (b - 1.0) * sig / denom - a * theta / denom) / t2_safe,
    )
    Wmat = A_[..., None, None] * eye + c_coef[..., None, None] * W + d_coef[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", Wmat, rho)
    return s, R, t


def sim3_log(s, R, t):
    """(s, R, t) -> 7-vector (rho, phi, sigma). Inverse of sim3_exp."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    small_guard = theta2 < 1e-10
    theta = jnp.sqrt(jnp.where(small_guard, 1.0, theta2))
    theta = jnp.where(small_guard, 1e-5, theta)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), W.shape)
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < 1e-10
    A_ = jnp.where(small_sig, 1.0 + sigma / 2.0, (s - 1.0) / jnp.where(small_sig, 1.0, sigma))
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    sig2 = sigma * sigma
    denom = sig2 + theta2
    denom = jnp.where(denom < _EPS, 1.0, denom)
    a = s * sin_t
    b = s * cos_t
    t2_safe = jnp.where(small_th, 1.0, theta2)
    c_coef = jnp.where(small_th, 0.5, (a * sigma + (1.0 - b) * theta) / (denom * theta))
    d_coef = jnp.where(small_th, 1.0 / 6.0, (A_ - (b - 1.0) * sigma / denom - a * theta / denom) / t2_safe)
    Wmat = A_[..., None, None] * eye + c_coef[..., None, None] * W + d_coef[..., None, None] * W2
    rho = jnp.linalg.solve(Wmat, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
