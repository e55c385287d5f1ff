"""Essential-graph Sim3 pose-graph optimization (one jit).

Re-designs Optimizer::solvePoseGraphLoop (reference:
optimizer_ceres.cpp:1036-1305): Sim3 vertex per keyframe, edges from (a) the
new loop connections, (b) spanning-tree parents, (c) historical loop edges,
(d) strong covisibles (weight >= 100, :1087,1105,1200-1236); 7-dim residual
log_sim3(S_ij * S_j * S_i^-1) per Strasdat (optimizer_ceres.h:269-311); the
loop-match keyframe is held fixed (:1239-1241).

TPU form: the graph is dense over the keyframe capacity — edge masks
[K,K], all residuals/Jacobians batched (forward-mode autodiff over the two
7-dof tangents of each edge), and the normal equations solved as ONE dense
(K*7)^2 system; at K<=256 that is a 1792^3 Cholesky, which the MXU eats.
Scale is frozen for RGB-D (the 7th tangent dimension is zeroed).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import lie


def _sim3_inv(s, R, t):
    return lie.sim3_inverse(s, R, t)


def _sim3_mul(a, b):
    return lie.sim3_compose(*a, *b)


def _edge_residual(si, Ri, ti, sj, Rj, tj, s_m, R_m, t_m):
    """log_sim3( S_meas_ij * S_j * S_i^-1 ) -> [7]."""
    inv_i = _sim3_inv(si, Ri, ti)
    rel = _sim3_mul((sj, Rj, tj), inv_i)          # S_j * S_i^-1
    err = _sim3_mul((s_m, R_m, t_m), rel)         # meas_ij * rel  (~identity)
    return lie.sim3_log(err[0], err[1], err[2])


@functools.partial(jax.jit, static_argnames=("fix_scale", "iters", "max_edges"))
def solve_pose_graph(
    kf_s: jnp.ndarray,       # [K] initial scales (1 for RGB-D)
    kf_R: jnp.ndarray,       # [K,3,3] T_c_w rotations
    kf_t: jnp.ndarray,       # [K,3]
    kf_valid: jnp.ndarray,   # [K]
    edge_mask: jnp.ndarray,  # [K,K] bool, undirected (upper triangle used)
    meas_s: jnp.ndarray,     # [K,K] measured relative scale  S_ij = S_i S_j^-1
    meas_R: jnp.ndarray,     # [K,K,3,3]
    meas_t: jnp.ndarray,     # [K,K,3]
    fixed_kf: jnp.ndarray,   # i32: held fixed
    fix_scale: bool = True,
    iters: int = 20,
    max_edges: int = 4096,
):
    """Returns (s, R, t) optimized per keyframe."""
    K = kf_s.shape[0]
    tri = jnp.triu(jnp.ones((K, K), bool), k=1)
    emask = edge_mask & tri & kf_valid[:, None] & kf_valid[None, :]
    flat = emask.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    slot = jnp.where(flat & (pos < max_edges), pos, max_edges)
    lin = (
        jnp.full((max_edges + 1,), -1, jnp.int32)
        .at[slot]
        .set(jnp.arange(K * K, dtype=jnp.int32))[:max_edges]
    )
    e_i = jnp.where(lin >= 0, lin // K, 0)
    e_j = jnp.where(lin >= 0, lin % K, 0)
    e_ok = lin >= 0

    m_s = meas_s[e_i, e_j]
    m_R = meas_R[e_i, e_j]
    m_t = meas_t[e_i, e_j]

    n_p = 7

    def vertex_apply(s, R, t, xi):
        ds, dR, dt = lie.sim3_exp(xi)
        return _sim3_mul((ds, dR, dt), (s, R, t))

    def residual_fn(xi_i, xi_j, si, Ri, ti, sj, Rj, tj, ms, mR, mt):
        si2, Ri2, ti2 = vertex_apply(si, Ri, ti, xi_i)
        sj2, Rj2, tj2 = vertex_apply(sj, Rj, tj, xi_j)
        return _edge_residual(si2, Ri2, ti2, sj2, Rj2, tj2, ms, mR, mt)

    def lm_body(state):
        s, R, t, lam, it, done = state
        si, Ri, ti = s[e_i], R[e_i], t[e_i]
        sj, Rj, tj = s[e_j], R[e_j], t[e_j]
        zero = jnp.zeros((n_p,))

        def per_edge(si_, Ri_, ti_, sj_, Rj_, tj_, ms_, mR_, mt_):
            r = residual_fn(zero, zero, si_, Ri_, ti_, sj_, Rj_, tj_, ms_, mR_, mt_)
            Ji = jax.jacfwd(
                lambda x: residual_fn(x, zero, si_, Ri_, ti_, sj_, Rj_, tj_, ms_, mR_, mt_)
            )(zero)
            Jj = jax.jacfwd(
                lambda x: residual_fn(zero, x, si_, Ri_, ti_, sj_, Rj_, tj_, ms_, mR_, mt_)
            )(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(si, Ri, ti, sj, Rj, tj, m_s, m_R, m_t)
        if fix_scale:
            # freeze the scale tangent
            sel = jnp.ones((n_p,)).at[6].set(0.0)
            Ji = Ji * sel[None, None, :]
            Jj = Jj * sel[None, None, :]

        w = e_ok.astype(r.dtype)
        # assemble dense H [K,7,K,7] and g [K,7]
        Hii = jnp.einsum("eri,erj,e->eij", Ji, Ji, w)
        Hjj = jnp.einsum("eri,erj,e->eij", Jj, Jj, w)
        Hij = jnp.einsum("eri,erj,e->eij", Ji, Jj, w)
        gi = jnp.einsum("eri,er,e->ei", Ji, r, w)
        gj = jnp.einsum("eri,er,e->ei", Jj, r, w)

        H = jnp.zeros((K, n_p, K, n_p))
        H = H.at[e_i, :, e_i, :].add(Hii)
        H = H.at[e_j, :, e_j, :].add(Hjj)
        H = H.at[e_i, :, e_j, :].add(Hij)
        H = H.at[e_j, :, e_i, :].add(jnp.swapaxes(Hij, 1, 2))
        g = jnp.zeros((K, n_p)).at[e_i].add(gi).at[e_j].add(gj)

        # gauge: fix the loop-match KF and every invalid vertex
        free = kf_valid & (jnp.arange(K) != fixed_kf)
        diag_boost = jnp.where(free, 0.0, 1e8)
        H = H + (
            jnp.eye(K * n_p).reshape(K, n_p, K, n_p)
            * (lam + 1e-8 + diag_boost[:, None, None, None])
        )
        Hd = H.reshape(K * n_p, K * n_p)
        step = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(K, n_p)
        if fix_scale:
            step = step.at[:, 6].set(0.0)
        step = step * free[:, None]

        s_new, R_new, t_new = jax.vmap(vertex_apply)(s, R, t, step)

        def cost(s_, R_, t_):
            rr = jax.vmap(
                lambda a, b, c, d, e_, f, g_, h, i_: _edge_residual(a, b, c, d, e_, f, g_, h, i_)
            )(s_[e_i], R_[e_i], t_[e_i], s_[e_j], R_[e_j], t_[e_j], m_s, m_R, m_t)
            return jnp.sum(jnp.where(e_ok[:, None], rr * rr, 0.0))

        improved = cost(s_new, R_new, t_new) < cost(s, R, t)
        s = jnp.where(improved, s_new, s)
        R = jnp.where(improved, R_new, R)
        t = jnp.where(improved, t_new, t)
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 5.0, 1e6))
        done = jnp.max(jnp.abs(step)) < 1e-9
        return s, R, t, lam, it + 1, done

    s, R, t, _, _, _ = jax.lax.while_loop(
        lambda st: (st[4] < iters) & (~st[5]),
        lm_body,
        (kf_s, kf_R, kf_t, jnp.asarray(1e-6), jnp.asarray(0), jnp.asarray(False)),
    )
    # renormalize rotations
    R = lie.quat_to_mat(lie.mat_to_quat(R))
    return s, R, t
