"""Global bundle adjustment (matrix-free Schur CG, one jit).

The reference deliberately stops at the essential graph after a loop
closure (SURVEY §2: "No global BA after pose graph"); upstream ORB-SLAM2
runs one, and BASELINE.json's full-system config names it — so it exists
here flag-gated (SlamSystem(enable_global_ba=True)).

TPU design: the dense cross-term array of the local solver (Wc ~ [K,P,6,3])
is gigabytes at map scale, so the reduced camera system S = Hpp - W Hll^-1
W^T is never materialized. Each CG matvec evaluates it observation-wise:

    v_p  = segment_sum_pt( Jl^T Jp x_kf )      (one pass over all obs)
    u_p  = Hll^-1 v_p                          (closed-form 3x3 inverses)
    y_k  = segment_sum_kf( Jp^T Jl u_p )       (second pass)
    Sx   = Hpp_blockdiag x - y

The observation table is the full [K,N] keypoint->point binding (no
compaction): fixed shapes, ~262k rows, two passes per matvec. Gauge:
keyframe 0 fixed. Huber weights per LM iteration like the reference
solvers (chi2 5.991/7.815 scale).

Multi-chip: `global_bundle_adjust_mesh` runs the SAME core with the
observation axis sharded over a `jax.sharding.Mesh` — every obs-space
segment-sum (Hpp/bp/Hll/bl, both matvec passes, the robust cost) becomes
a shard-local partial followed by a `psum` over ICI; poses, points and the
CG state stay replicated. Per-chip work is O(obs/n_devices), communication
O(K·6 + P·3) per CG step — independent of the observation count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import lie
from ..camera import Camera
from ..slam_map.map_state import MapCaps, MapState
from ..utils import linalg
from .pose_only import CHI2_MONO, CHI2_STEREO


def _obs_table(m: MapState):
    """Flatten the [K,N] binding table into observation arrays."""
    K, N = m.kf_mp.shape
    o_kf = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    o_kp = jnp.tile(jnp.arange(N, dtype=jnp.int32), K)
    o_pt = m.kf_mp.reshape(-1)
    valid = (
        (o_pt >= 0)
        & m.kf_valid[o_kf]
        & m.kf_kp_valid.reshape(-1)
        & m.pt_valid[jnp.maximum(o_pt, 0)]
    )
    return o_kf, o_kp, jnp.maximum(o_pt, 0), valid


def _prep_obs(m: MapState, inv_level_sigma2):
    """Per-observation constants (gathered once; they never change across
    LM iterations): indices, measurements, weights, validity."""
    o_kf, o_kp, o_pt, o_valid = _obs_table(m)
    N = m.kf_mp.shape[1]
    flat = o_kf * N + o_kp
    uv = m.kf_uv_und.reshape(-1, 2)[flat]
    ur_obs = m.kf_u_right.reshape(-1)[flat]
    obs_oct = m.kf_octave.reshape(-1)[flat]
    if inv_level_sigma2 is None:
        inv_sig2 = 1.0 / (1.2 ** (2.0 * obs_oct.astype(jnp.float32)))
    else:
        inv_sig2 = inv_level_sigma2[obs_oct]
    return o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2


def _residuals_jacs(poses, points, o_kf, o_pt, uv, ur_obs, cam: Camera):
    T = poses[o_kf]
    X = points[o_pt]
    pc = jnp.einsum("mij,mj->mi", T[:, :3, :3], X) + T[:, :3, 3]
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    invz = 1.0 / safe_z
    u = cam.fx * pc[:, 0] * invz + cam.cx
    v = cam.fy * pc[:, 1] * invz + cam.cy
    stereo = ur_obs >= 0
    ur = u - cam.bf * invz
    e = jnp.stack(
        [u - uv[:, 0], v - uv[:, 1], jnp.where(stereo, ur - ur_obs, 0.0)], -1
    )
    zero = jnp.zeros_like(z)
    du = jnp.stack([cam.fx * invz, zero, -cam.fx * pc[:, 0] * invz * invz], -1)
    dv = jnp.stack([zero, cam.fy * invz, -cam.fy * pc[:, 1] * invz * invz], -1)
    dur = du + jnp.stack([zero, zero, cam.bf * invz * invz], -1)
    dproj = jnp.stack([du, dv, jnp.where(stereo[:, None], dur, 0.0)], -2)
    dpc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), pc.shape[:1] + (3, 3)), -lie.hat(pc)], -1
    )
    Jp = dproj @ dpc
    Jl = dproj @ T[:, :3, :3]
    return e, Jp, Jl, stereo


def _gba_optimize(
    poses0, points0,
    o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2,   # per-observation (shardable)
    free, pt_valid,                              # replicated masks
    cam: Camera, iters: int, cg_iters: int, axis: str | None = None,
):
    """The LM/CG core. `axis`: mesh axis name when running under shard_map
    with the observation axis sharded — every obs-space reduction is then
    a shard-local partial psum-reduced over ICI."""
    psum = (lambda x: jax.lax.psum(x, axis)) if axis else (lambda x: x)
    K = free.shape[0]
    P = pt_valid.shape[0]
    inv_sig = jnp.sqrt(inv_sig2)
    d_mono = jnp.sqrt(CHI2_MONO)
    d_stereo = jnp.sqrt(CHI2_STEREO)

    def lm_iter(_, carry):
        poses, points = carry
        e, Jp, Jl, stereo = _residuals_jacs(
            poses, points, o_kf, o_pt, uv, ur_obs, cam)
        ew = e * inv_sig[:, None]
        nrm = jnp.sqrt(jnp.sum(ew * ew, -1) + 1e-12)
        delta = jnp.where(stereo, d_stereo, d_mono)
        w = o_valid.astype(e.dtype) * jnp.minimum(1.0, delta / nrm) * inv_sig2
        wp = w * free[o_kf]

        # block-diagonal Hessians and gradients
        Hpp = psum(jax.ops.segment_sum(
            wp[:, None, None] * jnp.einsum("mri,mrj->mij", Jp, Jp), o_kf,
            num_segments=K,
        ))
        bp = psum(jax.ops.segment_sum(
            wp[:, None] * jnp.einsum("mri,mr->mi", Jp, e), o_kf,
            num_segments=K,
        ))
        Hll = psum(jax.ops.segment_sum(
            w[:, None, None] * jnp.einsum("mri,mrj->mij", Jl, Jl), o_pt,
            num_segments=P,
        ))
        bl = psum(jax.ops.segment_sum(
            w[:, None] * jnp.einsum("mri,mr->mi", Jl, e), o_pt,
            num_segments=P,
        ))
        lam = 1e-3
        Hll_inv = linalg.inv3x3(Hll + (lam + 1e-7) * jnp.eye(3)[None])
        Hpp_d = Hpp + lam * jnp.eye(6)[None]

        def schur_matvec(x):  # [K,6] -> [K,6]
            px = jnp.einsum("mri,mi->mr", Jp, x[o_kf])          # [M,3]
            v = psum(jax.ops.segment_sum(
                wp[:, None] * jnp.einsum("mri,mr->mi", Jl, px), o_pt,
                num_segments=P,
            ))
            u_ = jnp.einsum("pij,pj->pi", Hll_inv, v)
            back = jnp.einsum("mri,mi->mr", Jl, u_[o_pt])       # [M,3]
            y = psum(jax.ops.segment_sum(
                wp[:, None] * jnp.einsum("mri,mr->mi", Jp, back), o_kf,
                num_segments=K,
            ))
            return jnp.einsum("kij,kj->ki", Hpp_d, x) - y

        u0 = jnp.einsum("pij,pj->pi", Hll_inv, bl)
        back0 = jnp.einsum("mri,mi->mr", Jl, u0[o_pt])
        r_rhs = bp - psum(jax.ops.segment_sum(
            wp[:, None] * jnp.einsum("mri,mr->mi", Jp, back0), o_kf,
            num_segments=K,
        ))
        rhs = -r_rhs * free[:, None]

        # diagonal(6x6-block) preconditioned CG (all-replicated state; the
        # only sharded work is inside schur_matvec)
        Hpp_inv = jnp.linalg.inv(Hpp_d + 1e-6 * jnp.eye(6)[None])

        def precond(r):
            return jnp.einsum("kij,kj->ki", Hpp_inv, r) * free[:, None]

        def cg_body(_, st):
            x, r, p_, rz = st
            Ap = schur_matvec(p_) * free[:, None]
            alpha = rz / jnp.maximum(jnp.sum(p_ * Ap), 1e-20)
            x = x + alpha * p_
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p_ = z + beta * p_
            return x, r, p_, rz_new

        x0 = jnp.zeros((K, 6))
        z0 = precond(rhs)
        x, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, rhs, z0, jnp.sum(rhs * z0))
        )
        dx_pose = x * free[:, None]

        # back-substitute points: dx_l = -Hll^-1 (bl + W^T dx)
        px = jnp.einsum("mri,mi->mr", Jp, dx_pose[o_kf])
        wtd = psum(jax.ops.segment_sum(
            wp[:, None] * jnp.einsum("mri,mr->mi", Jl, px), o_pt,
            num_segments=P,
        ))
        dx_pt = -jnp.einsum("pij,pj->pi", Hll_inv, bl + wtd)
        dx_pt = dx_pt * pt_valid[:, None]

        poses_new = jnp.where(
            free[:, None, None],
            lie.orthonormalize(jax.vmap(lie.se3_exp)(dx_pose) @ poses),
            poses,
        )
        points_new = points + dx_pt

        # accept only if the robust cost decreased (psum-reduced: the gate
        # is identical on every shard)
        def cost(ps, xs):
            ee, _, _, st_ = _residuals_jacs(ps, xs, o_kf, o_pt, uv, ur_obs, cam)
            ew_ = ee * inv_sig[:, None]
            s2 = jnp.sum(ew_ * ew_, -1)
            dd = jnp.where(st_, d_stereo, d_mono)
            ss = jnp.sqrt(s2 + 1e-12)
            rho = jnp.where(ss <= dd, s2, 2 * dd * ss - dd * dd)
            return psum(jnp.sum(jnp.where(o_valid, rho, 0.0)))

        better = cost(poses_new, points_new) < cost(poses, points)
        poses = jnp.where(better, poses_new, poses)
        points = jnp.where(better, points_new, points)
        return poses, points

    return jax.lax.fori_loop(0, iters, lm_iter, (poses0, points0))


@functools.partial(jax.jit, static_argnames=("caps", "iters", "cg_iters"))
def global_bundle_adjust(
    m: MapState,
    caps: MapCaps,
    cam: Camera,
    fixed_kf: jnp.ndarray,
    iters: int = 10,
    cg_iters: int = 24,
    inv_level_sigma2: jnp.ndarray | None = None,
) -> MapState:
    K = caps.max_kf
    o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2 = _prep_obs(m, inv_level_sigma2)
    free = m.kf_valid & (jnp.arange(K) != fixed_kf)
    poses, points = _gba_optimize(
        m.kf_pose, m.pt_pos,
        o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2,
        free, m.pt_valid, cam, iters, cg_iters,
    )
    return m.replace(kf_pose=poses, pt_pos=points)


def global_bundle_adjust_mesh(
    m: MapState,
    caps: MapCaps,
    cam: Camera,
    fixed_kf: jnp.ndarray,
    mesh,
    iters: int = 10,
    cg_iters: int = 24,
    inv_level_sigma2: jnp.ndarray | None = None,
) -> MapState:
    """Whole-map BA with the observation table sharded over a device mesh.

    Identical semantics to `global_bundle_adjust` (same Huber weights,
    CG-on-Schur, cost-gated acceptance; only float summation order differs
    across the psum). The [K*N] observation axis is split across the mesh's
    first axis; poses/points/CG state are replicated; every obs-space
    reduction psums over ICI. Requires K*N divisible by the mesh size."""
    try:  # jax >= 0.7
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ax = mesh.axis_names[0]
    n_dev = mesh.devices.size
    K, N = m.kf_mp.shape
    assert (K * N) % n_dev == 0, (K, N, n_dev)

    o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2 = _prep_obs(m, inv_level_sigma2)
    free = m.kf_valid & (jnp.arange(caps.max_kf) != fixed_kf)

    def optimize(poses0, points0, o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2,
                 free, pt_valid):
        return _gba_optimize(
            poses0, points0, o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2,
            free, pt_valid, cam, iters, cg_iters, axis=ax,
        )

    poses, points = jax.jit(
        shard_map(
            optimize,
            mesh=mesh,
            in_specs=(P(), P(), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax),
                      P(), P()),
            out_specs=(P(), P()),
        )
    )(m.kf_pose, m.pt_pos, o_kf, o_pt, o_valid, uv, ur_obs, inv_sig2,
      free, m.pt_valid)
    return m.replace(kf_pose=poses, pt_pos=points)
