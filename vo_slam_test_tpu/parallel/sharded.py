"""Multi-chip scaling for the optimization back end.

The reference is a single-process, 4-thread program with no distributed
backend (SURVEY.md §2 parallelism inventory). The TPU-native analogue of
"scaling" is sharding the *solvers'* data dimension — observations — over a
`jax.sharding.Mesh` and reducing the (tiny) normal equations with `psum`
over ICI:

- pose-only tracking: observations sharded, 6x6 H / 6 g psum-reduced;
- local BA: observation blocks sharded, the block-diagonal pose Hessian
  [W,6,6], point blocks [L,3,3] and cross terms psum-reduced, then the
  (W*6)^2 Schur system solved replicated on every chip.

Both patterns keep all collectives on ICI (a single mesh axis) and move no
image data between chips — only reduced Gauss-Newton terms, which is why
they scale: per-chip work is O(obs/n_devices), communication is O(model
dimension). The driver's `__graft_entry__.dryrun_multichip` executes
`sharded_pose_gn_step` on an N-device mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import lie
from ..solvers.pose_only import PoseObs, _residuals_jac


def make_obs_mesh(n_devices: int) -> Mesh:
    devices = np.array(jax.devices()[:n_devices])
    assert devices.size == n_devices, (devices, n_devices)
    return Mesh(devices, axis_names=("obs",))


def shard_observations(mesh: Mesh, obs: PoseObs) -> PoseObs:
    return jax.device_put(obs, NamedSharding(mesh, P("obs")))


def sharded_pose_gn_step(mesh: Mesh):
    """Returns a jitted fn(T, obs) -> T' doing one observation-sharded
    Gauss-Newton step with psum-reduced normal equations."""

    def gn_step(T, obs, fx, fy, cx, cy, bf):
        e, J, _ = _residuals_jac(T, obs, fx, fy, cx, cy, bf)
        w = obs.valid.astype(e.dtype) * obs.inv_sigma2
        H = jax.lax.psum(jnp.einsum("nri,nrj,n->ij", J, J, w), "obs")
        g = jax.lax.psum(jnp.einsum("nri,nr,n->i", J, e, w), "obs")
        step = -jnp.linalg.solve(H + 1e-6 * jnp.eye(6, dtype=H.dtype), g)
        return lie.orthonormalize(lie.se3_exp(step) @ T)

    return jax.jit(
        shard_map(
            gn_step,
            mesh=mesh,
            in_specs=(P(), P("obs"), P(), P(), P(), P(), P()),
            out_specs=P(),
        )
    )


def sharded_ba_normal_equations(mesh: Mesh, n_window: int, n_points: int):
    """Returns a jitted fn over observation-sharded local-BA blocks:

    (poses [W,4,4], points [L,3], o_kf [M], o_pt [M], o_uv [M,2],
     o_w [M]) -> (Hpp [W,6,6], bp [W,6], Hll [L,3,3], bl [L,3])

    with all outputs psum-reduced over the mesh — the distributed half of
    solvers/local_ba.py's Schur step. The (W*6)^2 Schur solve itself is
    replicated (it is tiny)."""

    def accumulate(poses, points, o_kf, o_pt, o_uv, o_w, fx, fy, cx, cy):
        kf = jnp.maximum(o_kf, 0)
        pt = jnp.maximum(o_pt, 0)
        T = poses[kf]
        X = points[pt]
        pc = jnp.einsum("mij,mj->mi", T[:, :3, :3], X) + T[:, :3, 3]
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        invz = 1.0 / z
        u = fx * pc[:, 0] * invz + cx
        v = fy * pc[:, 1] * invz + cy
        e = jnp.stack([u - o_uv[:, 0], v - o_uv[:, 1]], -1)
        zero = jnp.zeros_like(z)
        du = jnp.stack([fx * invz, zero, -fx * pc[:, 0] * invz * invz], -1)
        dv = jnp.stack([zero, fy * invz, -fy * pc[:, 1] * invz * invz], -1)
        dproj = jnp.stack([du, dv], -2)                                 # [M,2,3]
        dpc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), pc.shape[:1] + (3, 3)), -lie.hat(pc)], -1
        )
        Jp = dproj @ dpc                                                 # [M,2,6]
        Jl = dproj @ T[:, :3, :3]                                        # [M,2,3]
        w = o_w * (o_kf >= 0) * (o_pt >= 0)
        Hpp = jax.lax.psum(
            jax.ops.segment_sum(w[:, None, None] * jnp.einsum("mri,mrj->mij", Jp, Jp), kf, num_segments=n_window),
            "obs",
        )
        bp = jax.lax.psum(
            jax.ops.segment_sum(w[:, None] * jnp.einsum("mri,mr->mi", Jp, e), kf, num_segments=n_window),
            "obs",
        )
        Hll = jax.lax.psum(
            jax.ops.segment_sum(w[:, None, None] * jnp.einsum("mri,mrj->mij", Jl, Jl), pt, num_segments=n_points),
            "obs",
        )
        bl = jax.lax.psum(
            jax.ops.segment_sum(w[:, None] * jnp.einsum("mri,mr->mi", Jl, e), pt, num_segments=n_points),
            "obs",
        )
        return Hpp, bp, Hll, bl

    return jax.jit(
        shard_map(
            accumulate,
            mesh=mesh,
            in_specs=(P(), P(), P("obs"), P("obs"), P("obs"), P("obs"), P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
        )
    )


def sharded_ba_schur_step(mesh: Mesh, n_window: int, n_points: int, lam: float = 1e-4):
    """One FULL distributed BA Gauss-Newton step: observation-sharded
    accumulation of (Hpp, bp, Hll, bl, cross terms) psum-reduced over ICI,
    then the replicated dense Schur solve and pose/point update — the
    end-to-end pattern solvers/local_ba.py scales with.

    Returns jitted fn(poses [W,4,4], points [L,3], o_kf [M], o_pt [M],
    o_uv [M,2], o_w [M], fx, fy, cx, cy) -> (poses', points')."""

    def step(poses, points, o_kf, o_pt, o_uv, o_w, fx, fy, cx, cy):
        kf = jnp.maximum(o_kf, 0)
        pt = jnp.maximum(o_pt, 0)
        T = poses[kf]
        X = points[pt]
        pc = jnp.einsum("mij,mj->mi", T[:, :3, :3], X) + T[:, :3, 3]
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        invz = 1.0 / z
        u = fx * pc[:, 0] * invz + cx
        v = fy * pc[:, 1] * invz + cy
        e = jnp.stack([u - o_uv[:, 0], v - o_uv[:, 1]], -1)
        zero = jnp.zeros_like(z)
        du = jnp.stack([fx * invz, zero, -fx * pc[:, 0] * invz * invz], -1)
        dv = jnp.stack([zero, fy * invz, -fy * pc[:, 1] * invz * invz], -1)
        dproj = jnp.stack([du, dv], -2)
        dpc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), pc.shape[:1] + (3, 3)), -lie.hat(pc)], -1
        )
        Jp = dproj @ dpc
        Jl = dproj @ T[:, :3, :3]
        w = o_w * (o_kf >= 0) * (o_pt >= 0)
        seg = lambda vals, ids, n: jax.lax.psum(
            jax.ops.segment_sum(vals, ids, num_segments=n), "obs"
        )
        Hpp = seg(w[:, None, None] * jnp.einsum("mri,mrj->mij", Jp, Jp), kf, n_window)
        bp = seg(w[:, None] * jnp.einsum("mri,mr->mi", Jp, e), kf, n_window)
        Hll = seg(w[:, None, None] * jnp.einsum("mri,mrj->mij", Jl, Jl), pt, n_points)
        bl = seg(w[:, None] * jnp.einsum("mri,mr->mi", Jl, e), pt, n_points)
        cross = w[:, None, None] * jnp.einsum("mri,mrj->mij", Jp, Jl)  # [M,6,3]
        Wc = jax.lax.psum(
            jnp.zeros((n_window, n_points, 6, 3)).at[kf, pt].add(cross), "obs"
        )

        # replicated Schur solve (tiny): S dx = rhs, back-substitute points
        Hll_d = Hll + lam * jnp.eye(3)[None]
        Hll_inv = jnp.linalg.inv(Hll_d)
        WHinv = jnp.einsum("wpij,pjl->wpil", Wc, Hll_inv)
        S = -jnp.einsum("wpil,vpml->wivm", WHinv, Wc)
        S = S.at[jnp.arange(n_window), :, jnp.arange(n_window), :].add(
            Hpp + lam * jnp.eye(6)[None]
        )
        rhs = bp - jnp.einsum("wpil,pl->wi", WHinv, bl)
        # gauge: pin the first pose with a large diagonal boost BEFORE the
        # solve (the global gauge freedom otherwise makes S singular)
        S = S.at[0, :, 0, :].add(1e8 * jnp.eye(6))
        Sd = S.reshape(n_window * 6, n_window * 6) + 1e-8 * jnp.eye(n_window * 6)
        dx_pose = -jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(n_window, 6)
        dx_pose = dx_pose.at[0].set(0.0)
        Wt_dx = jnp.einsum("wpil,wi->pl", Wc, dx_pose)
        dx_pt = -jnp.einsum("pij,pj->pi", Hll_inv, bl + Wt_dx)

        poses_new = jax.vmap(lie.orthonormalize)(
            jax.vmap(lie.se3_exp)(dx_pose) @ poses
        )
        return poses_new, points + dx_pt

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P("obs"), P("obs"), P("obs"), P("obs"), P(), P(), P(), P()),
            out_specs=(P(), P()),
        )
    )
