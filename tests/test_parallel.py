"""Multi-chip sharding over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.parallel import (
    make_obs_mesh, sharded_ba_normal_equations, sharded_pose_gn_step,
)
from vo_slam_test_tpu.parallel.sharded import shard_observations
from vo_slam_test_tpu.solvers.pose_only import PoseObs

FX, FY, CX, CY, BF = 517.3, 516.5, 318.6, 255.3, 40.0


def make_obs(n, seed=0):
    rng = np.random.default_rng(seed)
    pw = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], size=(n, 3)).astype(np.float32)
    xi = np.array([0.05, -0.08, 0.12, 0.03, -0.02, 0.04], np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    pc = pw @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = FX * pc[:, 0] / pc[:, 2] + CX
    v = FY * pc[:, 1] / pc[:, 2] + CY
    return T_gt, PoseObs(
        p_world=jnp.asarray(pw),
        uv=jnp.asarray(np.stack([u, v], -1).astype(np.float32)),
        u_right=jnp.full((n,), -1.0),
        inv_sigma2=jnp.ones((n,)),
        valid=jnp.ones((n,), bool),
    )


class TestSharded:
    def test_pose_gn_matches_single_device(self):
        assert jax.device_count() >= 8
        mesh = make_obs_mesh(8)
        T_gt, obs = make_obs(64)
        obs_sh = shard_observations(mesh, obs)
        fn = sharded_pose_gn_step(mesh)
        T = jnp.eye(4)
        for _ in range(8):
            T = fn(T, obs_sh, FX, FY, CX, CY, BF)
        err = np.abs(np.asarray(T) - T_gt).max()
        assert err < 1e-3, err

    def test_ba_normal_equations_reduce(self):
        mesh = make_obs_mesh(8)
        W, L, M = 4, 32, 64
        rng = np.random.default_rng(1)
        poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (W, 1, 1)))
        points = jnp.asarray(rng.uniform([-1, -1, 2], [1, 1, 5], (L, 3)).astype(np.float32))
        o_kf = jnp.asarray(rng.integers(0, W, M).astype(np.int32))
        o_pt = jnp.asarray(rng.integers(0, L, M).astype(np.int32))
        pc = np.asarray(points)[np.asarray(o_pt)]
        u = FX * pc[:, 0] / pc[:, 2] + CX + rng.normal(0, 1, M)
        v = FY * pc[:, 1] / pc[:, 2] + CY + rng.normal(0, 1, M)
        o_uv = jnp.asarray(np.stack([u, v], -1).astype(np.float32))
        o_w = jnp.ones((M,))

        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P("obs"))
        fn = sharded_ba_normal_equations(mesh, W, L)
        Hpp, bp, Hll, bl = fn(
            poses, points,
            jax.device_put(o_kf, sh), jax.device_put(o_pt, sh),
            jax.device_put(o_uv, sh), jax.device_put(o_w, sh),
            FX, FY, CX, CY,
        )
        assert Hpp.shape == (W, 6, 6) and Hll.shape == (L, 3, 3)

        # single-device numpy oracle: the 8-way psum-reduced accumulation
        # must equal the unsharded normal equations
        def hat(p):
            x, y, z = p
            return np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], np.float64)

        Hpp_r = np.zeros((W, 6, 6)); bp_r = np.zeros((W, 6))
        Hll_r = np.zeros((L, 3, 3)); bl_r = np.zeros((L, 3))
        P_np = np.asarray(poses); X_np = np.asarray(points)
        kf_np = np.asarray(o_kf); pt_np = np.asarray(o_pt)
        uv_np = np.asarray(o_uv)
        for mi in range(M):
            T = P_np[kf_np[mi]]
            X = X_np[pt_np[mi]]
            pc = T[:3, :3] @ X + T[:3, 3]
            invz = 1.0 / pc[2]
            e = np.array([
                FX * pc[0] * invz + CX - uv_np[mi, 0],
                FY * pc[1] * invz + CY - uv_np[mi, 1],
            ])
            dproj = np.array([
                [FX * invz, 0, -FX * pc[0] * invz * invz],
                [0, FY * invz, -FY * pc[1] * invz * invz],
            ])
            Jp = dproj @ np.concatenate([np.eye(3), -hat(pc)], axis=1)
            Jl = dproj @ T[:3, :3]
            Hpp_r[kf_np[mi]] += Jp.T @ Jp
            bp_r[kf_np[mi]] += Jp.T @ e
            Hll_r[pt_np[mi]] += Jl.T @ Jl
            bl_r[pt_np[mi]] += Jl.T @ e

        scale = np.abs(Hpp_r).max()
        np.testing.assert_allclose(np.asarray(Hpp), Hpp_r, atol=1e-4 * scale)
        np.testing.assert_allclose(
            np.asarray(bp), bp_r, atol=1e-4 * max(np.abs(bp_r).max(), 1.0))
        np.testing.assert_allclose(
            np.asarray(Hll), Hll_r, atol=1e-4 * max(np.abs(Hll_r).max(), 1.0))
        np.testing.assert_allclose(
            np.asarray(bl), bl_r, atol=1e-4 * max(np.abs(bl_r).max(), 1.0))


class TestProductionLocalBAMesh:
    """local_bundle_adjust_mesh == local_bundle_adjust on a synthetic map:
    the PRODUCTION solver (Huber two-pass LM, chi2 erasure, obs<=2
    invalidation) executed with its L axis sharded over the 8-device mesh
    must reproduce the single-device result (same problem, same semantics;
    only float summation order differs across the psum)."""

    @pytest.mark.slow  # ~18 s: compiles the production BA twice (mesh + single)
    def test_mesh_matches_single_device(self):
        import sys as _sys
        _sys.path.insert(0, "/root/repo/tools")
        from synth_map import build

        from vo_slam_test_tpu.slam_map.map_state import MapCaps
        from vo_slam_test_tpu.solvers.local_ba import (
            local_bundle_adjust, local_bundle_adjust_mesh,
        )

        caps = MapCaps(max_kf=16, max_pt=1024, max_obs=8, n_feat=128)
        m, cam = build(caps, n_kf=8, n_pt=300, seed=11)
        poses = np.asarray(m.kf_pose).copy()
        poses[7, 0, 3] += 0.04
        poses[6, 1, 3] -= 0.02
        m = m.replace(kf_pose=jnp.asarray(poses))
        kid = jnp.asarray(7, jnp.int32)
        copy = jax.jit(lambda x: jax.tree.map(jnp.copy, x))

        m_single = local_bundle_adjust(copy(m), kid, caps, cam)
        mesh = make_obs_mesh(8)
        m_mesh = local_bundle_adjust_mesh(copy(m), kid, caps, cam, mesh)

        np.testing.assert_allclose(
            np.asarray(m_mesh.kf_pose), np.asarray(m_single.kf_pose),
            atol=5e-4,
        )
        live = np.asarray(m_single.pt_valid) & np.asarray(m_mesh.pt_valid)
        np.testing.assert_allclose(
            np.asarray(m_mesh.pt_pos)[live], np.asarray(m_single.pt_pos)[live],
            atol=5e-3,
        )
        # outlier-erasure bookkeeping must agree
        np.testing.assert_array_equal(
            np.asarray(m_mesh.pt_obs_cnt), np.asarray(m_single.pt_obs_cnt)
        )
        # both runs actually corrected the perturbed pose
        assert np.abs(np.asarray(m_mesh.kf_pose)[7] - poses[7]).max() > 1e-4
