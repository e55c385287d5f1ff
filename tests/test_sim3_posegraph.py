"""Sim3 RANSAC/refine and essential-graph pose-graph solver tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_slam_test_tpu import lie
from vo_slam_test_tpu.solvers import pose_graph, sim3

FX, FY, CX, CY = 517.3, 516.5, 318.6, 255.3


def make_sim3_scene(n=200, outlier_frac=0.2, seed=0):
    rng = np.random.default_rng(seed)
    pc2 = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], size=(n, 3)).astype(np.float32)
    xi = np.array([0.3, -0.1, 0.2, 0.08, -0.05, 0.1], np.float32)
    T12 = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    pc1 = pc2 @ T12[:3, :3].T + T12[:3, 3]
    uv1 = np.stack([FX * pc1[:, 0] / pc1[:, 2] + CX, FY * pc1[:, 1] / pc1[:, 2] + CY], -1)
    uv2 = np.stack([FX * pc2[:, 0] / pc2[:, 2] + CX, FY * pc2[:, 1] / pc2[:, 2] + CY], -1)
    uv1 += rng.normal(0, 0.3, uv1.shape)
    out = rng.uniform(size=n) < outlier_frac
    uv1[out] += rng.uniform(20, 80, (out.sum(), 2))
    return T12, pc1, pc2, uv1.astype(np.float32), uv2.astype(np.float32), out


class TestSim3:
    def test_ransac_recovers_relative_pose(self):
        T12, pc1, pc2, uv1, uv2, out = make_sim3_scene()
        n = pc1.shape[0]
        gates = np.full(n, 9.21 * 1.0, np.float32)
        s, T, inl, cnt = sim3.ransac_sim3(
            jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(gates), jnp.asarray(gates), jnp.ones(n, bool),
            FX, FY, CX, CY, jnp.asarray(7), fix_scale=True,
        )
        assert float(s) == 1.0
        assert int(cnt) > 0.7 * (~out).sum()
        err = np.abs(np.asarray(T) - T12).max()
        assert err < 0.02, err

    def test_refine_improves(self):
        T12, pc1, pc2, uv1, uv2, out = make_sim3_scene(outlier_frac=0.1, seed=3)
        n = pc1.shape[0]
        xi0 = np.array([0.02, -0.01, 0.015, 0.01, -0.005, 0.008], np.float32)
        T_init = np.asarray(lie.se3_exp(jnp.asarray(xi0))) @ T12
        ones = jnp.ones(n)
        s, T, inl, cnt = sim3.refine_sim3(
            jnp.asarray(T_init, dtype=jnp.float32), jnp.asarray(1.0),
            jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(uv1), jnp.asarray(uv2),
            ones, ones, jnp.ones(n, bool), FX, FY, CX, CY,
        )
        err = np.abs(np.asarray(T) - T12).max()
        assert err < 5e-3, err
        assert int(cnt) >= 0.8 * (~out).sum()
        # outliers rejected
        assert np.asarray(inl)[out].mean() < 0.2


class TestPoseGraph:
    def test_loop_drift_distributed(self):
        """Chain of KFs with accumulated drift; a loop edge back to the start
        pulls the chain into consistency."""
        K = 16
        rng = np.random.default_rng(1)
        # ground truth: poses on a circle-ish chain
        gt = [np.eye(4, dtype=np.float32)]
        step_xi = np.array([0.2, 0.0, 0.05, 0.0, 0.12, 0.0], np.float32)
        for k in range(1, K):
            gt.append(np.asarray(lie.se3_exp(jnp.asarray(step_xi))) @ gt[-1])
        gt = np.stack(gt)

        # drifted estimates: add small error to each chain step
        est = [gt[0]]
        for k in range(1, K):
            noise = np.concatenate([rng.normal(0, 0.01, 3), rng.normal(0, 0.004, 3)]).astype(np.float32)
            T_rel = np.asarray(lie.se3_exp(jnp.asarray(step_xi + noise)))
            est.append(T_rel @ est[-1])
        est = np.stack(est)

        edge_mask = np.zeros((K, K), bool)
        meas_R = np.tile(np.eye(3, dtype=np.float32), (K, K, 1, 1))
        meas_t = np.zeros((K, K, 3), np.float32)
        meas_s = np.ones((K, K), np.float32)

        def set_edge(i, j, S_i, S_j):
            # residual convention: meas[i,j] = S_i * S_j^-1 so that
            # meas_ij * S_j * S_i^-1 = I at consistent estimates
            edge_mask[i, j] = edge_mask[j, i] = True
            T_ij = S_i @ np.linalg.inv(S_j)
            meas_R[i, j] = T_ij[:3, :3]; meas_t[i, j] = T_ij[:3, 3]
            T_ji = np.linalg.inv(T_ij)
            meas_R[j, i] = T_ji[:3, :3]; meas_t[j, i] = T_ji[:3, 3]

        # chain edges measured from the DRIFTED estimates (spanning tree)
        for k in range(1, K):
            set_edge(k - 1, k, est[k - 1], est[k])
        # loop edge 0<->K-1 measured from ground truth (the loop detection)
        set_edge(0, K - 1, gt[0], gt[K - 1])

        s, R, t = pose_graph.solve_pose_graph(
            jnp.ones((K,)), jnp.asarray(est[:, :3, :3]), jnp.asarray(est[:, :3, 3]),
            jnp.ones((K,), bool), jnp.asarray(edge_mask),
            jnp.asarray(meas_s), jnp.asarray(meas_R), jnp.asarray(meas_t),
            jnp.asarray(0, jnp.int32), fix_scale=True, iters=20, max_edges=64,
        )
        # the far end of the chain must be pulled toward the loop constraint:
        # error at K-1 after optimization << drift before
        drift_before = np.linalg.norm(est[K - 1][:3, 3] - gt[K - 1][:3, 3])
        err_after = np.linalg.norm(np.asarray(t)[K - 1] - gt[K - 1][:3, 3])
        assert err_after < 0.5 * drift_before, (drift_before, err_after)
