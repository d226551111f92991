"""Distributed pose-graph bundle adjustment."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.geometry import se3
from loner_tpu.parallel.pose_graph import (
    PoseGraphFactors,
    make_factors,
    odometry_factors_from_tracking,
    solve_pose_graph,
)
from loner_tpu.parallel.sharding import make_mesh


def make_noisy_chain(n=16, seed=0, drift=0.05):
    """GT poses on a line + noisy odometry estimates that drift."""
    rng = np.random.default_rng(seed)
    gt = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        gt[i][:3, 3] = [i * 1.0, 0.1 * np.sin(i), 0.0]
    est = gt.copy()
    for i in range(1, n):
        noise = np.asarray(
            se3.pose_to_matrix(jnp.asarray(np.r_[rng.normal(0, drift, 3), rng.normal(0, drift / 5, 3)], dtype=np.float32))
        )
        est[i] = est[i - 1] @ (np.linalg.inv(gt[i - 1]) @ gt[i]) @ noise
    return gt, est


class TestPoseGraph:
    def test_perfect_factors_zero_update(self):
        gt, _ = make_noisy_chain(8, drift=0.0)
        edges = odometry_factors_from_tracking(gt)
        factors = make_factors(edges)
        p0 = jnp.asarray(np.stack([np.asarray(se3.matrix_to_pose(jnp.asarray(g, jnp.float32))) for g in gt]))
        refined, cost = solve_pose_graph(p0, factors, n_iters=3)
        np.testing.assert_allclose(np.asarray(refined), np.asarray(p0), atol=1e-4)
        assert float(cost) < 1e-8

    def test_loop_closure_reduces_drift(self):
        gt, est = make_noisy_chain(16, drift=0.08)
        # odometry from the DRIFTED estimates + one perfect loop closure 0->15
        edges = odometry_factors_from_tracking(est)
        z_loop = np.linalg.inv(gt[0]) @ gt[15]
        edges.append((0, 15, z_loop, 10.0))
        factors = make_factors(edges)

        p0 = jnp.asarray(np.stack([np.asarray(se3.matrix_to_pose(jnp.asarray(e, jnp.float32))) for e in est]))
        refined, cost = solve_pose_graph(p0, factors, n_iters=10)

        T_ref = np.asarray(jax.jit(se3.pose_to_matrix)(refined))
        err_before = np.linalg.norm(est[15][:3, 3] - gt[15][:3, 3])
        err_after = np.linalg.norm(T_ref[15][:3, 3] - gt[15][:3, 3])
        assert err_after < err_before * 0.5, (err_before, err_after)

    def test_anchor_pins_first_pose(self):
        gt, est = make_noisy_chain(8, drift=0.05)
        edges = odometry_factors_from_tracking(est)
        factors = make_factors(edges)
        p0 = jnp.asarray(np.stack([np.asarray(se3.matrix_to_pose(jnp.asarray(e, jnp.float32))) for e in est]))
        refined, _ = solve_pose_graph(p0, factors, n_iters=5)
        T0 = np.asarray(jax.jit(se3.pose_to_matrix)(refined[0]))
        np.testing.assert_allclose(T0, est[0], atol=1e-3)

    def test_distributed_matches_single_device(self):
        gt, est = make_noisy_chain(16, drift=0.08)
        edges = odometry_factors_from_tracking(est)
        z_loop = np.linalg.inv(gt[0]) @ gt[15]
        edges.append((0, 15, z_loop, 10.0))
        # pad to a multiple of 8 devices
        factors = make_factors(edges, n_pad=16)
        p0 = jnp.asarray(np.stack([np.asarray(se3.matrix_to_pose(jnp.asarray(e, jnp.float32))) for e in est]))

        single, cost_s = solve_pose_graph(p0, factors, n_iters=5)
        mesh = make_mesh(8)
        dist, cost_d = solve_pose_graph(p0, factors, n_iters=5, mesh=mesh)
        np.testing.assert_allclose(np.asarray(dist), np.asarray(single), atol=1e-4)
        np.testing.assert_allclose(float(cost_d), float(cost_s), rtol=1e-5)
