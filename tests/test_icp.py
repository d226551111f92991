import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.data import synthetic
from loner_tpu.geometry import se3
from loner_tpu.tracking.icp import (
    IcpConfig,
    IcpStage,
    build_voxel_grid,
    estimate_normals,
    icp_point_to_plane,
    k_nearest,
    nearest_neighbor,
)


def sample_scene_points(n=4096, seed=0):
    """Ray-cast the default scene from its center to get a surface cloud."""
    scene = synthetic.Scene.default()
    rng = np.random.default_rng(seed)
    dirs = synthetic.spinning_lidar_directions(24, 256)
    origins = np.tile(np.array([0.0, 0.0, 1.5]), (dirs.shape[0], 1))
    dist = synthetic.ray_cast(scene, origins, dirs, max_range=40.0)
    hit = np.isfinite(dist)
    pts = origins[hit] + dirs[hit] * dist[hit, None]
    idx = rng.choice(len(pts), size=min(n, len(pts)), replace=False)
    return pts[idx].astype(np.float32)


class TestVoxelGrid:
    def test_nearest_neighbor_exact(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
        grid = build_voxel_grid(jnp.asarray(pts), jnp.ones(500, bool), jnp.asarray(1.0))
        q = pts[:50] + rng.normal(0, 0.05, (50, 3)).astype(np.float32)
        idx, dist = nearest_neighbor(grid, jnp.asarray(q))
        # brute force oracle
        d_all = np.linalg.norm(pts[None] - q[:, None], axis=-1)
        brute = d_all.argmin(axis=1)
        brute_d = d_all.min(axis=1)
        match = np.asarray(idx) == brute
        # hash-slot overflow may rarely drop the true NN; demand 95%+ agreement
        assert match.mean() > 0.95
        np.testing.assert_allclose(np.asarray(dist)[match], brute_d[match], atol=1e-4)

    def test_invalid_points_excluded(self):
        pts = np.zeros((10, 3), np.float32)
        pts[0] = [1.0, 0, 0]
        valid = np.zeros(10, bool)
        valid[0] = True
        grid = build_voxel_grid(jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(1.0))
        idx, dist = nearest_neighbor(grid, jnp.asarray([[1.1, 0.0, 0.0]]))
        assert int(idx[0]) == 0

    def test_k_nearest_sorted(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-2, 2, size=(200, 3)).astype(np.float32)
        grid = build_voxel_grid(jnp.asarray(pts), jnp.ones(200, bool), jnp.asarray(1.0))
        idx, dist = k_nearest(grid, jnp.asarray(pts[:10]), 5)
        d = np.asarray(dist)
        assert np.all(np.diff(d, axis=1) >= -1e-6)  # ascending
        np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-5)  # self is nearest


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(-5, 5, size=(1000, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.zeros((1000, 1), np.float32)], axis=-1)
        normals = np.asarray(
            estimate_normals(jnp.asarray(pts), jnp.ones(1000, bool), jnp.asarray(1.0))
        )
        # normal of z=0 plane is +-z
        assert np.all(np.abs(np.abs(normals[:, 2]) - 1.0) < 1e-3)


class TestICP:
    def test_recovers_known_transform(self):
        pts = sample_scene_points()
        true_delta = np.asarray(
            se3.pose_to_matrix(jnp.asarray([0.2, -0.1, 0.05, 0.01, 0.02, -0.03]))
        )
        # source = target displaced by inv(delta): ICP should find delta
        src = (pts - true_delta[:3, 3]) @ np.linalg.inv(true_delta[:3, :3]).T
        src = src.astype(np.float32)

        T, rmse, fitness = icp_point_to_plane(jnp.asarray(src), jnp.asarray(pts))
        T = np.asarray(T)
        err_t = np.linalg.norm(T[:3, 3] - true_delta[:3, 3])
        err_r = np.linalg.norm(
            np.asarray(se3.log_so3(jnp.asarray(T[:3, :3] @ true_delta[:3, :3].T)))
        )
        assert float(rmse) < 0.05
        assert err_t < 0.03, f"translation error {err_t}"
        assert err_r < 0.01, f"rotation error {err_r}"
        assert float(fitness) > 0.8

    def test_identity_when_aligned(self):
        pts = sample_scene_points()
        T, rmse, fitness = icp_point_to_plane(jnp.asarray(pts), jnp.asarray(pts))
        T = np.asarray(T)
        assert np.linalg.norm(T[:3, 3]) < 1e-3
        assert np.linalg.norm(np.asarray(se3.log_so3(jnp.asarray(T[:3, :3])))) < 1e-3
