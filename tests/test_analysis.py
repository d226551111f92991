import numpy as np
import jax.numpy as jnp

from loner_tpu.analysis.mesher import save_ply, save_pcd, splat_weights_to_grid, surface_nets
from loner_tpu.analysis.metrics import (
    associate_by_time,
    ate_rmse,
    icp_realign,
    map_metrics,
    rpe,
    umeyama_alignment,
)
from loner_tpu.analysis.renderer import voxel_downsample
from loner_tpu.geometry import se3


def traj_circle(n=50, radius=5.0):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = radius * np.cos(t)
    poses[:, 1, 3] = radius * np.sin(t)
    return poses, t


class TestTrajMetrics:
    def test_ate_zero_for_identical(self):
        poses, ts = traj_circle()
        m = ate_rmse(poses, poses, ts, ts)
        assert m["rmse"] < 1e-9 and m["n"] == 50

    def test_ate_alignment_removes_rigid_offset(self):
        poses, ts = traj_circle()
        T = np.asarray(se3.pose_to_matrix(jnp.asarray([3.0, -1, 2, 0.2, 0.1, 0.4])))
        moved = T[None] @ poses
        m = ate_rmse(moved, poses, ts, ts, align=True)
        assert m["rmse"] < 1e-5  # rigid offset fully absorbed

    def test_ate_detects_noise(self):
        poses, ts = traj_circle()
        rng = np.random.default_rng(0)
        noisy = poses.copy()
        noisy[:, :3, 3] += rng.normal(0, 0.1, (len(poses), 3))
        m = ate_rmse(noisy, poses, ts, ts)
        assert 0.05 < m["rmse"] < 0.3

    def test_association_tolerance(self):
        ta = np.array([0.0, 1.0, 2.0])
        tb = np.array([0.05, 0.96, 5.0])
        ia, ib = associate_by_time(ta, tb, max_diff=0.1)
        assert len(ia) == 2

    def test_rpe_zero_identical(self):
        poses, ts = traj_circle()
        m = rpe(poses, poses)
        assert m["trans_rmse"] < 1e-9

    def test_umeyama_recovers_transform(self):
        rng = np.random.default_rng(1)
        src = rng.normal(size=(100, 3))
        R_true = np.asarray(se3.exp_so3(jnp.asarray([0.3, -0.2, 0.5])))
        t_true = np.array([1.0, 2.0, -0.5])
        dst = (R_true @ src.T).T + t_true
        R, t, s = umeyama_alignment(src, dst)
        np.testing.assert_allclose(R, R_true, atol=1e-5)
        np.testing.assert_allclose(t, t_true, atol=1e-5)


class TestMapMetrics:
    def test_identical_clouds(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, (2000, 3))
        m = map_metrics(pts, pts, realign=False)
        assert m["chamfer"] < 1e-9 and m["f_score"] == 1.0

    def test_offset_detected_without_realign(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, (2000, 3))
        m = map_metrics(pts + np.array([0.2, 0, 0]), pts, realign=False)
        assert 0.1 < m["accuracy"] < 0.3

    def test_icp_realign_recovers_offset(self):
        # randomly-sampled curved surface (a regular lattice aliases
        # point-to-point NN matching); ICP must recover the applied shift
        def sample(n, seed):
            r = np.random.default_rng(seed)
            xy = r.uniform(-5, 5, (n, 2))
            z = np.sin(xy[:, 0]) * np.cos(xy[:, 1])
            return np.column_stack([xy, z])

        true_t = np.array([0.15, -0.1, 0.05])
        src = sample(3000, 1) + true_t
        dst = sample(6000, 2)
        _, T = icp_realign(src, dst, iterations=30, threshold=1.0)
        np.testing.assert_allclose(T[:3, 3], -true_t, atol=0.02)


class TestMesher:
    def test_splat_and_extract_sphere(self):
        # scalar field: points sampled on a sphere with weight 1
        rng = np.random.default_rng(0)
        v = rng.normal(size=(50000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v * 0.5  # sphere radius 0.5 in cube coords
        grid, lo, voxel = splat_weights_to_grid(pts, np.ones(len(pts)), 64)
        verts, faces = surface_nets(grid, 0.5, lo, voxel)
        assert len(verts) > 100 and len(faces) > 100
        radii = np.linalg.norm(verts, axis=1)
        # extracted surface hugs the sphere (one-voxel tolerance ~ 2/64)
        assert abs(np.median(radii) - 0.5) < 0.06
        assert faces.max() < len(verts)

    def test_ply_pcd_writers(self, tmp_path):
        verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
        faces = np.array([[0, 1, 2]])
        save_ply(str(tmp_path / "m.ply"), verts, faces)
        save_pcd(str(tmp_path / "c.pcd"), verts)
        ply = (tmp_path / "m.ply").read_text()
        assert "element vertex 3" in ply and "3 0 1 2" in ply
        pcd = (tmp_path / "c.pcd").read_text()
        assert "POINTS 3" in pcd


class TestVoxelDownsample:
    def test_reduces_and_averages(self):
        pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [5.0, 5.0, 5.0]])
        out = voxel_downsample(pts, 0.5)
        assert len(out) == 2
        assert np.any(np.all(np.isclose(out, [0.015, 0, 0], atol=1e-6), axis=1))
