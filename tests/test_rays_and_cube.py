import jax.numpy as jnp
import numpy as np

from loner_tpu.geometry import se3
from loner_tpu.geometry.rays import build_lidar_rays, far_cube_exit
from loner_tpu.geometry.world_cube import WorldCube, compute_world_cube
from loner_tpu.geometry.motion import motion_compensate


class TestFarCubeExit:
    def test_axis_aligned_from_center(self):
        o = jnp.zeros((3, 3))
        d = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
        far = np.asarray(far_cube_exit(o, d))
        np.testing.assert_allclose(far, [1.0, 1.0, 1.0], atol=1e-5)

    def test_diagonal(self):
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[1.0, 1.0, 0.0]]) / np.sqrt(2)
        far = np.asarray(far_cube_exit(o, d))
        np.testing.assert_allclose(far, [np.sqrt(2)], atol=1e-4)

    def test_offset_origin(self):
        o = jnp.asarray([[0.5, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        far = np.asarray(far_cube_exit(o, d))
        np.testing.assert_allclose(far, [0.5], atol=1e-5)


class TestWorldCube:
    def test_bbox_mode(self):
        cube = compute_world_cube(
            None,
            ray_range=(1.0, 10.0),
            padding=0.1,
            traj_bounding_box={"x": [-5, 5], "y": [-5, 5], "z": [-1, 1]},
        )
        # corners at bbox corners +- 10 in each axis: extent = [30, 30, 22]
        extent = np.array([30.0, 30.0, 22.0])
        expected_scale = np.linalg.norm(extent) / (2 * np.sqrt(3)) * 1.1
        np.testing.assert_allclose(float(cube.scale_factor), expected_scale, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cube.shift), [0, 0, 0], atol=1e-5)

    def test_poses_rebased_to_first(self):
        T0 = np.asarray(se3.pose_to_matrix(jnp.asarray([5.0, 5.0, 0, 0, 0, 0])))
        T1 = np.asarray(se3.pose_to_matrix(jnp.asarray([7.0, 5.0, 0, 0, 0, 0])))
        cube = compute_world_cube(np.stack([T0, T1]), ray_range=(1.0, 10.0), padding=0.0)
        # after re-basing, positions are (0,0,0) and (2,0,0); corners +-10
        extent = np.array([22.0, 20.0, 20.0])
        expected_scale = np.linalg.norm(extent) / (2 * np.sqrt(3))
        np.testing.assert_allclose(float(cube.scale_factor), expected_scale, rtol=1e-5)

    def test_roundtrip(self):
        cube = WorldCube(jnp.asarray(4.0), jnp.asarray([1.0, -2.0, 0.5]))
        p = jnp.asarray([[3.0, 3.0, 3.0]])
        np.testing.assert_allclose(
            np.asarray(cube.from_cube(cube.to_cube(p))), np.asarray(p), atol=1e-6
        )


class TestBuildLidarRays:
    def _setup(self):
        cube = WorldCube(jnp.asarray(20.0), jnp.asarray([0.0, 0.0, 0.0]))
        dirs = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        dists = jnp.asarray([5.0, 8.0, 15.0])
        pose = se3.pose_to_matrix(jnp.asarray([1.0, 0, 0, 0, 0, 0]))
        return cube, dirs, dists, pose

    def test_origins_scaled(self):
        cube, dirs, dists, pose = self._setup()
        rb = build_lidar_rays(dirs, dists, pose, cube, (1.0, 50.0))
        np.testing.assert_allclose(np.asarray(rb.origins[0]), [0.05, 0, 0], atol=1e-6)

    def test_depths_scaled(self):
        cube, dirs, dists, pose = self._setup()
        rb = build_lidar_rays(dirs, dists, pose, cube, (1.0, 50.0))
        np.testing.assert_allclose(np.asarray(rb.depth), [0.25, 0.4, 0.75], atol=1e-6)

    def test_directions_rotated(self):
        cube = WorldCube(jnp.asarray(20.0), jnp.asarray([0.0, 0.0, 0.0]))
        pose = se3.pose_to_matrix(jnp.asarray([0.0, 0, 0, 0, 0, np.pi / 2]))
        dirs = jnp.asarray([[1.0, 0, 0]])
        rb = build_lidar_rays(dirs, jnp.asarray([5.0]), pose, cube, (1.0, 50.0))
        np.testing.assert_allclose(np.asarray(rb.directions[0]), [0, 1, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(rb.viewdirs[0]), [0, -1, 0], atol=1e-5)

    def test_near_far_and_valid(self):
        cube, dirs, dists, pose = self._setup()
        rb = build_lidar_rays(dirs, dists, pose, cube, (1.0, 50.0))
        np.testing.assert_allclose(np.asarray(rb.near), [0.05] * 3, atol=1e-6)
        # x-ray: origin at 0.05, exits at x=1 -> far = 0.95 (range 50/20=2.5 clipped)
        np.testing.assert_allclose(float(rb.far[0]), 0.95, atol=1e-5)
        assert bool(rb.valid[0])

    def test_pack_layout(self):
        cube, dirs, dists, pose = self._setup()
        rb = build_lidar_rays(dirs, dists, pose, cube, (1.0, 50.0))
        packed = np.asarray(rb.pack())
        assert packed.shape == (3, 13)
        np.testing.assert_allclose(packed[:, 11], np.asarray(rb.near))
        np.testing.assert_allclose(packed[:, 12], np.asarray(rb.far))


class TestMotionCompensation:
    def test_static_sensor_is_identity(self):
        n = 16
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dists = rng.uniform(2, 20, size=n)
        ts = np.linspace(0, 0.1, n)
        T = np.asarray(se3.pose_to_matrix(jnp.asarray([1.0, 2, 3, 0.1, 0.2, 0.3])))
        new_dirs, new_dists = motion_compensate(
            jnp.asarray(dirs), jnp.asarray(dists), jnp.asarray(ts),
            jnp.asarray(T), jnp.asarray(T), 0.0, 0.1, jnp.asarray(T),
        )
        np.testing.assert_allclose(np.asarray(new_dirs), dirs, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_dists), dists, atol=1e-4)

    def test_pure_translation(self):
        # Sensor moves +x at 10 m/s over 0.1 s; a point measured at scan end
        # straight ahead at 10 m is at 10 m in the end frame; compensated into
        # the start frame it should appear at 11 m.
        dirs = jnp.asarray([[1.0, 0, 0]])
        dists = jnp.asarray([10.0])
        ts = jnp.asarray([0.1])
        T0 = jnp.eye(4)
        T1 = np.eye(4)
        T1[0, 3] = 1.0
        new_dirs, new_dists = motion_compensate(
            dirs, dists, ts, T0, jnp.asarray(T1), 0.0, 0.1, T0
        )
        np.testing.assert_allclose(float(new_dists[0]), 11.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_dirs[0]), [1, 0, 0], atol=1e-6)

    def test_interpolated_fraction(self):
        # Point captured halfway through the scan gets half the motion.
        dirs = jnp.asarray([[1.0, 0, 0]])
        dists = jnp.asarray([10.0])
        ts = jnp.asarray([0.05])
        T0 = jnp.eye(4)
        T1 = np.eye(4)
        T1[0, 3] = 1.0
        _, new_dists = motion_compensate(dirs, dists, ts, T0, jnp.asarray(T1), 0.0, 0.1, T0)
        np.testing.assert_allclose(float(new_dists[0]), 10.5, atol=1e-5)
