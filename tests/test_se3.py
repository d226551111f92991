import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from loner_tpu.geometry import se3


def random_rotvecs(n, seed=0, max_angle=np.pi - 0.05):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return axes * angles


class TestExpLog:
    def test_exp_matches_scipy(self):
        w = random_rotvecs(32)
        R = np.asarray(se3.exp_so3(jnp.asarray(w, dtype=jnp.float64)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-6)

    def test_log_matches_scipy(self):
        w = random_rotvecs(32)
        R = Rotation.from_rotvec(w).as_matrix()
        w_back = np.asarray(se3.log_so3(jnp.asarray(R)))
        np.testing.assert_allclose(w_back, w, atol=1e-4)

    def test_exp_identity(self):
        R = np.asarray(se3.exp_so3(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_log_identity(self):
        w = np.asarray(se3.log_so3(jnp.eye(3)))
        np.testing.assert_allclose(w, np.zeros(3), atol=1e-5)

    def test_exp_differentiable_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(se3.exp_so3(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_roundtrip_near_pi(self):
        w = random_rotvecs(16, seed=3, max_angle=np.pi - 1e-4)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * (np.pi - 5e-3)
        R = Rotation.from_rotvec(w).as_matrix()
        w_back = np.asarray(se3.log_so3(jnp.asarray(R)))
        R_back = Rotation.from_rotvec(w_back).as_matrix()
        np.testing.assert_allclose(R_back, R, atol=1e-3)


class TestPoseMatrix:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        p = np.concatenate([rng.normal(size=(8, 3)), random_rotvecs(8, seed=2)], axis=-1)
        T = se3.pose_to_matrix(jnp.asarray(p))
        p_back = np.asarray(se3.matrix_to_pose(T))
        np.testing.assert_allclose(p_back, p, atol=1e-4)

    def test_inverse(self):
        p = jnp.asarray([0.3, -1.2, 0.5, 0.1, 0.2, -0.3])
        T = se3.pose_to_matrix(p)
        TT = np.asarray(se3.compose(T, se3.inverse(T)))
        np.testing.assert_allclose(TT, np.eye(4), atol=1e-6)

    def test_transform_points(self):
        T = se3.pose_to_matrix(jnp.asarray([1.0, 2.0, 3.0, 0, 0, np.pi / 2]))
        pts = jnp.asarray([[1.0, 0.0, 0.0]])
        out = np.asarray(se3.transform_points(T, pts))
        np.testing.assert_allclose(out, [[1.0, 3.0, 3.0]], atol=1e-5)


class TestQuaternions:
    def test_matrix_to_quat_matches_scipy(self):
        w = random_rotvecs(32, seed=5)
        R = Rotation.from_rotvec(w).as_matrix()
        q = np.asarray(se3.matrix_to_quat(jnp.asarray(R)))
        q_ref = Rotation.from_matrix(R).as_quat()  # [x,y,z,w]
        # sign-canonicalize both
        q_ref = q_ref * np.where(q_ref[:, 3:4] < 0, -1.0, 1.0)
        np.testing.assert_allclose(q, q_ref, atol=1e-4)

    def test_quat_to_matrix_roundtrip(self):
        w = random_rotvecs(16, seed=6)
        R = Rotation.from_rotvec(w).as_matrix()
        q = se3.matrix_to_quat(jnp.asarray(R))
        R_back = np.asarray(se3.quat_to_matrix(q))
        np.testing.assert_allclose(R_back, R, atol=1e-5)


class TestInterpolation:
    def test_slerp_endpoints(self):
        R0 = Rotation.from_rotvec([0.2, 0.1, -0.4]).as_matrix()
        R1 = Rotation.from_rotvec([-0.3, 0.5, 0.2]).as_matrix()
        out0 = np.asarray(se3.slerp_rotation(jnp.asarray(R0), jnp.asarray(R1), jnp.asarray(0.0)))
        out1 = np.asarray(se3.slerp_rotation(jnp.asarray(R0), jnp.asarray(R1), jnp.asarray(1.0)))
        np.testing.assert_allclose(out0, R0, atol=1e-5)
        np.testing.assert_allclose(out1, R1, atol=1e-5)

    def test_slerp_matches_scipy(self):
        R0 = Rotation.from_rotvec([0.2, 0.1, -0.4])
        R1 = Rotation.from_rotvec([-0.3, 0.5, 0.2])
        from scipy.spatial.transform import Slerp

        slerp = Slerp([0, 1], Rotation.concatenate([R0, R1]))
        for a in [0.25, 0.5, 0.75]:
            ours = np.asarray(
                se3.slerp_rotation(
                    jnp.asarray(R0.as_matrix()), jnp.asarray(R1.as_matrix()), jnp.asarray(a)
                )
            )
            np.testing.assert_allclose(ours, slerp([a]).as_matrix()[0], atol=1e-5)

    def test_interpolate_transform_translation_lerp(self):
        T0 = se3.pose_to_matrix(jnp.asarray([0.0, 0, 0, 0, 0, 0]))
        T1 = se3.pose_to_matrix(jnp.asarray([2.0, 4, 6, 0, 0, 0]))
        Tm = np.asarray(se3.interpolate_transform(T0, T1, jnp.asarray(0.5)))
        np.testing.assert_allclose(Tm[:3, 3], [1, 2, 3], atol=1e-6)
