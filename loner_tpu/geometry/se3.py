"""so(3)/se(3) operations on plain arrays.

Poses are 6-vectors ``[tx, ty, tz, rx, ry, rz]`` (translation + axis-angle),
the same parameterization the reference optimizes through
(``src/common/pose_utils.py:321-368`` transform_to_tensor/tensor_to_transform),
or 4x4 homogeneous matrices. Everything here is pure jnp, differentiable and
batch-friendly (leading batch dims broadcast).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector. Batched over leading dims."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (...,3) -> rotation matrix (...,3,3) via Rodrigues.

    Uses the Taylor-safe formulation so it is differentiable at the identity.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS**2)
    # sin(t)/t and (1-cos(t))/t^2 with series fallback near 0
    small = theta_sq < 1e-8
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / (theta_sq + _EPS**2))
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> axis-angle (...,3).

    Safe at identity; near theta=pi uses the diagonal-based axis extraction.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # Generic case: w = theta / (2 sin(theta)) * vee; near 0: 0.5 * vee.
    generic_scale = jnp.where(
        jnp.abs(sin_theta) < 1e-6,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * sin_theta + _EPS * jnp.sign(sin_theta + _EPS)),
    )
    w_generic = generic_scale[..., None] * vee

    # Near pi the antisymmetric part vanishes (vee ~ 2 sin(theta) * axis), so
    # recover the axis from the symmetric part: (R + R^T)/2 = cI + (1-c) aa^T.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip(
        (diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None
    )
    axis_abs = jnp.sqrt(axis_sq)
    # Relative signs from the symmetric off-diagonals: R_ij + R_ji = 2(1-c) a_i a_j.
    sym_xy = R[..., 0, 1] + R[..., 1, 0]
    sym_xz = R[..., 0, 2] + R[..., 2, 0]
    sym_yz = R[..., 1, 2] + R[..., 2, 1]
    k = jnp.argmax(axis_abs, axis=-1)  # anchor: largest-magnitude component
    sgn = lambda v: jnp.where(v >= 0, 1.0, -1.0)
    # Signs when anchoring each candidate axis component as positive.
    signs_k0 = jnp.stack([jnp.ones_like(sym_xy), sgn(sym_xy), sgn(sym_xz)], axis=-1)
    signs_k1 = jnp.stack([sgn(sym_xy), jnp.ones_like(sym_xy), sgn(sym_yz)], axis=-1)
    signs_k2 = jnp.stack([sgn(sym_xz), sgn(sym_yz), jnp.ones_like(sym_xy)], axis=-1)
    signs = jnp.where(
        (k == 0)[..., None], signs_k0, jnp.where((k == 1)[..., None], signs_k1, signs_k2)
    )
    axis = axis_abs * signs
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    # Overall sign: align with the (small but directional) antisymmetric part.
    flip = jnp.sum(axis * vee, axis=-1)
    axis = axis * jnp.where(flip < 0, -1.0, 1.0)[..., None]
    w_pi = theta[..., None] * axis

    near_pi = (jnp.pi - theta) < 1e-2
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def pose_to_matrix(p: jnp.ndarray) -> jnp.ndarray:
    """6-vector [t, w] (...,6) -> homogeneous matrix (...,4,4)."""
    R = exp_so3(p[..., 3:6])
    t = p[..., 0:3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous matrix (...,4,4) -> 6-vector (...,6)."""
    return jnp.concatenate([T[..., :3, 3], log_so3(T[..., :3, :3])], axis=-1)


def compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    return Ta @ Tb


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -(Rt @ t[..., :, None])[..., 0]
    top = jnp.concatenate([Rt, t_inv[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (...,4,4) transform to (...,N,3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [x,y,z,w] (...,4) -> rotation matrix (...,3,3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> quaternion [x,y,z,w] (...,4).

    Branch-free Shepperd-style extraction (safe for any rotation).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidate magnitudes (4q_i^2 = 1 + 2 m_ii - trace style identities).
    tr = m00 + m11 + m22
    qw_sq = jnp.maximum(0.0, 1.0 + tr) / 4.0
    qx_sq = jnp.maximum(0.0, 1.0 + m00 - m11 - m22) / 4.0
    qy_sq = jnp.maximum(0.0, 1.0 - m00 + m11 - m22) / 4.0
    qz_sq = jnp.maximum(0.0, 1.0 - m00 - m11 + m22) / 4.0

    qw = jnp.sqrt(qw_sq + _EPS)
    # Signs relative to w from antisymmetric parts.
    qx = (m21 - m12) / (4.0 * qw)
    qy = (m02 - m20) / (4.0 * qw)
    qz = (m10 - m01) / (4.0 * qw)
    q_w_branch = jnp.stack([qx, qy, qz, qw], axis=-1)

    # w-near-zero branch (theta ~ pi): use largest diagonal element branch.
    qx2 = jnp.sqrt(qx_sq + _EPS)
    q_x_branch = jnp.stack(
        [qx2, (m01 + m10) / (4 * qx2), (m02 + m20) / (4 * qx2), (m21 - m12) / (4 * qx2)], axis=-1
    )
    qy2 = jnp.sqrt(qy_sq + _EPS)
    q_y_branch = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)], axis=-1
    )
    qz2 = jnp.sqrt(qz_sq + _EPS)
    q_z_branch = jnp.stack(
        [(m02 + m20) / (4 * qz2), (m12 + m21) / (4 * qz2), qz2, (m10 - m01) / (4 * qz2)], axis=-1
    )

    # Pick the numerically best branch.
    mags = jnp.stack([qx_sq, qy_sq, qz_sq, qw_sq], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.where(
        (best == 3)[..., None],
        q_w_branch,
        jnp.where(
            (best == 0)[..., None],
            q_x_branch,
            jnp.where((best == 1)[..., None], q_y_branch, q_z_branch),
        ),
    )
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def slerp_rotation(R0: jnp.ndarray, R1: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Geodesic interpolation between rotations; alpha broadcastable (...,)."""
    rel = jnp.swapaxes(R0, -1, -2) @ R1
    w = log_so3(rel)
    return R0 @ exp_so3(w * alpha[..., None])


def interpolate_transform(T0: jnp.ndarray, T1: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Lerp translation + slerp rotation, as the reference's motion
    compensation does (``src/common/sensors.py:176-231``).

    alpha has shape (...,) broadcastable against batch dims of T0/T1.
    """
    t = T0[..., :3, 3] + (T1[..., :3, 3] - T0[..., :3, 3]) * alpha[..., None]
    R = slerp_rotation(T0[..., :3, :3], T1[..., :3, :3], alpha)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T0.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)
