"""Per-point motion compensation of spinning-lidar scans.

Replicates the semantics of ``LidarScan.motion_compensate``
(``src/common/sensors.py:176-231``): each point's capture-time pose is
interpolated between a start and end pose (lerp translation, slerp of the
relative rotation), the point is lifted into the world frame at that pose and
re-projected into a single target frame; ranges/directions are recomputed.

TPU-first: one fused jittable function over fixed-size point arrays.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from loner_tpu.geometry import se3


def interpolate_poses(
    T0: jnp.ndarray,  # (4,4)
    T1: jnp.ndarray,  # (4,4)
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    timestamps: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """Pose for each timestamp: lerp translation + slerp rotation. (N,4,4)."""
    alpha = (timestamps - t0) / (t1 - t0)
    R0, R1 = T0[:3, :3], T1[:3, :3]
    rel_w = se3.log_so3(R0.T @ R1)  # (3,)
    R = R0 @ se3.exp_so3(rel_w[None, :] * alpha[:, None])  # (N,3,3)
    trans = T0[:3, 3] + (T1[:3, 3] - T0[:3, 3]) * alpha[:, None]  # (N,3)
    top = jnp.concatenate([R, trans[:, :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T0.dtype), (alpha.shape[0], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def motion_compensate(
    ray_directions: jnp.ndarray,  # (N, 3) unit dirs in sensor frame
    distances: jnp.ndarray,  # (N,)
    timestamps: jnp.ndarray,  # (N,)
    start_pose: jnp.ndarray,  # (4,4) world_T_lidar at scan start
    end_pose: jnp.ndarray,  # (4,4) world_T_lidar at scan end
    start_time: jnp.ndarray,
    end_time: jnp.ndarray,
    target_pose: jnp.ndarray,  # (4,4) frame to compensate into
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (new_ray_directions (N,3), new_distances (N,))."""
    T_world_point = interpolate_poses(start_pose, end_pose, start_time, end_time, timestamps)
    T_target = se3.inverse(target_pose)  # (4,4)
    T = T_target @ T_world_point  # (N,4,4)

    pts = ray_directions * distances[:, None]  # (N,3) sensor frame
    pts_comp = (T[:, :3, :3] @ pts[:, :, None])[:, :, 0] + T[:, :3, 3]

    new_dist = jnp.linalg.norm(pts_comp, axis=-1)
    new_dirs = pts_comp / (new_dist[:, None] + 1e-12)
    return new_dirs, new_dist
