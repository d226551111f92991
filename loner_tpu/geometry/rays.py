"""Ray construction for lidar and camera sensors, in world-cube coordinates.

Semantics follow the reference ray builder
(``src/common/ray_utils.py:31-60`` get_far_val and ``:269-322``
build_lidar_rays), with one TPU-first change: instead of dropping rays that
exit the cube too early (a dynamic-shape operation), rays carry a ``valid``
mask and every downstream reduction is mask-aware. Batches keep static shapes.

Ray bundles are structured pytrees rather than packed 11-float rows; use
``pack``/``unpack`` for interchange with the reference's packed layout
``[origin(3), dir(3), viewdir(3), pad(2), near, far]`` (13 floats).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


def _safe_norm(v: jnp.ndarray) -> jnp.ndarray:
    """Norm along the last axis, keepdims, with a zero-safe gradient."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-20)


class RayBundle(NamedTuple):
    origins: jnp.ndarray  # (N, 3) in cube coords
    directions: jnp.ndarray  # (N, 3) unit, world frame
    viewdirs: jnp.ndarray  # (N, 3) = -directions for lidar
    near: jnp.ndarray  # (N,)
    far: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) bool — ray has >= 1 m inside the cube
    depth: jnp.ndarray  # (N,) measured range in cube units (0 when absent)

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]

    def pack(self) -> jnp.ndarray:
        """Pack into the reference's 13-float row layout (N, 13)."""
        pad = jnp.zeros_like(self.origins[:, :2])
        return jnp.concatenate(
            [
                self.origins,
                self.directions,
                self.viewdirs,
                pad,
                self.near[:, None],
                self.far[:, None],
            ],
            axis=-1,
        )


def unpack(rays: jnp.ndarray, valid=None, depth=None) -> RayBundle:
    n = rays.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    if depth is None:
        depth = jnp.zeros((n,), dtype=rays.dtype)
    return RayBundle(
        origins=rays[:, 0:3],
        directions=rays[:, 3:6],
        viewdirs=rays[:, 6:9],
        near=rays[:, -2],
        far=rays[:, -1],
        valid=valid,
        depth=depth,
    )


def far_cube_exit(origins: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Distance along each ray to the exit of the [-1,1]^3 cube.

    Vectorized slab test matching ``get_far_val``
    (``src/common/ray_utils.py:31-60``): for each axis take the larger of the
    two (clamped-positive) plane-hit distances, then the min over axes.
    Origins are assumed inside the cube. Shape (N,).
    """
    d = directions + 1e-15  # no_nan guard, same constant as the reference
    t_lo = (-1.0 - origins) / d  # (N, 3)
    t_hi = (1.0 - origins) / d
    t_max_per_axis = jnp.maximum(jnp.clip(t_lo, 0.0), jnp.clip(t_hi, 0.0))
    return jnp.min(t_max_per_axis, axis=-1)


def build_lidar_rays(
    directions_sensor: jnp.ndarray,  # (N, 3) unit ray dirs in sensor frame
    distances: jnp.ndarray,  # (N,) measured ranges, meters
    lidar_pose: jnp.ndarray,  # (4, 4) world_T_lidar, metric
    world_cube,
    ray_range: Tuple[float, float],
    point_valid: jnp.ndarray = None,  # (N,) bool mask for padded points
) -> RayBundle:
    """Build world-cube rays for one scan at one (differentiable) pose.

    Gradients flow to ``lidar_pose`` exactly as in the reference
    (``src/common/ray_utils.py:269-322``): the origin is shifted+scaled into
    the cube and the directions rotated by the pose rotation, then
    re-normalized. Rays with less than 1 m inside the cube are masked invalid
    rather than dropped.
    """
    n = directions_sensor.shape[0]
    scale = world_cube.scale_factor

    depths = distances / scale

    origin = (lidar_pose[:3, 3] + world_cube.shift) / scale
    origins = jnp.broadcast_to(origin, (n, 3))

    rot = lidar_pose[:3, :3]
    dirs_world = directions_sensor @ rot.T
    # eps-safe norm: padded points carry zero directions; a bare norm would
    # emit NaN *gradients* there and poison the whole batch via the finite
    # guard, even though such rays are masked out of the loss.
    dirs_world = dirs_world / _safe_norm(dirs_world)
    viewdirs = -dirs_world

    near = jnp.full((n,), ray_range[0] / scale, dtype=origins.dtype)
    far_range = jnp.full((n,), ray_range[1] / scale, dtype=origins.dtype)
    far = jnp.minimum(far_range, far_cube_exit(origins, dirs_world))

    valid = far > (near + 1.0 / scale)
    if point_valid is not None:
        valid = jnp.logical_and(valid, point_valid)

    return RayBundle(origins, dirs_world, viewdirs, near, far, valid, depths)


def build_camera_rays(
    directions_cam: jnp.ndarray,  # (N, 3) pixel ray dirs in camera frame
    camera_pose: jnp.ndarray,  # (4, 4) world_T_camera, metric
    world_cube,
    ray_range: Tuple[float, float],
) -> RayBundle:
    """Camera rays (viewdirs = +normalized direction, like the reference's
    camera variant ``src/common/ray_utils.py:128-225``)."""
    n = directions_cam.shape[0]
    scale = world_cube.scale_factor

    origin = (camera_pose[:3, 3] + world_cube.shift) / scale
    origins = jnp.broadcast_to(origin, (n, 3))

    rot = camera_pose[:3, :3]
    dirs_world = directions_cam @ rot.T
    dirs_world = dirs_world / _safe_norm(dirs_world)

    near = jnp.full((n,), ray_range[0] / scale, dtype=origins.dtype)
    far_range = jnp.full((n,), ray_range[1] / scale, dtype=origins.dtype)
    far = jnp.minimum(far_range, far_cube_exit(origins, dirs_world))
    valid = far > (near + 1.0 / scale)

    return RayBundle(
        origins, dirs_world, dirs_world, near, far, valid, jnp.zeros((n,), origins.dtype)
    )


def camera_ray_directions(h: int, w: int, K: jnp.ndarray) -> jnp.ndarray:
    """Pinhole pixel ray directions, (H*W, 3), row-major over (y, x).

    Matches the reference's undistorted branch of ``get_ray_directions``
    (``src/common/ray_utils.py:81-124``); distortion should be undone on the
    host before this point.
    """
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    dirs = jnp.stack(
        [
            (grid_x.reshape(-1) - K[0, 2]) / K[0, 0],
            (grid_y.reshape(-1) - K[1, 2]) / K[1, 1],
            jnp.ones(h * w, dtype=jnp.float32),
        ],
        axis=-1,
    )
    return dirs
