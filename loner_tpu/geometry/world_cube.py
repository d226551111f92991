"""World-cube normalization.

The implicit field lives in the unit cube [-1, 1]^3. A ``WorldCube`` carries
the isotropic scale and shift that map metric world coordinates into it:
``p_cube = (p_world + shift) / scale_factor``.

Semantics match the reference's ``WorldCube``/``compute_world_cube``
(``src/common/pose_utils.py:23-314``): gather sensor positions plus per-pose
view-volume corners (camera frustums or a +-max_range lidar cube), take the
axis-aligned bounding box, center it, and set
``scale = ||max-min|| / (2*sqrt(3)) * (1+padding)``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class WorldCube(NamedTuple):
    scale_factor: jnp.ndarray  # scalar
    shift: jnp.ndarray  # (3,)

    def to_cube(self, pts: jnp.ndarray) -> jnp.ndarray:
        return (pts + self.shift) / self.scale_factor

    def from_cube(self, pts: jnp.ndarray) -> jnp.ndarray:
        return pts * self.scale_factor - self.shift

    def as_dict(self) -> dict:
        return {
            "scale_factor": float(np.asarray(self.scale_factor)),
            "shift": np.asarray(self.shift).tolist(),
        }

    @staticmethod
    def from_dict(d: dict) -> "WorldCube":
        return WorldCube(
            jnp.asarray(d["scale_factor"], dtype=jnp.float32),
            jnp.asarray(d["shift"], dtype=jnp.float32),
        )


def _lidar_view_corners(max_depth: float) -> np.ndarray:
    m = float(max_depth)
    corners = []
    for x in (-m, m):
        for y in (-m, m):
            for z in (-m, m):
                corners.append([x, y, z])
    return np.array(corners, dtype=np.float64)


def _camera_frustum_corners(K: np.ndarray, h: float, w: float, min_depth: float, max_depth: float) -> np.ndarray:
    """Corners of the camera view frustum in camera coords (8, 3)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    pix = np.array([[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]])
    dirs = np.stack(
        [(pix[:, 0] - cx) / fx, (pix[:, 1] - cy) / fy, np.ones(4)], axis=-1
    )
    return np.concatenate([dirs * min_depth, dirs * max_depth], axis=0)


def compute_world_cube(
    lidar_poses: Optional[np.ndarray],
    ray_range: Tuple[float, float],
    padding: float = 0.1,
    traj_bounding_box: Optional[dict] = None,
    camera_to_lidar: Optional[np.ndarray] = None,
    intrinsic: Optional[np.ndarray] = None,
    image_size: Optional[Tuple[float, float]] = None,
    rebase_to_first_pose: bool = True,
) -> WorldCube:
    """Compute a world cube from GT poses or a trajectory bounding box.

    lidar_poses: (N, 4, 4) float array of world_T_lidar, or None to use
    ``traj_bounding_box`` = {"x": [lo,hi], "y": ..., "z": ...} (padded by the
    lidar view volume exactly like GT poses are).
    ``rebase_to_first_pose`` mirrors the reference's
    ``lidar_poses @ inv(lidar_poses[0])`` (disabled in submap mode).
    """
    assert 0 <= padding < 1
    assert lidar_poses is not None or traj_bounding_box is not None

    if lidar_poses is None:
        xs = traj_bounding_box["x"]
        ys = traj_bounding_box["y"]
        zs = traj_bounding_box["z"]
        combos = np.array(
            [[x, y, z] for x in xs for y in ys for z in zs], dtype=np.float64
        )
        lidar_poses = np.tile(np.eye(4), (8, 1, 1))
        lidar_poses[:, :3, 3] = combos
    else:
        lidar_poses = np.asarray(lidar_poses, dtype=np.float64)
        if rebase_to_first_pose:
            lidar_poses = lidar_poses @ np.linalg.inv(lidar_poses[0])

    all_corners = []
    all_positions = [lidar_poses[:, :3, 3]]

    if camera_to_lidar is not None and intrinsic is not None and image_size is not None:
        camera_poses = lidar_poses @ np.linalg.inv(np.asarray(camera_to_lidar, dtype=np.float64))
        corners_cam = _camera_frustum_corners(
            np.asarray(intrinsic, dtype=np.float64),
            image_size[0],
            image_size[1],
            ray_range[0],
            ray_range[1],
        )
        corners_h = np.concatenate([corners_cam, np.ones((8, 1))], axis=-1)
        for c2w in camera_poses:
            all_corners.append((c2w[:3, :] @ corners_h.T).T)
        all_positions.append(camera_poses[:, :3, 3])
    else:
        corners = _lidar_view_corners(ray_range[1])
        corners_h = np.concatenate([corners, np.ones((8, 1))], axis=-1)
        for p in lidar_poses:
            all_corners.append((p[:3, :] @ corners_h.T).T)

    all_points = np.concatenate(all_corners + all_positions, axis=0)
    min_coord = all_points.min(axis=0)
    max_coord = all_points.max(axis=0)
    origin = min_coord + (max_coord - min_coord) / 2
    scale_factor = np.linalg.norm(max_coord - min_coord) / (2 * np.sqrt(3.0)) * (1 + padding)

    return WorldCube(
        jnp.asarray(scale_factor, dtype=jnp.float32),
        jnp.asarray(-origin, dtype=jnp.float32),
    )
