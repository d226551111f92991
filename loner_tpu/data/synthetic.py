"""Synthetic lidar world: analytic scenes + a virtual spinning lidar.

The reference has no test fixtures; its closest analog is the mesher's
virtual-scan generator (``analysis/mesher.py:29-50``). Here a small analytic
ray-caster (ground plane + axis-aligned boxes) provides ground-truth depths
for unit tests, convergence tests and benchmarks — no dataset download
needed. Everything is numpy (host-side data prep, like the reference's
``data_prep_on_cpu``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class Box:
    center: Tuple[float, float, float]
    size: Tuple[float, float, float]  # full extents


@dataclass
class Scene:
    """Ground plane at z=0 plus boxes; the lidar flies above the plane."""

    boxes: List[Box] = field(default_factory=list)
    ground_z: float = 0.0
    has_ground: bool = True

    @staticmethod
    def default() -> "Scene":
        """A courtyard-like scene: ground, four walls, some pillars."""
        boxes = [
            Box((20.0, 0.0, 2.5), (1.0, 40.0, 5.0)),
            Box((-20.0, 0.0, 2.5), (1.0, 40.0, 5.0)),
            Box((0.0, 20.0, 2.5), (40.0, 1.0, 5.0)),
            Box((0.0, -20.0, 2.5), (40.0, 1.0, 5.0)),
            Box((6.0, 5.0, 1.5), (1.5, 1.5, 3.0)),
            Box((-5.0, -7.0, 2.0), (2.0, 2.0, 4.0)),
            Box((-8.0, 8.0, 1.0), (3.0, 1.0, 2.0)),
            Box((4.0, -4.0, 0.75), (1.0, 1.0, 1.5)),
        ]
        return Scene(boxes=boxes)

    @staticmethod
    def forest(seed: int = 0, extent: float = 40.0, n_trees: int = 60) -> "Scene":
        """Scattered thin vertical boxes, forest-like (Haveri analog)."""
        rng = np.random.default_rng(seed)
        boxes = []
        for _ in range(n_trees):
            x, y = rng.uniform(-extent, extent, 2)
            if abs(x) < 3 and abs(y) < 3:
                continue
            r = rng.uniform(0.2, 0.6)
            h = rng.uniform(6.0, 14.0)
            boxes.append(Box((x, y, h / 2), (2 * r, 2 * r, h)))
        return Scene(boxes=boxes)


def ray_cast(
    scene: Scene,
    origins: np.ndarray,  # (N, 3)
    directions: np.ndarray,  # (N, 3) unit
    max_range: float = 1e9,
) -> np.ndarray:
    """Distance to the first hit per ray; +inf where nothing is hit (sky)."""
    n = origins.shape[0]
    t_best = np.full(n, np.inf)

    if scene.has_ground:
        dz = directions[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_g = (scene.ground_z - origins[:, 2]) / dz
        hit = (dz < -1e-9) & (t_g > 0)
        t_best = np.where(hit, np.minimum(t_best, t_g), t_best)

    for box in scene.boxes:
        lo = np.asarray(box.center) - np.asarray(box.size) / 2
        hi = np.asarray(box.center) + np.asarray(box.size) / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - origins) / directions
            t2 = (hi - origins) / directions
        t_near = np.nanmax(np.minimum(t1, t2), axis=1)
        t_far = np.nanmin(np.maximum(t1, t2), axis=1)
        hit = (t_near <= t_far) & (t_far > 0) & (t_near > 1e-6)
        t_best = np.where(hit, np.minimum(t_best, t_near), t_best)

    t_best = np.where(t_best > max_range, np.inf, t_best)
    return t_best


def spinning_lidar_directions(
    n_channels: int = 32,
    n_azimuth: int = 512,
    vfov_deg: Tuple[float, float] = (-22.5, 22.5),
) -> np.ndarray:
    """(n_channels * n_azimuth, 3) unit directions of a spinning lidar,
    azimuth-major so timestamps increase along the sweep."""
    elev = np.deg2rad(np.linspace(vfov_deg[0], vfov_deg[1], n_channels))
    azim = np.linspace(0, 2 * np.pi, n_azimuth, endpoint=False)
    az, el = np.meshgrid(azim, elev, indexing="ij")  # (A, C)
    d = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    )
    return d.reshape(-1, 3)


def simulate_scan(
    scene: Scene,
    pose: np.ndarray,  # (4,4) world_T_lidar
    t0: float,
    scan_period: float = 0.1,
    n_channels: int = 32,
    n_azimuth: int = 512,
    max_range: float = 60.0,
    vfov_deg: Tuple[float, float] = (-22.5, 22.5),
    rng: Optional[np.random.Generator] = None,
    noise_std: float = 0.0,
):
    """Simulate one sweep from a static pose.

    Returns (directions (N,3) sensor frame, distances (N,), timestamps (N,),
    hit_mask (N,)): misses keep their direction with distance +inf so callers
    can turn them into sky rays.
    """
    dirs_sensor = spinning_lidar_directions(n_channels, n_azimuth, vfov_deg)
    n = dirs_sensor.shape[0]
    dirs_world = dirs_sensor @ pose[:3, :3].T
    origins = np.broadcast_to(pose[:3, 3], (n, 3))

    dist = ray_cast(scene, origins, dirs_world, max_range)
    hit = np.isfinite(dist)
    if noise_std > 0 and rng is not None:
        dist = np.where(hit, dist + rng.normal(0, noise_std, n), dist)

    # azimuth-major layout: timestamp per azimuth column
    ts = t0 + np.repeat(np.linspace(0, scan_period, n_azimuth, endpoint=False), n_channels)
    return dirs_sensor.astype(np.float32), dist.astype(np.float32), ts.astype(np.float32), hit


def circular_trajectory(
    n_poses: int = 40,
    radius: float = 8.0,
    z: float = 1.5,
    period: float = 20.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(N,4,4) poses moving on a circle, yaw tangent to it, plus timestamps."""
    ts = np.linspace(0, period, n_poses, endpoint=False)
    theta = 2 * np.pi * ts / period
    poses = np.tile(np.eye(4), (n_poses, 1, 1))
    for i, th in enumerate(theta):
        yaw = th + np.pi / 2
        c, s = np.cos(yaw), np.sin(yaw)
        poses[i, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        poses[i, :3, 3] = [radius * np.cos(th), radius * np.sin(th), z]
    return poses, ts


def world_intensity(pts: np.ndarray) -> np.ndarray:
    """Synthetic reflectivity texture: smooth function of world position —
    gives the camera/intensity path a learnable groundtruth."""
    return 0.5 + 0.25 * np.sin(0.8 * pts[:, 0]) + 0.25 * np.cos(0.8 * pts[:, 1])


def render_intensity_image(
    scene: Scene,
    pose: np.ndarray,  # (4,4) world_T_camera
    K: np.ndarray,  # (3,3)
    h: int,
    w: int,
    max_range: float = 40.0,
):
    """Ray-cast groundtruth intensity image. Returns (img (H,W,1) float32 in
    [0,1], hit mask (H,W))."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5, np.ones(h * w)], axis=-1)
    dirs_cam = pix @ np.linalg.inv(K).T
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_world = dirs_cam @ pose[:3, :3].T
    origins = np.broadcast_to(pose[:3, 3], (h * w, 3)).copy()
    dist = ray_cast(scene, origins, dirs_world, max_range)
    hit = np.isfinite(dist)
    pts = origins + dirs_world * np.where(hit, dist, max_range)[:, None]
    img = np.where(hit, world_intensity(pts), 0.0).reshape(h, w, 1)
    return np.clip(img, 0.0, 1.0).astype(np.float32), hit.reshape(h, w)
