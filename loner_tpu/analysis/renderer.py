"""Offline renderers: camera images and virtual lidar scans from a trained
map.

Covers ``analysis/renderer.py`` (chunked full-image depth/intensity render
per pose, peak-depth-consistency) and ``analysis/renderer_lidar.py``
(virtual spinning-lidar depth render, variance-thresholded point drop,
global cloud assembly). TPU-first: fixed-size ray chunks through one jitted
render function.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.data import synthetic
from loner_tpu.geometry.rays import build_camera_rays, build_lidar_rays, camera_ray_directions
from loner_tpu.mapping.optimizer import MapperConfig, make_render_fn


def _render_chunked(
    cfg,
    cube,
    state,
    dirs,
    pose,
    build_fn,
    chunk: int = 16384,
    key=None,
    rgb: bool = False,
    render_strategy: str = "default",
    peak_consistency: bool = False,
):
    """Render arbitrary direction sets in fixed-size chunks (pads the tail).
    Returns dict of np arrays [depth, variance, opacity(, rgb)
    (, peak_depth)]."""
    render_fn = make_render_fn(
        cfg, test=True, sigma_only=not rgb, render_strategy=render_strategy
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    n = dirs.shape[0]
    out = {"depth": [], "variance": [], "opacity": []}
    if rgb:
        out["rgb"] = []
    if peak_consistency:
        out["peak_depth"] = []
    pose_j = jnp.asarray(pose, jnp.float32)
    for s in range(0, n, chunk):
        d = dirs[s : s + chunk]
        pad = chunk - d.shape[0]
        if pad:
            d = np.concatenate([d, np.tile(d[-1:], (pad, 1))])
        bundle = build_fn(jnp.asarray(d, jnp.float32), pose_j)
        key, sub = jax.random.split(key)
        r = render_fn(state.params, state.occ_grid, bundle, sub)
        sl = slice(0, chunk - pad)
        out["depth"].append(np.asarray(r.depth)[sl])
        out["variance"].append(np.asarray(r.variance)[sl])
        out["opacity"].append(np.asarray(r.opacity)[sl])
        if rgb:
            out["rgb"].append(np.asarray(r.rgb)[sl])
        if peak_consistency:
            # |z at the argmax weight - expected depth|: large where the
            # weight distribution is multi-modal / diffuse (reference
            # peak_depth_consistency, analysis/renderer.py:181-216)
            w = np.asarray(r.weights)
            z = np.asarray(r.z_vals)
            z_peak = z[np.arange(z.shape[0]), np.argmax(w, axis=1)]
            out["peak_depth"].append(np.abs(z_peak - np.asarray(r.depth))[sl])
    return {k: np.concatenate(v) for k, v in out.items()}


def render_lidar_scan(
    cfg: MapperConfig,
    cube,
    state,
    pose: np.ndarray,  # (4,4) metric world_T_lidar
    n_channels: int = 32,
    n_azimuth: int = 512,
    vfov_deg: Tuple[float, float] = (-22.5, 22.5),
    var_threshold: Optional[float] = 1e-2,
    chunk: int = 16384,
) -> Dict[str, np.ndarray]:
    """Virtual spinning-lidar depth render at a pose. Returns metric depths,
    variance-filtered world points, and the validity mask
    (``analysis/renderer_lidar.py:39-93`` semantics)."""
    dirs = synthetic.spinning_lidar_directions(n_channels, n_azimuth, vfov_deg)

    def build(d, p):
        return build_lidar_rays(d, jnp.zeros(d.shape[0]), p, cube, cfg.ray_range)

    out = _render_chunked(cfg, cube, state, dirs, pose, build, chunk)
    scale = cfg.world_scale
    depth_m = out["depth"] * scale
    keep = np.ones(len(dirs), bool)
    if var_threshold is not None:
        keep &= out["variance"] * scale * scale < var_threshold * scale * scale
    # drop rays that never terminated inside the range
    keep &= depth_m < cfg.ray_range[1] * 0.99
    dirs_world = dirs @ np.asarray(pose)[:3, :3].T
    points = np.asarray(pose)[:3, 3] + dirs_world * depth_m[:, None]
    return {
        "depth": depth_m,
        "variance": out["variance"] * scale * scale,
        "points": points[keep],
        "keep": keep,
        "directions": dirs,
    }


def render_camera_image(
    cfg: MapperConfig,
    cube,
    state,
    pose: np.ndarray,  # (4,4) metric world_T_camera
    K: np.ndarray,  # (3,3) intrinsics
    height: int,
    width: int,
    chunk: int = 16384,
    rgb: bool = True,
    distortion: Optional[np.ndarray] = None,
    render_strategy: str = "default",
    peak_consistency: bool = False,
) -> Dict[str, np.ndarray]:
    """Full-image depth + intensity render (``analysis/renderer.py:181-216``
    renders rgb + depth + peak-depth-consistency). ``distortion`` (plumb-bob
    coeffs) makes the rays follow the real (distorted) pixel grid like the
    reference's kornia-undistorted ``CameraRayDirections``.
    ``peak_consistency`` adds the |argmax-weight depth - expected depth| map
    (metric), a per-pixel multi-modality diagnostic."""
    if distortion is not None and np.any(distortion):
        from loner_tpu.data.calibration import CameraCalibration, undistorted_pixel_rays

        dirs = undistorted_pixel_rays(
            CameraCalibration(
                K=np.asarray(K, float),
                distortion=np.asarray(distortion, float),
                width=width,
                height=height,
            )
        )
    else:
        dirs = np.asarray(
            camera_ray_directions(height, width, jnp.asarray(K, jnp.float32))
        )

    def build(d, p):
        return build_camera_rays(d, p, cube, cfg.ray_range)

    out = _render_chunked(
        cfg, cube, state, dirs, pose, build, chunk, rgb=rgb,
        render_strategy=render_strategy, peak_consistency=peak_consistency,
    )
    scale = cfg.world_scale
    result = {
        "depth": (out["depth"] * scale).reshape(height, width),
        "variance": (out["variance"] * scale * scale).reshape(height, width),
        "opacity": out["opacity"].reshape(height, width),
    }
    if rgb:
        result["rgb"] = np.clip(out["rgb"].reshape(height, width, -1), 0.0, 1.0)
    if peak_consistency:
        result["peak_depth"] = (out["peak_depth"] * scale).reshape(height, width)
    return result


def assemble_global_cloud(
    cfg: MapperConfig,
    cube,
    state,
    poses: np.ndarray,  # (N,4,4)
    skip_step: int = 1,
    voxel_size: float = 0.1,
    **scan_kwargs,
) -> np.ndarray:
    """Render virtual scans along keyframe poses and voxel-downsample the
    merged cloud (``analysis/renderer_lidar.py`` global-map mode)."""
    clouds = []
    for pose in poses[::skip_step]:
        clouds.append(render_lidar_scan(cfg, cube, state, pose, **scan_kwargs)["points"])
    pts = np.concatenate(clouds, axis=0)
    return voxel_downsample(pts, voxel_size)


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Average points per voxel (open3d voxel_down_sample role)."""
    if len(points) == 0:
        return points
    keys = np.floor(points / voxel_size).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((counts.shape[0], 3))
    np.add.at(sums, inv, points)
    return sums / counts[:, None]
