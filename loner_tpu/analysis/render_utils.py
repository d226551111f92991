"""Render output utilities: depth colormaps, image/video writers, and
smooth interpolated camera paths for fly-through videos.

Counterpart of ``analysis/render_utils.py:106-127`` (save_img / save_depth)
and the interpolated-trajectory + periodic-360 logic of
``analysis/renderer.py:330-420``. Host-side numpy/matplotlib only — no
device work happens here.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def depth_colormap(
    depth_m: np.ndarray,  # (H, W) metric depth
    min_depth: float = 1.0,
    max_depth: float = 50.0,
    cmap: str = "turbo",
) -> np.ndarray:
    """(H, W, 4) uint8 turbo-colormapped depth; pixels at/beyond max_depth
    are black (the reference's save_depth semantics)."""
    import matplotlib

    img = np.asarray(depth_m, np.float64)
    far = img >= max_depth
    x = (np.clip(img, min_depth, max_depth) - min_depth) / (max_depth - min_depth)
    colored = matplotlib.colormaps[cmap](np.clip(x, 0.0, 1.0))
    colored[far] = np.array([0.0, 0.0, 0.0, 1.0])
    return (colored * 255).astype(np.uint8)


def save_depth_png(
    depth_m: np.ndarray, path: str, min_depth: float = 1.0, max_depth: float = 50.0
) -> None:
    import imageio.v2 as imageio

    imageio.imwrite(path, depth_colormap(depth_m, min_depth, max_depth))


def save_rgb_png(img: np.ndarray, path: str) -> None:
    """img (H, W, C) float in [0,1] or uint8; C in {1, 3}."""
    import imageio.v2 as imageio

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    imageio.imwrite(path, a)


def write_video(frames: Sequence[np.ndarray], path: str, fps: float = 5.0) -> None:
    """Write (H, W, 3/4) uint8 frames as a video (mp4/gif by extension)."""
    import imageio.v2 as imageio

    frames = [np.asarray(f)[..., :3] for f in frames]
    if path.endswith(".gif"):  # pillow writer wants per-frame duration (ms)
        imageio.mimwrite(path, frames, duration=1000.0 / fps)
    else:
        imageio.mimwrite(path, frames, fps=fps)


def interpolate_camera_path(
    poses: np.ndarray,  # (N, 4, 4) key poses along the trajectory
    velocity: float = 1.0,  # fly-through speed, m/s
    fps: float = 5.0,
    spin_spacing_m: Optional[float] = 10.0,  # a 360 every this many meters
    spin_duration_s: float = 15.0,
    no_interp: bool = False,
) -> Tuple[np.ndarray, List[int]]:
    """Smooth camera path for video rendering: arc-length parameterized
    (constant ``velocity``) slerp/lerp through the key poses, with a
    periodic in-place 360-degree z-spin every ``spin_spacing_m`` meters
    (``analysis/renderer.py:330-420`` semantics). Returns
    ((M, 4, 4) poses, indices where spin frames start)."""
    from scipy.interpolate import interp1d
    from scipy.spatial.transform import Rotation, Slerp

    T = np.asarray(poses, np.float64)
    if no_interp:
        return T.copy(), []

    xyz = T[:, :3, 3]
    rots = Rotation.from_matrix(T[:, :3, :3])
    dists = np.linalg.norm(np.diff(xyz, axis=0), axis=1)
    t = np.concatenate([[0.0], np.cumsum(dists / max(velocity, 1e-9))])
    # slerp needs strictly increasing times; merge stationary key poses
    keep = np.concatenate([[True], np.diff(t) > 1e-9])
    t, xyz, rots = t[keep], xyz[keep], Rotation.from_matrix(T[keep, :3, :3])
    if len(t) < 2:
        return T.copy(), []

    slerp = Slerp(t, rots)
    lerp = interp1d(t, xyz, axis=0)
    n_frames = max(int(t[-1] * fps), 2)
    stamps = np.linspace(0.0, t[-1], n_frames)

    out: List[np.ndarray] = []
    spin_idxs: List[int] = []
    dist_since_spin = 0.0
    prev_xyz = xyz[0]
    for s in stamps:
        p = lerp(s)
        P = np.eye(4)
        P[:3, :3] = slerp(s).as_matrix()
        P[:3, 3] = p
        out.append(P)
        dist_since_spin += float(np.linalg.norm(p - prev_xyz))
        prev_xyz = p
        if spin_spacing_m and dist_since_spin > spin_spacing_m:
            spin_idxs.append(len(out))
            base = P
            for a in np.linspace(0.0, 2 * np.pi, int(spin_duration_s * fps)):
                c, si = np.cos(a), np.sin(a)
                Rz = np.array([[c, -si, 0], [si, c, 0], [0, 0, 1.0]])
                S = base.copy()
                S[:3, :3] = base[:3, :3] @ Rz
                out.append(S)
            dist_since_spin = 0.0
    return np.stack(out), spin_idxs
