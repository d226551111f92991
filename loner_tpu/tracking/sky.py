"""Sky-ray extraction from lidar scans via spherical-projection morphology.

Covers the reference tracker's sky segmentation
(``src/tracking/tracker.py:257-296``): project the sweep into an
azimuth x elevation occupancy image, morphologically clean it, and emit
synthetic "sky" directions for empty upper-hemisphere cells — these become
transparent supervision rays that carve free space above the scene
(keyframe sky rays at range far+1).

Host-side numpy/cv2 (data prep), like the rest of the scan front-end.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def spherical_projection(
    directions: np.ndarray,  # (N, 3) unit dirs, sensor frame
    valid: np.ndarray,  # (N,)
    n_azimuth: int = 256,
    n_elevation: int = 64,
    elevation_range: Tuple[float, float] = (-np.pi / 6, np.pi / 2),
) -> np.ndarray:
    """Binary occupancy image (n_elevation, n_azimuth): True where a return
    landed in the cell. Row 0 = highest elevation."""
    d = directions[valid]
    az = np.arctan2(d[:, 1], d[:, 0])  # [-pi, pi]
    el = np.arcsin(np.clip(d[:, 2], -1, 1))
    lo, hi = elevation_range
    col = ((az + np.pi) / (2 * np.pi) * n_azimuth).astype(np.int64) % n_azimuth
    row_f = (hi - el) / (hi - lo) * n_elevation
    row = np.clip(row_f.astype(np.int64), 0, n_elevation - 1)
    inside = (el >= lo) & (el <= hi)
    img = np.zeros((n_elevation, n_azimuth), bool)
    img[row[inside], col[inside]] = True
    return img


def extract_sky_directions(
    directions: np.ndarray,
    valid: np.ndarray,
    n_azimuth: int = 256,
    n_elevation: int = 64,
    elevation_range: Tuple[float, float] = (-np.pi / 6, np.pi / 2),
    min_elevation_deg: float = 5.0,
    closing_kernel: int = 3,
    max_rays: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Directions (M, 3) of sky cells: empty cells above ``min_elevation``
    after a morphological closing of the occupancy image (filling small
    no-return speckles so only genuine sky holes survive)."""
    occ = spherical_projection(directions, valid, n_azimuth, n_elevation, elevation_range)

    if _HAS_CV2 and closing_kernel > 1:
        kernel = np.ones((closing_kernel, closing_kernel), np.uint8)
        occ = cv2.morphologyEx(occ.astype(np.uint8), cv2.MORPH_CLOSE, kernel).astype(bool)

    lo, hi = elevation_range
    rows = np.arange(n_elevation)
    cell_el = hi - (rows + 0.5) / n_elevation * (hi - lo)  # (R,)
    sky_rows = cell_el > np.deg2rad(min_elevation_deg)

    empty = ~occ & sky_rows[:, None]
    rr, cc = np.nonzero(empty)
    if len(rr) == 0:
        return np.zeros((0, 3), np.float32)

    el = hi - (rr + 0.5) / n_elevation * (hi - lo)
    az = (cc + 0.5) / n_azimuth * 2 * np.pi - np.pi
    dirs = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    ).astype(np.float32)

    if max_rays is not None and len(dirs) > max_rays:
        rng = rng or np.random.default_rng(0)
        dirs = dirs[rng.choice(len(dirs), max_rays, replace=False)]
    return dirs
