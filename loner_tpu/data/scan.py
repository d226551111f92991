"""Sensor data containers as fixed-size pytrees.

Covers the reference's ``LidarScan``/``Image``/``Frame``
(``src/common/sensors.py``, ``src/common/frame.py``) with a TPU-first twist:
scans are padded to a fixed point budget and carry a validity mask, so every
downstream jitted function sees static shapes regardless of how many returns
a physical scan produced.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class LidarScan(NamedTuple):
    """One (possibly padded) lidar sweep in the sensor frame."""

    ray_directions: jnp.ndarray  # (P, 3) unit vectors
    distances: jnp.ndarray  # (P,) meters
    timestamps: jnp.ndarray  # (P,) seconds (absolute)
    valid: jnp.ndarray  # (P,) bool

    @property
    def num_points(self) -> int:
        return self.ray_directions.shape[0]

    def start_time(self) -> jnp.ndarray:
        big = jnp.float64 if self.timestamps.dtype == jnp.float64 else jnp.float32
        return jnp.min(jnp.where(self.valid, self.timestamps, jnp.asarray(np.inf, big)))

    def end_time(self) -> jnp.ndarray:
        big = jnp.float64 if self.timestamps.dtype == jnp.float64 else jnp.float32
        return jnp.max(jnp.where(self.valid, self.timestamps, jnp.asarray(-np.inf, big)))


def make_lidar_scan(
    ray_directions: np.ndarray,  # (N, 3)
    distances: np.ndarray,  # (N,)
    timestamps: np.ndarray,  # (N,)
    pad_to: Optional[int] = None,
) -> LidarScan:
    """Build a scan, padding (or truncating by uniform stride) to ``pad_to``."""
    n = ray_directions.shape[0]
    if pad_to is not None and n > pad_to:
        idx = np.linspace(0, n - 1, pad_to).astype(np.int64)
        ray_directions = ray_directions[idx]
        distances = distances[idx]
        timestamps = timestamps[idx]
        n = pad_to
    if pad_to is None:
        pad_to = n
    pad = pad_to - n
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    f = lambda a, d: np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a
    # numpy-backed on purpose: scans are host-side data until a window is
    # stacked and shipped to the device in one transfer (op-by-op device
    # work is expensive on remote-compile backends)
    return LidarScan(
        f(ray_directions.astype(np.float32), 3),
        f(distances.astype(np.float32), 1),
        f(timestamps.astype(np.float32), 1),
        valid,
    )


def sky_scan(sky_directions: np.ndarray, distance: float, timestamp: float, pad_to: Optional[int] = None) -> LidarScan:
    """Synthesize constant-range returns along sky directions (the
    reference's ``get_sky_scan``, ``src/common/sensors.py:162-167``); used to
    carve free space along rays that exited to the sky."""
    n = sky_directions.shape[0]
    return make_lidar_scan(
        sky_directions,
        np.full(n, distance, np.float32),
        np.full(n, timestamp, np.float32),
        pad_to=pad_to,
    )


class Frame(NamedTuple):
    """A lidar scan bundled with its trajectory attitude: poses at scan start
    and end (for motion compensation) in the world frame."""

    scan: LidarScan
    start_pose: jnp.ndarray  # (4,4) world_T_lidar at scan start
    end_pose: jnp.ndarray  # (4,4) world_T_lidar at scan end
    start_time: jnp.ndarray  # scalar
    end_time: jnp.ndarray  # scalar
    sky: Optional[LidarScan] = None  # synthesized sky rays, if segmented
