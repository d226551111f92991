"""Keyframes: host-side bookkeeping + stacked device windows.

Covers the reference's ``KeyFrame`` (``src/mapping/keyframe.py``): a frame
pinned on device with its tracked pose at creation time, an optimizable pose
slot, and fixed-count ray sampling from its scan (lidar + synthesized sky
rays at range far+1 with a detached pose).

TPU-first: the optimizable pose lives in one global (K, 6) array inside the
mapper state (keyframes reference it by index), and an active window is a
stacked pytree of W keyframes' point arrays so the whole window feeds one
jitted step.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from loner_tpu.data.scan import LidarScan
from loner_tpu.geometry import se3


@dataclass
class KeyFrame:
    """Host-side keyframe record."""

    scan: LidarScan
    timestamp: float
    pose_index: int  # row in the mapper's (K, 6) pose array
    tracked_pose: np.ndarray  # (4,4) tracker output at creation (fixed)
    gt_pose: Optional[np.ndarray] = None  # (4,4) groundtruth, if known
    sky: Optional[LidarScan] = None
    is_anchored: bool = False  # first KF anchors the world frame
    # online camera mode (reference keyframe.py:108-128): the image matched
    # to this keyframe's scan by FrameSynthesis, attached (possibly late —
    # the match resolves when the image arrives) by OnlineMapper.attach_image
    image: Optional[np.ndarray] = None  # (H, W, C) float32 in [0, 1]
    image_timestamp: Optional[float] = None
    # dynamic-object mask for the image (True = trainable/static pixel;
    # data/dynamic_mask.py sources) — consumed by the online camera phase
    image_mask: Optional[np.ndarray] = None  # (H, W) bool
    # MASK ray-selection support (FDT trunk-band sampling,
    # src/mapping/optimizer.py:367-379): indices of scan points whose WORLD
    # z lies in the trunk band, cyclically padded to the scan budget so
    # uniform sampling over this array IS band sampling.
    band_indices: Optional[np.ndarray] = None

    def compute_band_indices(self, z_range=(0.5, 8.0)):
        """Fill ``band_indices`` using the best-known pose (gt or tracked)."""
        pose = self.gt_pose if self.gt_pose is not None else self.tracked_pose
        dirs = np.asarray(self.scan.ray_directions)
        dist = np.asarray(self.scan.distances)
        valid = np.asarray(self.scan.valid)
        pts_world = (dirs * dist[:, None]) @ np.asarray(pose)[:3, :3].T + np.asarray(pose)[:3, 3]
        band = valid & (pts_world[:, 2] > z_range[0]) & (pts_world[:, 2] < z_range[1])
        idx = np.flatnonzero(band)
        p = len(valid)
        if len(idx) == 0:
            idx = np.flatnonzero(valid)
        if len(idx) == 0:
            idx = np.zeros(1, np.int64)
        reps = int(np.ceil(p / len(idx)))
        self.band_indices = np.tile(idx, reps)[:p].astype(np.int32)
        return self

    def pose_state(self, optimized_pose: np.ndarray) -> dict:
        """Serializable pose state, mirroring the reference's per-KF dict
        (``src/mapping/keyframe.py:130-138``)."""
        return {
            "timestamp": self.timestamp,
            "lidar_pose": np.asarray(optimized_pose),
            "tracked_pose": np.asarray(self.tracked_pose),
            "gt_lidar_pose": None if self.gt_pose is None else np.asarray(self.gt_pose),
        }


class KeyFrameWindow(NamedTuple):
    """A stacked window of W keyframes, ready for one jitted train step."""

    dirs: jnp.ndarray  # (W, P, 3) sensor-frame ray directions
    dists: jnp.ndarray  # (W, P) ranges (meters)
    point_valid: jnp.ndarray  # (W, P) bool
    sky_dirs: jnp.ndarray  # (W, S, 3)
    sky_valid: jnp.ndarray  # (W, S) bool
    pose_idx: jnp.ndarray  # (W,) int32 rows into the pose array
    band_idx: jnp.ndarray  # (W, P) int32 trunk-band sampling indices

    @property
    def window_size(self) -> int:
        return self.dirs.shape[0]


def stack_window(keyframes: List[KeyFrame], n_sky_pad: int = 64) -> KeyFrameWindow:
    """Stack keyframes into a fixed-shape window. All scans must share the
    same padded point budget (enforced by the dataset/frame-synthesis layer).

    Stacking happens host-side (scans are numpy-backed); the result ships to
    the device as one transfer per field.
    """
    dirs = np.stack([np.asarray(kf.scan.ray_directions) for kf in keyframes])
    dists = np.stack([np.asarray(kf.scan.distances) for kf in keyframes])
    valid = np.stack([np.asarray(kf.scan.valid) for kf in keyframes])

    skys_d, skys_v = [], []
    for kf in keyframes:
        if kf.sky is not None:
            skys_d.append(np.asarray(kf.sky.ray_directions))
            skys_v.append(np.asarray(kf.sky.valid))
        else:
            skys_d.append(np.zeros((n_sky_pad, 3), dtype=np.float32))
            skys_v.append(np.zeros((n_sky_pad,), dtype=bool))

    pose_idx = np.asarray([kf.pose_index for kf in keyframes], dtype=np.int32)
    p = dirs.shape[1]
    bands = []
    for kf in keyframes:
        if kf.band_indices is not None:
            bands.append(np.asarray(kf.band_indices, np.int32)[:p])
        else:
            bands.append(np.arange(p, dtype=np.int32))  # no band -> uniform
    return KeyFrameWindow(
        jnp.asarray(dirs),
        jnp.asarray(dists),
        jnp.asarray(valid),
        jnp.asarray(np.stack(skys_d)),
        jnp.asarray(np.stack(skys_v)),
        jnp.asarray(pose_idx),
        jnp.asarray(np.stack(bands)),
    )
