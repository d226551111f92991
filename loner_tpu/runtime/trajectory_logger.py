"""Trajectory bookkeeping and TUM-format IO.

Covers the reference's ``DefaultLogger`` (``src/logging/default_logger.py``)
and ``dump_trajectory_to_tum`` (``src/common/pose_utils.py:374-384``): keep
the ICP-only trajectory, the groundtruth trajectory, and the online estimate
(last keyframe correction composed with relative tracked motion); at finish,
re-anchor every tracked pose onto its temporally-preceding keyframe's
optimized pose, and dump four TUM files:
tracking_only / online_estimates / keyframe_trajectory / estimated_trajectory.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from loner_tpu.geometry import se3


def dump_tum(poses: np.ndarray, timestamps: np.ndarray, path: str):
    """Write (N,4,4) poses to TUM: t x y z qx qy qz qw."""
    poses = np.asarray(poses, np.float64)
    q = np.asarray(se3.matrix_to_quat(jnp.asarray(poses[:, :3, :3], jnp.float32)))
    data = np.concatenate(
        [np.asarray(timestamps).reshape(-1, 1), poses[:, :3, 3], q], axis=-1
    )
    np.savetxt(path, data, delimiter=" ", fmt="%.10f")


def load_tum(path: str):
    """Returns (poses (N,4,4), timestamps (N,))."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    ts = data[:, 0]
    t = data[:, 1:4]
    quat = data[:, 4:8]  # x y z w
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(quat, jnp.float32)))
    poses = np.tile(np.eye(4), (len(ts), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    return poses, ts


@dataclass
class _TrackedFrame:
    timestamp: float
    tracked_pose: np.ndarray  # (4,4)
    gt_pose: Optional[np.ndarray] = None
    # causal estimate captured when the frame arrived (only keyframe
    # corrections known at that moment) — what the reference's logger writes
    # to online_estimates.txt (default_logger.py:83-115)
    online_pose: Optional[np.ndarray] = None


@dataclass
class _KeyFrameRecord:
    timestamp: float
    tracked_pose: np.ndarray
    optimized_pose: np.ndarray


class TrajectoryLogger:
    """Collects tracked frames and keyframe pose updates; reconstructs the
    final estimate by re-anchoring each tracked pose to the optimized pose of
    its temporally-preceding keyframe (``default_logger.py:117-149``)."""

    def __init__(self):
        self.frames: List[_TrackedFrame] = []
        self.keyframes: Dict[float, _KeyFrameRecord] = {}

    def log_frame(self, timestamp: float, tracked_pose: np.ndarray, gt_pose=None):
        tracked_pose = np.asarray(tracked_pose)
        self.frames.append(
            _TrackedFrame(
                timestamp,
                tracked_pose,
                gt_pose,
                online_pose=self.online_estimate(timestamp, tracked_pose),
            )
        )

    def update_keyframe(self, timestamp: float, tracked_pose: np.ndarray, optimized_pose: np.ndarray):
        """Record (or refresh) a keyframe's optimized pose; called whenever
        the mapper publishes new poses (keyframe_update_signal analog)."""
        self.keyframes[timestamp] = _KeyFrameRecord(
            timestamp, np.asarray(tracked_pose), np.asarray(optimized_pose)
        )

    def online_estimate(self, timestamp: float, tracked_pose: np.ndarray) -> np.ndarray:
        """Latest-correction estimate: optimized_kf @ inv(tracked_kf) @ tracked
        for the most recent keyframe (``default_logger.py:83-115``)."""
        past = [k for k in self.keyframes.values() if k.timestamp <= timestamp]
        if not past:
            return np.asarray(tracked_pose)
        kf = max(past, key=lambda k: k.timestamp)
        return kf.optimized_pose @ np.linalg.inv(kf.tracked_pose) @ np.asarray(tracked_pose)

    def reconstruct_trajectory(self) -> np.ndarray:
        """Final estimate for every tracked frame (re-anchored)."""
        out = []
        for fr in self.frames:
            out.append(self.online_estimate(fr.timestamp, fr.tracked_pose))
        return np.stack(out) if out else np.zeros((0, 4, 4))

    def finish(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        ts = np.array([f.timestamp for f in self.frames])
        if len(ts):
            dump_tum(np.stack([f.tracked_pose for f in self.frames]), ts, os.path.join(out_dir, "tracking_only.txt"))
            dump_tum(self.reconstruct_trajectory(), ts, os.path.join(out_dir, "estimated_trajectory.txt"))
            # causal per-frame estimates, NOT the final re-anchored poses
            dump_tum(
                np.stack(
                    [
                        f.online_pose if f.online_pose is not None else f.tracked_pose
                        for f in self.frames
                    ]
                ),
                ts,
                os.path.join(out_dir, "online_estimates.txt"),
            )
        if self.keyframes:
            kts = np.array(sorted(self.keyframes))
            kposes = np.stack([self.keyframes[t].optimized_pose for t in kts])
            dump_tum(kposes, kts, os.path.join(out_dir, "keyframe_trajectory.txt"))
        gt = [f for f in self.frames if f.gt_pose is not None]
        if gt:
            dump_tum(
                np.stack([f.gt_pose for f in gt]),
                np.array([f.timestamp for f in gt]),
                os.path.join(out_dir, "groundtruth.txt"),
            )
