"""Keyframe selection and active-window management (host-side policy).

Covers the reference's ``KeyFrameManager`` (``src/mapping/keyframe_manager.py``):
  * selection strategies TEMPORAL / MOTION / HYBRID / HYBRID_LAZY (:23-28,67-120)
  * motion gate on translation/rotation deltas (:138-155)
  * pose re-basing: a newly accepted keyframe's pose is the last *optimized*
    keyframe pose composed with the relative tracked motion since then —
    how tracking and mapping corrections compose (:92-100)
  * window selection MOST_RECENT / RANDOM / HYBRID (random past + N most
    recent) (:164-187)

Policy code is deliberately plain Python/numpy: it runs on the host between
jitted steps and involves tiny data.
"""
from __future__ import annotations

import random as pyrandom
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from loner_tpu.geometry import se3
from loner_tpu.mapping.keyframe import KeyFrame

import jax.numpy as jnp


@dataclass
class KeyFrameManagerConfig:
    selection_strategy: str = "TEMPORAL"  # TEMPORAL | MOTION | HYBRID | HYBRID_LAZY
    time_diff_seconds: float = 3.0
    translation_threshold_m: float = 0.5
    rotation_threshold_deg: float = 22.5
    window_selection: str = "HYBRID"  # MOST_RECENT | RANDOM | HYBRID
    window_size: int = 8
    num_recent_frames: int = 1


class KeyFrameManager:
    def __init__(self, cfg: KeyFrameManagerConfig, seed: int = 0):
        self.cfg = cfg
        self.keyframes: List[KeyFrame] = []
        self._rng = pyrandom.Random(seed)
        self._last_accepted_time: Optional[float] = None
        self._last_motion_rejected_time: Optional[float] = None

    def __len__(self) -> int:
        return len(self.keyframes)

    # -- selection ----------------------------------------------------------
    def _temporal_gate(self, timestamp: float) -> bool:
        if self._last_accepted_time is None:
            return True
        return (timestamp - self._last_accepted_time) >= self.cfg.time_diff_seconds

    def _motion_gate(self, tracked_pose: np.ndarray) -> bool:
        if not self.keyframes:
            return True
        last = self.keyframes[-1].tracked_pose
        delta = np.linalg.inv(last) @ tracked_pose
        dt = float(np.linalg.norm(delta[:3, 3]))
        ang = float(
            np.linalg.norm(np.asarray(se3.log_so3(jnp.asarray(delta[:3, :3], jnp.float32))))
        )
        return dt >= self.cfg.translation_threshold_m or np.degrees(ang) >= self.cfg.rotation_threshold_deg

    def decide(self, timestamp: float, tracked_pose: np.ndarray) -> str:
        """Keyframe decision: ``"NEW"`` (create + optimize), ``"REOPT"``
        (re-optimize the last keyframe without creating one — HYBRID's
        stationary behavior, ``keyframe_manager.py:106-120``), ``"SKIP"``.

        HYBRID vs HYBRID_LAZY: both require motion AND elapsed time for a
        new keyframe, but when the time has elapsed and the platform is
        stationary HYBRID still spends the optimization budget on the
        existing window (and resets the temporal clock), while HYBRID_LAZY
        skips entirely (it only marks the frame as 'mapped' for
        backpressure, ``keyframe_manager.py:122-127``)."""
        s = self.cfg.selection_strategy
        if s == "TEMPORAL":
            return "NEW" if self._temporal_gate(timestamp) else "SKIP"
        if s in ("MOTION", "HYBRID", "HYBRID_LAZY"):
            motion = self._motion_gate(tracked_pose)
            temporal = self._temporal_gate(timestamp)
            if temporal and not motion:
                # the platform is stationary: remember the rejection so
                # HYBRID_LAZY/MOTION backpressure doesn't starve the tracker
                # (reference keyframe_manager.py:75-76,122-127)
                self._last_motion_rejected_time = timestamp
            if s == "MOTION":
                return "NEW" if motion else "SKIP"
            if motion and temporal:
                return "NEW"
            if s == "HYBRID" and temporal and self.keyframes:
                # reset the temporal clock even without a new keyframe
                # (reference keyframe_manager.py:109-111)
                self._last_accepted_time = timestamp
                return "REOPT"
            return "SKIP"
        raise ValueError(f"Unknown keyframe selection strategy {s}")

    def should_accept(self, timestamp: float, tracked_pose: np.ndarray) -> bool:
        return self.decide(timestamp, tracked_pose) == "NEW"

    @property
    def last_mapped_time(self) -> Optional[float]:
        """The timestamp backpressure should compare against: for
        MOTION/HYBRID_LAZY, a motion-rejected (stationary) frame counts as
        'mapped' so the tracker isn't throttled while nothing moves
        (``keyframe_manager.py:122-127``)."""
        if (
            self.cfg.selection_strategy in ("MOTION", "HYBRID_LAZY")
            and self._last_motion_rejected_time is not None
        ):
            if self._last_accepted_time is None:
                return self._last_motion_rejected_time
            return max(self._last_motion_rejected_time, self._last_accepted_time)
        return self._last_accepted_time

    # -- pose re-basing -----------------------------------------------------
    def rebase_pose(self, tracked_pose: np.ndarray, optimized_poses: np.ndarray) -> np.ndarray:
        """Initial optimizable pose of a new keyframe: last optimized KF pose
        composed with the relative *tracked* motion since that KF
        (``keyframe_manager.py:92-100``). ``optimized_poses`` is the mapper's
        (K, 6) array."""
        if not self.keyframes:
            return tracked_pose
        last_kf = self.keyframes[-1]
        last_opt = np.asarray(
            se3.pose_to_matrix(jnp.asarray(optimized_poses[last_kf.pose_index], jnp.float32))
        )
        rel_tracked = np.linalg.inv(last_kf.tracked_pose) @ tracked_pose
        return last_opt @ rel_tracked

    def accept(self, kf: KeyFrame):
        self._last_accepted_time = kf.timestamp
        if not self.keyframes:
            kf.is_anchored = True
        self.keyframes.append(kf)

    # -- window selection ---------------------------------------------------
    def get_active_window(self) -> List[KeyFrame]:
        """Pick up to window_size keyframes (``keyframe_manager.py:164-187``).

        HYBRID: the num_recent_frames most recent, plus a random sample of
        the past. If fewer keyframes exist than the window size, keyframes
        repeat (fixed-shape windows downstream)."""
        cfg = self.cfg
        n = len(self.keyframes)
        assert n > 0
        if cfg.window_selection == "MOST_RECENT":
            chosen = self.keyframes[-cfg.window_size :]
        elif cfg.window_selection == "RANDOM":
            chosen = [self.keyframes[self._rng.randrange(n)] for _ in range(cfg.window_size)] if n else []
        elif cfg.window_selection == "HYBRID":
            recent = self.keyframes[-cfg.num_recent_frames :]
            past = self.keyframes[: -cfg.num_recent_frames] or self.keyframes
            n_past = cfg.window_size - len(recent)
            if len(past) >= n_past:
                sampled = self._rng.sample(past, n_past)
            else:
                sampled = list(past)
            chosen = sampled + recent
        else:
            raise ValueError(f"Unknown window selection {cfg.window_selection}")

        # pad by repetition to the fixed window size
        while len(chosen) < cfg.window_size:
            chosen = chosen + chosen[: cfg.window_size - len(chosen)]
        return chosen[: cfg.window_size]

    def poses_state(self, optimized_poses: np.ndarray) -> List[dict]:
        out = []
        for kf in self.keyframes:
            T = np.asarray(
                se3.pose_to_matrix(jnp.asarray(optimized_poses[kf.pose_index], jnp.float32))
            )
            out.append(kf.pose_state(T))
        return out
