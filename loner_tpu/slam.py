"""The SLAM orchestrator: tracker + mapper + logger, single- or dual-threaded.

Covers the reference's ``Loner`` class (``src/loner.py``): wires the tracking
and mapping halves together, owns the world cube and output directory
contract, and runs either inline (the reference's ``single_threaded`` mode —
also our deterministic test harness) or with the mapper on a worker thread
fed through a bounded queue with time-delta backpressure (the reference's
two-process + Manager-queue design collapsed to host threads around async
device dispatch; SURVEY §2.4).
"""
from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from loner_tpu.data.scan import LidarScan
from loner_tpu.geometry.world_cube import WorldCube
from loner_tpu.mapping.mapper import OnlineMapper, OnlineMapperConfig
from loner_tpu.runtime.trajectory_logger import TrajectoryLogger
from loner_tpu.tracking.frame_synthesis import FrameSynthesis, FrameSynthesisConfig
from loner_tpu.tracking.tracker import Tracker, TrackerConfig


@dataclass
class SlamConfig:
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    frame_synthesis: FrameSynthesisConfig = field(default_factory=FrameSynthesisConfig)
    mapper: OnlineMapperConfig = field(default_factory=OnlineMapperConfig)
    single_threaded: bool = True
    # tracker may run at most this far ahead of the last mapped frame
    # (reference synchronization.max_time_delta; tracker.py:86-88)
    max_time_delta: float = 3.0
    use_groundtruth_poses: bool = False  # debug flag analog
    # pose-graph BA over keyframes at finish (loop closures from ICP scan
    # re-alignment; no reference analog — north-star capability)
    loop_closure: "LoopClosureConfig" = None  # set in __post_init__
    # tracker and mapper as two concurrent programs on DISJOINT devices
    # (PP axis): tracker pinned to device 0, mapper DP over the rest
    concurrent_device_split: bool = False

    def __post_init__(self):
        if self.loop_closure is None:
            from loner_tpu.mapping.loop_closure import LoopClosureConfig

            self.loop_closure = LoopClosureConfig()


class LonerSLAM:
    def __init__(self, cfg: SlamConfig, cube: WorldCube, out_dir: Optional[str] = None):
        self.cfg = cfg
        self.cube = cube
        self.out_dir = out_dir
        if out_dir and cfg.mapper.checkpoint_dir is None:
            cfg.mapper.checkpoint_dir = os.path.join(out_dir, "checkpoints")
        if out_dir and cfg.mapper.loss_log_dir is None:
            cfg.mapper.loss_log_dir = os.path.join(out_dir, "losses")
        if out_dir and cfg.mapper.debug is not None and cfg.mapper.debug.dump_dir is None:
            cfg.mapper.debug.dump_dir = os.path.join(out_dir, "debug")
        # tracker shares the mapper's DebugFlags (one debug: block in cfg)
        if cfg.tracker.debug is None:
            cfg.tracker.debug = cfg.mapper.debug
        if cfg.concurrent_device_split:
            import jax

            n = len(jax.devices())
            if n >= 2:
                cfg.tracker.device_index = 0
                w = cfg.mapper.mapper.window_size
                # mapper gets the largest divisor of window_size that fits in
                # the n-1 non-tracker devices (the DP shard must divide the
                # window's keyframe axis; make_sharded_train_step replicates
                # non-divisible windows, which would waste the extra devices)
                m = max(d for d in range(1, n) if w % d == 0)
                if m == 1 and n > 2:
                    import warnings

                    warnings.warn(
                        f"concurrent_device_split: window_size={w} has no "
                        f"divisor <= {n - 1}; mapper runs on 1 device while "
                        f"{n - 2} idle. Pick a window_size with a divisor "
                        f"<= {n - 1}."
                    )
                cfg.mapper.mesh_device_indices = list(range(1, 1 + m))
        self.tracker = Tracker(cfg.tracker)
        self.frame_synthesis = FrameSynthesis(cfg.frame_synthesis)
        self.mapper = OnlineMapper(cfg.mapper, cube)
        self.logger = TrajectoryLogger()
        self.mapper.keyframe_update_callbacks.append(self.logger.update_keyframe)

        self._queue: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._last_mapped_time = 0.0
        self._worker_error: Optional[BaseException] = None
        if not cfg.single_threaded:
            self._worker = threading.Thread(target=self._mapper_loop, daemon=True)
            self._worker.start()

    # ------------------------------------------------------------------
    def _mapper_loop(self):
        while not self._stop.is_set() or not self._queue.empty():
            try:
                item = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                self._dispatch(item)
            except BaseException as e:  # surfaced on stop()
                self._worker_error = e
                break

    def _map_frame(self, scan, timestamp, pose, gt_pose, sky):
        self.mapper.process_frame(
            scan,
            timestamp,
            pose,
            gt_pose=gt_pose,
            sky=sky,
            use_gt_pose=self.cfg.use_groundtruth_poses,
        )
        self._last_mapped_time = timestamp

    def _dispatch(self, item):
        kind, payload = item
        if kind == "scan":
            self._map_frame(*payload)
        else:  # "image": attach a matched image to its keyframe
            scan, image, t_img, t_scan = payload
            self.mapper.attach_image(scan, image, t_img, scan_timestamp=t_scan)

    # ------------------------------------------------------------------
    def process_scan(
        self,
        scan: LidarScan,
        timestamp: float,
        gt_pose: Optional[np.ndarray] = None,
        sky: Optional[LidarScan] = None,
    ) -> Optional[np.ndarray]:
        """Feed one lidar sweep. Returns the tracked pose if the scan
        survived decimation, else None."""
        if not self.frame_synthesis.accepts(timestamp):
            return None

        result = self.tracker.track(scan, timestamp)
        self.logger.log_frame(timestamp, result.pose, gt_pose)

        # tracker-side sky segmentation feeds transparent supervision rays
        # (reference tracker.py:257-296) unless the caller provided its own
        if sky is None and result.sky_dirs is not None and len(result.sky_dirs):
            from loner_tpu.data.scan import sky_scan

            sky = sky_scan(
                result.sky_dirs,
                self.cfg.mapper.mapper.ray_range[1] + 1.0,
                timestamp,
                pad_to=self.cfg.mapper.n_sky_pad,
            )

        if self.cfg.single_threaded:
            self._map_frame(result.scan, timestamp, result.pose, gt_pose, sky)
        else:
            # backpressure: don't run ahead of the mapper by more than
            # max_time_delta (reference tracker.py:86-88)
            while (
                timestamp - self._last_mapped_time > self.cfg.max_time_delta
                and not self._queue.empty()
                and self._worker_error is None
            ):
                time.sleep(0.005)
            self._queue.put(("scan", (result.scan, timestamp, result.pose, gt_pose, sky)))
        if self.cfg.mapper.camera.enabled:
            # enqueue the (possibly motion-compensated) mapped scan for
            # image<->scan interval matching; the queue order guarantees a
            # match can only resolve after its scan reached the mapper
            self.frame_synthesis.process_scan_for_matching(result.scan, timestamp)
            self._drain_image_matches()
        return result.pose

    def process_image(self, image: np.ndarray, timestamp: float) -> None:
        """Feed one camera image into the live pipeline (the reference's
        ``process_rgb``, ``src/loner.py:273``). The image is matched to the
        first scan whose padded timestamp interval contains it
        (``src/tracking/frame_synthesis.py:86-126``) and attached to that
        scan's keyframe; the mapper then trains the intensity branch against
        the window's images after each lidar pass."""
        if not self.cfg.mapper.camera.enabled:
            raise RuntimeError(
                "process_image requires SlamConfig.mapper.camera.enabled"
            )
        self.frame_synthesis.process_image(np.asarray(image, np.float32), timestamp)
        self._drain_image_matches()

    def _drain_image_matches(self):
        while self.frame_synthesis.has_frame():
            mf = self.frame_synthesis.pop_frame()
            item = ("image", (mf.scan, mf.image, mf.image_timestamp, mf.scan_timestamp))
            if self.cfg.single_threaded:
                self._dispatch(item)
            else:
                self._queue.put(item)

    def stop(self, out_dir: Optional[str] = None):
        """Two-phase shutdown: drain the mapper queue, stop the worker,
        write trajectories (the reference's stop protocol, loner.py:217-250)."""
        if self._worker is not None:
            self._stop.set()
            self._worker.join(timeout=600)
        if self._worker_error is not None:
            raise self._worker_error

        # pose-graph BA over keyframes: ICP loop closures + odometry factors
        # + weak priors on the mapper's poses; corrected poses flow to the
        # mapper state and the trajectory logger before finish()
        self.ba_info = None
        kfs = self.mapper.kf_manager.keyframes
        if self.cfg.loop_closure.enabled and len(kfs) >= 3:
            import jax.numpy as jnp

            from loner_tpu.geometry import se3
            from loner_tpu.mapping.loop_closure import refine_keyframe_poses

            poses_np = np.asarray(self.mapper.state.poses)
            opt = np.stack(
                [
                    np.asarray(
                        se3.pose_to_matrix(jnp.asarray(poses_np[k.pose_index]))
                    )
                    for k in kfs
                ]
            )
            refined, self.ba_info = refine_keyframe_poses(
                kfs, opt, self.cfg.loop_closure
            )
            pose6 = jnp.stack(
                [se3.matrix_to_pose(jnp.asarray(T, jnp.float32)) for T in refined]
            )
            idx = jnp.asarray([k.pose_index for k in kfs])
            self.mapper.state = self.mapper.state._replace(
                poses=self.mapper.state.poses.at[idx].set(pose6)
            )
            for k, T in zip(kfs, refined):
                self.logger.update_keyframe(k.timestamp, k.tracked_pose, T)

        out_dir = out_dir or self.out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            # final full checkpoint, always (reference mapper.py:177-180) —
            # downstream tools (render_map, compute_metrics, sim) boot from it
            if len(self.mapper.kf_manager):
                self.mapper.save_final(os.path.join(out_dir, "checkpoints"))
            self.logger.finish(os.path.join(out_dir, "trajectory"))
            np.savetxt(
                os.path.join(out_dir, "track_times.csv"),
                np.asarray(self.tracker.track_times),
                delimiter=",",
            )
            np.savetxt(
                os.path.join(out_dir, "map_times.csv"),
                np.asarray(self.mapper.map_times),
                delimiter=",",
            )
            # per-window iteration timing + its/s (reference timing.csv,
            # src/mapping/optimizer.py:183-188)
            self.mapper.window_timer.write_csv(os.path.join(out_dir, "timing.csv"))
            if self.cfg.mapper.camera.enabled:
                # image->keyframe attach observability (ADVICE r04: silent
                # drops hide a mis-set frame_match_tolerance)
                import json as _json

                with open(os.path.join(out_dir, "camera_attach.json"), "w") as f:
                    _json.dump(
                        {
                            "attached": self.mapper.image_attaches,
                            "dropped": self.mapper.image_attach_drops,
                        },
                        f,
                    )
                if self.mapper.image_attach_drops:
                    print(
                        f"[slam] WARNING: {self.mapper.image_attach_drops} matched "
                        f"images hit scans that never became keyframes "
                        f"({self.mapper.image_attaches} attached)"
                    )
            if self.ba_info is not None:
                import json

                with open(os.path.join(out_dir, "ba_info.json"), "w") as f:
                    json.dump(self.ba_info, f, indent=1)
