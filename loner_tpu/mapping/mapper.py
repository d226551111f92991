"""Online mapper: keyframe acceptance + schedule-driven optimization.

Covers the reference's ``Mapper`` (``src/mapping/mapper.py``) and the
schedule-execution half of its ``Optimizer`` (``src/mapping/optimizer.py:
143-265``): per accepted keyframe, run the keyframe schedule's phases
(e.g. 1000 iterations on the first keyframe, then 50/keyframe of joint
optimization), each phase with its freeze configuration, over the active
window chosen by the KeyFrameManager; checkpoint on a cadence; publish
updated keyframe poses.

The host loop stays thin: each iteration is one call of the single jitted
train step with runtime flags.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.data.scan import LidarScan
from loner_tpu.geometry import se3
from loner_tpu.mapping.keyframe import KeyFrame, stack_window
from loner_tpu.mapping.keyframe_manager import KeyFrameManager, KeyFrameManagerConfig
from loner_tpu.mapping.optimizer import (
    MapperConfig,
    MapperState,
    TrainStepFlags,
    init_mapper_state,
    make_train_step,
)
from loner_tpu.runtime.profiling import WindowTimer


@dataclass
class IterationPhase:
    """One entry of an iteration schedule (``cfg/defaults.yaml``
    keyframe_schedule)."""

    num_iterations: int
    freeze_poses: bool = False
    freeze_sigma_mlp: bool = False
    freeze_rgb_mlp: bool = True
    latest_kf_only: bool = False


@dataclass
class SchedulePhase:
    num_keyframes: int  # -1 = all remaining
    iteration_schedule: List[IterationPhase]


def default_keyframe_schedule(skip_pose_refinement: bool = True) -> List[SchedulePhase]:
    """The reference's default schedule: 1000 iterations on the first
    keyframe (poses frozen), then per keyframe an optional tracking-refine
    phase (skipped by default) and 50 joint iterations."""
    later = []
    if not skip_pose_refinement:
        later.append(
            IterationPhase(50, freeze_poses=False, freeze_sigma_mlp=True, latest_kf_only=True)
        )
    later.append(IterationPhase(50, freeze_poses=False, freeze_sigma_mlp=False))
    return [
        SchedulePhase(1, [IterationPhase(1000, freeze_poses=True)]),
        SchedulePhase(-1, later),
    ]


@dataclass
class OnlineCameraConfig:
    """Online camera/intensity training (the reference's camera samples in
    the live schedule, ``src/loner.py:273`` + ``src/mapping/optimizer.py:
    517-688``, re-designed as a decoupled per-window RGB pass: sigma trains
    from lidar, then the intensity branch trains from the window's matched
    images with sigma detached)."""

    enabled: bool = False
    K: Optional[np.ndarray] = None  # (3, 3) camera intrinsics
    lidar_to_camera: Optional[np.ndarray] = None  # (4, 4): cam pose = kf pose @ this
    iterations_per_window: int = 20
    n_rays: int = 1024
    # dynamic-object masking (reference: SAM masks written into the bag,
    # rosbag_utils/adjust_bags.py:16-60): called with the attached (H, W, C)
    # image, returns an (H, W) bool mask, True = trainable/static. Composable
    # from data/dynamic_mask.py sources; None = all pixels trainable.
    mask_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None


@dataclass
class OnlineMapperConfig:
    mapper: MapperConfig = field(default_factory=MapperConfig)
    keyframe_manager: KeyFrameManagerConfig = field(default_factory=KeyFrameManagerConfig)
    schedule: List[SchedulePhase] = field(default_factory=default_keyframe_schedule)
    n_sky_pad: int = 64
    seed: int = 0
    # checkpoint cadence (reference mapper.log_level, mapper.py:110-119):
    # VERBOSE = full checkpoint every keyframe, STANDARD = every 10th,
    # DISABLED = none; pose states are dumped every keyframe either way,
    # and a final checkpoint is always written at stop.
    log_level: str = "STANDARD"
    checkpoint_dir: Optional[str] = None
    # loss observability (reference debug.flags.log_losses,
    # optimizer.py:496-508): per-keyframe, per-phase CSVs of the loss terms
    log_losses: bool = False
    loss_log_dir: Optional[str] = None
    # run the mapper's step on a device mesh (DP over the window axis) —
    # with the tracker pinned elsewhere, tracking and mapping become two
    # concurrent programs on disjoint devices (the PP axis)
    mesh_device_indices: Optional[List[int]] = None
    camera: OnlineCameraConfig = field(default_factory=OnlineCameraConfig)
    # visual-dump observability (reference debug.flags pcd/plot dumps,
    # src/mapping/optimizer.py:391-396,927-1017) — see runtime/debug_dump.py
    debug: "DebugFlags" = None  # set in __post_init__

    def __post_init__(self):
        if self.debug is None:
            from loner_tpu.runtime.debug_dump import DebugFlags

            self.debug = DebugFlags()


class OnlineMapper:
    def __init__(self, cfg: OnlineMapperConfig, cube):
        self.cfg = cfg
        self.cube = cube
        self.state: MapperState = init_mapper_state(
            jax.random.PRNGKey(cfg.seed), cfg.mapper
        )
        self.kf_manager = KeyFrameManager(cfg.keyframe_manager, seed=cfg.seed)
        # state is threaded linearly (self.state = step(self.state, ...)), so
        # donation is safe and halves HBM held by tables + Adam moments
        if cfg.mesh_device_indices:
            from jax.sharding import Mesh

            from loner_tpu.parallel.sharding import make_sharded_train_step

            devs = [jax.devices()[i] for i in cfg.mesh_device_indices]
            self.mesh = Mesh(np.asarray(devs), ("data",))
            self._train_step = make_sharded_train_step(
                cfg.mapper, cube, self.mesh, donate=True
            )
        else:
            self.mesh = None
            self._train_step = make_train_step(cfg.mapper, cube, donate=True)
        self._key = jax.random.PRNGKey(cfg.seed + 1)
        # host-side mirror of state.global_step: reading the device scalar
        # every iteration would add a device->host round-trip per step
        self._host_step = 0
        # schedule-bucket counter: advances on every optimization pass, NEW
        # or HYBRID stationary re-opt alike — the reference bumps
        # _keyframe_count on every iterate_optimizer call
        # (src/mapping/optimizer.py:190), so a stationary platform still
        # advances past the 1000-iteration first-keyframe phase
        self._opt_count = 0
        self._camera_step = None  # built lazily on the first image window
        self._debug_probe = None  # built lazily on the first flagged window
        # attach observability (ADVICE r04: silent drops hide a mis-set
        # frame_match_tolerance): successful / failed image->keyframe matches
        self.image_attaches = 0
        self.image_attach_drops = 0
        self.map_times: List[float] = []
        self.its_per_sec_log: List[float] = []
        self.window_timer = WindowTimer()  # per-window timing.csv rows
        # callbacks: called with (timestamp, tracked_pose, optimized_pose)
        self.keyframe_update_callbacks: List[Callable] = []

    # ------------------------------------------------------------------
    def _phases_for_kf(self, opt_count: int) -> List[IterationPhase]:
        """Select the iteration schedule for the opt_count-th optimization
        pass (1-based; includes HYBRID stationary re-opts), walking the
        schedule's num_keyframes buckets (``optimizer.py:145-155,190``)."""
        remaining = opt_count
        for phase in self.cfg.schedule:
            if phase.num_keyframes == -1 or remaining <= phase.num_keyframes:
                return phase.iteration_schedule
            remaining -= phase.num_keyframes
        return self.cfg.schedule[-1].iteration_schedule

    def _pose_mask(self, window_kfs, latest_only: bool) -> jnp.ndarray:
        mask = np.zeros((self.cfg.mapper.max_keyframes,), np.float32)
        if latest_only:
            mask[window_kfs[-1].pose_index] = 1.0
        else:
            for kf in window_kfs:
                if not kf.is_anchored:
                    mask[kf.pose_index] = 1.0
        return jnp.asarray(mask)

    # ------------------------------------------------------------------
    def process_frame(
        self,
        scan: LidarScan,
        timestamp: float,
        tracked_pose: np.ndarray,
        gt_pose: Optional[np.ndarray] = None,
        sky: Optional[LidarScan] = None,
        use_gt_pose: bool = False,
    ) -> bool:
        """Keyframe gate + optimization. Returns True if the map was
        optimized (a new keyframe, or HYBRID's stationary re-optimization
        of the existing window)."""
        decision = self.kf_manager.decide(timestamp, tracked_pose)
        if decision == "SKIP":
            return False
        t0 = time.time()

        if decision == "NEW":
            pose_init = (
                gt_pose
                if (use_gt_pose and gt_pose is not None)
                else self.kf_manager.rebase_pose(tracked_pose, np.asarray(self.state.poses))
            )
            kf = KeyFrame(
                scan=scan,
                timestamp=timestamp,
                pose_index=len(self.kf_manager),
                tracked_pose=np.asarray(tracked_pose),
                gt_pose=gt_pose,
                sky=sky,
            )
            assert kf.pose_index < self.cfg.mapper.max_keyframes, "max_keyframes exceeded"
            self.kf_manager.accept(kf)
            self.state = self.state._replace(
                poses=self.state.poses.at[kf.pose_index].set(
                    se3.matrix_to_pose(jnp.asarray(pose_init, jnp.float32))
                )
            )

        window_kfs = self.kf_manager.get_active_window()
        window = stack_window(window_kfs, n_sky_pad=self.cfg.n_sky_pad)

        self._opt_count += 1
        n_iters = 0
        t_opt = time.time()
        self.window_timer.start()
        loss_rows: List[tuple] = []  # (phase_idx, it, aux) device scalars
        for phase_idx, phase in enumerate(self._phases_for_kf(self._opt_count)):
            flags = TrainStepFlags(
                freeze_sigma=jnp.asarray(phase.freeze_sigma_mlp),
                freeze_rgb=jnp.asarray(phase.freeze_rgb_mlp),
                freeze_poses=jnp.asarray(phase.freeze_poses),
                do_occ_update=jnp.asarray(False),
            )
            pose_mask = self._pose_mask(window_kfs, phase.latest_kf_only)
            n_phase_iters = phase.num_iterations
            window_key = None
            if self.cfg.mapper.rays_strategy == "FIXED":
                # FIXED = one epoch over every scan point: the key stays
                # constant across the window (fixed shuffle) and the
                # iteration count covers the whole padded scan
                # (reference optimizer.py:278-281)
                self._key, window_key = jax.random.split(self._key)
                n_phase_iters = max(
                    1, window.dirs.shape[1] // self.cfg.mapper.rays_per_kf
                )
            for it in range(n_phase_iters):
                if window_key is None:
                    self._key, sub = jax.random.split(self._key)
                else:
                    sub = window_key
                occ = jnp.asarray(
                    (self._host_step % self.cfg.mapper.occ.n_iters_acc)
                    == self.cfg.mapper.occ.n_iters_acc - 1
                )
                self._host_step += 1
                self.state, aux = self._train_step(
                    self.state, window, sub, flags._replace(do_occ_update=occ),
                    pose_mask, jnp.asarray(it),
                )
                if self.cfg.log_losses:
                    loss_rows.append((phase_idx, it, aux))
                n_iters += 1
        jax.block_until_ready(self.state.params)
        if loss_rows:
            self._write_loss_csvs(len(self.kf_manager), loss_rows)
        if self.cfg.debug is not None and self.cfg.debug.mapper_any:
            self._dump_debug_probe(window)
        self.window_timer.stop(n_iters)
        dt_opt = time.time() - t_opt
        if dt_opt > 0:
            self.its_per_sec_log.append(n_iters / dt_opt)

        if self.cfg.camera.enabled:
            self._run_camera_phase(window_kfs)

        poses_np = np.asarray(self.state.poses)
        for cb in self.keyframe_update_callbacks:
            for k in window_kfs:
                opt_T = np.asarray(se3.pose_to_matrix(jnp.asarray(poses_np[k.pose_index])))
                cb(k.timestamp, k.tracked_pose, opt_T)

        self._maybe_checkpoint()
        self.map_times.append(time.time() - t0)
        return True

    # ------------------------------------------------------------------
    def _dump_debug_probe(self, window):
        """Run the jitted observation pass once for this window and write
        ray/sample pcds + loss-distribution plots (runtime/debug_dump.py)."""
        from loner_tpu.mapping.optimizer import make_debug_probe
        from loner_tpu.runtime.debug_dump import dump_window_probe

        if self._debug_probe is None:
            self._debug_probe = make_debug_probe(self.cfg.mapper, self.cube)
        self._key, sub = jax.random.split(self._key)
        out = self._debug_probe(self.state, window, sub, jnp.asarray(0))
        dump_window_probe(
            self.cfg.debug,
            f"keyframe_{len(self.kf_manager)}",
            jax.tree.map(np.asarray, out),
            scale=self.cfg.mapper.world_scale,
            shift=np.asarray(self.cube.shift, np.float32).reshape(-1)[:3],
        )

    # ------------------------------------------------------------------
    # online camera mode
    # ------------------------------------------------------------------
    def attach_image(
        self,
        scan,
        image,
        image_timestamp: float,
        scan_timestamp: Optional[float] = None,
        mask: Optional[np.ndarray] = None,
    ) -> bool:
        """Attach a matched image to the keyframe holding ``scan``. Keyed by
        the scan timestamp when provided (robust across scan copies — e.g. a
        process boundary or motion-comp rebuild), falling back to object
        identity. An explicit ``mask`` (or ``camera.mask_fn``) becomes the
        keyframe's dynamic-object pixel mask. Returns False if that scan
        never became a keyframe (counted in ``image_attach_drops``)."""
        target = None
        for kf in reversed(self.kf_manager.keyframes):
            if scan_timestamp is not None and abs(kf.timestamp - scan_timestamp) < 1e-6:
                target = kf
                break
            if kf.scan is scan:
                target = kf
                break
        if target is None:
            self.image_attach_drops += 1
            return False
        target.image = np.asarray(image, np.float32)
        target.image_timestamp = image_timestamp
        if mask is None and self.cfg.camera.mask_fn is not None:
            mask = self.cfg.camera.mask_fn(target.image)
        if mask is not None:
            target.image_mask = np.asarray(mask, bool)
        self.image_attaches += 1
        return True

    def _run_camera_phase(self, window_kfs) -> int:
        """The decoupled RGB pass over the window's image-carrying keyframes:
        intensity branch trains against the matched images at the CURRENT
        optimized keyframe poses, sigma detached (camera_optimizer.py).
        Padded slots (windows with fewer images than window_size) are
        disabled through the pixel mask. Returns iterations run."""
        cam = self.cfg.camera
        kfs = [k for k in window_kfs if k.image is not None]
        if not kfs or cam.K is None:
            return 0
        from loner_tpu.mapping.camera_optimizer import (
            make_camera_train_step,
            stack_camera_window,
        )

        b = self.cfg.keyframe_manager.window_size
        t_lc = (
            np.eye(4) if cam.lidar_to_camera is None else np.asarray(cam.lidar_to_camera)
        )
        poses_np = np.asarray(self.state.poses)
        imgs, masks, cam_poses = [], [], []
        for k in kfs[:b]:
            imgs.append(np.asarray(k.image, np.float32))
            masks.append(
                np.asarray(k.image_mask, bool)
                if k.image_mask is not None
                else np.ones(k.image.shape[:2], bool)
            )
            T = np.asarray(se3.pose_to_matrix(jnp.asarray(poses_np[k.pose_index])))
            cam_poses.append(T @ t_lc)
        while len(imgs) < b:  # static batch: pad with masked-out copies
            imgs.append(imgs[0])
            masks.append(np.zeros(imgs[0].shape[:2], bool))
            cam_poses.append(cam_poses[0])
        window = stack_camera_window(
            np.stack(imgs), np.stack(masks), np.stack(cam_poses), np.asarray(cam.K)
        )
        if self._camera_step is None:
            self._camera_step = make_camera_train_step(
                self.cfg.mapper, self.cube, n_rays=cam.n_rays, mesh=self.mesh
            )
        for _ in range(cam.iterations_per_window):
            self._key, sub = jax.random.split(self._key)
            self.state, _ = self._camera_step(self.state, window, sub)
        return cam.iterations_per_window

    # ------------------------------------------------------------------
    _LOSS_COLS = (
        "loss", "depth_mse", "los_loss", "opacity_loss", "depth_eps", "js_mean",
    )

    def _write_loss_csvs(self, kf_index: int, rows):
        """Per-keyframe, per-phase loss CSVs (reference debug log_losses,
        ``src/mapping/optimizer.py:496-508``). Device scalars are pulled
        once per window, after block_until_ready."""
        import os
        from collections import defaultdict

        base = self.cfg.loss_log_dir or "losses"
        d = os.path.join(base, f"keyframe_{kf_index}")
        os.makedirs(d, exist_ok=True)
        by_phase = defaultdict(list)
        for phase_idx, it, aux in rows:
            vals = [it] + [float(aux.get(c, float("nan"))) for c in self._LOSS_COLS]
            by_phase[phase_idx].append(vals)
        for phase_idx, vals in by_phase.items():
            np.savetxt(
                os.path.join(d, f"phase_{phase_idx}.csv"),
                np.asarray(vals),
                delimiter=",",
                header="iteration," + ",".join(self._LOSS_COLS),
                comments="",
            )

    def _ckpt_interval(self) -> Optional[int]:
        return {"VERBOSE": 1, "STANDARD": 10}.get(self.cfg.log_level.upper())

    def _maybe_checkpoint(self):
        """Per-keyframe checkpoint cadence (reference mapper.py:110-119):
        pose states every keyframe, a full state checkpoint every
        ``log_level`` interval."""
        d = self.cfg.checkpoint_dir
        if not d:
            return
        interval = self._ckpt_interval()
        if interval is None:  # DISABLED
            return
        self.write_pose_states(d)
        if self._opt_count % interval == 0:
            self.save_checkpoint(d)

    def write_pose_states(self, directory: str):
        """Dump per-keyframe pose states (timestamp, tracked, optimized, gt)
        as one npz — the reference's poses-only checkpoint content
        (``src/mapping/keyframe.py:130-138``)."""
        import os

        os.makedirs(directory, exist_ok=True)
        kfs = self.kf_manager.keyframes
        poses_np = np.asarray(self.state.poses)
        opt = np.stack(
            [
                np.asarray(se3.pose_to_matrix(jnp.asarray(poses_np[k.pose_index])))
                for k in kfs
            ]
        ) if kfs else np.zeros((0, 4, 4))
        np.savez(
            os.path.join(directory, "kf_poses.npz"),
            timestamps=np.asarray([k.timestamp for k in kfs]),
            tracked=np.stack([k.tracked_pose for k in kfs]) if kfs else np.zeros((0, 4, 4)),
            optimized=opt,
            has_gt=np.asarray([k.gt_pose is not None for k in kfs]),
            gt=np.stack(
                [k.gt_pose if k.gt_pose is not None else np.eye(4) for k in kfs]
            ) if kfs else np.zeros((0, 4, 4)),
        )

    def save_checkpoint(self, directory: str) -> str:
        """Full mapper-state checkpoint under ``directory/ckpt_<step>``."""
        from loner_tpu.runtime.checkpoints import save_checkpoint

        return save_checkpoint(directory, int(self._host_step), self.state)

    def save_final(self, directory: str) -> str:
        """The reference always writes a final full checkpoint at shutdown
        (``src/mapping/mapper.py:177-180``), regardless of log_level."""
        self.write_pose_states(directory)
        return self.save_checkpoint(directory)

    def optimized_pose(self, kf: KeyFrame) -> np.ndarray:
        return np.asarray(
            se3.pose_to_matrix(jnp.asarray(self.state.poses[kf.pose_index]))
        )
