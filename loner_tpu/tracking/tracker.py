"""The odometry tracker: frame-to-frame ICP with motion compensation.

Covers the reference's ``Tracker`` (``src/tracking/tracker.py``): build a
downsampled point cloud from the middle ``scan_duration`` fraction of each
sweep (``src/common/frame.py:105-146``), register it against the previous
frame with a coarse->fine point-to-plane ICP schedule (``tracker.py:203-221``,
identity initialization), anchor the first frame at the origin
(``:187-196``), motion-compensate the full scan with the interpolated pose
(``:232-237``), and expose per-frame timing.

TPU-first: the ICP and motion compensation are jitted device programs; the
cloud extraction/downsampling is host-side numpy data prep (the reference
keeps this on CPU too, ``data_prep_on_cpu``).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.data.scan import Frame, LidarScan
from loner_tpu.geometry.motion import motion_compensate
from loner_tpu.tracking.icp import IcpConfig, IcpStage, make_icp


@dataclass
class TrackerConfig:
    icp: IcpConfig = field(default_factory=IcpConfig)
    scan_duration: float = 0.9  # ICP uses the first fraction of the sweep
    target_points: int = 4096  # uniform downsample budget (static shape)
    motion_compensation: bool = True
    # sky segmentation (reference tracker.py:257-296): emit synthetic sky
    # directions from empty upper-hemisphere cells of the spherical
    # projection; the SLAM loop turns them into transparent supervision rays
    sky_segmentation: bool = False
    sky_max_rays: int = 1024
    sky_min_elevation_deg: float = 5.0
    # pin the tracker's device programs (ICP, motion comp) to one device so
    # tracking and mapping run as two concurrent programs on DISJOINT
    # devices (the PP axis; reference = two processes on one GPU)
    device_index: Optional[int] = None
    # ICP cloud dumps (reference debug.flags draw_*_clouds,
    # src/tracking/tracker.py:126-137,239-250): a runtime/debug_dump
    # DebugFlags; when draw_icp_clouds is on, each tracked frame writes the
    # ICP input cloud, its aligned copy, and the target (previous) cloud
    debug: Optional[object] = None


@dataclass
class TrackResult:
    pose: np.ndarray  # (4,4) world_T_lidar for this frame
    scan: LidarScan  # motion-compensated scan
    rmse: float
    fitness: float
    wall_time_s: float
    sky_dirs: Optional[np.ndarray] = None  # (M, 3) sensor-frame sky dirs


class Tracker:
    def __init__(self, cfg: TrackerConfig = TrackerConfig()):
        self.cfg = cfg
        self._icp = make_icp(cfg.icp)
        self._prev_cloud: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self._prev_pose: Optional[np.ndarray] = None
        self._prev_time: Optional[float] = None
        self.track_times: List[float] = []
        self._frame_count = 0
        self._device = (
            jax.devices()[cfg.device_index] if cfg.device_index is not None else None
        )

    def _put(self, x):
        """Pin device arrays to the tracker's device (computation follows
        its arguments, so ICP/motion-comp dispatch there)."""
        return jax.device_put(x, self._device) if self._device is not None else x

    def _extract_cloud(self, scan: LidarScan) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Middle scan fraction -> uniform stride downsample to a fixed
        budget, in the sensor frame. Host-side prep."""
        dirs = np.asarray(scan.ray_directions)
        dist = np.asarray(scan.distances)
        ts = np.asarray(scan.timestamps)
        valid = np.asarray(scan.valid)

        tmin = ts[valid].min() if valid.any() else 0.0
        tmax = ts[valid].max() if valid.any() else 1.0
        keep = valid & (ts <= tmin + self.cfg.scan_duration * (tmax - tmin))
        idx = np.flatnonzero(keep)
        n = self.cfg.target_points
        if len(idx) > n:
            idx = idx[np.linspace(0, len(idx) - 1, n).astype(np.int64)]
        pts = dirs[idx] * dist[idx, None]
        pad = n - len(idx)
        v = np.concatenate([np.ones(len(idx), bool), np.zeros(pad, bool)])
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 3), pts.dtype)])
        return self._put(jnp.asarray(pts, jnp.float32)), self._put(jnp.asarray(v))

    def _dump_icp_clouds(self, cloud, cloud_valid, prev_pts, prev_valid, T_rel):
        """Write this frame's ICP clouds (input, aligned, target) as pcds —
        the reference's tracker cloud dumps
        (``src/tracking/tracker.py:126-137,239-250``)."""
        import os

        from loner_tpu.runtime.debug_dump import write_pcd

        d = os.path.join(self.cfg.debug.dump_dir, f"frame_{self._frame_count}")
        src = np.asarray(cloud)[np.asarray(cloud_valid)]
        tgt = np.asarray(prev_pts)[np.asarray(prev_valid)]
        T = np.asarray(T_rel)
        write_pcd(os.path.join(d, "icp_input.pcd"), src)
        write_pcd(os.path.join(d, "icp_aligned.pcd"), src @ T[:3, :3].T + T[:3, 3])
        write_pcd(os.path.join(d, "icp_target.pcd"), tgt)

    def track(self, frame_scan: LidarScan, timestamp: float) -> TrackResult:
        t0 = time.time()
        cloud, cloud_valid = self._extract_cloud(frame_scan)

        if self._prev_cloud is None:
            # first frame anchors the origin (reference tracker.py:187-196)
            pose = np.eye(4)
            rmse, fitness = 0.0, 1.0
        else:
            prev_pts, prev_valid = self._prev_cloud
            T_rel, rmse_j, fit_j = self._icp(
                cloud, cloud_valid, prev_pts, prev_valid, jnp.eye(4, dtype=jnp.float32)
            )
            # T_rel maps current sensor frame into the previous sensor frame
            pose = self._prev_pose @ np.asarray(T_rel, np.float64)
            rmse, fitness = float(rmse_j), float(fit_j)
            if self.cfg.debug is not None and self.cfg.debug.on("draw_icp_clouds"):
                self._dump_icp_clouds(cloud, cloud_valid, prev_pts, prev_valid, T_rel)

        scan = frame_scan
        if self.cfg.motion_compensation and self._prev_pose is not None:
            new_dirs, new_dists = motion_compensate(
                self._put(frame_scan.ray_directions),
                self._put(frame_scan.distances),
                self._put(frame_scan.timestamps),
                jnp.asarray(self._prev_pose, jnp.float32),
                jnp.asarray(pose, jnp.float32),
                jnp.asarray(self._prev_time, jnp.float32),
                jnp.asarray(timestamp, jnp.float32),
                jnp.asarray(pose, jnp.float32),
            )
            scan = frame_scan._replace(ray_directions=new_dirs, distances=new_dists)
            cloud, cloud_valid = self._extract_cloud(scan)

        self._prev_cloud = (cloud, cloud_valid)
        self._prev_pose = pose
        self._prev_time = timestamp

        sky_dirs = None
        if self.cfg.sky_segmentation:
            from loner_tpu.tracking.sky import extract_sky_directions

            sky_dirs = extract_sky_directions(
                np.asarray(scan.ray_directions),
                np.asarray(scan.valid),
                min_elevation_deg=self.cfg.sky_min_elevation_deg,
                max_rays=self.cfg.sky_max_rays,
            )

        dt = time.time() - t0
        self.track_times.append(dt)
        self._frame_count += 1
        return TrackResult(
            pose=pose, scan=scan, rmse=rmse, fitness=fitness, wall_time_s=dt,
            sky_dirs=sky_dirs,
        )
