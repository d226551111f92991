"""Rosbag -> on-disk sequence conversion (offline data preparation).

Covers the reference's bag ingestion (``examples/run_loner.py:59-157``
build_scan_from_msg + timestamp heuristics; ``rosbag_utils/`` extraction
tools). ROS is not available in every environment (not in this one), so this
module degrades to an importable API whose entry point raises a clear error
without ``rosbag``/``sensor_msgs``; the numeric heuristics are pure
functions, unit-testable without ROS:

  * nanosecond-scale timestamps -> seconds
  * negative Velodyne per-point times -> offset fix
  * per-point times relative-to-scan-start vs absolute detection
  * Fusion Portable 2048-column per-point time recomputation
  * dynamic-object removal via an axis-aligned box (harvester filter)
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import yaml

from loner_tpu.runtime import native

try:  # pragma: no cover - exercised only where ROS exists
    import rosbag  # type: ignore

    HAS_ROS = True
except Exception:
    HAS_ROS = False


@dataclass
class BagConversionConfig:
    lidar_topic: str = "/os_cloud_node/points"
    min_range: float = 0.3
    timestamps_relative_to_start: bool = True
    fusion_portable_columns: Optional[int] = None  # 2048 -> recompute times
    # dynamic-object box filter in the sensor frame (harvester removal,
    # rosbag_utils/README_data_preparation.md:36-44)
    remove_box_center: Optional[Tuple[float, float, float]] = None
    remove_box_size: Optional[Tuple[float, float, float]] = None


def normalize_point_times(
    times: np.ndarray, scan_stamp: float, relative_to_start: bool = True
) -> np.ndarray:
    """Apply the reference's per-lidar timestamp heuristics
    (``run_loner.py:119-145``): ns -> s scaling, negative-offset fix, and
    conversion to absolute seconds."""
    t = times.astype(np.float64)
    if len(t) == 0:
        return t
    span = t.max() - t.min()
    if span > 1e6:  # nanoseconds
        t = t * 1e-9
    elif span > 1e3:  # microseconds
        t = t * 1e-6
    if t.min() < 0:  # some Velodynes emit negative offsets
        t = t - t.min()
    if relative_to_start or t.max() < 1e6:  # relative to scan start
        t = scan_stamp + t
    return t


def fusion_portable_times(n_points: int, columns: int, scan_stamp: float, period: float = 0.1) -> np.ndarray:
    """Recompute per-point times for sensors that don't report them
    (Fusion Portable: 2048 azimuth columns per sweep)."""
    col = np.arange(n_points) % columns
    return scan_stamp + col / columns * period


def scan_from_arrays(
    points: np.ndarray,  # (N, 3) sensor frame
    times: np.ndarray,  # (N,) absolute seconds
    cfg: BagConversionConfig,
):
    """Filter + convert raw points to (directions, distances, timestamps)."""
    dist = np.linalg.norm(points, axis=1)
    valid = dist >= cfg.min_range
    valid = native.range_filter(dist.astype(np.float32), valid, cfg.min_range, np.inf)
    if cfg.remove_box_center is not None and cfg.remove_box_size is not None:
        valid = native.box_filter(
            points.astype(np.float32), valid, cfg.remove_box_center, cfg.remove_box_size
        )
    points = points[valid]
    times = times[valid]
    dist = dist[valid]
    dirs = points / dist[:, None]
    order = np.argsort(times)
    return dirs[order].astype(np.float32), dist[order].astype(np.float32), times[order]


def convert_bag(bag_path: str, out_dir: str, cfg: BagConversionConfig = BagConversionConfig()):
    """Stream a rosbag's lidar topic into the npz sequence format."""
    if not HAS_ROS:
        raise RuntimeError(
            "rosbag is not available in this environment; run the conversion "
            "where ROS is installed (the on-disk npz format is documented in "
            "loner_tpu/data/dataset.py)"
        )
    import sensor_msgs.point_cloud2 as pc2  # type: ignore

    os.makedirs(os.path.join(out_dir, "scans"), exist_ok=True)
    bag = rosbag.Bag(bag_path)
    i = 0
    for topic, msg, ts in bag.read_messages(topics=[cfg.lidar_topic]):
        fields = [f.name for f in msg.fields]
        has_t = "t" in fields or "time" in fields or "timestamp" in fields
        tname = next((n for n in ("t", "time", "timestamp") if n in fields), None)
        arr = np.array(
            list(pc2.read_points(msg, field_names=("x", "y", "z") + ((tname,) if has_t else ())))
        )
        pts = arr[:, :3]
        stamp = msg.header.stamp.to_sec()
        if has_t:
            times = normalize_point_times(arr[:, 3], stamp, cfg.timestamps_relative_to_start)
        elif cfg.fusion_portable_columns:
            times = fusion_portable_times(len(pts), cfg.fusion_portable_columns, stamp)
        else:
            times = np.full(len(pts), stamp)
        dirs, dist, t = scan_from_arrays(pts, times, cfg)
        np.savez_compressed(
            os.path.join(out_dir, "scans", f"{i:06d}.npz"),
            ray_directions=dirs,
            distances=dist,
            timestamps=t,
        )
        i += 1
    bag.close()
    with open(os.path.join(out_dir, "meta.yaml"), "w") as f:
        yaml.safe_dump({"name": os.path.basename(bag_path)}, f)
    return i


# ---------------------------------------------------------------------------
# trajectory extraction (reference rosbag_utils/extract_trajectories.py)
# ---------------------------------------------------------------------------


def poses_from_stamped_quats(
    stamps: np.ndarray,  # (N,)
    positions: np.ndarray,  # (N, 3)
    quats_xyzw: np.ndarray,  # (N, 4)
) -> Tuple[np.ndarray, np.ndarray]:
    """Stamped position+quaternion stream -> ((N,4,4) poses, sorted stamps).
    The pure core of odometry/tf extraction — unit-testable without ROS."""
    import jax.numpy as jnp

    from loner_tpu.geometry import se3

    stamps = np.asarray(stamps, float)
    order = np.argsort(stamps)
    positions = np.asarray(positions, float)[order]
    quats = np.asarray(quats_xyzw, float)[order]
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(quats, jnp.float32)))
    poses = np.tile(np.eye(4), (len(stamps), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = positions
    return poses, stamps[order]


def select_tf_pair(
    parents: list,
    children: list,
    stamps: np.ndarray,
    positions: np.ndarray,
    quats_xyzw: np.ndarray,
    parent_frame: str,
    child_frame: str,
):
    """Filter a flattened tf stream down to one (parent, child) pair."""
    keep = [
        i
        for i, (p, c) in enumerate(zip(parents, children))
        if p.lstrip("/") == parent_frame.lstrip("/")
        and c.lstrip("/") == child_frame.lstrip("/")
    ]
    idx = np.asarray(keep, int)
    return (
        np.asarray(stamps, float)[idx],
        np.asarray(positions, float)[idx],
        np.asarray(quats_xyzw, float)[idx],
    )


def extract_trajectory_from_bag(
    bag_path: str,
    out_tum: str,
    topic: str = "/mapping_node/scan2map_odometry",
    kind: str = "odometry",  # odometry | tf
    parent_frame: str = "map",
    child_frame: str = "base_link",
) -> int:
    """Odometry/tf topic -> TUM trajectory file (the reference's
    ``extract_trajectories.py:16-45`` role). Returns the pose count."""
    if not HAS_ROS:
        raise RuntimeError("rosbag is not available in this environment")
    from loner_tpu.runtime.trajectory_logger import dump_tum

    stamps, positions, quats, parents, children = [], [], [], [], []
    bag = rosbag.Bag(bag_path)
    for _, msg, _ in bag.read_messages(topics=[topic]):
        if kind == "odometry":
            p = msg.pose.pose.position
            q = msg.pose.pose.orientation
            stamps.append(msg.header.stamp.to_sec())
            positions.append([p.x, p.y, p.z])
            quats.append([q.x, q.y, q.z, q.w])
        else:  # tf2_msgs/TFMessage
            for t in msg.transforms:
                tr = t.transform.translation
                q = t.transform.rotation
                stamps.append(t.header.stamp.to_sec())
                positions.append([tr.x, tr.y, tr.z])
                quats.append([q.x, q.y, q.z, q.w])
                parents.append(t.header.frame_id)
                children.append(t.child_frame_id)
    bag.close()
    stamps = np.asarray(stamps)
    positions = np.asarray(positions)
    quats = np.asarray(quats)
    if kind == "tf":
        stamps, positions, quats = select_tf_pair(
            parents, children, stamps, positions, quats, parent_frame, child_frame
        )
    poses, times = poses_from_stamped_quats(stamps, positions, quats)
    dump_tum(poses, times, out_tum)
    return len(times)


def extract_images_from_bag(
    bag_path: str,
    out_dir: str,
    topic: str = "/stereo/frame_left/image_raw/compressed",
    compressed: bool = True,
    image_scale: float = 1.0,
) -> int:
    """Image topic -> images/*.npz (the reference's ``extract_images.py``
    role; compressed decode via cv2)."""
    if not HAS_ROS:
        raise RuntimeError("rosbag is not available in this environment")
    import cv2

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    bag = rosbag.Bag(bag_path)
    i = 0
    for _, msg, _ in bag.read_messages(topics=[topic]):
        if compressed:
            img = cv2.imdecode(np.frombuffer(msg.data, np.uint8), cv2.IMREAD_COLOR)
        else:
            img = np.frombuffer(msg.data, np.uint8).reshape(msg.height, msg.width, -1)
        if image_scale != 1.0:
            img = cv2.resize(img, None, fx=image_scale, fy=image_scale)
        np.savez_compressed(
            os.path.join(out_dir, "images", f"{i:06d}.npz"),
            image=(img[..., ::-1] if img.ndim == 3 else img),  # BGR -> RGB
            timestamp=np.float64(msg.header.stamp.to_sec()),
        )
        i += 1
    bag.close()
    return i
