import os

import numpy as np
import pytest

from loner_tpu.data.dataset import (
    SequenceDataset,
    interpolate_gt_poses,
    write_synthetic_dataset,
)
from loner_tpu.mapping.submaps import SubmapCollection, segment_trajectory


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("seq"))
    write_synthetic_dataset(root, n_poses=10, n_channels=8, n_azimuth=64)
    return root


class TestDataset:
    def test_roundtrip(self, dataset_dir):
        ds = SequenceDataset(dataset_dir, pad_to=1024)
        assert len(ds) == 10
        scan, ts = ds.load_scan(0)
        assert scan.ray_directions.shape == (1024, 3)
        assert bool(scan.valid.any())
        assert ds.gt_poses is not None and len(ds.gt_poses) == 10

    def test_meta(self, dataset_dir):
        ds = SequenceDataset(dataset_dir)
        assert ds.meta.ray_range[1] == 40.0

    def test_gt_interpolation_midpoint(self):
        T0 = np.eye(4)
        T1 = np.eye(4)
        T1[:3, 3] = [2.0, 0, 0]
        out = interpolate_gt_poses(np.stack([T0, T1]), np.array([0.0, 1.0]), np.array([0.5]))
        np.testing.assert_allclose(out[0][:3, 3], [1.0, 0, 0], atol=1e-6)

    def test_gt_interpolation_clamps(self):
        T0 = np.eye(4)
        T1 = np.eye(4)
        T1[:3, 3] = [2.0, 0, 0]
        out = interpolate_gt_poses(np.stack([T0, T1]), np.array([0.0, 1.0]), np.array([-1.0, 9.0]))
        np.testing.assert_allclose(out[0], T0, atol=1e-9)
        np.testing.assert_allclose(out[1], T1, atol=1e-9)


class TestSubmapSegmentation:
    def test_arc_length_segments(self):
        # straight line, 1 m spacing, 100 poses -> 50 m segments = 2 cores
        pos = np.zeros((101, 3))
        pos[:, 0] = np.arange(101)
        segs = segment_trajectory(pos, segment_length_m=50.0, overlap_poses=5)
        assert len(segs) == 3 or len(segs) == 2  # 0-50, 50-100(, tail)
        assert segs[0].core_indices[0] == 0
        # overlap padding extends beyond the core
        assert segs[1].indices[0] == segs[1].core_indices[0] - 5
        # cores partition the trajectory
        all_core = [i for s in segs for i in s.core_indices]
        assert sorted(all_core) == list(range(101))

    def test_middle_point_lookup(self, tmp_path):
        pos = np.zeros((101, 3))
        pos[:, 0] = np.arange(101)
        segs = segment_trajectory(pos, 50.0, 5)
        coll = SubmapCollection(
            np.stack([s.middle_point for s in segs]), [f"s{i}" for i in range(len(segs))]
        )
        assert coll.query([2.0, 0, 0]) == 0
        assert coll.query([90.0, 0, 0]) == len(segs) - 1
        coll.save(str(tmp_path))
        back = SubmapCollection.load(str(tmp_path))
        np.testing.assert_allclose(back.middle_points, coll.middle_points)


class TestTrajectoryExtraction:
    """Pure cores of the bag GT/odometry extraction
    (reference rosbag_utils/extract_trajectories.py)."""

    def test_poses_from_stamped_quats_sorts_and_converts(self):
        from loner_tpu.data.rosbag_convert import poses_from_stamped_quats

        stamps = np.array([2.0, 0.0, 1.0])
        pos = np.array([[2, 0, 0], [0, 0, 0], [1, 0, 0]], float)
        # identity, identity, 90 deg yaw
        quats = np.array(
            [[0, 0, 0, 1], [0, 0, 0, 1], [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]],
            float,
        )
        poses, times = poses_from_stamped_quats(stamps, pos, quats)
        np.testing.assert_allclose(times, [0.0, 1.0, 2.0])
        np.testing.assert_allclose(poses[:, 0, 3], [0.0, 1.0, 2.0])
        # the t=1 pose carries the yaw
        np.testing.assert_allclose(poses[1, :3, 0], [0, 1, 0], atol=1e-6)

    def test_select_tf_pair_filters_frames(self):
        from loner_tpu.data.rosbag_convert import select_tf_pair

        parents = ["map", "odom", "/map", "map"]
        children = ["base", "base", "base", "lidar"]
        stamps = np.arange(4.0)
        pos = np.arange(12.0).reshape(4, 3)
        quats = np.tile([0, 0, 0, 1.0], (4, 1))
        s, p, q = select_tf_pair(parents, children, stamps, pos, quats, "map", "base")
        np.testing.assert_allclose(s, [0.0, 2.0])
        np.testing.assert_allclose(p[:, 0], [0.0, 6.0])
