import numpy as np
import jax.numpy as jnp

from loner_tpu.data.scan import make_lidar_scan
from loner_tpu.geometry import se3
from loner_tpu.mapping.keyframe import KeyFrame
from loner_tpu.mapping.keyframe_manager import KeyFrameManager, KeyFrameManagerConfig
from loner_tpu.runtime.trajectory_logger import TrajectoryLogger, dump_tum, load_tum


def make_kf(i, t, pose):
    scan = make_lidar_scan(
        np.tile([[1.0, 0, 0]], (4, 1)), np.full(4, 5.0), np.full(4, t), pad_to=4
    )
    return KeyFrame(scan=scan, timestamp=t, pose_index=i, tracked_pose=pose)


def pose_at(x, yaw=0.0):
    return np.asarray(se3.pose_to_matrix(jnp.asarray([x, 0, 0, 0, 0, yaw], jnp.float32)), np.float64)


class TestKeyFrameManager:
    def test_temporal_gate(self):
        m = KeyFrameManager(KeyFrameManagerConfig(selection_strategy="TEMPORAL", time_diff_seconds=3.0))
        assert m.should_accept(0.0, pose_at(0))
        m.accept(make_kf(0, 0.0, pose_at(0)))
        assert not m.should_accept(2.0, pose_at(1))
        assert m.should_accept(3.5, pose_at(1))

    def test_motion_gate(self):
        m = KeyFrameManager(
            KeyFrameManagerConfig(selection_strategy="MOTION", translation_threshold_m=0.5)
        )
        m.accept(make_kf(0, 0.0, pose_at(0)))
        assert not m.should_accept(10.0, pose_at(0.3))
        assert m.should_accept(10.0, pose_at(0.7))
        # rotation trigger
        assert m.should_accept(10.0, pose_at(0.0, yaw=np.deg2rad(30)))

    def test_rebase_composes_corrections(self):
        m = KeyFrameManager(KeyFrameManagerConfig())
        m.accept(make_kf(0, 0.0, pose_at(1.0)))
        # mapper moved KF0 to x=1.2 (optimized), tracker thinks we are at x=2.0
        opt = np.zeros((4, 6), np.float32)
        opt[0] = np.asarray(se3.matrix_to_pose(jnp.asarray(pose_at(1.2), jnp.float32)))
        rebased = m.rebase_pose(pose_at(2.0), opt)
        # relative tracked motion = +1.0 from KF0 -> rebased = 1.2 + 1.0
        np.testing.assert_allclose(rebased[:3, 3], [2.2, 0, 0], atol=1e-5)

    def test_window_hybrid_includes_recent(self):
        m = KeyFrameManager(
            KeyFrameManagerConfig(window_selection="HYBRID", window_size=4, num_recent_frames=1)
        )
        for i in range(10):
            m.accept(make_kf(i, float(i * 3), pose_at(i)))
        win = m.get_active_window()
        assert len(win) == 4
        assert win[-1].pose_index == 9  # newest always included

    def test_window_pads_by_repetition(self):
        m = KeyFrameManager(KeyFrameManagerConfig(window_size=8))
        m.accept(make_kf(0, 0.0, pose_at(0)))
        m.accept(make_kf(1, 3.0, pose_at(1)))
        win = m.get_active_window()
        assert len(win) == 8


class TestTrajectoryLogger:
    def test_online_estimate_applies_correction(self):
        log = TrajectoryLogger()
        log.update_keyframe(0.0, tracked_pose=pose_at(1.0), optimized_pose=pose_at(1.5))
        est = log.online_estimate(1.0, pose_at(2.0))
        # correction +0.5 applied to tracked
        np.testing.assert_allclose(est[:3, 3], [2.5, 0, 0], atol=1e-5)

    def test_reanchoring_uses_preceding_keyframe(self):
        log = TrajectoryLogger()
        log.log_frame(0.5, pose_at(0.5))
        log.log_frame(4.0, pose_at(4.0))
        log.update_keyframe(0.0, pose_at(0.0), pose_at(0.1))
        log.update_keyframe(3.0, pose_at(3.0), pose_at(3.4))
        traj = log.reconstruct_trajectory()
        np.testing.assert_allclose(traj[0][:3, 3], [0.6, 0, 0], atol=1e-5)  # +0.1
        np.testing.assert_allclose(traj[1][:3, 3], [4.4, 0, 0], atol=1e-5)  # +0.4

    def test_tum_roundtrip(self, tmp_path):
        poses = np.stack([pose_at(1.0, 0.3), pose_at(2.0, -0.5)])
        ts = np.array([0.1, 0.2])
        p = str(tmp_path / "traj.txt")
        dump_tum(poses, ts, p)
        back, ts_back = load_tum(p)
        np.testing.assert_allclose(back, poses, atol=1e-5)
        np.testing.assert_allclose(ts_back, ts, atol=1e-9)

    def test_finish_writes_files(self, tmp_path):
        log = TrajectoryLogger()
        log.log_frame(0.0, pose_at(0), gt_pose=pose_at(0))
        log.update_keyframe(0.0, pose_at(0), pose_at(0))
        log.finish(str(tmp_path))
        for name in ["tracking_only.txt", "estimated_trajectory.txt", "keyframe_trajectory.txt", "groundtruth.txt"]:
            assert (tmp_path / name).exists(), name


class TestHybridLazy:
    def _mgr(self, strategy):
        return KeyFrameManager(
            KeyFrameManagerConfig(
                selection_strategy=strategy,
                time_diff_seconds=1.0,
                translation_threshold_m=0.5,
            )
        )

    def _kf(self, t, x):
        T = np.eye(4)
        T[0, 3] = x
        return KeyFrame(
            scan=None, timestamp=t, pose_index=0, tracked_pose=T
        )

    def test_lazy_counts_motion_rejections_as_mapped(self):
        """HYBRID_LAZY (reference keyframe_manager.py:122-127): a stationary
        frame that passes the temporal gate but fails the motion gate
        advances last_mapped_time so backpressure doesn't starve."""
        m = self._mgr("HYBRID_LAZY")
        assert m.should_accept(0.0, np.eye(4))
        m.accept(self._kf(0.0, 0.0))
        # stationary frame at t=2: temporal ok, motion rejected
        assert not m.should_accept(2.0, self._kf(2.0, 0.01).tracked_pose)
        assert m.last_mapped_time == 2.0

    def test_plain_hybrid_reoptimizes_when_stationary(self):
        # HYBRID: elapsed time + no motion -> no new keyframe, but the
        # optimization budget is still spent on the existing window and the
        # temporal clock resets (reference keyframe_manager.py:106-120).
        m = self._mgr("HYBRID")
        assert m.decide(0.0, np.eye(4)) == "NEW"
        m.accept(self._kf(0.0, 0.0))
        assert m.decide(2.0, self._kf(2.0, 0.01).tracked_pose) == "REOPT"
        assert m.last_mapped_time == 2.0
        # clock was reset: immediately after, neither criterion fires
        assert m.decide(2.5, self._kf(2.5, 0.02).tracked_pose) == "SKIP"

    def test_hybrid_lazy_skips_when_stationary(self):
        m = self._mgr("HYBRID_LAZY")
        assert m.decide(0.0, np.eye(4)) == "NEW"
        m.accept(self._kf(0.0, 0.0))
        assert m.decide(2.0, self._kf(2.0, 0.01).tracked_pose) == "SKIP"
        # the rejection still counts as 'mapped' for backpressure
        assert m.last_mapped_time == 2.0
