"""Loop-closure + pose-graph BA integration: on a synthetic loop with
injected odometry drift, ICP loop factors + the Gauss-Newton solve must pull
the trajectory back toward groundtruth (the north star's 'distributed BA
over keyframes', structured in loner_tpu/parallel/pose_graph.py)."""
import numpy as np
import pytest

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan
from loner_tpu.mapping.keyframe import KeyFrame
from loner_tpu.mapping.loop_closure import (
    LoopClosureConfig,
    find_candidates,
    refine_keyframe_poses,
)


def _ate(poses, gt):
    return float(
        np.sqrt(np.mean(np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1) ** 2))
    )


@pytest.fixture(scope="module")
def drifted_loop():
    """A closed circular loop; tracked odometry accumulates a small yaw +
    translation bias so the loop doesn't close (endpoint drift ~1 m)."""
    scene = synthetic.Scene.default()
    n = 24
    gt, ts = synthetic.circular_trajectory(n_poses=n, radius=5.0, z=1.5, period=24.0)

    # drift: re-integrate GT relative motions with a per-step bias
    bias = np.eye(4)
    yaw = np.deg2rad(0.5)
    bias[:3, :3] = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    )
    bias[:3, 3] = [0.05, 0.0, 0.005]
    drifted = [gt[0]]
    for i in range(1, n):
        z = np.linalg.inv(gt[i - 1]) @ gt[i]
        drifted.append(drifted[-1] @ (z @ bias))
    drifted = np.stack(drifted)

    kfs = []
    for i in range(n):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, gt[i], ts[i], n_channels=12, n_azimuth=192, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=2048)
        kfs.append(
            KeyFrame(
                scan=scan,
                timestamp=ts[i],
                pose_index=i,
                tracked_pose=drifted[i],
                gt_pose=gt[i],
            )
        )
    return kfs, gt, drifted


class TestLoopClosure:
    def test_candidates_prefer_loop_endpoints(self, drifted_loop):
        kfs, gt, drifted = drifted_loop
        cfg = LoopClosureConfig(enabled=True, min_index_gap=12, max_candidate_distance_m=4.0)
        cands = find_candidates(gt[:, :3, 3], cfg)
        assert cands, "no candidates on a closed loop"
        assert any(j - i >= 18 for i, j in cands), cands

    def test_ba_reduces_drift(self, drifted_loop):
        kfs, gt, drifted = drifted_loop
        ate_before = _ate(drifted, gt)
        assert ate_before > 0.3, "drift injection too small for the test to mean anything"

        cfg = LoopClosureConfig(
            enabled=True,
            min_index_gap=10,
            max_candidate_distance_m=5.0,
            max_candidates=8,
        )
        refined, info = refine_keyframe_poses(kfs, drifted, cfg)
        assert info["n_loop_closures"] >= 1, info
        ate_after = _ate(refined, gt)
        # one endpoint closure spreads the linear drift around the loop:
        # measured 0.587 -> 0.362 m ATE (0.62x)
        assert ate_after < ate_before * 0.7, (
            f"BA did not help: {ate_before:.3f} -> {ate_after:.3f} "
            f"({info['n_loop_closures']} closures)"
        )
        # the closure itself must pull the loop ends together hard
        end_before = float(np.linalg.norm(drifted[-1, :3, 3] - gt[-1, :3, 3]))
        end_after = float(np.linalg.norm(refined[-1, :3, 3] - gt[-1, :3, 3]))
        assert end_after < end_before * 0.5, f"{end_before:.3f} -> {end_after:.3f}"

    def test_no_closures_keeps_poses_consistent(self, drifted_loop):
        """With loop factors impossible (tiny distance gate), odometry
        factors + priors must not blow up the trajectory."""
        kfs, gt, drifted = drifted_loop
        cfg = LoopClosureConfig(
            enabled=True, min_index_gap=10, max_candidate_distance_m=0.01
        )
        refined, info = refine_keyframe_poses(kfs, drifted, cfg)
        assert info["n_loop_closures"] == 0
        assert _ate(refined, drifted) < 0.5
