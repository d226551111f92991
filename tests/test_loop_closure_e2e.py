"""Loop closure end-to-end: a closed loop driven through the full LonerSLAM
pipeline with injected odometry drift; pose-graph BA at stop() must accept
loop factors from ICP scan re-alignment and strictly improve keyframe ATE.
(North-star capability — no reference analog; the reference's keyframe poses
are only ever corrected through the rendering loss.)"""
import json

import numpy as np
import pytest

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan, sky_scan
from loner_tpu.geometry.world_cube import compute_world_cube
from tests.test_slam_e2e import build_slam


@pytest.mark.slow
def test_ba_corrects_injected_drift(tmp_path):
    scene = synthetic.Scene.default()
    # two full laps of the circle: the second lap revisits every first-lap
    # pose, so loop-closure candidates (far in index, near in space) exist
    poses1, ts1 = synthetic.circular_trajectory(n_poses=30, radius=5.0, z=1.5, period=6.0)
    poses = np.concatenate([poses1, poses1])
    ts = np.concatenate([ts1, ts1 + 6.0])
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=True)
    slam = build_slam(cube, float(cube.scale_factor))
    lc = slam.cfg.loop_closure
    lc.enabled = True
    lc.min_index_gap = 5
    lc.max_candidate_distance_m = 4.0

    # inject odometry drift on top of the (accurate) ICP tracker: a slowly
    # growing translation, the classic accumulated-drift failure BA fixes
    orig_track = slam.tracker.track

    def drifting_track(scan, t):
        res = orig_track(scan, t)
        drift = np.eye(4)
        drift[0, 3] = 0.09 * t  # ~0.7 m by loop close
        res.pose = drift @ res.pose
        return res

    slam.tracker.track = drifting_track

    gt_rel = np.linalg.inv(poses[0])[None] @ poses
    for T, t0, gt in zip(poses, ts, gt_rel):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=3072)
        sky = sky_scan(dirs[~hit][:256], 41.0, t0, pad_to=256)
        slam.process_scan(scan, t0, gt_pose=gt, sky=sky)

    kfs = slam.mapper.kf_manager.keyframes
    assert len(kfs) >= 6
    gt_by_t = {t: g for t, g in zip(ts, gt_rel)}

    def kf_ate(get_pose):
        errs = [
            np.linalg.norm(get_pose(k)[:3, 3] - gt_by_t[k.timestamp][:3, 3])
            for k in kfs
        ]
        return float(np.sqrt(np.mean(np.square(errs))))

    ate_before = kf_ate(lambda k: slam.mapper.optimized_pose(k))
    slam.stop(str(tmp_path))
    ate_after = kf_ate(lambda k: slam.mapper.optimized_pose(k))

    assert slam.ba_info is not None
    assert slam.ba_info["n_loop_closures"] >= 1, slam.ba_info
    # drift of ~0.5+ m must be substantially repaired, not just nudged
    assert ate_after < ate_before * 0.6, (ate_before, ate_after, slam.ba_info)

    # ba_info lands in the run directory (output contract)
    with open(tmp_path / "ba_info.json") as f:
        info = json.load(f)
    assert info["n_loop_closures"] == slam.ba_info["n_loop_closures"]
