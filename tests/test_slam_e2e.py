"""End-to-end online SLAM smoke test on the synthetic scene (small budgets):
tracker odometry must follow the trajectory and the full pipeline must write
the output contract."""
import numpy as np
import pytest

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan, sky_scan
from loner_tpu.geometry.world_cube import compute_world_cube
from loner_tpu.mapping.keyframe_manager import KeyFrameManagerConfig
from loner_tpu.mapping.mapper import (
    IterationPhase,
    OnlineMapperConfig,
    SchedulePhase,
)
from loner_tpu.mapping.optimizer import MapperConfig
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.nerf import NeRFConfig
from loner_tpu.models.occupancy_grid import OccGridConfig
from loner_tpu.slam import LonerSLAM, SlamConfig
from loner_tpu.tracking.tracker import TrackerConfig
from loner_tpu.tracking.icp import IcpConfig, IcpStage


def build_slam(cube, world_scale, single_threaded=True):
    mapper_cfg = MapperConfig(
        nerf=NeRFConfig(
            num_colors=1,
            pos_encoding_sigma=HashEncodingConfig(n_levels=6, log2_hashmap_size=14),
            pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
            sigma_hidden_dim=32,
            intensity_hidden_dim=16,
            intensity_hidden_layers=1,
        ),
        occ=OccGridConfig(voxel_size=32),
        ray_range=(1.0, 40.0),
        world_scale=world_scale,
        window_size=4,
        max_keyframes=32,
        rays_per_kf=128,
        sky_rays_per_kf=16,
        n_samples_train=64,
        n_samples_test=128,
    )
    schedule = [
        SchedulePhase(1, [IterationPhase(20, freeze_poses=True)]),
        SchedulePhase(-1, [IterationPhase(10, freeze_poses=False)]),
    ]
    return LonerSLAM(
        SlamConfig(
            tracker=TrackerConfig(
                icp=IcpConfig(stages=(IcpStage(1.5, 8), IcpStage(0.25, 8)), n_buckets=1 << 12),
                target_points=2048,
                motion_compensation=False,  # static-pose synthetic scans
            ),
            mapper=OnlineMapperConfig(
                mapper=mapper_cfg,
                keyframe_manager=KeyFrameManagerConfig(
                    time_diff_seconds=1.0, window_size=4
                ),
                schedule=schedule,
                n_sky_pad=256,
            ),
            single_threaded=single_threaded,
        ),
        cube,
    )


@pytest.fixture(scope="module")
def sequence():
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=48, radius=5.0, z=1.5, period=9.6)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=True)
    scans = []
    for T, t0 in zip(poses, ts):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=3072)
        sky = sky_scan(dirs[~hit][:256], 41.0, t0, pad_to=256)
        scans.append((scan, sky, t0, T))
    return scene, poses, ts, cube, scans


class TestOnlineSlam:
    def test_tracking_follows_trajectory(self, sequence, tmp_path):
        scene, poses, ts, cube, scans = sequence
        slam = build_slam(cube, float(cube.scale_factor))

        # gt poses re-based to the first frame, like the tracker's frame
        gt_rel = np.linalg.inv(poses[0])[None] @ poses

        est = []
        for (scan, sky, t0, T), gt in zip(scans, gt_rel):
            pose = slam.process_scan(scan, t0, gt_pose=gt, sky=sky)
            assert pose is not None
            est.append(pose)
        slam.stop(str(tmp_path))

        est = np.stack(est)
        ate = np.sqrt(np.mean(np.linalg.norm(est[:, :3, 3] - gt_rel[:, :3, 3], axis=1) ** 2))
        # odometry drift over a 31 m loop must stay small (measured ~0.06 m)
        assert ate < 0.3, f"tracking ATE {ate:.3f} m"

        # output contract
        assert (tmp_path / "trajectory" / "tracking_only.txt").exists()
        assert (tmp_path / "trajectory" / "estimated_trajectory.txt").exists()
        assert (tmp_path / "trajectory" / "keyframe_trajectory.txt").exists()
        assert (tmp_path / "track_times.csv").exists()
        assert len(slam.mapper.kf_manager) >= 4

    def test_threaded_mode_matches_contract(self, sequence, tmp_path):
        scene, poses, ts, cube, scans = sequence
        slam = build_slam(cube, float(cube.scale_factor), single_threaded=False)
        for scan, sky, t0, T in scans[:12]:
            slam.process_scan(scan, t0, sky=sky)
        slam.stop(str(tmp_path))
        assert (tmp_path / "trajectory" / "tracking_only.txt").exists()
        assert len(slam.mapper.kf_manager) >= 2


class TestConcurrentDeviceSplit:
    def test_tracker_and_mapper_on_disjoint_devices(self, sequence, tmp_path):
        """PP axis: tracker pinned to device 0, mapper DP over devices 1..m —
        two concurrent programs on disjoint devices of the virtual mesh."""
        import jax

        scene, poses, ts, cube, scans = sequence
        slam = build_slam(cube, float(cube.scale_factor), single_threaded=False)
        slam.cfg.concurrent_device_split = True
        # re-run the constructor wiring on the existing config
        slam2 = LonerSLAM(slam.cfg, cube)
        assert slam2.tracker._device == jax.devices()[0]
        assert slam2.mapper.mesh is not None
        mapper_devs = set(slam2.mapper.mesh.devices.ravel())
        assert jax.devices()[0] not in mapper_devs

        for scan, sky, t0, T in scans[:12]:
            slam2.process_scan(scan, t0, sky=sky)
        slam2.stop(str(tmp_path / "split"))
        assert (tmp_path / "split" / "trajectory" / "tracking_only.txt").exists()
        # tracker's device buffers really live on device 0
        prev_pts, _ = slam2.tracker._prev_cloud
        assert list(prev_pts.devices())[0] == jax.devices()[0]
        # mapper state lives on the mapper mesh, not the tracker device
        state_devs = set(jax.tree.leaves(slam2.mapper.state.params)[0].devices())
        assert jax.devices()[0] not in state_devs


class TestDeviceSplitHeuristic:
    def test_mapper_gets_largest_divisor_of_window(self, sequence):
        """n=3 devices, window 8 -> mapper on 2 devices (not 1); prime
        window with no divisor <= n-1 -> 1 device + a warning."""
        import warnings

        import jax

        scene, poses, ts, cube, scans = sequence
        n = len(jax.devices())
        assert n >= 3

        slam = build_slam(cube, float(cube.scale_factor))
        cfg = slam.cfg
        cfg.concurrent_device_split = True
        cfg.mapper.mapper = cfg.mapper.mapper._replace(window_size=8)
        # simulate n=3 by checking the divisor math directly on the config
        w = cfg.mapper.mapper.window_size
        m = max(d for d in range(1, 3) if w % d == 0)
        assert m == 2

        # full constructor path on the real 8-device mesh: window 8 ->
        # mapper devices = largest divisor of 8 within the 7 available = 4
        slam2 = LonerSLAM(cfg, cube)
        assert slam2.cfg.mapper.mesh_device_indices == [1, 2, 3, 4]

        # prime window: warning + single mapper device
        cfg2 = build_slam(cube, float(cube.scale_factor)).cfg
        cfg2.concurrent_device_split = True
        cfg2.mapper.mapper = cfg2.mapper.mapper._replace(window_size=11)
        cfg2.mapper.keyframe_manager.window_size = 11
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            slam3 = LonerSLAM(cfg2, cube)
        assert slam3.cfg.mapper.mesh_device_indices == [1]
        assert any("no divisor" in str(r.message) for r in rec)
