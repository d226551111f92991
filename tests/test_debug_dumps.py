"""Debug-flag observability suite: ICP cloud dumps, ray/sample pcds, and
loss-distribution artifacts must land in the run dir when the flags are on
(the reference gates these behind ``debug.flags``,
``src/tracking/tracker.py:126-137``, ``src/mapping/optimizer.py:391-396,
927-1017``)."""
import glob
import os

import numpy as np

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan
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
from loner_tpu.runtime.debug_dump import DebugFlags, read_pcd, write_pcd
from loner_tpu.slam import LonerSLAM, SlamConfig
from loner_tpu.tracking.icp import IcpConfig, IcpStage
from loner_tpu.tracking.tracker import TrackerConfig


def test_pcd_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    inten = np.linspace(0, 1, 100, dtype=np.float32)
    p = str(tmp_path / "cloud.pcd")
    write_pcd(p, pts, intensity=inten)
    back = read_pcd(p)
    assert back.shape == (100, 4)
    np.testing.assert_allclose(back[:, :3], pts, atol=1e-5)
    np.testing.assert_allclose(back[:, 3], inten, atol=1e-5)


def test_debug_dumps_land_in_run_dir(tmp_path):
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=6, radius=5.0, z=1.5, period=6.0)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=True)

    mapper_cfg = MapperConfig(
        nerf=NeRFConfig(
            num_colors=1,
            pos_encoding_sigma=HashEncodingConfig(n_levels=4, log2_hashmap_size=12),
            pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
            sigma_hidden_dim=16,
            intensity_hidden_dim=16,
            intensity_hidden_layers=1,
        ),
        occ=OccGridConfig(voxel_size=16),
        ray_range=(1.0, 40.0),
        world_scale=float(cube.scale_factor),
        window_size=2,
        max_keyframes=16,
        rays_per_kf=64,
        sky_rays_per_kf=8,
        n_samples_train=32,
        n_samples_test=32,
    )
    out_dir = str(tmp_path / "run")
    slam = LonerSLAM(
        SlamConfig(
            tracker=TrackerConfig(
                icp=IcpConfig(stages=(IcpStage(1.5, 4),), n_buckets=1 << 10),
                target_points=1024,
                motion_compensation=False,
            ),
            mapper=OnlineMapperConfig(
                mapper=mapper_cfg,
                keyframe_manager=KeyFrameManagerConfig(
                    time_diff_seconds=1.0, window_size=2
                ),
                schedule=[SchedulePhase(-1, [IterationPhase(3, freeze_poses=True)])],
                n_sky_pad=64,
                debug=DebugFlags(
                    global_enabled=True,
                    draw_icp_clouds=True,
                    draw_rays=True,
                    draw_samples=True,
                    draw_loss_distribution=True,
                ),
            ),
            single_threaded=True,
        ),
        cube,
        out_dir=out_dir,
    )
    for T, t0 in zip(poses, ts):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=8, n_azimuth=128, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=1536)
        slam.process_scan(scan, t0, gt_pose=T)
    slam.stop(out_dir)

    dbg = os.path.join(out_dir, "debug")
    # (a) tracker ICP clouds: input/aligned/target per tracked frame >= 1
    aligned = glob.glob(os.path.join(dbg, "frame_*", "icp_aligned.pcd"))
    assert aligned, "no ICP cloud dumps"
    a = read_pcd(aligned[0])
    assert a.shape[1] == 3 and len(a) > 10
    assert os.path.exists(os.path.join(os.path.dirname(aligned[0]), "icp_input.pcd"))
    assert os.path.exists(os.path.join(os.path.dirname(aligned[0]), "icp_target.pcd"))

    # (b) train-step ray + sample pcds per mapped window
    rays = glob.glob(os.path.join(dbg, "keyframe_*", "ray_endpoints.pcd"))
    assert rays, "no ray dumps"
    r = read_pcd(rays[0])
    assert r.shape[1] == 4  # xyz + depth-err intensity
    # endpoints must be metric-world-plausible (inside the ray range ball)
    assert np.linalg.norm(r[:, :3], axis=1).max() < 100.0
    samples = glob.glob(os.path.join(dbg, "keyframe_*", "sample_points.pcd"))
    assert samples, "no sample dumps"
    s = read_pcd(samples[0])
    assert s.shape[1] == 4 and len(s) > 100  # xyz + rendering weight

    # (c) loss-distribution artifact with per-ray vectors
    dists_npz = glob.glob(os.path.join(dbg, "keyframe_*", "loss_distribution.npz"))
    assert dists_npz, "no loss-distribution dumps"
    z = np.load(dists_npz[0])
    assert {"depth_err_m", "js", "los", "valid"} <= set(z.files)
    n_rays = mapper_cfg.rays_per_window
    assert z["depth_err_m"].shape == (n_rays,)
    assert np.isfinite(z["depth_err_m"][z["valid"] > 0]).all()
