"""Schedule-bucket selection must advance on every optimization pass —
NEW keyframes and HYBRID stationary re-optimizations alike — matching the
reference, which bumps ``_keyframe_count`` on every ``iterate_optimizer``
call (``src/mapping/optimizer.py:190``). A stationary platform must not
re-run the 1000-iteration first-keyframe phase forever."""
import numpy as np
import pytest

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan
from loner_tpu.geometry.world_cube import compute_world_cube
from loner_tpu.mapping.keyframe_manager import KeyFrameManagerConfig
from loner_tpu.mapping.mapper import (
    IterationPhase,
    OnlineMapper,
    OnlineMapperConfig,
    SchedulePhase,
)
from loner_tpu.mapping.optimizer import MapperConfig
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.nerf import NeRFConfig
from loner_tpu.models.occupancy_grid import OccGridConfig


@pytest.fixture()
def mapper():
    poses = np.eye(4)[None].repeat(4, axis=0)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0))
    cfg = OnlineMapperConfig(
        mapper=MapperConfig(
            nerf=NeRFConfig(
                num_colors=1,
                pos_encoding_sigma=HashEncodingConfig(n_levels=2, log2_hashmap_size=8),
                pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=8),
                sigma_hidden_dim=16,
                intensity_hidden_dim=16,
                intensity_hidden_layers=1,
            ),
            occ=OccGridConfig(voxel_size=8),
            ray_range=(1.0, 40.0),
            window_size=2,
            max_keyframes=8,
            rays_per_kf=16,
            sky_rays_per_kf=4,
            n_samples_train=16,
            n_samples_test=16,
        ),
        keyframe_manager=KeyFrameManagerConfig(
            selection_strategy="HYBRID",
            time_diff_seconds=1.0,
            translation_threshold_m=0.5,
            window_size=2,
        ),
        schedule=[
            SchedulePhase(1, [IterationPhase(7, freeze_poses=True)]),
            SchedulePhase(-1, [IterationPhase(3, freeze_poses=False)]),
        ],
        n_sky_pad=4,
    )
    m = OnlineMapper(cfg, cube)
    # the scheduling logic under test never needs a real train step
    m._train_step = lambda state, window, key, flags, pose_mask, it: (state, {})
    return m


def _scan(t):
    scene = synthetic.Scene.default()
    dirs, dists, stamps, hit = synthetic.simulate_scan(
        scene, np.eye(4), t, n_channels=4, n_azimuth=32, max_range=40.0
    )
    return make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=128)


def _iters_run(mapper, timestamp):
    before = mapper._host_step
    assert mapper.process_frame(_scan(timestamp), timestamp, np.eye(4))
    return mapper._host_step - before


def test_reopt_advances_schedule_bucket(mapper):
    # first keyframe: the 7-iteration first-KF phase
    assert _iters_run(mapper, 0.0) == 7
    # stationary platform at t=2: HYBRID returns REOPT — the schedule must
    # advance to the 3-iteration joint bucket, not re-run the first-KF phase
    assert _iters_run(mapper, 2.0) == 3
    assert len(mapper.kf_manager) == 1  # no new keyframe was created
    # further stationary re-opts stay in the joint bucket
    assert _iters_run(mapper, 4.0) == 3


def test_checkpoint_cadence_follows_opt_count(mapper, tmp_path):
    mapper.cfg.log_level = "VERBOSE"
    mapper.cfg.checkpoint_dir = str(tmp_path)
    _iters_run(mapper, 0.0)
    _iters_run(mapper, 2.0)  # REOPT
    assert mapper._opt_count == 2
    assert (tmp_path / "kf_poses.npz").exists()


def test_attach_image_timestamp_keyed():
    """attach_image must match by scan timestamp when given one (robust
    across scan copies, e.g. a process boundary), and count drops."""
    import numpy as np

    from loner_tpu.data import synthetic
    from loner_tpu.data.scan import make_lidar_scan
    from loner_tpu.geometry.world_cube import compute_world_cube
    from loner_tpu.mapping.mapper import OnlineMapper

    cfg, cube, kf_ts = _tiny_online_setup()
    mapper = OnlineMapper(cfg, cube)
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=3, radius=5.0, z=1.5)
    for T, t0 in zip(poses, ts):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=8, n_azimuth=64, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=512)
        mapper.process_frame(scan, t0, T, gt_pose=T)

    kfs = mapper.kf_manager.keyframes
    assert len(kfs) >= 2
    img = np.zeros((4, 6, 1), np.float32)
    # a COPY of the scan (object identity broken) still matches by timestamp
    copied = kfs[1].scan._replace()
    assert copied is not kfs[1].scan
    ok = mapper.attach_image(copied, img, image_timestamp=kfs[1].timestamp + 0.02,
                             scan_timestamp=kfs[1].timestamp)
    assert ok and kfs[1].image is not None
    assert mapper.image_attaches == 1 and mapper.image_attach_drops == 0
    # unknown timestamp + unknown object -> counted drop
    ok = mapper.attach_image(copied._replace(), img, 99.0, scan_timestamp=98.5)
    assert not ok and mapper.image_attach_drops == 1


def _tiny_online_setup():
    from loner_tpu.data import synthetic
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

    poses, ts = synthetic.circular_trajectory(n_poses=3, radius=5.0, z=1.5)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=True)
    mc = MapperConfig(
        nerf=NeRFConfig(
            num_colors=1,
            pos_encoding_sigma=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
            pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
            sigma_hidden_dim=16,
            intensity_hidden_dim=16,
            intensity_hidden_layers=1,
        ),
        occ=OccGridConfig(voxel_size=8),
        ray_range=(1.0, 40.0),
        world_scale=float(cube.scale_factor),
        window_size=2,
        max_keyframes=8,
        rays_per_kf=32,
        sky_rays_per_kf=8,
        n_samples_train=16,
        n_samples_test=16,
    )
    cfg = OnlineMapperConfig(
        mapper=mc,
        keyframe_manager=KeyFrameManagerConfig(time_diff_seconds=0.5, window_size=2),
        schedule=[SchedulePhase(-1, [IterationPhase(2, freeze_poses=True)])],
        n_sky_pad=16,
    )
    return cfg, cube, ts
