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
