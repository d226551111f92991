"""MASK ray-selection strategy (FDT trunk-band sampling)."""
import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan
from loner_tpu.geometry import se3
from loner_tpu.geometry.world_cube import compute_world_cube
from loner_tpu.mapping.keyframe import KeyFrame, stack_window
from loner_tpu.mapping.optimizer import build_window_rays
from test_train_step import tiny_mapper_config


def test_band_indices_and_mask_sampling():
    scene = synthetic.Scene.forest(seed=1)
    poses, ts = synthetic.circular_trajectory(n_poses=2, radius=4.0, z=1.5)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=False)
    cfg = tiny_mapper_config(float(cube.scale_factor))._replace(
        rays_strategy="MASK", window_size=2, rays_per_kf=512, sky_rays_per_kf=32
    )

    kfs = []
    for i, (T, t0) in enumerate(zip(poses, ts)):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=4096)
        kf = KeyFrame(scan=scan, timestamp=t0, pose_index=i, tracked_pose=T, gt_pose=T)
        kf.compute_band_indices(z_range=(0.5, 8.0))
        kfs.append(kf)

    # band indices point at trunk-band points
    kf = kfs[0]
    dirs = np.asarray(kf.scan.ray_directions)
    dist = np.asarray(kf.scan.distances)
    pts_world = (dirs * dist[:, None]) @ kf.gt_pose[:3, :3].T + kf.gt_pose[:3, 3]
    z = pts_world[np.asarray(kf.band_indices)][:, 2]
    assert np.all((z > 0.5) & (z < 8.0))

    # sampled lidar rays respect the band fraction
    window = stack_window(kfs, n_sky_pad=64)
    pose6 = jax.jit(se3.matrix_to_pose)(jnp.asarray(np.stack(poses), jnp.float32))
    all_poses = jnp.zeros((cfg.max_keyframes, 6)).at[:2].set(pose6)
    bundle = build_window_rays(all_poses, window, cube, cfg, jax.random.PRNGKey(0))

    scale = float(cube.scale_factor)
    shift = np.asarray(cube.shift)
    ends = (
        np.asarray(bundle.origins) + np.asarray(bundle.directions) * np.asarray(bundle.depth)[:, None]
    ) * scale - shift
    valid = np.asarray(bundle.valid)

    r = cfg.rays_per_kf
    s = cfg.sky_rays_per_kf
    lidar_sel = np.concatenate([np.arange(0, r), np.arange(r + s, 2 * r + s)])
    band_sel = np.concatenate([np.arange(0, int(r * 0.75)), np.arange(r + s, r + s + int(r * 0.75))])

    in_band = (ends[band_sel][:, 2] > 0.4) & (ends[band_sel][:, 2] < 8.1)
    ok = valid[band_sel]
    # all valid band-designated rays must land in the trunk band
    assert in_band[ok].mean() > 0.95, in_band[ok].mean()

    # compared against uniform sampling, MASK concentrates rays in-band
    cfg_rand = cfg._replace(rays_strategy="RANDOM")
    bundle_r = build_window_rays(all_poses, window, cube, cfg_rand, jax.random.PRNGKey(0))
    ends_r = (
        np.asarray(bundle_r.origins) + np.asarray(bundle_r.directions) * np.asarray(bundle_r.depth)[:, None]
    ) * scale - shift
    in_band_r = (ends_r[lidar_sel][:, 2] > 0.4) & (ends_r[lidar_sel][:, 2] < 8.1)
    in_band_all = (ends[lidar_sel][:, 2] > 0.4) & (ends[lidar_sel][:, 2] < 8.1)
    assert in_band_all.mean() > in_band_r.mean()


def test_fixed_strategy_epoch_coverage():
    """FIXED (reference optimizer.py:269-346): same key + increasing
    iteration slices a fixed per-window shuffle — p/R iterations cover every
    scan point exactly once, and the same (key, iteration) is reproducible."""
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=1, radius=4.0, z=1.5)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=False)
    p, r = 1024, 256
    cfg = tiny_mapper_config(float(cube.scale_factor))._replace(
        rays_strategy="FIXED", window_size=1, rays_per_kf=r, sky_rays_per_kf=8
    )
    dirs, dists, stamps, hit = synthetic.simulate_scan(
        scene, poses[0], ts[0], n_channels=8, n_azimuth=128, max_range=40.0
    )
    scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=p)
    kf = KeyFrame(scan=scan, timestamp=ts[0], pose_index=0, tracked_pose=poses[0], gt_pose=poses[0])
    window = stack_window([kf], n_sky_pad=8)
    pose6 = jax.jit(se3.matrix_to_pose)(jnp.asarray(poses[0], jnp.float32))
    all_poses = jnp.zeros((cfg.max_keyframes, 6)).at[0].set(pose6)

    key = jax.random.PRNGKey(5)
    scale = float(cube.scale_factor)
    slices = []
    for it in range(p // r):
        b = build_window_rays(all_poses, window, cube, cfg, key, jnp.asarray(it))
        slices.append(np.asarray(b.depth)[:r] * scale)  # lidar part
    all_depths = np.sort(np.concatenate(slices))
    scan_depths = np.sort(np.asarray(scan.distances))
    # coverage: the multiset of sampled depths IS the multiset of scan ranges
    # (invalid/padded rays carry depth 0 on both sides)
    matched = np.isclose(all_depths, scan_depths, atol=1e-3)
    assert matched.mean() > 0.99, matched.mean()

    # reproducible: same (key, iteration) -> identical rays
    b0 = build_window_rays(all_poses, window, cube, cfg, key, jnp.asarray(0))
    b0b = build_window_rays(all_poses, window, cube, cfg, key, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(b0.depth), np.asarray(b0b.depth))
