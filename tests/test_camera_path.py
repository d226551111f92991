"""Camera/intensity training path: after lidar pre-training of the sigma
field, the intensity branch must learn a view pattern (FDT RGB phase)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan, sky_scan
from loner_tpu.geometry.world_cube import compute_world_cube
from loner_tpu.mapping.camera_optimizer import (
    make_camera_train_step,
    optimize_intensity,
    stack_camera_window,
)
from loner_tpu.mapping.keyframe import KeyFrame, stack_window
from loner_tpu.mapping.optimizer import (
    TrainStepFlags,
    init_mapper_state,
    make_train_step,
)
from test_train_step import tiny_mapper_config


def world_intensity(pts):
    """Synthetic reflectivity: smooth function of world position."""
    return 0.5 + 0.25 * np.sin(0.8 * pts[:, 0]) + 0.25 * np.cos(0.8 * pts[:, 1])


def render_gt_image(scene, pose, K, h, w, max_range=40.0):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5, np.ones(h * w)], axis=-1)
    dirs_cam = pix @ np.linalg.inv(K).T
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_world = dirs_cam @ pose[:3, :3].T
    origins = np.tile(pose[:3, 3], (h * w, 1))
    dist = synthetic.ray_cast(scene, origins, dirs_world, max_range)
    hit = np.isfinite(dist)
    pts = origins + dirs_world * np.where(hit, dist, max_range)[:, None]
    img = np.where(hit, world_intensity(pts), 0.0).reshape(h, w, 1)
    return img.astype(np.float32), hit.reshape(h, w)



def test_intensity_branch_learns_pattern():
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=4, radius=6.0, z=1.5)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=False)
    cfg = tiny_mapper_config(float(cube.scale_factor))

    # 1. lidar pre-training of the sigma field (short)
    kfs = []
    for i, (T, t0) in enumerate(zip(poses, ts)):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=4096)
        sky = sky_scan(dirs[~hit][:512], 41.0, t0, pad_to=512)
        kfs.append(KeyFrame(scan=scan, timestamp=t0, pose_index=i, tracked_pose=T, gt_pose=T, sky=sky))
    window = stack_window(kfs, n_sky_pad=512)
    from loner_tpu.geometry import se3

    pose6 = jax.jit(se3.matrix_to_pose)(jnp.asarray(np.stack(poses), jnp.float32))
    state = init_mapper_state(jax.random.PRNGKey(0), cfg)
    state = state._replace(poses=state.poses.at[:4].set(pose6))
    step = make_train_step(cfg, cube)
    flags = TrainStepFlags(
        jnp.asarray(False), jnp.asarray(True), jnp.asarray(True), jnp.asarray(False)
    )
    pm = jnp.zeros((cfg.max_keyframes,))
    key = jax.random.PRNGKey(1)
    for i in range(120):
        key, sub = jax.random.split(key)
        state, _ = step(state, window, sub, flags, pm, jnp.asarray(i))

    # 2. camera window: two GT-intensity views. Camera optical axis (+z)
    # must look forward (+x of the vehicle), not up: standard lidar<-camera
    # rotation with z_cam = x_lidar, x_cam = -y_lidar, y_cam = -z_lidar.
    R_lc = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    T_lc = np.eye(4)
    T_lc[:3, :3] = R_lc
    cam_poses = np.stack([T @ T_lc for T in poses[:2]])

    h, w = 48, 64
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    imgs, masks = [], []
    for T in cam_poses:
        img, hit = render_gt_image(scene, T, K, h, w)
        imgs.append(img)
        masks.append(hit)
    assert masks[0].mean() > 0.5, "test camera sees too little of the scene"
    cam_window = stack_camera_window(np.stack(imgs), np.stack(masks), cam_poses, K)

    cam_step = make_camera_train_step(cfg, cube, n_rays=1024)
    _, aux0 = cam_step(state, cam_window, jax.random.PRNGKey(5))
    l1_before = float(aux0["cam_l1"])

    state = optimize_intensity(
        cfg, cube, state, cam_window, n_iterations=150, n_rays=1024, log_every=0
    )
    _, aux1 = cam_step(state, cam_window, jax.random.PRNGKey(5))
    l1_after = float(aux1["cam_l1"])

    assert np.isfinite(l1_after)
    assert l1_after < l1_before * 0.6, f"{l1_before:.4f} -> {l1_after:.4f}"
    assert l1_after < 0.1, f"intensity L1 {l1_after:.4f} too high"
    # sigma branch untouched by the camera phase
    # (detach_sigma + intensity-only optimizer)
    # spot check: table unchanged
    # (state from before optimize_intensity is gone; rely on step-level test)
