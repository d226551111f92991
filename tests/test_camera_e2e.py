"""Camera path end-to-end through the on-disk formats: scans + images +
calibration -> offline sigma training -> RGB phase -> full-image render with
a PSNR gate (the reference chain: fdt_optimize_implicit_map phase 2 +
analysis/renderer.py rgb output)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loner_tpu.data import synthetic
from loner_tpu.data.dataset import (
    ImageSequence,
    SequenceDataset,
    write_synthetic_dataset,
    write_synthetic_images,
)
from loner_tpu.geometry.world_cube import compute_world_cube
from loner_tpu.mapping.camera_optimizer import optimize_intensity, stack_camera_window
from loner_tpu.mapping.keyframe import KeyFrame
from loner_tpu.mapping.offline import OfflineConfig, optimize_implicit_map
from loner_tpu.analysis.renderer import render_camera_image

from tests.test_train_step import tiny_mapper_config


def psnr(a, b, mask):
    mse = float(np.mean((a[mask] - b[mask]) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


@pytest.mark.slow
def test_camera_path_end_to_end(tmp_path):
    root = str(tmp_path / "seq")
    n_poses, period = 8, 1.6
    write_synthetic_dataset(root, n_poses=n_poses, period=period)
    write_synthetic_images(root, n_poses=n_poses, period=period, height=48, width=64)

    scans = SequenceDataset(root, pad_to=4096)
    images = ImageSequence(root)
    assert len(scans) == len(images) == n_poses

    poses, ts = synthetic.circular_trajectory(n_poses=n_poses, radius=5.0, period=period)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=False)
    cfg = tiny_mapper_config(float(cube.scale_factor))._replace(window_size=8)

    # 1. offline sigma phase with GT poses from the dataset
    kfs = []
    for i, (scan, t) in enumerate(scans):
        sky = None
        kfs.append(
            KeyFrame(scan=scan, timestamp=t, pose_index=i, tracked_pose=poses[i], gt_pose=poses[i], sky=sky)
        )
    result = optimize_implicit_map(
        cfg,
        cube,
        kfs,
        OfflineConfig(window_size=8, iterations_per_window=64, max_epochs=2, n_eval_scans=0),
        log_fn=lambda s: None,
    )
    state = result.state

    # 2. RGB phase from the image sequence + calibration extrinsics
    T_lc = images.calibration.lidar_to_camera
    imgs, masks, cam_poses = [], [], []
    for i, (img, mask, t) in enumerate(images):
        imgs.append(img)
        masks.append(mask)
        cam_poses.append(poses[i] @ T_lc)
    cam_window = stack_camera_window(
        np.stack(imgs), np.stack(masks), np.stack(cam_poses), images.K
    )
    state = optimize_intensity(
        cfg, cube, state, cam_window, n_iterations=200, n_rays=1024, log_every=0
    )

    # 3. full-image render: intensity must reconstruct the texture
    out = render_camera_image(
        cfg, cube, state, cam_poses[0], images.K, 48, 64, rgb=True
    )
    assert out["rgb"].shape == (48, 64, 1)
    gt_img, hit = imgs[0], masks[0]
    p = psnr(out["rgb"], gt_img, hit)
    assert p > 15.0, f"rendered-image PSNR {p:.1f} dB too low"

    # depth render agrees with ray-cast groundtruth where the camera hits
    d = out["depth"]
    ys, xs = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    pix = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5, np.ones(48 * 64)], axis=-1)
    dirs_cam = pix @ np.linalg.inv(images.K).T
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_world = dirs_cam @ cam_poses[0][:3, :3].T
    origins = np.broadcast_to(cam_poses[0][:3, 3], (48 * 64, 3)).copy()
    gt_d = synthetic.ray_cast(synthetic.Scene.default(), origins, dirs_world, 40.0)
    m = np.isfinite(gt_d) & (gt_d > 1.5) & (gt_d < 35.0)
    l1 = np.abs(d.ravel()[m] - gt_d[m]).mean()
    # guards ray geometry (wrong extrinsics/intrinsics -> ~10+ m), not
    # convergence — the short sigma budget leaves a few meters of blur
    assert l1 < 4.0, f"camera-depth L1 {l1:.2f} m"
