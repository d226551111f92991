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


def test_rgb_upsample_option():
    """2x RGB-phase upsample with intrinsics rescale (the reference's
    optional FDT camera upsampling, fdt_optimize_implicit_map.py:730-889):
    bilinear interpolation must be exact on a linear ramp, the rescaled
    intrinsics must preserve each pixel's viewing ray, and masks stay bool."""
    from loner_tpu.mapping.camera_optimizer import upsample_images

    h, w, f = 12, 16, 2
    yy, xx = np.mgrid[0:h, 0:w]
    img = (0.3 * xx + 0.1 * yy).astype(np.float32)[None, :, :, None]
    mask = np.zeros((1, h, w), bool)
    mask[0, 3:7, 4:9] = True
    K = np.array([[50.0, 0, 7.5], [0, 45.0, 5.5], [0, 0, 1.0]])

    up, mup, Kp = upsample_images(img, mask, K, factor=f)
    assert up.shape == (1, h * f, w * f, 1)
    assert mup.shape == (1, h * f, w * f) and mup.dtype == bool

    # bilinear on a linear ramp reproduces the ramp at the src coordinates
    ys = (np.arange(h * f) + 0.5) / f - 0.5
    xs = (np.arange(w * f) + 0.5) / f - 0.5
    expect = 0.3 * np.clip(xs, 0, w - 1)[None, :] + 0.1 * np.clip(ys, 0, h - 1)[:, None]
    np.testing.assert_allclose(up[0, :, :, 0], expect, atol=1e-5)

    # ray-preservation: src pixel (u, v) and its upsampled center map to the
    # same camera ray through the rescaled intrinsics
    Kinv, Kpinv = np.linalg.inv(K), np.linalg.inv(Kp)
    for u, v in [(0, 0), (3, 7), (15, 11)]:
        d0 = Kinv @ np.array([u + 0.5, v + 0.5, 1.0])
        up_u, up_v = f * u + (f - 1) / 2.0, f * v + (f - 1) / 2.0
        d1 = Kpinv @ np.array([up_u + 0.5, up_v + 0.5, 1.0])
        np.testing.assert_allclose(d0, d1, atol=1e-9)

    # mask area is preserved up to the factor^2 scaling (nearest sampling)
    assert mup.sum() == mask.sum() * f * f

    # stack_camera_window applies it end-to-end
    win = stack_camera_window(
        img, mask, np.eye(4)[None], K, upsample=2
    )
    assert win.intensities.shape == (1, h * f, w * f, 1)
