"""Online camera ingestion: images fed to the live pipeline via
``LonerSLAM.process_image`` must reach keyframes through FrameSynthesis
matching and train the intensity branch (the reference's ``process_rgb``
path, ``src/loner.py:273`` + ``src/tracking/frame_synthesis.py:86-126`` +
``src/mapping/optimizer.py:517-688``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan
from loner_tpu.geometry.world_cube import compute_world_cube
from loner_tpu.mapping.keyframe_manager import KeyFrameManagerConfig
from loner_tpu.mapping.mapper import (
    IterationPhase,
    OnlineCameraConfig,
    OnlineMapperConfig,
    SchedulePhase,
)
from loner_tpu.mapping.optimizer import MapperConfig
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.nerf import NeRFConfig, init_nerf
from loner_tpu.models.occupancy_grid import OccGridConfig
from loner_tpu.slam import LonerSLAM, SlamConfig
from loner_tpu.tracking.icp import IcpConfig, IcpStage
from loner_tpu.tracking.tracker import TrackerConfig

H, W = 32, 48
K_CAM = np.array([[W / 2, 0, W / 2], [0, W / 2, H / 2], [0, 0, 1.0]])
# camera looks forward: z_cam = +x_lidar (write_synthetic_images convention)
T_LC = np.eye(4)
T_LC[:3, :3] = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])


def _psnr(a, b, mask):
    mse = float(np.mean((a[mask] - b[mask]) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


def _build_slam(cube, world_scale):
    from loner_tpu.models.losses import LossConfig

    mapper_cfg = MapperConfig(
        nerf=NeRFConfig(
            num_colors=1,
            pos_encoding_sigma=HashEncodingConfig(n_levels=6, log2_hashmap_size=14),
            pos_encoding_intensity=HashEncodingConfig(n_levels=4, log2_hashmap_size=12),
            sigma_hidden_dim=32,
            intensity_hidden_dim=16,
            intensity_hidden_layers=1,
        ),
        # stratified sample spacing must resolve the truncated-Gaussian
        # depth target (spacing < ~2*min_depth_eps) or the all-transparent
        # field is the loss optimum — 64 samples over 40 m with the 0.5 m
        # eps floor collapses (the reference's get_weights_gt has the same
        # property: zero in-window samples -> all-zero target rows)
        loss=LossConfig(min_depth_eps=1.5),
        occ=OccGridConfig(voxel_size=32),
        ray_range=(1.0, 40.0),
        world_scale=world_scale,
        window_size=4,
        max_keyframes=32,
        rays_per_kf=128,
        sky_rays_per_kf=16,
        n_samples_train=128,
        n_samples_test=256,
    )
    return LonerSLAM(
        SlamConfig(
            tracker=TrackerConfig(
                icp=IcpConfig(stages=(IcpStage(1.5, 8), IcpStage(0.25, 8)), n_buckets=1 << 12),
                target_points=2048,
                motion_compensation=False,
            ),
            mapper=OnlineMapperConfig(
                mapper=mapper_cfg,
                keyframe_manager=KeyFrameManagerConfig(
                    time_diff_seconds=1.0, window_size=4
                ),
                schedule=[
                    SchedulePhase(1, [IterationPhase(20, freeze_poses=True)]),
                    SchedulePhase(-1, [IterationPhase(8, freeze_poses=False)]),
                ],
                n_sky_pad=256,
                camera=OnlineCameraConfig(
                    enabled=True,
                    K=K_CAM,
                    lidar_to_camera=T_LC,
                    iterations_per_window=25,
                    n_rays=512,
                ),
            ),
            single_threaded=True,
        ),
        cube,
    )


def test_online_images_train_intensity(tmp_path):
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=24, radius=5.0, z=1.5, period=4.8)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=True)
    slam = _build_slam(cube, float(cube.scale_factor))
    gt_rel = np.linalg.inv(poses[0])[None] @ poses

    imgs = {}
    for i, (T, t0) in enumerate(zip(poses, ts)):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=3072)
        t_mid = float(np.median(stamps[hit]))
        img, mask = synthetic.render_intensity_image(scene, T @ T_LC, K_CAM, H, W)
        imgs[i] = (img, mask, T)
        pose = slam.process_scan(scan, t0, gt_pose=gt_rel[i])
        assert pose is not None
        # image arrives just after its scan, stamped inside the scan interval
        slam.process_image(img, t_mid)
    slam.stop(str(tmp_path))

    kfs = slam.mapper.kf_manager.keyframes
    n_img = sum(1 for k in kfs if k.image is not None)
    assert n_img >= 3, f"only {n_img} keyframes got images"

    # the intensity branch must have learned from the online images: the
    # masked camera L1 over the window's images, evaluated with the SAME
    # rays/samples, improves over an untrained intensity branch (sigma
    # shared — at these tiny lidar budgets a full photometric render is not
    # yet meaningful, so the loss itself is the metric)
    from loner_tpu.mapping.camera_optimizer import (
        _sample_camera_rays,
        stack_camera_window,
    )
    from loner_tpu.models.losses import compute_camera_loss
    from loner_tpu.models.rendering import render_rays
    from loner_tpu.models import sampling

    state = slam.mapper.state
    cfg = slam.cfg.mapper.mapper
    img_kfs = [k for k in kfs if k.image is not None][:4]
    poses_np = np.asarray(slam.mapper.state.poses)
    from loner_tpu.geometry import se3

    cam_poses = [
        np.asarray(se3.pose_to_matrix(jnp.asarray(poses_np[k.pose_index]))) @ T_LC
        for k in img_kfs
    ]
    win = stack_camera_window(
        np.stack([k.image for k in img_kfs]),
        np.ones((len(img_kfs), H, W), bool),
        np.stack(cam_poses),
        K_CAM,
    )

    def cam_l1(params):
        bundle, target = _sample_camera_rays(win, cube, cfg, 2048, jax.random.PRNGKey(5))
        z = sampling.occ_grid_sampler_z_vals(
            jax.random.PRNGKey(6), bundle, state.occ_grid, cfg.n_samples_train, 0.0
        )
        render = render_rays(params, bundle, z, cfg.nerf, sigma_only=False, detach_sigma=True)
        _, aux = compute_camera_loss(render, target, bundle.valid, cfg.loss)
        return float(aux["cam_l1"])

    l1_trained = cam_l1(state.params)
    fresh_int = init_nerf(jax.random.PRNGKey(123), cfg.nerf)["intensity"]
    l1_fresh = cam_l1({"sigma": state.params["sigma"], "intensity": fresh_int})
    assert l1_trained < l1_fresh * 0.8, (l1_trained, l1_fresh)


def test_process_image_requires_camera_mode():
    poses = np.eye(4)[None].repeat(2, axis=0)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0))
    slam = _build_slam(cube, float(cube.scale_factor))
    slam.cfg.mapper.camera.enabled = False
    with pytest.raises(RuntimeError):
        slam.process_image(np.zeros((H, W, 1), np.float32), 0.0)


def test_online_dynamic_masks_block_training(tmp_path):
    """Dynamic-object masks must be consumed by the ONLINE camera phase
    (the reference bakes SAM masks into the bag and the optimizer's camera
    samples respect them, rosbag_utils/adjust_bags.py:16-60 +
    src/mapping/optimizer.py:517-688): pixels masked out by
    ``camera.mask_fn`` are provably untrained — an adversarial all-bright
    overlay confined to the masked strip must NOT be reproduced by the
    trained intensity branch, while unmasked content still trains."""
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=24, radius=5.0, z=1.5, period=4.8)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=True)
    slam = _build_slam(cube, float(cube.scale_factor))
    strip = W // 4  # left strip plays the dynamic object

    # mask_fn: the left strip is a "vehicle" — not trainable
    def mask_fn(img):
        m = np.ones(img.shape[:2], bool)
        m[:, :strip] = False
        return m

    slam.cfg.mapper.camera.mask_fn = mask_fn
    gt_rel = np.linalg.inv(poses[0])[None] @ poses

    for i, (T, t0) in enumerate(zip(poses, ts)):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=3072)
        t_mid = float(np.median(stamps[hit]))
        img, _ = synthetic.render_intensity_image(scene, T @ T_LC, K_CAM, H, W)
        img = img.copy()
        img[:, :strip] = 1.0  # the adversarial overlay (dynamic object)
        pose = slam.process_scan(scan, t0, gt_pose=gt_rel[i])
        assert pose is not None
        slam.process_image(img, t_mid)
    slam.stop(str(tmp_path))

    kfs = [k for k in slam.mapper.kf_manager.keyframes if k.image is not None]
    assert len(kfs) >= 3
    # masks reached the keyframes
    for k in kfs:
        assert k.image_mask is not None
        assert not k.image_mask[:, : strip].any()
        assert k.image_mask[:, strip:].all()

    # render the window's pixels with the trained intensity branch, split
    # by the mask: masked pixels must NOT have learned the 1.0 overlay
    from loner_tpu.geometry import se3
    from loner_tpu.mapping.camera_optimizer import (
        _sample_camera_rays,
        stack_camera_window,
    )
    from loner_tpu.models import sampling
    from loner_tpu.models.rendering import render_rays

    state = slam.mapper.state
    cfg = slam.cfg.mapper.mapper
    img_kfs = kfs[:4]
    poses_np = np.asarray(state.poses)
    cam_poses = [
        np.asarray(se3.pose_to_matrix(jnp.asarray(poses_np[k.pose_index]))) @ T_LC
        for k in img_kfs
    ]
    # all-True mask here: we WANT rays in the masked strip for evaluation
    win = stack_camera_window(
        np.stack([k.image for k in img_kfs]),
        np.ones((len(img_kfs), H, W), bool),
        np.stack(cam_poses),
        K_CAM,
    )
    bundle, target = _sample_camera_rays(win, cube, cfg, 4096, jax.random.PRNGKey(5))
    z = sampling.occ_grid_sampler_z_vals(
        jax.random.PRNGKey(6), bundle, state.occ_grid, cfg.n_samples_train, 0.0
    )
    render = render_rays(
        state.params, bundle, z, cfg.nerf, sigma_only=False, detach_sigma=True
    )
    pred = np.asarray(render.rgb)[:, 0]
    tgt = np.asarray(target)[:, 0]
    valid = np.asarray(bundle.valid)
    in_strip = tgt > 0.999  # overlay pixels (the synthetic scene is darker)
    err_masked = np.abs(pred - tgt)[valid & in_strip].mean()
    err_open = np.abs(pred - tgt)[valid & ~in_strip].mean()
    # the open region trains toward its targets; the masked strip must stay
    # far from the overlay value (no gradient ever flowed from it)
    assert err_masked > 2.5 * err_open, (err_masked, err_open)
    assert err_masked > 0.2, err_masked
