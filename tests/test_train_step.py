"""End-to-end training-step tests on the synthetic scene: the map must learn
the scene's depth (L1 falls well below the scene scale) — the jax analog of
the reference's metric-based verification loop (SURVEY §4.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.data import synthetic
from loner_tpu.data.scan import make_lidar_scan, sky_scan
from loner_tpu.geometry.rays import build_lidar_rays
from loner_tpu.geometry.world_cube import compute_world_cube
from loner_tpu.mapping.keyframe import KeyFrame, stack_window
from loner_tpu.mapping.optimizer import (
    MapperConfig,
    TrainStepFlags,
    init_mapper_state,
    make_render_fn,
    make_train_step,
)
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.losses import LossConfig
from loner_tpu.models.nerf import NeRFConfig
from loner_tpu.models.occupancy_grid import OccGridConfig
from loner_tpu.geometry import se3


def tiny_mapper_config(world_scale, ray_range=(1.0, 40.0)):
    return MapperConfig(
        nerf=NeRFConfig(
            num_colors=1,
            pos_encoding_sigma=HashEncodingConfig(n_levels=8, log2_hashmap_size=15),
            pos_encoding_intensity=HashEncodingConfig(n_levels=4, log2_hashmap_size=12),
            sigma_hidden_dim=32,
            intensity_hidden_dim=16,
            intensity_hidden_layers=2,
        ),
        loss=LossConfig(),
        occ=OccGridConfig(voxel_size=32),
        ray_range=ray_range,
        world_scale=world_scale,
        window_size=4,
        max_keyframes=16,
        rays_per_kf=256,
        sky_rays_per_kf=32,
        n_samples_train=128,
        n_samples_test=256,
    )


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=4, radius=6.0, z=1.5)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=False)
    world_scale = float(cube.scale_factor)

    cfg = tiny_mapper_config(world_scale)

    kfs = []
    rng = np.random.default_rng(0)
    for i, (T, t0) in enumerate(zip(poses, ts)):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0, rng=rng
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=4096)
        sky = sky_scan(dirs[~hit], cfg.ray_range[1] + 1.0, t0, pad_to=512)
        kfs.append(
            KeyFrame(
                scan=scan,
                timestamp=t0,
                pose_index=i,
                tracked_pose=T,
                gt_pose=T,
                sky=sky,
            )
        )

    window = stack_window(kfs, n_sky_pad=512)
    pose6 = jnp.stack([se3.matrix_to_pose(jnp.asarray(T, jnp.float32)) for T in poses])
    return scene, poses, cube, cfg, kfs, window, pose6


def eval_l1_depth(cfg, cube, state, scene, pose, n_rays=512, seed=1):
    """Render depths at a GT pose and compare to ray-cast ground truth."""
    rng = np.random.default_rng(seed)
    dirs, dists, stamps, hit = synthetic.simulate_scan(
        scene, pose, 0.0, n_channels=16, n_azimuth=128, max_range=40.0
    )
    sel = np.flatnonzero(hit)
    sel = rng.choice(sel, size=min(n_rays, len(sel)), replace=False)
    bundle = build_lidar_rays(
        jnp.asarray(dirs[sel]),
        jnp.asarray(dists[sel]),
        jnp.asarray(pose, jnp.float32),
        cube,
        cfg.ray_range,
    )
    render_fn = make_render_fn(cfg, test=True)
    render = render_fn(state.params, state.occ_grid, bundle, jax.random.PRNGKey(7))
    scale = float(cube.scale_factor)
    pred = np.asarray(render.depth) * scale
    gt = np.asarray(bundle.depth) * scale
    valid = np.asarray(bundle.valid)
    # exclude returns clipped by near/far like compute_l1_depth (ranges in
    # [near, far - 0.25], analysis/compute_l1_depth.py:42-64)
    keep = valid & (gt > cfg.ray_range[0]) & (gt < cfg.ray_range[1] - 0.25)
    return float(np.mean(np.abs(pred[keep] - gt[keep])))


class TestTrainStep:
    def test_single_step_runs_and_is_finite(self, setup):
        scene, poses, cube, cfg, kfs, window, pose6 = setup
        state = init_mapper_state(jax.random.PRNGKey(0), cfg)
        state = state._replace(poses=state.poses.at[: pose6.shape[0]].set(pose6))
        step = make_train_step(cfg, cube)
        flags = TrainStepFlags(
            freeze_sigma=jnp.asarray(False),
            freeze_rgb=jnp.asarray(True),
            freeze_poses=jnp.asarray(True),
            do_occ_update=jnp.asarray(False),
        )
        pose_mask = jnp.zeros((cfg.max_keyframes,))
        state2, aux = step(state, window, jax.random.PRNGKey(1), flags, pose_mask, jnp.asarray(0))
        assert np.isfinite(float(aux["loss"]))
        assert int(state2.global_step) == 1

        def tree_delta(a, b):
            return sum(
                float(jnp.sum(jnp.abs(x - y)))
                for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
            )

        # sigma params moved, intensity + poses did not
        assert tree_delta(state2.params["sigma"]["table"], state.params["sigma"]["table"]) > 0
        assert tree_delta(state2.params["intensity"]["table"], state.params["intensity"]["table"]) == 0
        np.testing.assert_allclose(np.asarray(state2.poses), np.asarray(state.poses))

    def test_convergence_on_synthetic_scene(self, setup):
        scene, poses, cube, cfg, kfs, window, pose6 = setup
        state = init_mapper_state(jax.random.PRNGKey(0), cfg)
        state = state._replace(poses=state.poses.at[: pose6.shape[0]].set(pose6))
        step = make_train_step(cfg, cube)
        flags = TrainStepFlags(
            freeze_sigma=jnp.asarray(False),
            freeze_rgb=jnp.asarray(True),
            freeze_poses=jnp.asarray(True),
            do_occ_update=jnp.asarray(False),
        )
        pose_mask = jnp.zeros((cfg.max_keyframes,))

        l1_before = eval_l1_depth(cfg, cube, state, scene, poses[0])

        key = jax.random.PRNGKey(42)
        for i in range(400):
            key, sub = jax.random.split(key)
            occ = jnp.asarray((i % cfg.occ.n_iters_acc) == cfg.occ.n_iters_acc - 1)
            state, aux = step(
                state, window, sub, flags._replace(do_occ_update=occ), pose_mask, jnp.asarray(i)
            )
        assert int(state.skipped_steps) == 0
        # average over two eval poses to damp the (expected) optimization noise
        l1_after = 0.5 * (
            eval_l1_depth(cfg, cube, state, scene, poses[0])
            + eval_l1_depth(cfg, cube, state, scene, poses[2])
        )
        # untrained field renders garbage depth (~scene scale); trained must
        # be dramatically better
        assert l1_after < l1_before * 0.5
        assert l1_after < 3.0, f"L1 depth {l1_after:.2f} m too high after training"

    def test_pose_gradients_flow_when_unfrozen(self, setup):
        scene, poses, cube, cfg, kfs, window, pose6 = setup
        state = init_mapper_state(jax.random.PRNGKey(0), cfg)
        # perturb pose 1 so there is signal to correct
        noisy = pose6.at[1, 0].add(0.3)
        state = state._replace(poses=state.poses.at[: pose6.shape[0]].set(noisy))
        step = make_train_step(cfg, cube)
        flags = TrainStepFlags(
            freeze_sigma=jnp.asarray(False),
            freeze_rgb=jnp.asarray(True),
            freeze_poses=jnp.asarray(False),
            do_occ_update=jnp.asarray(False),
        )
        pose_mask = jnp.zeros((cfg.max_keyframes,)).at[1].set(1.0)
        state2, aux = step(state, window, jax.random.PRNGKey(3), flags, pose_mask, jnp.asarray(0))
        moved = np.abs(np.asarray(state2.poses - state.poses)).sum(axis=1)
        assert moved[1] > 0  # unmasked pose moved
        assert moved[0] == 0 and moved[2] == 0  # masked poses pinned
