"""Camera/intensity training: the decoupled RGB phase.

Covers the reference's ``Optimizer.iterate_optimizer_camera`` /
``compute_loss_camera`` (``src/mapping/optimizer.py:517-688,861-894``) and
the FDT RGB phase (``examples/fdt_optimize_implicit_map.py:730-889``): after
the sigma field is trained from lidar, train the intensity hash-grid + MLP
from camera images with per-image dynamic-object masks, sigma branch
detached, poses fixed to (interpolated) groundtruth.

TPU-first: one jitted step samples a fixed number of pixels across a stacked
image window, builds camera rays on device, renders with ``sigma_only=False,
detach_sigma=True`` and applies the masked L1 intensity loss.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from loner_tpu.geometry import se3
from loner_tpu.geometry.rays import RayBundle, far_cube_exit
from loner_tpu.mapping.optimizer import MapperConfig, MapperState, make_optimizers, _tree_where, _tree_finite
from loner_tpu.models import sampling
from loner_tpu.models.losses import compute_camera_loss
from loner_tpu.models.rendering import render_rays


class CameraWindow(NamedTuple):
    """A stacked window of B images ready for the camera train step."""

    intensities: jnp.ndarray  # (B, H, W, C) in [0, 1]
    masks: jnp.ndarray  # (B, H, W) bool — True where pixels are trainable
    poses: jnp.ndarray  # (B, 6) world_T_camera se3 vectors (fixed)
    k_inv: jnp.ndarray  # (3, 3) inverse intrinsics (shared)

    @property
    def batch(self) -> int:
        return self.intensities.shape[0]


def stack_camera_window(
    images: np.ndarray,  # (B, H, W, C)
    masks: np.ndarray,  # (B, H, W)
    poses: np.ndarray,  # (B, 4, 4)
    K: np.ndarray,  # (3, 3)
) -> CameraWindow:
    pose6 = np.asarray(
        jax.jit(se3.matrix_to_pose)(jnp.asarray(poses, jnp.float32))
    )
    return CameraWindow(
        jnp.asarray(images, jnp.float32),
        jnp.asarray(masks),
        jnp.asarray(pose6),
        jnp.asarray(np.linalg.inv(K), jnp.float32),
    )


def _sample_camera_rays(
    window: CameraWindow,
    cube,
    cfg: MapperConfig,
    n_rays: int,
    key: jax.Array,
) -> Tuple[RayBundle, jnp.ndarray]:
    """Sample pixels uniformly across the window; rays with masked-out pixels
    are marked invalid (mask-aware loss replaces the reference's host-side
    masked index sets). Returns (bundle, target intensities (N, C))."""
    b, h, w, c = window.intensities.shape
    kb, ky, kx = jax.random.split(key, 3)
    bi = jax.random.randint(kb, (n_rays,), 0, b)
    yi = jax.random.randint(ky, (n_rays,), 0, h)
    xi = jax.random.randint(kx, (n_rays,), 0, w)

    target = window.intensities[bi, yi, xi]  # (N, C)
    pix_ok = window.masks[bi, yi, xi]  # (N,)

    pix_h = jnp.stack(
        [xi.astype(jnp.float32) + 0.5, yi.astype(jnp.float32) + 0.5, jnp.ones(n_rays)],
        axis=-1,
    )
    dirs_cam = pix_h @ window.k_inv.T  # (N, 3)

    T = se3.pose_to_matrix(window.poses[bi])  # (N, 4, 4)
    scale = cube.scale_factor
    origins = (T[:, :3, 3] + cube.shift) / scale
    dirs_world = (T[:, :3, :3] @ dirs_cam[:, :, None])[:, :, 0]
    dirs_world = dirs_world / jnp.sqrt(
        jnp.sum(dirs_world * dirs_world, axis=-1, keepdims=True) + 1e-20
    )

    near = jnp.full((n_rays,), cfg.ray_range[0] / scale)
    far = jnp.minimum(
        jnp.full((n_rays,), cfg.ray_range[1] / scale), far_cube_exit(origins, dirs_world)
    )
    valid = pix_ok & (far > near + 1.0 / scale)
    bundle = RayBundle(
        origins, dirs_world, dirs_world, near, far, valid, jnp.zeros((n_rays,))
    )
    return bundle, target


def make_camera_train_step(cfg: MapperConfig, cube, n_rays: int = 4096):
    """Jitted intensity-branch train step over a CameraWindow."""
    _, tx_intensity, _, _ = make_optimizers(cfg)

    def _forward(params, occ_grid, window, key):
        k_pix, k_samp, k_enc = jax.random.split(key, 3)
        bundle, target = _sample_camera_rays(window, cube, cfg, n_rays, k_pix)
        if cfg.samples_strategy == "OGM":
            z_vals = sampling.occ_grid_sampler_z_vals(
                k_samp, bundle, occ_grid, cfg.n_samples_train, cfg.perturb
            )
        else:
            z_vals = sampling.uniform_sampler_z_vals(
                k_samp, bundle, cfg.n_samples_train, cfg.perturb
            )
        render = render_rays(
            params, bundle, z_vals, cfg.nerf, sigma_only=False, detach_sigma=True,
            key=k_enc,
        )
        return compute_camera_loss(render, target, bundle.valid, cfg.loss)

    @jax.jit
    def camera_step(state: MapperState, window: CameraWindow, key: jax.Array):
        (loss, aux), grads = jax.value_and_grad(_forward, has_aux=True)(
            state.params, state.occ_grid, window, key
        )
        finite = jnp.logical_and(jnp.isfinite(loss), _tree_finite(grads))
        updates, new_opt = tx_intensity.update(
            grads["intensity"], state.opt_intensity, state.params["intensity"]
        )
        new_int = optax.apply_updates(state.params["intensity"], updates)
        skip = jnp.logical_not(finite)
        new_state = state._replace(
            params={
                "sigma": state.params["sigma"],
                "intensity": _tree_where(skip, state.params["intensity"], new_int),
            },
            opt_intensity=_tree_where(skip, state.opt_intensity, new_opt),
            global_step=state.global_step + 1,
            skipped_steps=state.skipped_steps + jnp.where(finite, 0, 1).astype(jnp.int32),
        )
        aux = dict(aux)
        aux["loss"] = loss
        return new_state, aux

    return camera_step


def optimize_intensity(
    cfg: MapperConfig,
    cube,
    state: MapperState,
    window: CameraWindow,
    n_iterations: int = 1000,
    n_rays: int = 4096,
    seed: int = 0,
    log_every: int = 200,
    log_fn=print,
) -> MapperState:
    """The FDT RGB phase loop (``fdt_optimize_implicit_map.py:730-889``)."""
    step = make_camera_train_step(cfg, cube, n_rays)
    key = jax.random.PRNGKey(seed)
    for i in range(n_iterations):
        key, sub = jax.random.split(key)
        state, aux = step(state, window, sub)
        if log_every and (i + 1) % log_every == 0:
            log_fn(f"[camera] it {i + 1}/{n_iterations}: L1 {float(aux['cam_l1']):.4f}")
    return state
