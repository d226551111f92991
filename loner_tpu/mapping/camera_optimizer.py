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


def upsample_images(
    images: np.ndarray,  # (B, H, W, C)
    masks: np.ndarray,  # (B, H, W)
    K: np.ndarray,  # (3, 3)
    factor: int = 2,
):
    """Bilinear image upsample with intrinsics rescale — the reference's
    optional 2x RGB-phase upsampling (``fdt_optimize_implicit_map.py:
    730-889``): more pixel samples per surface point without touching the
    field. Masks are nearest-sampled (a mask is a set, not a signal).
    Returns (images', masks', K')."""
    if factor <= 1:
        return images, masks, K
    b, h, w, c = images.shape
    nh, nw = h * factor, w * factor
    # align-corners=False mapping: out pixel center -> src coordinate
    ys = (np.arange(nh) + 0.5) / factor - 0.5
    xs = (np.arange(nw) + 0.5) / factor - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 2)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 2)
    fy = np.clip(ys - y0, 0.0, 1.0)[None, :, None, None]  # (1, nh, 1, 1)
    fx = np.clip(xs - x0, 0.0, 1.0)[None, None, :, None]  # (1, 1, nw, 1)
    g = images[:, y0][:, :, x0]  # (B, nh, nw, C) corner 00 via fancy index
    g01 = images[:, y0][:, :, x0 + 1]
    g10 = images[:, y0 + 1][:, :, x0]
    g11 = images[:, y0 + 1][:, :, x0 + 1]
    up = (
        g * (1 - fy) * (1 - fx)
        + g01 * (1 - fy) * fx
        + g10 * fy * (1 - fx)
        + g11 * fy * fx
    ).astype(np.float32)
    yn = np.clip(np.round(ys).astype(np.int64), 0, h - 1)
    xn = np.clip(np.round(xs).astype(np.int64), 0, w - 1)
    masks_up = masks[:, yn][:, :, xn]
    # intrinsics: this codebase's K maps rays to CONTINUOUS pixel coords
    # (index + 0.5, see _sample_camera_rays), where upsampling is exactly
    # x' = f * x — so K' = diag(f, f, 1) @ K, no half-pixel offset
    Kp = np.asarray(K, np.float64).copy()
    Kp[:2] *= factor
    return up, masks_up, Kp


def stack_camera_window(
    images: np.ndarray,  # (B, H, W, C)
    masks: np.ndarray,  # (B, H, W)
    poses: np.ndarray,  # (B, 4, 4)
    K: np.ndarray,  # (3, 3)
    upsample: int = 1,  # 2 = the reference's RGB-phase 2x option
) -> CameraWindow:
    images, masks, K = upsample_images(images, masks, K, upsample)
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


def make_camera_train_step(cfg: MapperConfig, cube, n_rays: int = 4096, mesh=None):
    """Jitted intensity-branch train step over a CameraWindow.

    With ``mesh`` set, the step's inputs and outputs are pinned replicated on
    that mesh, so running the camera phase between mesh-sharded lidar steps
    cannot silently migrate the MapperState onto the default device (ADVICE
    r04 medium: a plain jit consuming a sharded state changes placement for
    subsequent sharded steps). The camera pass is small (n_rays ≪ the lidar
    batch), so replication — not DP — is the right sharding for it."""
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

    def _camera_step(state: MapperState, window: CameraWindow, key: jax.Array):
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

    if mesh is None:
        return jax.jit(_camera_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    jitted = jax.jit(_camera_step, out_shardings=(repl, repl))

    def camera_step(state, window, key):
        # no-op once the state is already replicated on the mesh
        return jitted(jax.device_put(state, repl), jax.device_put(window, repl), key)

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
