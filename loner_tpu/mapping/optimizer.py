"""The mapping optimizer: one fused, jitted train step for the implicit map.

This is the TPU re-design of the reference's ``Optimizer``
(``src/mapping/optimizer.py``, the heart of the system). One call of
``train_step`` performs what the reference spreads over many torch ops and
host round-trips:

  sample ray indices -> build rays from (differentiable) keyframe poses ->
  occupancy-guided z sampling -> field eval -> composite -> JS/LOS loss ->
  backward -> per-group Adam updates (sigma / intensity / poses) ->
  optional occupancy-grid update

entirely on device with static shapes. Phase behavior (the reference's
keyframe schedule with freeze_poses / freeze_sigma_mlp / freeze_rgb_mlp,
``optimizer.py:209-265``) is expressed with *runtime* 0/1 flags plus a
per-keyframe pose mask, so a single compiled step serves every phase.

Divergences from the reference (deliberate):
  * non-finite loss/grads skip the update instead of hard-asserting
    (``optimizer.py:452-458`` guards, ``:854`` assert) — reported in aux.
  * invalid/padded rays are masked, not dropped (static shapes).
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from loner_tpu.geometry import se3
from loner_tpu.geometry.rays import RayBundle, build_lidar_rays
from loner_tpu.models import sampling
from loner_tpu.models.losses import LossConfig, compute_lidar_loss
from loner_tpu.models.nerf import NeRFConfig, init_nerf
from loner_tpu.models.occupancy_grid import (
    OccGridConfig,
    init_occ_grid,
    occ_grid_cotangent,
)
from loner_tpu.models.rendering import render_rays


class MapperConfig(NamedTuple):
    nerf: NeRFConfig = NeRFConfig()
    loss: LossConfig = LossConfig()
    occ: OccGridConfig = OccGridConfig()

    ray_range: Tuple[float, float] = (1.0, 50.0)
    world_scale: float = 20.0  # world-cube scale factor (static for jit)

    window_size: int = 8
    max_keyframes: int = 512
    rays_per_kf: int = 512
    sky_rays_per_kf: int = 64
    n_samples_train: int = 512
    n_samples_test: int = 2048
    perturb: float = 1.0
    samples_strategy: str = "OGM"  # OGM | UNIFORM
    # RANDOM = uniform draw per iteration; MASK = 75% trunk-band (FDT);
    # FIXED = one shuffle per window, sequential slices per iteration — an
    # epoch over every scan point (reference optimizer.py:269-346; the
    # caller must hold the step key constant across the window and let
    # ``iteration`` advance — see OnlineMapper)
    rays_strategy: str = "RANDOM"
    mask_band_fraction: float = 0.75
    # sequential point chunks for the TRAIN step's field pipeline. 1 =
    # single pass — measured ~9% faster at the flagship 2.36M-point batch
    # (scripts/bench_ab.py r4) and well inside 16 GB HBM; eval renders keep
    # NeRFConfig.point_chunks (test batches are ~10x larger).
    train_point_chunks: int = 1

    lr_sigma: float = 0.01
    lr_rgb: float = 0.01
    lr_pose: float = 0.001
    lr_gamma: float = 1.0  # exponential decay per optimizer step
    pose_lr_gamma: float = 1.0
    rgb_weight_decay: float = 1e-5
    sigma_weight_decay: float = 0.0

    @property
    def rays_per_window(self) -> int:
        return self.window_size * (self.rays_per_kf + self.sky_rays_per_kf)


class MapperState(NamedTuple):
    params: Any  # nerf params {"sigma": ..., "intensity": ...}
    poses: jnp.ndarray  # (K, 6) keyframe poses (se3 vectors)
    opt_sigma: Any
    opt_intensity: Any
    opt_poses: Any
    occ_grid: jnp.ndarray  # (V, V, V) logits
    opt_occ: Any
    global_step: jnp.ndarray  # scalar int32
    skipped_steps: jnp.ndarray  # scalar int32, non-finite guard trips


def _exp_schedule(base_lr: float, gamma: float):
    if gamma == 1.0:
        return base_lr
    return lambda step: base_lr * gamma**step


def make_optimizers(cfg: MapperConfig):
    tx_sigma = optax.chain(
        optax.add_decayed_weights(cfg.sigma_weight_decay) if cfg.sigma_weight_decay else optax.identity(),
        optax.adam(_exp_schedule(cfg.lr_sigma, cfg.lr_gamma)),
    )
    tx_intensity = optax.chain(
        optax.add_decayed_weights(cfg.rgb_weight_decay) if cfg.rgb_weight_decay else optax.identity(),
        optax.adam(_exp_schedule(cfg.lr_rgb, cfg.lr_gamma)),
    )
    tx_poses = optax.adam(_exp_schedule(cfg.lr_pose, cfg.pose_lr_gamma))
    tx_occ = optax.adam(cfg.occ.lr)
    return tx_sigma, tx_intensity, tx_poses, tx_occ


def init_mapper_state(key: jax.Array, cfg: MapperConfig) -> MapperState:
    tx_s, tx_i, tx_p, tx_o = make_optimizers(cfg)

    # one jitted program for the whole init: on remote-compile backends
    # op-by-op initialization costs minutes, one fused program costs seconds
    @jax.jit
    def _init(key):
        params = init_nerf(key, cfg.nerf)
        poses = jnp.zeros((cfg.max_keyframes, 6), dtype=jnp.float32)
        occ = init_occ_grid(cfg.occ)
        return MapperState(
            params=params,
            poses=poses,
            opt_sigma=tx_s.init(params["sigma"]),
            opt_intensity=tx_i.init(params["intensity"]),
            opt_poses=tx_p.init(poses),
            occ_grid=occ,
            opt_occ=tx_o.init(occ),
            global_step=jnp.asarray(0, jnp.int32),
            skipped_steps=jnp.asarray(0, jnp.int32),
        )

    return _init(key)


def _tree_where(flag, a, b):
    """flag ? a : b across a pytree (elementwise select, dtype-preserving)."""
    return jax.tree.map(lambda x, y: jnp.where(flag, x, y).astype(x.dtype), a, b)


def _tree_finite(t) -> jnp.ndarray:
    leaves = jax.tree.leaves(t)
    ok = jnp.asarray(True)
    for l in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(l)))
    return ok


def build_window_rays(
    poses: jnp.ndarray,  # (K, 6)
    window,  # KeyFrameWindow
    cube,
    cfg: MapperConfig,
    key: jax.Array,
    iteration: jnp.ndarray = 0,  # scalar; drives FIXED's sequential slices
) -> RayBundle:
    """Sample rays_per_kf lidar + sky_rays_per_kf sky rays from every
    keyframe in the window and build one flat RayBundle of static size
    W * (rays_per_kf + sky_rays_per_kf).

    Gradients flow from ray origins/directions to ``poses``; sky rays use a
    detached pose like the reference (``src/mapping/keyframe.py:75-105``).
    """
    w = window.window_size
    p = window.dirs.shape[1]
    s = window.sky_dirs.shape[1]
    sky_range = cfg.ray_range[1] + 1.0  # beyond far -> transparent ray

    keys = jax.random.split(key, w)

    def one_kf(pose6, dirs, dists, pvalid, sky_dirs, sky_valid, band, k):
        k1, k2 = jax.random.split(k)
        if cfg.rays_strategy == "FIXED":
            # fixed shuffle per window (the key is held constant across the
            # window's iterations), sequential slice per iteration
            it = jnp.asarray(iteration).astype(jnp.int32)
            perm = jax.random.permutation(k1, p)
            start = (it * cfg.rays_per_kf) % p
            idx = perm[(start + jnp.arange(cfg.rays_per_kf)) % p]
            k2 = jax.random.fold_in(k2, it)
        else:
            idx = jax.random.randint(k1, (cfg.rays_per_kf,), 0, p)
        if cfg.rays_strategy == "MASK":
            # 75% of rays drawn from the trunk band (uniform over the
            # band-index array == band sampling), the rest uniform
            n_band = int(cfg.rays_per_kf * cfg.mask_band_fraction)
            idx = jnp.concatenate([band[idx[:n_band]], idx[n_band:]])
        T = se3.pose_to_matrix(pose6)
        lidar = build_lidar_rays(
            dirs[idx], dists[idx], T, cube, cfg.ray_range, point_valid=pvalid[idx]
        )
        sidx = jax.random.randint(k2, (cfg.sky_rays_per_kf,), 0, s)
        sky = build_lidar_rays(
            sky_dirs[sidx],
            jnp.full((cfg.sky_rays_per_kf,), sky_range),
            jax.lax.stop_gradient(T),
            cube,
            cfg.ray_range,
            point_valid=sky_valid[sidx],
        )
        return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), lidar, sky)

    pose6 = poses[window.pose_idx]  # (W, 6)
    bundles = jax.vmap(one_kf)(
        pose6,
        window.dirs,
        window.dists,
        window.point_valid,
        window.sky_dirs,
        window.sky_valid,
        window.band_idx,
        keys,
    )
    # (W, R, ...) -> (W*R, ...)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), bundles)


class TrainStepFlags(NamedTuple):
    """Runtime phase flags (the keyframe schedule's freeze config)."""

    freeze_sigma: jnp.ndarray  # scalar bool
    freeze_rgb: jnp.ndarray  # scalar bool
    freeze_poses: jnp.ndarray  # scalar bool
    do_occ_update: jnp.ndarray  # scalar bool


def make_train_step_body(cfg: MapperConfig, cube, apply_updates: bool = True):
    """The un-jitted train-step body:
    ``body(pose_grads, state, window, key, flags, pose_mask, iteration)``.
    Exposed so wrappers can transform it (``make_train_step`` jits it;
    ``parallel/submaps_parallel`` vmaps it over a submap axis).

    ``apply_updates=False`` (static) computes loss + gradients but returns
    the state with only counters advanced — the DP step minus its REPLICATED
    per-device compute (Adam moments on the full tables, occ update). Used
    by the scaling harness to attribute virtual-mesh weak-scaling residue to
    replicated work, never by training."""
    tx_sigma, tx_intensity, tx_poses, tx_occ = make_optimizers(cfg)
    scale = cfg.world_scale
    # keep the fused encoder's slot-strided backward in sync with the actual
    # samples-per-ray (points arrive flattened (rays, S) -> slot = n % S)
    if cfg.nerf.encoding_slot_period != cfg.n_samples_train:
        cfg = cfg._replace(
            nerf=cfg.nerf._replace(encoding_slot_period=cfg.n_samples_train)
        )

    def _forward(params, poses, occ_grid, window, key, iteration, global_step):
        k_rays, k_samp, k_enc = jax.random.split(key, 3)
        if cfg.rays_strategy == "FIXED":
            # the caller holds the key constant across the window so the ray
            # shuffle is fixed; sampler/encoder draws must still vary per it
            it32 = jnp.asarray(iteration).astype(jnp.int32)
            k_samp = jax.random.fold_in(k_samp, it32)
            k_enc = jax.random.fold_in(k_enc, it32)
        bundle = build_window_rays(poses, window, cube, cfg, k_rays, iteration)

        if cfg.samples_strategy == "OGM":
            z_vals = sampling.occ_grid_sampler_z_vals(
                k_samp, bundle, occ_grid, cfg.n_samples_train, cfg.perturb
            )
        else:
            z_vals = sampling.uniform_sampler_z_vals(
                k_samp, bundle, cfg.n_samples_train, cfg.perturb
            )

        render = render_rays(
            params, bundle, z_vals, cfg.nerf, sigma_only=True, key=k_enc,
            point_chunks=cfg.train_point_chunks,
        )
        loss, aux = compute_lidar_loss(
            render, bundle, scale, cfg.loss, global_step, iteration
        )
        return loss, (aux, render, bundle)

    def _train_step(
        pose_grads: bool,
        state: MapperState,
        window,  # KeyFrameWindow
        key: jax.Array,
        flags: TrainStepFlags,
        pose_mask: jnp.ndarray,  # (K,) 1.0 where this phase may move the pose
        iteration: jnp.ndarray,  # scalar — iteration within the phase
    ) -> Tuple[MapperState, dict]:
        # pose_grads is STATIC: pose-frozen phases compile a step without the
        # d(rays)/d(pose) backward (sort/stratify/ray-build VJPs all DCE'd)
        if pose_grads:
            (loss, (aux, render, bundle)), grads = jax.value_and_grad(
                _forward, argnums=(0, 1), has_aux=True
            )(
                state.params,
                state.poses,
                state.occ_grid,
                window,
                key,
                iteration.astype(jnp.float32),
                state.global_step.astype(jnp.float32),
            )
            g_params, g_poses = grads
        else:
            (loss, (aux, render, bundle)), g_params = jax.value_and_grad(
                _forward, argnums=0, has_aux=True
            )(
                state.params,
                jax.lax.stop_gradient(state.poses),
                state.occ_grid,
                window,
                key,
                iteration.astype(jnp.float32),
                state.global_step.astype(jnp.float32),
            )
            g_poses = jnp.zeros_like(state.poses)

        finite = jnp.logical_and(
            jnp.isfinite(loss),
            jnp.logical_and(_tree_finite(g_params), _tree_finite(g_poses)),
        )

        if not apply_updates:
            # gradients must still be materialized (they carry the psum),
            # so fold a zero-cost reduction of them into the counters
            g_any = jnp.asarray(0, jnp.int32)
            for l in jax.tree.leaves((g_params, g_poses)):
                g_any = g_any + (l.ravel()[0] != 0).astype(jnp.int32)
            new_state = state._replace(
                global_step=state.global_step + 1 + 0 * g_any,
                skipped_steps=state.skipped_steps
                + jnp.where(finite, 0, 1).astype(jnp.int32),
            )
            aux = dict(aux)
            aux["loss"] = loss
            aux["finite"] = finite
            return new_state, aux

        def masked_group(tx, g, opt_state, params, freeze):
            updates, new_state = tx.update(g, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            skip = jnp.logical_or(freeze, jnp.logical_not(finite))
            return (
                _tree_where(skip, params, new_params),
                _tree_where(skip, opt_state, new_state),
            )

        new_sigma, opt_sigma = masked_group(
            tx_sigma, g_params["sigma"], state.opt_sigma, state.params["sigma"], flags.freeze_sigma
        )
        new_intensity, opt_intensity = masked_group(
            tx_intensity,
            g_params["intensity"],
            state.opt_intensity,
            state.params["intensity"],
            flags.freeze_rgb,
        )

        # Poses: per-row mask (latest-kf-only phases), plus the global flag.
        if pose_grads:
            pose_updates, opt_poses_new = tx_poses.update(
                g_poses, state.opt_poses, state.poses
            )
            pose_updates = pose_updates * pose_mask[:, None]
            new_poses = optax.apply_updates(state.poses, pose_updates)
            skip_poses = jnp.logical_or(flags.freeze_poses, jnp.logical_not(finite))
            new_poses = jnp.where(skip_poses, state.poses, new_poses)
            opt_poses = _tree_where(skip_poses, state.opt_poses, opt_poses_new)
        else:
            new_poses, opt_poses = state.poses, state.opt_poses

        # Occupancy-grid update (every n_iters_acc steps; flag set by caller).
        def occ_update(occ_and_opt):
            occ_grid, opt_occ = occ_and_opt
            z_metric = render.z_vals * scale
            d_metric = (bundle.depth * scale)[:, None]
            g_occ = occ_grid_cotangent(
                occ_grid,
                jax.lax.stop_gradient(render.points),
                z_metric,
                d_metric,
                bundle.valid,
                key=jax.random.fold_in(key, 0x0CC),
                estimator=cfg.occ.estimator,
            )
            updates, new_opt = tx_occ.update(g_occ, opt_occ, occ_grid)
            return optax.apply_updates(occ_grid, updates), new_opt

        occ_grid, opt_occ = jax.lax.cond(
            jnp.logical_and(flags.do_occ_update, finite),
            occ_update,
            lambda x: x,
            (state.occ_grid, state.opt_occ),
        )

        new_state = MapperState(
            params={"sigma": new_sigma, "intensity": new_intensity},
            poses=new_poses,
            opt_sigma=opt_sigma,
            opt_intensity=opt_intensity,
            opt_poses=opt_poses,
            occ_grid=occ_grid,
            opt_occ=opt_occ,
            global_step=state.global_step + 1,
            skipped_steps=state.skipped_steps + jnp.where(finite, 0, 1).astype(jnp.int32),
        )
        aux = dict(aux)
        aux["loss"] = loss
        aux["finite"] = finite
        return new_state, aux

    return _train_step


def make_train_step(
    cfg: MapperConfig, cube, donate: bool = False, out_shardings=None,
    apply_updates: bool = True,
):
    """Build the jitted train step. ``cube`` is the WorldCube (static).

    ``donate``: donate the input state's buffers to the output (halves HBM
    for the big table/moment arrays). Only safe when the caller threads the
    state linearly (``state = step(state, ...)``) and never touches the old
    state afterwards — the online mapper and bench do; tests and the
    multichip dryrun (which reuse a state across step variants) must not.

    ``out_shardings``: optional (state_shardings, aux_sharding) pair pinning
    the output placement, so a DP/TP wrapper's per-call ``device_put`` is a
    no-op after the first step instead of a re-replication every iteration.
    """
    _train_step = make_train_step_body(cfg, cube, apply_updates=apply_updates)
    jit_kwargs = {}
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = out_shardings
    step_posed = jax.jit(partial(_train_step, True), **jit_kwargs)
    step_frozen = jax.jit(partial(_train_step, False), **jit_kwargs)

    def train_step(state, window, key, flags, pose_mask, iteration):
        # freeze_poses picks the compiled variant (host-side, static); the
        # remaining flags stay dynamic so phases don't recompile
        fp = bool(flags.freeze_poses)
        fn = step_frozen if fp else step_posed
        return fn(state, window, key, flags, pose_mask, iteration)

    return train_step


def make_debug_probe(cfg: MapperConfig, cube):
    """One jitted observation pass over a window: the train step's exact ray
    build + sampler + render, but returning per-ray/per-point diagnostics
    instead of gradients (the reference dumps these from inside its train
    loop, ``src/mapping/optimizer.py:391-396,927-1017``; keeping the dump
    out of the hot jitted step is the TPU-shaped equivalent). Returns
    cube-frame arrays; runtime/debug_dump.py converts to world metric."""

    @jax.jit
    def probe(state: MapperState, window, key: jax.Array, iteration):
        k_rays, k_samp, k_enc = jax.random.split(key, 3)
        bundle = build_window_rays(
            state.poses, window, cube, cfg, k_rays, iteration
        )
        if cfg.samples_strategy == "OGM":
            z_vals = sampling.occ_grid_sampler_z_vals(
                k_samp, bundle, state.occ_grid, cfg.n_samples_train, cfg.perturb
            )
        else:
            z_vals = sampling.uniform_sampler_z_vals(
                k_samp, bundle, cfg.n_samples_train, cfg.perturb
            )
        render = render_rays(
            state.params, bundle, z_vals, cfg.nerf, sigma_only=True,
            key=k_enc, point_chunks=cfg.train_point_chunks,
        )
        _, aux = compute_lidar_loss(
            render, bundle, cfg.world_scale, cfg.loss,
            state.global_step.astype(jnp.float32),
            jnp.asarray(iteration).astype(jnp.float32),
            return_per_ray=True,
        )
        pr = aux["per_ray"]
        points = (
            bundle.origins[:, None, :]
            + bundle.directions[:, None, :] * z_vals[..., None]
        )
        return {
            "origins": bundle.origins,
            "endpoints": bundle.origins + bundle.directions * render.depth[:, None],
            "points": points,
            "weights": render.weights,
            "valid": bundle.valid,
            "depth_err": pr["depth_err_m"],
            "js": pr["js"],
            "los": pr["los"],
        }

    return probe


@lru_cache(maxsize=32)
def make_render_fn(
    cfg: MapperConfig,
    test: bool = True,
    sigma_only: bool = True,
    render_strategy: str = "default",
):
    """A jitted depth/render evaluation on a fixed-size ray bundle (the
    reference's ``Model.forward(testing=True)`` role for eval/analysis).
    ``sigma_only=False`` also evaluates the intensity branch (RGB output).

    Cached per config: eval loops (L1 depth, renderers) call this every
    invocation; rebuilding would discard the jit cache entry each time.
    """

    n_samples = cfg.n_samples_test if test else cfg.n_samples_train

    @jax.jit
    def render_fn(params, occ_grid, bundle: RayBundle, key: jax.Array):
        if cfg.samples_strategy == "OGM":
            z_vals = sampling.occ_grid_sampler_z_vals(key, bundle, occ_grid, n_samples, perturb=0.0)
        else:
            z_vals = sampling.uniform_sampler_z_vals(key, bundle, n_samples, perturb=0.0)
        return render_rays(
            params,
            bundle,
            z_vals,
            cfg.nerf,
            sigma_only=sigma_only,
            render_strategy=render_strategy,
        )

    return render_fn
