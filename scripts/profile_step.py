"""Component-level timing of the flagship train step on the current backend.

Times (compile excluded) each stage of the step in isolation:
  ray build, occ sampler (interp + sample_pdf), field fwd, field fwd+bwd,
  full loss fwd+bwd, full train step.

Usage: python scripts/profile_step.py [--samples 512] [--iters 20]
"""
import argparse
import sys
sys.path.insert(0, ".")
import os
import time

import jax
import jax.numpy as jnp

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cp", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--hash", type=int, default=1, help="triad hash levels")
    ap.add_argument("--chunks", type=int, default=4, help="point chunks")
    args = ap.parse_args()

    from __graft_entry__ import _flagship
    from loner_tpu.mapping.optimizer import (
        TrainStepFlags,
        build_window_rays,
        make_train_step,
    )
    from loner_tpu.models import sampling
    from loner_tpu.models.losses import compute_lidar_loss
    from loner_tpu.models.rendering import render_rays
    from loner_tpu.models.nerf import query_sigma_t

    cfg, cube, state, window = _flagship()
    cfg = cfg._replace(n_samples_train=args.samples)
    triad = cfg.nerf.triad._replace(cp_dtype=args.cp, hash_levels=args.hash)
    cfg = cfg._replace(nerf=cfg.nerf._replace(triad=triad, point_chunks=args.chunks))
    if args.hash != 1:
        from loner_tpu.mapping.optimizer import init_mapper_state
        state = init_mapper_state(jax.random.PRNGKey(0), cfg)
    print(f"cp={args.cp} hash={args.hash} chunks={args.chunks}")
    key = jax.random.PRNGKey(0)
    n_pts = cfg.rays_per_window * cfg.n_samples_train
    print(f"rays/window={cfg.rays_per_window}  samples={cfg.n_samples_train}  pts={n_pts/1e6:.2f}M")

    # --- ray build ---
    rays_fn = jax.jit(lambda poses, k: build_window_rays(poses, window, cube, cfg, k))
    timed("build_window_rays", rays_fn, state.poses, key, iters=args.iters)
    bundle = rays_fn(state.poses, key)

    # --- sampler ---
    samp_fn = jax.jit(
        lambda k, occ: sampling.occ_grid_sampler_z_vals(k, bundle, occ, cfg.n_samples_train, cfg.perturb)
    )
    timed("occ_grid_sampler_z_vals", samp_fn, key, state.occ_grid, iters=args.iters)
    z_vals = samp_fn(key, state.occ_grid)

    unif_fn = jax.jit(lambda k: sampling.uniform_sampler_z_vals(k, bundle, cfg.n_samples_train, cfg.perturb))
    timed("uniform_sampler_z_vals", unif_fn, key, iters=args.iters)

    # --- raw field eval at flat points (isolates encoder+MLP from render) ---
    pts_t = jnp.zeros((3, n_pts), jnp.float32) + 0.1
    fwd_pts = jax.jit(lambda p, x: query_sigma_t(p, x, cfg.nerf).sum())
    timed("field fwd (flat pts)", fwd_pts, state.params, pts_t, iters=args.iters)
    bwd_pts = jax.jit(jax.grad(lambda p, x: query_sigma_t(p, x, cfg.nerf).sum()))
    timed("field fwd+bwd (flat pts)", bwd_pts, state.params, pts_t, iters=args.iters)

    # --- render fwd ---
    rr_fn = jax.jit(lambda p, z: render_rays(p, bundle, z, cfg.nerf, sigma_only=True).depth.sum())
    timed("render_rays fwd", rr_fn, state.params, z_vals, iters=args.iters)

    # --- loss fwd+bwd (params only) ---
    def loss_fn(p, z):
        render = render_rays(p, bundle, z, cfg.nerf, sigma_only=True)
        loss, _ = compute_lidar_loss(render, bundle, cfg.world_scale, cfg.loss, jnp.float32(0), jnp.float32(0))
        return loss

    lg_fn = jax.jit(jax.grad(loss_fn))
    timed("loss fwd+bwd (params)", lg_fn, state.params, z_vals, iters=args.iters)

    # --- full train step ---
    step = make_train_step(cfg, cube)
    flags = TrainStepFlags(
        freeze_sigma=jnp.asarray(False),
        freeze_rgb=jnp.asarray(True),
        freeze_poses=jnp.asarray(True),
        do_occ_update=jnp.asarray(False),
    )
    pose_mask = jnp.zeros((cfg.max_keyframes,))

    def step_fn(st, k):
        st, _ = step(st, window, k, flags, pose_mask, jnp.asarray(0))
        return st

    timed("full train step", step_fn, state, key, iters=args.iters)


if __name__ == "__main__":
    main()
