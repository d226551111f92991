"""Knockout profiling of the flagship step: chained timings of nested
subsets of the step, so differences isolate each stage's in-context cost.

  A  loss fwd only                          (rays + sampler + field + loss)
  B  grad wrt params                        (+ table/MLP backward + scatter)
  C  grad wrt params, tables stop-gradient  (B minus encoder table bwd)
  D  grad wrt (params, poses)               (+ d_pts -> pose backward)
  E  full train step                        (+ adam, guards, state update)

Usage: python scripts/profile_knockout.py [--only A,B,...]
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

K = 8


def chain_timed(name, body, init):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, body, c)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:44s} {dt*1e3:9.2f} ms/iter (compile {compile_s:5.0f}s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(x):
        return only is None or x in only

    from __graft_entry__ import _flagship
    from loner_tpu.mapping.optimizer import (
        TrainStepFlags,
        build_window_rays,
        make_train_step,
    )
    from loner_tpu.models import sampling
    from loner_tpu.models.losses import compute_lidar_loss
    from loner_tpu.models.rendering import render_rays

    cfg, cube, state, window = _flagship()
    nerf_cfg = cfg.nerf._replace(encoding_slot_period=cfg.n_samples_train)
    key = jax.random.PRNGKey(0)

    def loss_fn(params, poses, occ, i):
        k = jax.random.fold_in(key, i)
        k1, k2 = jax.random.split(k)
        bundle = build_window_rays(poses, window, cube, cfg, k1)
        z = sampling.occ_grid_sampler_z_vals(k2, bundle, occ, cfg.n_samples_train, cfg.perturb)
        render = render_rays(params, bundle, z, nerf_cfg, sigma_only=True)
        loss, _ = compute_lidar_loss(render, bundle, cfg.world_scale, cfg.loss, 0.0, 0.0)
        return loss

    if want("A"):
        def body(i, p):
            l = loss_fn(p, state.poses, state.occ_grid, i)
            return jax.tree.map(lambda x: x + l * 1e-20, p)

        chain_timed("A: loss fwd", body, state.params)

    if want("B"):
        def body(i, p):
            g = jax.grad(loss_fn)(p, state.poses, state.occ_grid, i)
            return jax.tree.map(lambda x, y: x - 1e-9 * y, p, g)

        chain_timed("B: grad params", body, state.params)

    if want("C"):
        def loss_sg(params, poses, occ, i):
            params = {
                "sigma": {
                    "table": jax.lax.stop_gradient(params["sigma"]["table"]),
                    "mlp": params["sigma"]["mlp"],
                },
                "intensity": params["intensity"],
            }
            return loss_fn(params, poses, occ, i)

        def body(i, p):
            g = jax.grad(loss_sg)(p, state.poses, state.occ_grid, i)
            return jax.tree.map(lambda x, y: x - 1e-9 * y, p, g)

        chain_timed("C: grad params, table frozen", body, state.params)

    if want("D"):
        def body(i, carry):
            p, poses = carry
            gp, gpo = jax.grad(loss_fn, argnums=(0, 1))(p, poses, state.occ_grid, i)
            return (
                jax.tree.map(lambda x, y: x - 1e-9 * y, p, gp),
                poses - 1e-9 * gpo,
            )

        chain_timed("D: grad params+poses", body, (state.params, state.poses))

    if want("E"):
        step = make_train_step(cfg, cube)
        flags = TrainStepFlags(
            freeze_sigma=jnp.asarray(False),
            freeze_rgb=jnp.asarray(True),
            freeze_poses=jnp.asarray(True),
            do_occ_update=jnp.asarray(False),
        )
        pose_mask = jnp.zeros((cfg.max_keyframes,))

        def body(i, st):
            st2, _ = step(st, window, jax.random.fold_in(key, i), flags, pose_mask, i)
            return st2

        chain_timed("E: full train step", body, state)


if __name__ == "__main__":
    main()
