"""Trustworthy component timing: every iteration's inputs depend on the
previous iteration's outputs (chained inside one jit via lax.fori_loop), so
the remote backend can neither overlap nor memoize repeated executions.

Times the flagship train-step components:
  cellhash fwd / fwd+bwd, MLP fwd+bwd, occ interp, sample_pdf, full
  field fwd / fwd+bwd, render+loss fwd+bwd, full train step.

Usage: python scripts/profile_chained.py [--only name1,name2]
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

K = 8  # chained iterations inside one jit


def chain_timed(name, make_body, init_carry, k=K):
    """make_body() -> body(i, carry) -> carry. Times one chained jit of k
    iterations; reports per-iteration ms (1-iteration program subtracted is
    overkill; dispatch overhead is amortized over k)."""
    body = make_body()

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, k, body, carry)

    try:
        t0 = time.perf_counter()
        out = run(init_carry)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    out = run(init_carry)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / k
    print(f"{name:40s} {dt*1e3:9.2f} ms/iter   (compile {compile_s:5.1f}s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(n):
        return only is None or n in only

    from __graft_entry__ import _flagship
    from loner_tpu.mapping.optimizer import (
        TrainStepFlags,
        build_window_rays,
        make_train_step,
    )
    from loner_tpu.models import sampling
    from loner_tpu.models.losses import compute_lidar_loss
    from loner_tpu.models.occupancy_grid import occupancy_probs_t
    from loner_tpu.models.rendering import render_rays
    from loner_tpu.models.nerf import query_sigma_t
    from loner_tpu.models.mlp import mlp_apply_t
    from loner_tpu.ops.cell_hash import CellHashConfig, cell_hash_encode_t

    cfg, cube, state, window = _flagship()
    key = jax.random.PRNGKey(0)
    n_pts = cfg.rays_per_window * cfg.n_samples_train
    print(f"pts={n_pts/1e6:.2f}M  rays={cfg.rays_per_window}  S={cfg.n_samples_train}", flush=True)

    rays_fn = jax.jit(lambda poses, k: build_window_rays(poses, window, cube, cfg, k))
    bundle = rays_fn(state.poses, key)
    params = state.params
    occ = state.occ_grid

    ccfg = CellHashConfig(n_levels=16, log2_cells=16, bwd="level1")
    pts0 = jax.random.uniform(key, (3, n_pts), jnp.float32)

    # ---- cellhash fwd: pts depends on previous output ----
    if want("enc_fwd"):
        def mk():
            table = params["sigma"]["table"]

            def body(i, pts):
                out = cell_hash_encode_t(table, pts, ccfg, None)  # (32, N)
                return jnp.clip(pts + out[:3] * 1e-6, 0.0, 1.0)

            return body

        chain_timed("cellhash fwd", mk, pts0)

    # ---- cellhash fwd+bwd: table depends on previous grad ----
    if want("enc_bwd"):
        def mk():
            def body(i, tb):
                g_tb, g_pts = jax.grad(
                    lambda t, p: cell_hash_encode_t(t, p, ccfg, None).sum(), argnums=(0, 1)
                )(tb, pts0)
                return tb - 1e-9 * g_tb

            return body

        chain_timed("cellhash fwd+bwd (level1)", mk, params["sigma"]["table"])

        def mk2():
            ccfg_e = ccfg._replace(bwd="exact")

            def body(i, tb):
                g_tb, g_pts = jax.grad(
                    lambda t, p: cell_hash_encode_t(t, p, ccfg_e, None).sum(), argnums=(0, 1)
                )(tb, pts0)
                return tb - 1e-9 * g_tb

            return body

        chain_timed("cellhash fwd+bwd (exact)", mk2, params["sigma"]["table"])

    # ---- MLP fwd+bwd at encoder output shape ----
    if want("mlp"):
        mcfg = cfg.nerf.sigma_mlp_config()

        def mk():
            x = jnp.ones((mcfg.in_dim, n_pts), jnp.float32)

            def body(i, p):
                g = jax.grad(lambda pp: mlp_apply_t(pp, x, mcfg).sum())(p)
                return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)

            return body

        chain_timed("sigma MLP fwd+bwd", mk, params["sigma"]["mlp"])

    # ---- occ interpolation at sampler point count ----
    if want("occ"):
        n_half = cfg.rays_per_window * (cfg.n_samples_train // 2)
        p0 = jax.random.uniform(key, (3, n_half), jnp.float32, minval=-1, maxval=1)

        def mk():
            def body(i, p):
                pr = occupancy_probs_t(occ, p)
                return jnp.clip(p + pr[None] * 1e-6, -1.0, 1.0)

            return body

        chain_timed("occ interp (1.18M pts)", mk, p0)

    # ---- sample_pdf at flagship shape ----
    if want("pdf"):
        half = cfg.n_samples_train // 2
        z0 = jnp.sort(jax.random.uniform(key, (cfg.rays_per_window, half)), axis=-1)

        def mk():
            w = jnp.abs(jax.random.normal(key, (cfg.rays_per_window, half - 2)))

            def body(i, z):
                mids = 0.5 * (z[:, :-1] + z[:, 1:])
                zi = sampling.sample_pdf(jax.random.PRNGKey(0), mids, w, half)
                return jnp.sort(jnp.clip(z + zi * 1e-6, 0.0, 1.0), axis=-1)

            return body

        chain_timed("sample_pdf", mk, z0)

    # ---- full occ sampler ----
    if want("sampler"):
        def mk():
            def body(i, og):
                z = sampling.occ_grid_sampler_z_vals(
                    jax.random.PRNGKey(0), bundle, og, cfg.n_samples_train, cfg.perturb
                )
                return og + z.sum() * 1e-12

            return body

        chain_timed("occ_grid_sampler", mk, occ)

    # ---- field fwd (query_sigma_t on flat pts) ----
    if want("field_fwd"):
        pts_c = jax.random.uniform(key, (3, n_pts), jnp.float32, minval=-1, maxval=1)

        def mk():
            def body(i, p):
                s = query_sigma_t(params, p, cfg.nerf)
                return jnp.clip(p + s[None] * 1e-9, -1.0, 1.0)

            return body

        chain_timed("field fwd", mk, pts_c)

    # ---- field fwd+bwd ----
    if want("field_bwd"):
        pts_c = jax.random.uniform(key, (3, n_pts), jnp.float32, minval=-1, maxval=1)

        def mk():
            def body(i, p):
                g = jax.grad(lambda pp: query_sigma_t(pp, pts_c, cfg.nerf).sum())(p)
                return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)

            return body

        chain_timed("field fwd+bwd", mk, params)

    # ---- render+loss fwd+bwd (params chained) ----
    if want("loss"):
        z_fn = jax.jit(
            lambda k: sampling.occ_grid_sampler_z_vals(k, bundle, occ, cfg.n_samples_train, cfg.perturb)
        )
        z_vals = z_fn(key)

        def mk():
            def loss_fn(p):
                render = render_rays(p, bundle, z_vals, cfg.nerf, sigma_only=True)
                loss, _ = compute_lidar_loss(
                    render, bundle, cfg.world_scale, cfg.loss, jnp.float32(0), jnp.float32(0)
                )
                return loss

            def body(i, p):
                g = jax.grad(loss_fn)(p)
                return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)

            return body

        chain_timed("render+loss fwd+bwd", mk, params)

    # ---- full train step (state chained) ----
    if want("step"):
        step = make_train_step(cfg, cube)
        flags = TrainStepFlags(
            freeze_sigma=jnp.asarray(False),
            freeze_rgb=jnp.asarray(True),
            freeze_poses=jnp.asarray(True),
            do_occ_update=jnp.asarray(False),
        )
        pose_mask = jnp.zeros((cfg.max_keyframes,))

        def mk():
            def body(i, st):
                st2, _ = step(st, window, jax.random.fold_in(key, i), flags, pose_mask, i)
                return st2

            return body

        chain_timed("full train step", mk, state)


if __name__ == "__main__":
    main()
