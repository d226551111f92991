"""Honest component timing: every iteration's input depends on the previous
iteration's output (a feedback scalar), so no dispatch/result caching or
overlap can fake the numbers — the same protocol as bench.py.

python scripts/bench_feedback.py [--which all|enc|samp|field|step]
"""
import argparse
import sys

sys.path.insert(0, ".")
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_fb(name, make_fn, iters=10):
    """make_fn returns (fn, x0) where fn(x, t) -> x' (feedback state)."""
    try:
        fn, x = make_fn()
        x = fn(x, 0)
        jax.block_until_ready(x)
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    t0 = time.perf_counter()
    for i in range(iters):
        x = fn(x, i + 1)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)
    return dt


N = 2_359_296  # 4608 * 512
T = 65536
L = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    which = args.which

    key = jax.random.PRNGKey(0)

    if which in ("all", "enc"):
        from loner_tpu.ops.cell_hash import CellHashConfig, cell_hash_encode_t, init_cell_table

        ccfg = CellHashConfig(n_levels=16, log2_cells=16)
        table = init_cell_table(key, ccfg)
        pts0 = jax.random.uniform(key, (3, N), jnp.float32) * 0.9

        def mk_enc_fwd():
            @jax.jit
            def f(pts, t):
                out = cell_hash_encode_t(table, pts, ccfg, None)
                fb = out[0, 0] * 1e-12
                return pts0 + fb

            return f, pts0

        timed_fb("cellhash fwd", mk_enc_fwd)

        def mk_enc_bwd():
            g = jax.grad(lambda tb, p: cell_hash_encode_t(tb, p, ccfg, None).sum(), argnums=(0, 1))

            @jax.jit
            def f(pts, t):
                gt, gp = g(table, pts)
                fb = gt[0, 0, 0] * 1e-12 + gp[0, 0] * 1e-12
                return pts0 + fb

            return f, pts0

        timed_fb("cellhash fwd+bwd", mk_enc_bwd)

        # raw row gathers x 16 with feedback
        idx0 = jax.random.randint(key, (L, N), 0, T)
        tbl_rows = jax.random.normal(key, (L, T, 8), jnp.float32)

        def mk_gathers():
            @jax.jit
            def f(ix, t):
                acc = jnp.zeros((N, 8), jnp.float32)
                for l in range(L):
                    acc = acc + tbl_rows[l][ix[l]]
                fb = (acc[0, 0] * 1e-12).astype(jnp.int32)
                return ix + fb

            return f, idx0

        timed_fb("16x row gathers (acc)", mk_gathers)

        rows0 = jax.random.normal(key, (N, 16), jnp.float32)

        def mk_scatter():
            @jax.jit
            def f(r, t):
                out = jnp.zeros((T, 16), jnp.float32).at[idx0[0]].add(r)
                return r + out[0, 0] * 1e-12

            return f, rows0

        timed_fb("row scatter 1 level (N,16)", mk_scatter)

    if which in ("all", "samp"):
        n_rays, m, k = 4608, 257, 256
        cdf0 = jnp.sort(jax.random.uniform(key, (n_rays, m)), axis=-1)
        u0 = jax.random.uniform(key, (n_rays, k))
        from functools import partial

        def mk_ss():
            @jax.jit
            def f(u, t):
                inds = jax.vmap(partial(jnp.searchsorted, side="right"))(cdf0, u)
                return u0 + inds[0, 0] * 1e-12

            return f, u0

        timed_fb("vmap searchsorted", mk_ss)

        def mk_count():
            @jax.jit
            def f(u, t):
                inds = jnp.sum((cdf0[:, :, None] <= u[:, None, :]).astype(jnp.int32), axis=1)
                return u0 + inds[0, 0] * 1e-12

            return f, u0

        timed_fb("vectorized count", mk_count)

        def mk_sortm():
            @jax.jit
            def f(u, t):
                inds = jax.vmap(partial(jnp.searchsorted, side="right", method="sort"))(cdf0, u)
                return u0 + inds[0, 0] * 1e-12

            return f, u0

        timed_fb("searchsorted method=sort", mk_sortm)

        # occupancy interpolation at (3, 4608, 256)
        from loner_tpu.models.occupancy_grid import occupancy_probs_t

        grid = jnp.zeros((100, 100, 100), jnp.float32)
        p0 = jax.random.uniform(key, (3, n_rays, k), jnp.float32) * 1.8 - 0.9

        def mk_occ():
            @jax.jit
            def f(p, t):
                pr = occupancy_probs_t(grid, p)
                return p0 + pr[0, 0] * 1e-12

            return f, p0

        timed_fb("occupancy_probs_t (1.18M pts)", mk_occ)

        # full occ sampler
        from loner_tpu.models import sampling
        from loner_tpu.geometry.rays import RayBundle

        o = jnp.zeros((n_rays, 3))
        d = jnp.ones((n_rays, 3)) / np.sqrt(3.0)
        bundle = RayBundle(
            origins=o,
            directions=d,
            viewdirs=d,
            near=jnp.full((n_rays,), 0.1),
            far=jnp.full((n_rays,), 1.2),
            depth=jnp.full((n_rays,), 0.8),
            valid=jnp.ones((n_rays,), bool),
        )

        def mk_sampler():
            @jax.jit
            def f(kk, t):
                z = sampling.occ_grid_sampler_z_vals(kk, bundle, grid, 512, 1.0)
                return jax.random.fold_in(kk, (z[0, 0] * 0).astype(jnp.int32))

            return f, key

        timed_fb("occ_grid_sampler_z_vals", mk_sampler)

    if which in ("all", "field"):
        from __graft_entry__ import _flagship
        from loner_tpu.models.nerf import query_sigma_t

        cfg, cube, state, window = _flagship()
        pts0 = jax.random.uniform(key, (3, N), jnp.float32) * 1.6 - 0.8

        def mk_field_fwd():
            @jax.jit
            def f(pts, t):
                s = query_sigma_t(state.params, pts, cfg.nerf)
                return pts0 + s[0] * 1e-12

            return f, pts0

        timed_fb("query_sigma_t fwd (2.36M)", mk_field_fwd)

        def mk_field_bwd():
            g = jax.grad(lambda p, x: query_sigma_t(p, x, cfg.nerf).sum(), argnums=(0, 1))

            @jax.jit
            def f(pts, t):
                gp, gx = g(state.params, pts)
                leaf = jax.tree.leaves(gp)[0]
                return pts0 + leaf.reshape(-1)[0] * 1e-12 + gx[0, 0] * 1e-12

            return f, pts0

        timed_fb("query_sigma_t fwd+bwd (2.36M)", mk_field_bwd)

    if which in ("all", "step"):
        from __graft_entry__ import _flagship
        from loner_tpu.mapping.optimizer import TrainStepFlags, make_train_step

        cfg, cube, state, window = _flagship()
        step = make_train_step(cfg, cube)
        flags = TrainStepFlags(
            freeze_sigma=jnp.asarray(False),
            freeze_rgb=jnp.asarray(True),
            freeze_poses=jnp.asarray(True),
            do_occ_update=jnp.asarray(False),
        )
        pose_mask = jnp.zeros((cfg.max_keyframes,))

        def mk_step():
            def f(st, t):
                st, _ = step(st, window, jax.random.fold_in(key, t), flags, pose_mask, jnp.asarray(0))
                return st

            return f, state

        timed_fb("full train step", mk_step)


if __name__ == "__main__":
    main()
