"""Round 2 honest micro-bench: scatter strategies, MLP, occupancy interp.

Feedback protocol: each iteration's input depends on the previous output.
"""
import argparse
import sys

sys.path.insert(0, ".")
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_fb(name, make_fn, iters=10):
    try:
        fn, x = make_fn()
        x = fn(x, 0)
        jax.block_until_ready(x)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:130]}", flush=True)
        return None
    t0 = time.perf_counter()
    for i in range(iters):
        x = fn(x, i + 1)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt


N = 2_359_296
T = 65536


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    which = args.which
    key = jax.random.PRNGKey(0)

    if which in ("all", "scatter"):
        idx0 = jax.random.randint(key, (N,), 0, T)
        upd0 = jax.random.normal(key, (N, 16), jnp.float32)

        def fb_of(out, x0):
            return x0 + jax.tree.leaves(out)[0].reshape(-1)[0] * 1e-12

        def mk_scatter_plain():
            @jax.jit
            def f(u, t):
                out = jnp.zeros((T, 16), jnp.float32).at[idx0].add(u)
                return fb_of(out, upd0)

            return f, upd0

        timed_fb("scatter rows (N,16) plain", mk_scatter_plain)

        def mk_scatter_w8():
            u8 = upd0[:, :8]

            @jax.jit
            def f(u, t):
                out = jnp.zeros((T, 8), jnp.float32).at[idx0].add(u[:, :8])
                return fb_of(out, upd0)

            return f, upd0

        timed_fb("scatter rows (N,8)", mk_scatter_w8)

        def mk_scatter_w2():
            @jax.jit
            def f(u, t):
                out = jnp.zeros((T, 2), jnp.float32).at[idx0].add(u[:, :2])
                return fb_of(out, upd0)

            return f, upd0

        timed_fb("scatter rows (N,2)", mk_scatter_w2)

        idx_sorted = jnp.sort(idx0)

        def mk_scatter_sorted():
            @jax.jit
            def f(u, t):
                out = jnp.zeros((T, 16), jnp.float32).at[idx_sorted].add(
                    u, indices_are_sorted=True
                )
                return fb_of(out, upd0)

            return f, upd0

        timed_fb("scatter rows sorted+flag", mk_scatter_sorted)

        def mk_segsum_sorted():
            @jax.jit
            def f(u, t):
                out = jax.ops.segment_sum(u, idx_sorted, num_segments=T, indices_are_sorted=True)
                return fb_of(out, upd0)

            return f, upd0

        timed_fb("segment_sum sorted", mk_segsum_sorted)

        def mk_sortkeys():
            @jax.jit
            def f(u, t):
                ii = idx0 + (u[0, 0] * 0).astype(jnp.int32)
                sk, perm = jax.lax.sort_key_val(ii, jnp.arange(N, dtype=jnp.int32))
                return upd0 + sk[0] * 1e-12 + perm[0] * 1e-12

            return f, upd0

        timed_fb("sort_key_val keys only (2.36M)", mk_sortkeys)

        def mk_sort_cumsum_trick():
            @jax.jit
            def f(u, t):
                ii = idx0 + (u[0, 0] * 0).astype(jnp.int32)
                sk, perm = jax.lax.sort_key_val(ii, jnp.arange(N, dtype=jnp.int32))
                su = u[perm]  # (N, 16) gather
                cum = jnp.cumsum(su, axis=0)
                # ends[t] = #{i: sk[i] <= t} via count; T x N compare too big ->
                # use searchsorted method=sort over one row
                ends = jnp.searchsorted(sk, jnp.arange(T, dtype=jnp.int32), side="right", method="sort")
                cum_pad = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), cum], axis=0)
                out = cum_pad[ends] - cum_pad[jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])]
                return fb_of(out, upd0)

            return f, upd0

        timed_fb("sort+cumsum+diff trick", mk_sort_cumsum_trick)

        # scatter 1-wide into flat (T*16,)
        def mk_scatter_flat1():
            @jax.jit
            def f(u, t):
                flat_idx = idx0 * 16 + 3
                out = jnp.zeros((T * 16,), jnp.float32).at[flat_idx].add(u[:, 0])
                return fb_of(out, upd0)

            return f, upd0

        timed_fb("scatter flat 1-wide", mk_scatter_flat1)

    if which in ("all", "mlp"):
        from loner_tpu.models.mlp import MLPConfig, init_mlp, mlp_apply_t

        cfgs = {
            "f32": MLPConfig(in_dim=32, out_dim=1, hidden_dim=64, n_hidden_layers=1),
            "bf16": MLPConfig(in_dim=32, out_dim=1, hidden_dim=64, n_hidden_layers=1, compute_dtype="bfloat16"),
        }
        x0 = jax.random.normal(key, (32, N), jnp.float32)
        for nm, mc in cfgs.items():
            params = init_mlp(key, mc)

            def mk(mc=mc, params=params):
                @jax.jit
                def f(x, t):
                    y = mlp_apply_t(params, x, mc)
                    return x0 + y[0, 0] * 1e-12

                return f, x0

            timed_fb(f"mlp_apply_t 32->64->1 {nm} (2.36M)", mk)

        # transposed the other way: (N, 32) @ (32, 64)
        from loner_tpu.models.mlp import mlp_apply

        xr0 = jax.random.normal(key, (N, 32), jnp.float32)
        params = init_mlp(key, cfgs["f32"])

        def mk_rows():
            @jax.jit
            def f(x, t):
                y = mlp_apply(params, x, cfgs["f32"])
                return xr0 + y[0, 0] * 1e-12

            return f, xr0

        timed_fb("mlp_apply rows (N,32) f32", mk_rows)

    if which in ("all", "occ"):
        from loner_tpu.models.occupancy_grid import occupancy_probs_t

        n_rays, half = 4608, 256
        grid = jax.random.normal(key, (100, 100, 100), jnp.float32) * 0.1
        p0 = jax.random.uniform(key, (3, n_rays, half), jnp.float32) * 1.8 - 0.9

        def mk_occ_cur():
            @jax.jit
            def f(p, t):
                pr = occupancy_probs_t(grid, p)
                return p0 + pr[0, 0] * 1e-12

            return f, p0

        timed_fb("occ probs 3D-index (current)", mk_occ_cur)

        def mk_occ_flat():
            gflat = grid.reshape(-1)
            v = 100

            @jax.jit
            def f(p, t):
                pix = ((p + 1.0) * v - 1.0) / 2.0
                lo = jnp.floor(pix)
                frac = pix - lo
                lo = lo.astype(jnp.int32)
                out = jnp.zeros(p.shape[1:], jnp.float32)
                for dz in (0, 1):
                    for dy in (0, 1):
                        for dx in (0, 1):
                            cx = lo[0] + dx
                            cy = lo[1] + dy
                            cz = lo[2] + dz
                            inb = (
                                (cx >= 0) & (cx < v) & (cy >= 0) & (cy < v) & (cz >= 0) & (cz < v)
                            )
                            lin = (
                                jnp.clip(cz, 0, v - 1) * (v * v)
                                + jnp.clip(cy, 0, v - 1) * v
                                + jnp.clip(cx, 0, v - 1)
                            )
                            val = gflat[lin]
                            wx = jnp.where(dx == 1, frac[0], 1.0 - frac[0])
                            wy = jnp.where(dy == 1, frac[1], 1.0 - frac[1])
                            wz = jnp.where(dz == 1, frac[2], 1.0 - frac[2])
                            out = out + jnp.where(inb, val, 0.0) * wx * wy * wz
                pr = jax.nn.sigmoid(out)
                return p0 + pr[0, 0] * 1e-12

            return f, p0

        timed_fb("occ probs flat-linear gather", mk_occ_flat)

    if which in ("all", "samp2"):
        # the fixed sampler end-to-end
        from loner_tpu.models import sampling
        from loner_tpu.geometry.rays import RayBundle

        n_rays = 4608
        grid = jnp.zeros((100, 100, 100), jnp.float32)
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

        timed_fb("occ sampler (count searchsorted)", mk_sampler)


if __name__ == "__main__":
    main()
