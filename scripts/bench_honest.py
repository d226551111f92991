"""HONEST benchmark protocol for the axon remote backend.

jax.block_until_ready() does NOT wait for remote execution here (measured:
an 8-iteration chained 2.36M-row gather loop "completes" in 0.1 ms but
fetching its scalar output takes 270 ms). Every timing below therefore ends
with a host fetch (float(...)) of a scalar that depends on all the work.

Usage: python scripts/bench_honest.py [--only a,b,...]
"""
import argparse
import sys, os, time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8


def fetch_timed(name, make_chain, *args):
    """make_chain -> jitted fn(*args) -> scalar; times K chained iterations
    inside the jit, fetches the scalar."""
    fn = make_chain()
    try:
        t0 = time.perf_counter()
        v = float(fn(*args))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:130]}", flush=True)
        return None
    t0 = time.perf_counter()
    v = float(fn(*args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:46s} {dt*1e3:9.2f} ms/iter (compile {compile_s:4.0f}s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args_ns = ap.parse_args()
    only = set(args_ns.only.split(",")) if args_ns.only else None

    def want(x):
        return only is None or x in only

    key = jax.random.PRNGKey(0)
    N, T = 2_359_296, 65536

    if want("gather"):
        for n in (294_912, 2_359_296):
            table = jax.random.normal(key, (T, 8), jnp.float32)
            idx0 = jax.random.randint(key, (n,), 0, T)

            def mk():
                @jax.jit
                def fn(table, idx):
                    def body(_, c):
                        idx, acc = c
                        rows = table[idx]
                        acc = acc + rows.sum()
                        idx = (idx + acc.astype(jnp.int32)) & (T - 1)
                        return idx, acc

                    _, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.float32(0)))
                    return acc

                return fn

            fetch_timed(f"XLA gather {n/1e6:.2f}M x (T,8)f32", mk, table, idx0)

    if want("lane"):
        # Pallas lane dynamic-gather at one-flagship-level volume
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        rows = N // 128
        tabl = jax.random.normal(key, (rows, 128), jnp.float32)
        li0 = jax.random.randint(key, (rows, 128), 0, 128)

        def k_lane(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

        lane_call = pl.pallas_call(
            k_lane,
            grid=(rows // 1024,),
            in_specs=[
                pl.BlockSpec((1024, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1024, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1024, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )

        def mk():
            @jax.jit
            def fn(tab, idx):
                def body(_, c):
                    idx, acc = c
                    g = lane_call(tab, idx)
                    acc = acc + g.sum()
                    idx = (idx + acc.astype(jnp.int32)) & 127
                    return idx, acc

                _, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.float32(0)))
                return acc

            return fn

        fetch_timed("Pallas lane-gather 2.36M elems", mk, tabl, li0)

    if want("scatter"):
        for n in (73_728, 294_912, 2_359_296):
            idx0 = jax.random.randint(key, (n,), 0, T)
            upd = jax.random.normal(key, (n, 16), jnp.float32)

            def mk():
                @jax.jit
                def fn(idx, upd):
                    def body(_, c):
                        idx, acc = c
                        out = jnp.zeros((T, 16), jnp.float32).at[idx].add(upd)
                        acc = acc + out.sum()
                        idx = (idx + acc.astype(jnp.int32)) & (T - 1)
                        return idx, acc

                    _, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.float32(0)))
                    return acc

                return fn

            fetch_timed(f"XLA scatter-add {n/1e3:.0f}K x (T,16)f32", mk, idx0, upd)

    if want("fwd") or want("step") or want("sampler") or want("fieldbwd"):
        from __graft_entry__ import _flagship
        from loner_tpu.mapping.optimizer import TrainStepFlags, build_window_rays, make_train_step
        from loner_tpu.models import sampling
        from loner_tpu.models.nerf import query_sigma_t

        cfg, cube, state, window = _flagship()
        nerf_cfg = cfg.nerf._replace(encoding_slot_period=cfg.n_samples_train)
        rays_fn = jax.jit(lambda poses, k: build_window_rays(poses, window, cube, cfg, k))
        bundle = rays_fn(state.poses, key)

    if want("fwd"):
        pts0 = jax.random.uniform(key, (3, N), jnp.float32, minval=-1, maxval=1)

        def mk():
            @jax.jit
            def fn(params, pts):
                def body(_, c):
                    pts, acc = c
                    s = query_sigma_t(params, pts, nerf_cfg)
                    acc = acc + s.sum()
                    pts = jnp.clip(pts + acc * 1e-30, -1.0, 1.0)
                    return pts, acc

                _, acc = jax.lax.fori_loop(0, K, body, (pts, jnp.float32(0)))
                return acc

            return fn

        fetch_timed("field fwd (enc+mlp) 2.36M", mk, state.params, pts0)

    if want("fieldbwd"):
        pts0 = jax.random.uniform(key, (3, N), jnp.float32, minval=-1, maxval=1)

        def mk():
            @jax.jit
            def fn(params, pts):
                def body(_, c):
                    p, acc = c
                    g = jax.grad(lambda pp: query_sigma_t(pp, pts, nerf_cfg).sum())(p)
                    acc = acc + jax.tree.leaves(g)[0].sum()
                    p = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
                    return p, acc

                _, acc = jax.lax.fori_loop(0, K, body, (params, jnp.float32(0)))
                return acc

            return fn

        fetch_timed("field fwd+bwd (params) 2.36M", mk, state.params, pts0)

    if want("sampler"):
        def mk():
            @jax.jit
            def fn(occ):
                def body(i, c):
                    occ, acc = c
                    z = sampling.occ_grid_sampler_z_vals(
                        jax.random.fold_in(key, i), bundle, occ, cfg.n_samples_train, cfg.perturb
                    )
                    return occ, acc + z.sum()

                _, acc = jax.lax.fori_loop(0, K, body, (occ, jnp.float32(0)))
                return acc

            return fn

        fetch_timed("occ sampler", mk, state.occ_grid)

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
            def fn(st):
                for i in range(K):
                    st, aux = step(st, window, jax.random.fold_in(key, i), flags, pose_mask, jnp.asarray(i))
                return aux["loss"]

            return fn

        fetch_timed("full train step", mk, state)


if __name__ == "__main__":
    main()
