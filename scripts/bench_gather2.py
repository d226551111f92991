"""Serialized gather/scatter micro-bench: chained lax.fori_loop inside one jit
so the remote backend cannot overlap or memoize iterations.

Usage: python scripts/bench_gather2.py
"""
import sys, os, time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8  # chained iterations inside the jit


def timed(name, fn, *args):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:46s} {dt*1e3:9.3f} ms/iter   (compile {compile_s:5.1f}s)", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    N = 2_359_296
    T = 65536

    table = jax.random.normal(key, (T, 8), jnp.float32)
    idx0 = jax.random.randint(key, (N,), 0, T)

    # --- XLA row gather, serialized: idx depends on previous output --------
    @jax.jit
    def chain_gather(table, idx):
        def body(_, carry):
            idx, acc = carry
            rows = table[idx]  # (N, 8)
            acc = acc + rows
            idx = (idx + rows[:, 0].astype(jnp.int32)) & (T - 1)
            return idx, acc

        idx, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.zeros((N, 8), jnp.float32)))
        return acc

    timed(f"XLA row-gather {N/1e6:.1f}M x 8 f32 (chained)", chain_gather, table, idx0)

    # --- XLA transposed gather: table (8, T), gather along axis 1 ----------
    table_t = table.T.copy()

    @jax.jit
    def chain_gather_t(table_t, idx):
        def body(_, carry):
            idx, acc = carry
            rows = table_t[:, idx]  # (8, N)
            acc = acc + rows
            idx = (idx + rows[0].astype(jnp.int32)) & (T - 1)
            return idx, acc

        idx, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.zeros((8, N), jnp.float32)))
        return acc

    timed("XLA col-gather (8, T)[:, idx] (chained)", chain_gather_t, table_t, idx0)

    # --- XLA scatter-add, serialized ----------------------------------------
    upd = jax.random.normal(key, (N, 16), jnp.float32)

    @jax.jit
    def chain_scatter(idx, upd):
        def body(_, carry):
            idx, acc = carry
            acc = acc.at[idx].add(upd)
            idx = (idx + acc[0, 0].astype(jnp.int32)) & (T - 1)
            return idx, acc

        idx, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.zeros((T, 16), jnp.float32)))
        return acc

    timed(f"XLA scatter-add {N/1e6:.1f}M x 16 f32 (chained)", chain_scatter, idx0, upd)

    # --- Pallas lane dynamic_gather, serialized, realistic volume ----------
    # one flagship level = 2.36M lookups; as (rows=18432, 128) lane gather
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

    @jax.jit
    def chain_lane(tab, idx):
        def body(_, carry):
            idx, acc = carry
            g = lane_call(tab, idx)
            acc = acc + g
            idx = (idx + g.astype(jnp.int32)) % 128
            return idx, acc

        idx, acc = jax.lax.fori_loop(0, K, body, (idx, jnp.zeros((rows, 128), jnp.float32)))
        return acc

    timed(f"Pallas lane-gather {N/1e6:.1f}M elems (chained)", chain_lane, tabl, li0)


if __name__ == "__main__":
    main()
