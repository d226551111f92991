"""Probe: Mosaic tpu.dynamic_gather as a VMEM hash-table lookup.

XLA's TPU gather moves a full vreg tile per random index (measured: the
encoder's 37.7M row-gathers/step dominate the flagship train step). If
Mosaic's dynamic_gather (jnp.take_along_axis inside a Pallas kernel) supports
sublane gather across a multi-vreg operand, the whole per-level table slab
(2 MB packed) can live in VMEM and lookups run at VMEM bandwidth.

Layout idea: table slab (R, 128) f32 where row r holds 16 cells x 8 words;
points chunked as (R, 128) with 16 points per row:
  stage 1 (sublane gather): out[i,j] = slab[rowidx[i,j], j]
  stage 2 (lane gather):    out2[i,j] = out[i, laneidx[i,j]]

Usage: python scripts/bench_dyngather.py
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


def timed(name, fn, *args, iters=20):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:44s} compile {time.perf_counter()-t0:6.1f}s", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    R = 4096  # table slab rows (T=65536 cells / 16 per row)

    for rows in (8, 512, 4096):
        tab = jax.random.normal(key, (rows, 128), jnp.float32)
        idx = jax.random.randint(key, (rows, 128), 0, rows)

        def k_sub(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        f = jax.jit(
            lambda t, i: pl.pallas_call(
                k_sub,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)
        )
        timed(f"dyngather sublane rows={rows}", f, tab, idx)

        def k_lane(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

        f2 = jax.jit(
            lambda t, i: pl.pallas_call(
                k_lane,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)
        )
        timed(f"dyngather lane rows={rows}", f2, tab, idx)

    # realistic volume: loop a (4096,128) sublane+lane gather over 36 chunks
    # ~= one level of the flagship encoder (2.36M points)
    tab = jax.random.normal(key, (R, 128), jnp.float32)
    idxs = jax.random.randint(key, (36, R, 128), 0, R)

    def k2(tab_ref, idx_ref, out_ref):
        idx = idx_ref[0]
        g = jnp.take_along_axis(tab_ref[:], idx, axis=0)
        out_ref[0] = jnp.take_along_axis(g, idx % 128, axis=1)

    def full(t, ii):
        return pl.pallas_call(
            k2,
            grid=(36,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((36, R, 128), jnp.float32),
        )(t, ii)

    timed("one flagship level (36 chunks, 2-stage)", jax.jit(full), tab, idxs)

    # XLA reference: same useful bytes via plain row gather
    table_rows = jax.random.normal(key, (65536, 8), jnp.float32)
    ridx = jax.random.randint(key, (2_359_296,), 0, 65536)
    timed("XLA row-gather 2.36M x 8 f32", jax.jit(lambda t, i: t[i]), table_rows, ridx)


if __name__ == "__main__":
    main()
