"""Microbenchmark: random row-gather strategies on the current backend.

The hash encoder's cost is dominated by gathers of feature rows from the
level tables (and scatter-adds in backward). Outputs are returned whole
(not reduced) so XLA cannot rewrite the gather away.

Usage: python scripts/bench_gather.py
"""
import argparse
import sys

sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp


def timed(name, fn, *args, iters=10):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:9.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_359_296)  # 4608*512
    ap.add_argument("--t", type=int, default=65536)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--levels", type=int, default=16)
    args = ap.parse_args()
    n, t, w, L = args.n, args.t, args.w, args.levels

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (t, w), jnp.float32)
    tables = jax.random.normal(key, (L, t, w), jnp.float32)
    idx = jax.random.randint(key, (n,), 0, t)
    idxs = jax.random.randint(key, (L, n), 0, t)
    rows = jax.random.normal(key, (n, w), jnp.float32)

    print(f"n={n} t={t} w={w} L={L}; one-level gather out={n*w*4/1e6:.0f} MB")

    timed("xla_rows (1 level)", jax.jit(lambda tb, ix: tb[ix]), table, idx)

    @jax.jit
    def loop_levels(tbs, ixs):
        # sum over the level axis only: per-point output stays (n, w)
        acc = jnp.zeros((n, w), jnp.float32)
        for l in range(L):
            acc = acc + tbs[l][ixs[l]]
        return acc

    timed("xla_rows x L (loop, acc)", loop_levels, tables, idxs)

    @jax.jit
    def flat_take(tb, ix):
        flat = tb.reshape(-1)
        idx2 = ix[:, None] * w + jnp.arange(w)[None, :]
        return flat[idx2]

    timed("xla_take flat (1 level)", flat_take, table, idx)

    table_t = table.T.copy()
    timed("xla_cols transposed (1 lvl)", jax.jit(lambda tb, ix: tb[:, ix]), table_t, idx)

    timed(
        "scatter_rows (1 level)",
        jax.jit(lambda ix, r: jnp.zeros((t, w), jnp.float32).at[ix].add(r)),
        idx,
        rows,
    )

    idx_sorted = jnp.sort(idx)
    timed("xla_rows sorted idx", jax.jit(lambda tb, ix: tb[ix]), table, idx_sorted)
    timed(
        "scatter_rows sorted idx",
        jax.jit(lambda ix, r: jnp.zeros((t, w), jnp.float32).at[ix].add(r)),
        idx_sorted,
        rows,
    )

    # one-wide gather: out (n,) from flat word table
    timed(
        "xla_take 1-wide (1 level)",
        jax.jit(lambda tb, ix: tb.reshape(-1)[ix * w]),
        table,
        idx,
    )

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 8192

    # pallas via take_along_axis with broadcast indices (sublane gather)
    def k_tala(idx_ref, table_ref, out_ref):
        ix = idx_ref[:]  # (CHUNK, 1) int32
        ixb = jnp.broadcast_to(ix, (CHUNK, w))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ixb, axis=0)

    @jax.jit
    def pallas_tala(tb, ix2):
        return pl.pallas_call(
            k_tala,
            grid=(n // CHUNK,),
            in_specs=[
                pl.BlockSpec((CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((t, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, w), jnp.float32),
        )(ix2, tb)

    timed("pallas take_along_axis ax0", pallas_tala, table, idx[:, None])

    # pallas transposed: table (w, t), gather along lanes
    def k_tala_t(idx_ref, table_ref, out_ref):
        ix = idx_ref[:]  # (1, CHUNK)
        ixb = jnp.broadcast_to(ix, (w, CHUNK))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ixb, axis=1)

    @jax.jit
    def pallas_tala_t(tb, ix2):
        return pl.pallas_call(
            k_tala_t,
            grid=(n // CHUNK,),
            in_specs=[
                pl.BlockSpec((1, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((w, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((w, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((w, n), jnp.float32),
        )(ix2, tb)

    timed("pallas take_along lanes", pallas_tala_t, table_t, idx[None, :])

    # pallas: jnp.take (gather rows) in VMEM
    def k_take(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:].reshape(-1), axis=0)

    @jax.jit
    def pallas_take(tb, ix2):
        return pl.pallas_call(
            k_take,
            grid=(n // CHUNK,),
            in_specs=[
                pl.BlockSpec((CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((t, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, w), jnp.float32),
        )(ix2, tb)

    timed("pallas jnp.take rows", pallas_take, table, idx[:, None])


if __name__ == "__main__":
    main()
