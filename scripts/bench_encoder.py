"""Micro-profile of hash-encoder strategies at the flagship point count.

Compares the current CellHash (row gathers + (N,8) layout) against a
lane-transposed prototype (tables (16, T), column gathers, (16, N) layout)
for fwd and fwd+bwd, plus the vmapped-searchsorted vs vectorized-count
sample_pdf inner op.
"""
import argparse
import sys

sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, iters=10):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:9.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_359_296)
    args = ap.parse_args()
    n = args.n

    from loner_tpu.ops.cell_hash import CellHashConfig, cell_hash_encode_t, init_cell_table

    cfg = CellHashConfig(n_levels=16, log2_cells=16)
    L, T = cfg.n_levels, cfg.table_size
    key = jax.random.PRNGKey(0)
    table = init_cell_table(key, cfg)
    pts_t = jax.random.uniform(key, (3, n), jnp.float32)

    # current implementation
    fwd = jax.jit(lambda tb, p: cell_hash_encode_t(tb, p, cfg, None))
    timed("cellhash fwd (current)", fwd, table, pts_t)
    bwd = jax.jit(jax.grad(lambda tb, p: cell_hash_encode_t(tb, p, cfg, None).sum(), argnums=(0, 1)))
    timed("cellhash fwd+bwd (current)", bwd, table, pts_t)

    # ---------------- transposed prototype ----------------
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    from loner_tpu.models.hash_encoding import _CORNERS, _PRIMES

    corner_f = jnp.asarray(_CORNERS.astype(np.float32))  # (8, 3)
    table_t = jnp.zeros((L, 16, T), jnp.float32)

    def enc_t_fwd(tb_t, pts):
        outs = []
        for lvl in range(L):
            scale = float(scales[lvl])
            res = int(resolutions[lvl])
            scaled = pts * scale + 0.5
            cells = jnp.floor(scaled)
            frac = scaled - cells  # (3, N)
            c = jnp.clip(cells.astype(jnp.int32), 0, res - 1).astype(jnp.uint32)
            h = (
                c[0] * jnp.uint32(_PRIMES[0])
                ^ c[1] * jnp.uint32(_PRIMES[1])
                ^ c[2] * jnp.uint32(_PRIMES[2])
            )
            idx = (h % jnp.uint32(T)).astype(jnp.int32)
            # (8, N) trilinear weights
            w = jnp.prod(
                corner_f[:, :, None] * frac[None] + (1 - corner_f[:, :, None]) * (1 - frac[None]),
                axis=1,
            )
            v = tb_t[lvl][:, idx]  # (16, N) column gather
            f0 = v[0::2]  # (8, N)
            f1 = v[1::2]
            outs.append(jnp.stack([jnp.sum(f0 * w, 0), jnp.sum(f1 * w, 0)]))
        return jnp.concatenate(outs, axis=0)  # (32, N)

    fwd_t = jax.jit(enc_t_fwd)
    timed("transposed fwd (autodiff-able)", fwd_t, table_t, pts_t)
    bwd_t = jax.jit(jax.grad(lambda tb, p: enc_t_fwd(tb, p).sum(), argnums=(0, 1)))
    timed("transposed fwd+bwd (autodiff)", bwd_t, table_t, pts_t)

    # pieces of the transposed fwd
    idx = jax.random.randint(key, (L, n), 0, T)

    @jax.jit
    def gathers_only(tb_t, ix):
        return [tb_t[l][:, ix[l]] for l in range(L)]

    timed("16x column gathers only", gathers_only, table_t, idx)

    @jax.jit
    def hash_weights_only(pts):
        acc = jnp.zeros((8, n), jnp.float32)
        for lvl in range(L):
            scale = float(scales[lvl])
            scaled = pts * scale + 0.5
            cells = jnp.floor(scaled)
            frac = scaled - cells
            w = jnp.prod(
                corner_f[:, :, None] * frac[None] + (1 - corner_f[:, :, None]) * (1 - frac[None]),
                axis=1,
            )
            acc = acc + w
        return acc

    timed("16x hash+weights only", hash_weights_only, pts_t)

    # transposed scatter (backward analog): d_table[:, idx] += upd
    upd = jax.random.normal(key, (16, n), jnp.float32)
    one_idx = idx[0]

    @jax.jit
    def scatter_cols(ix, u):
        return jnp.zeros((16, T), jnp.float32).at[:, ix].add(u)

    timed("column scatter (1 level)", scatter_cols, one_idx, upd)

    @jax.jit
    def scatter_rows(ix, u):
        return jnp.zeros((T, 16), jnp.float32).at[ix].add(u.T)

    timed("row scatter w/ transpose (1 lvl)", scatter_rows, one_idx, upd)

    # ---------------- sample_pdf inner op ----------------
    n_rays, m, k = 4608, 257, 256
    cdf = jnp.sort(jax.random.uniform(key, (n_rays, m)), axis=-1)
    u = jax.random.uniform(key, (n_rays, k))

    from functools import partial

    timed(
        "vmap searchsorted (current)",
        jax.jit(lambda c, uu: jax.vmap(partial(jnp.searchsorted, side="right"))(c, uu)),
        cdf,
        u,
    )

    @jax.jit
    def count_le(c, uu):
        return jnp.sum((c[:, :, None] <= uu[:, None, :]).astype(jnp.int32), axis=1)

    timed("vectorized count (proposed)", count_le, cdf, u)

    @jax.jit
    def batched_ss(c, uu):
        return jax.vmap(partial(jnp.searchsorted, side="right", method="sort"))(c, uu)

    timed("searchsorted method=sort", batched_ss, cdf, u)


if __name__ == "__main__":
    main()
