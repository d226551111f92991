"""Honest (chained) XLA scatter-add cost on TPU: rows x widths, carried
accumulator vs fresh zeros, plus gather cost at matching shapes.

Usage: python scripts/bench_scatter_chained.py
"""
import sys, os, time

sys.path.insert(0, ".")
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
        out = jax.block_until_ready(run(init))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:52s} {dt*1e3:9.2f} ms/iter (compile {compile_s:4.0f}s)", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    T = 1 << 20  # combined level1 table rows (16 levels x 65536)

    for n in (589_824, 2_359_296):
        idx0 = jax.random.randint(key, (n,), 0, T)
        upd = jax.random.normal(key, (n, 16), jnp.float32)

        # scatter into carried accumulator; idx depends on carry
        def body_acc(i, acc):
            idx = (idx0 + acc[0, 0].astype(jnp.int32)) % T
            return acc.at[idx].add(upd)

        chain_timed(f"scatter-add {n/1e6:.1f}M rows x16 -> (1M,16) carried", body_acc, jnp.zeros((T, 16), jnp.float32))

        # fresh zeros each iteration (what the VJP does)
        def body_zero(i, s):
            idx = (idx0 + s.astype(jnp.int32)) % T
            out = jnp.zeros((T, 16), jnp.float32).at[idx].add(upd)
            return s + out.sum() * 1e-20

        chain_timed(f"scatter-add {n/1e6:.1f}M rows x16 -> fresh zeros", body_zero, jnp.float32(0))

        # width 8
        def body_w8(i, s):
            idx = (idx0 + s.astype(jnp.int32)) % T
            out = jnp.zeros((T, 8), jnp.float32).at[idx].add(upd[:, :8])
            return s + out.sum() * 1e-20

        chain_timed(f"scatter-add {n/1e6:.1f}M rows x8  -> fresh zeros", body_w8, jnp.float32(0))

    # per-level exact variant: 16 scatters of 2.36M into (65536, 16)
    n = 2_359_296
    idxs = jax.random.randint(key, (4, n), 0, 65536)
    upd = jax.random.normal(key, (n, 16), jnp.float32)

    def body_lvls(i, s):
        acc = jnp.float32(0)
        for l in range(4):
            idx = (idxs[l] + s.astype(jnp.int32)) % 65536
            out = jnp.zeros((65536, 16), jnp.float32).at[idx].add(upd)
            acc = acc + out.sum() * 1e-20
        return s + acc

    chain_timed("4x scatter-add 2.36M x16 -> (65536,16)", body_lvls, jnp.float32(0))

    # gather at matching shape, for reference
    tab = jax.random.normal(key, (T, 16), jnp.float32)

    def body_g(i, s):
        idx = (idx0 + s.astype(jnp.int32)) % T
        v = tab[idx]
        return s + v.sum() * 1e-20

    chain_timed("gather 2.36M rows x16 from (1M,16)", body_g, jnp.float32(0))

    # segment-sum alternative: sort by key then scatter with sorted indices
    def body_sorted(i, s):
        idx = (idx0 + s.astype(jnp.int32)) % T
        order = jnp.argsort(idx)
        out = jnp.zeros((T, 16), jnp.float32).at[idx[order]].add(
            upd[order], indices_are_sorted=True
        )
        return s + out.sum() * 1e-20

    chain_timed("sort + sorted scatter-add 2.36M x16", body_sorted, jnp.float32(0))


if __name__ == "__main__":
    main()
