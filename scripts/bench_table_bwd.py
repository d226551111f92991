"""Micro-bench of the strided table-gradient (the B-minus-C 23.3 ms stage of
scripts/profile_knockout.py) at the triad flagship shape: m=295k update rows
(N/k = 2.36M/8) scattered into the (65536, 128) f32 fat-hash table.

Variants: full current path, einsum-only, scatter-only, bf16 operand,
feature-slab split, coarser stride.

Usage: python scripts/bench_table_bwd.py
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
        jax.block_until_ready(run(init))
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
    from loner_tpu.ops.fused_encoder import _bwd_dtable_strided, FusedHashConfig

    key = jax.random.PRNGKey(0)
    n = 2_359_296
    t_rows, width = 65536, 128
    cfg = FusedHashConfig(
        n_levels=1,
        log2_cells=16,
        base_resolution=512,
        per_level_scale=2.0,
        bwd="strided",
        bwd_stride=8,
        slot_period=512,
        n_features=16,
    )
    pts0 = jax.random.uniform(key, (3, n), jnp.float32)
    g0 = jax.random.normal(key, (16, n), jnp.float32)
    kd = jnp.asarray([3, 5], jnp.uint32)

    # 1. full current strided path (g chained)
    def b_full(i, g):
        d = _bwd_dtable_strided(pts0, g, kd, cfg)
        return g + d.sum() * 1e-30

    chain_timed("strided d_table FULL (m=295k, 33MB f32)", b_full, g0)

    m = n // 8
    idx0 = jax.random.randint(key, (m,), 0, t_rows)
    w0 = jax.random.uniform(key, (8, m), jnp.float32)
    gl0 = jax.random.normal(key, (16, m), jnp.float32)
    upd0 = jax.random.normal(key, (m, width), jnp.float32)

    # 2. einsum only
    def b_einsum(i, gl):
        upd = jnp.einsum("sn,fn->nfs", w0, gl).reshape(-1, width)
        return gl + upd.sum() * 1e-30

    chain_timed("einsum (8,m)x(16,m)->(m,128)", b_einsum, gl0)

    # 3. scatter only, f32 33MB operand
    def b_scat(i, upd):
        d = jnp.zeros((t_rows, width), jnp.float32).at[idx0].add(upd)
        return upd + d.sum() * 1e-30

    chain_timed("scatter-add (m,128) -> (65536,128) f32", b_scat, upd0)

    # 4. scatter bf16 operand (16MB)
    def b_scat_bf(i, upd):
        d = jnp.zeros((t_rows, width), jnp.bfloat16).at[idx0].add(upd.astype(jnp.bfloat16))
        return upd + d.astype(jnp.float32).sum() * 1e-30

    chain_timed("scatter-add bf16 operand (16MB)", b_scat_bf, upd0)

    # 5. feature-slab split: 4 x (65536, 32) f32 (8MB each)
    def b_scat_slab(i, upd):
        s = jnp.float32(0)
        for j in range(4):
            d = jnp.zeros((t_rows, 32), jnp.float32).at[idx0].add(upd[:, 32 * j : 32 * j + 32])
            s = s + d.sum()
        return upd + s * 1e-30

    chain_timed("scatter-add 4 slabs (65536,32) f32", b_scat_slab, upd0)

    # 6. half rows (k=16 -> m=147k)
    idx1 = idx0[: m // 2]
    upd1 = upd0[: m // 2]

    def b_scat_half(i, upd):
        d = jnp.zeros((t_rows, width), jnp.float32).at[idx1].add(upd)
        return upd + d.sum() * 1e-30

    chain_timed("scatter-add m=147k -> (65536,128) f32", b_scat_half, upd1)

    # 7. scatter into (65536*2, 64) f32 (same bytes, narrower rows)
    idx2 = idx0 * 2

    def b_scat_narrow(i, upd):
        u = upd.reshape(-1, 64)
        ix = jnp.stack([idx2, idx2 + 1], axis=1).reshape(-1)
        d = jnp.zeros((t_rows * 2, 64), jnp.float32).at[ix].add(u)
        return upd + d.sum() * 1e-30

    chain_timed("scatter-add 2m rows x64 (same bytes)", b_scat_narrow, upd0)


if __name__ == "__main__":
    main()
