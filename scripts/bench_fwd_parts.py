"""Chained timing of fused-encoder forward internals at the flagship shape:
idx computation, per-level gathers, transposes+stack, Pallas interp kernel,
and sort VJP candidates for the sampler backward.

Usage: python scripts/bench_fwd_parts.py
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
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:46s} {dt*1e3:9.2f} ms/iter (compile {compile_s:4.0f}s)", flush=True)
    return dt


def main():
    from loner_tpu.ops.fused_encoder import (
        FusedHashConfig,
        _gather_v_t,
        _interp_fwd_pallas,
        _level_indices,
        init_fused_table,
    )

    cfg = FusedHashConfig()
    key = jax.random.PRNGKey(0)
    n = 2_359_296
    master = init_fused_table(key, cfg)
    pts0 = jax.random.uniform(key, (3, n), jnp.float32)
    scales = jnp.asarray(cfg.level_scales()).reshape(-1, 1)

    # 1. idx computation only (pts chained)
    def b_idx(i, pts):
        s = jnp.int32(0)
        for lvl in range(cfg.n_levels):
            s = s + _level_indices(pts, cfg, lvl).sum()
        return jnp.clip(pts + s.astype(jnp.float32) * 1e-30, 0.0, 1.0)

    chain_timed("idx compute x16 (pts chained)", b_idx, pts0)

    # 2. gathers only, (N,16) bf16 rows, no transpose (table chained)
    def b_gather(i, tb):
        tbb = tb.astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for lvl in range(cfg.n_levels):
            idx = _level_indices(pts0, cfg, lvl)
            acc = acc + tbb[lvl][idx].astype(jnp.float32).sum()
        return tb + acc * 1e-30

    chain_timed("16x gather (N,16) bf16, no T", b_gather, master)

    # 3. gathers + transpose + stack (the current _gather_v_t)
    def b_gvt(i, tb):
        v_t = _gather_v_t(tb.astype(jnp.bfloat16), pts0, cfg)
        return tb + v_t.astype(jnp.float32).sum() * 1e-30

    chain_timed("_gather_v_t (gather+T+stack)", b_gvt, master)

    # 4. full fwd: gathers + kernel
    def b_fwd(i, tb):
        v_t = _gather_v_t(tb.astype(jnp.bfloat16), pts0, cfg)
        out = _interp_fwd_pallas(pts0, v_t, cfg, scales)
        return tb + out.sum() * 1e-30

    chain_timed("gathers + interp kernel", b_fwd, master)

    # 5. sort fwd and sort VJP at sampler shape
    zc = jax.random.uniform(key, (4608, 512), jnp.float32)

    def b_sort(i, z):
        return jnp.sort(z, axis=-1) * 0.9999 + 1e-9

    chain_timed("jnp.sort (4608,512) fwd", b_sort, zc)

    def b_sortvjp(i, z):
        g = jax.grad(lambda x: jnp.sum(jnp.sort(x, axis=-1) ** 2))(z)
        return z - 1e-9 * g

    chain_timed("jnp.sort fwd+VJP", b_sortvjp, zc)

    # 6. multi-operand sort (carry affine coefficients through)
    a0 = jax.random.uniform(key, (4608, 512), jnp.float32)

    def b_sort3(i, z):
        zs, a_s, b_s = jax.lax.sort([z, a0, a0], num_keys=1)
        return zs * 0.9999 + (a_s + b_s) * 1e-12

    chain_timed("lax.sort 3-operand fwd", b_sort3, zc)


if __name__ == "__main__":
    main()
