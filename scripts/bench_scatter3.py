"""Round 3 micro-bench: can any scatter formulation run at vector speed?

Feedback protocol (input depends on previous output) so the remote backend
cannot cache dispatches.
"""
import sys

sys.path.insert(0, ".")
import os
import time

import jax
import jax.numpy as jnp

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
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    for i in range(iters):
        x = fn(x, i + 1)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


N = 2_359_296
T = 65536


def main():
    key = jax.random.PRNGKey(0)
    idx0 = jax.random.randint(key, (N,), 0, T)
    upd0 = jax.random.normal(key, (N, 16), jnp.float32)
    perm0 = jax.random.permutation(key, N)

    def fb_of(out, x0):
        return x0 + jax.tree.leaves(out)[0].reshape(-1)[0] * 1e-12

    # permutation scatter (unique indices): sorted[r] = upd[i] with r a permutation
    def mk_perm_scatter():
        @jax.jit
        def f(u, t):
            out = jnp.zeros((N, 16), jnp.float32).at[perm0].set(
                u, unique_indices=True
            )
            return fb_of(out, upd0)

        return f, upd0

    timed_fb("scatter SET rows unique perm (N,16)", mk_perm_scatter)

    # gather by inverse permutation (the gather-formulated permutation)
    inv0 = jnp.argsort(perm0)

    def mk_perm_gather():
        @jax.jit
        def f(u, t):
            out = u[inv0]
            return fb_of(out, upd0)

        return f, upd0

    timed_fb("gather rows by perm (N,16)", mk_perm_gather)

    # argsort cost on 2.36M int32 keys
    def mk_argsort():
        @jax.jit
        def f(u, t):
            ii = idx0 + (u[0, 0] * 0).astype(jnp.int32)
            sk, perm = jax.lax.sort_key_val(ii, jnp.arange(N, dtype=jnp.int32))
            return upd0 + (sk[0] + perm[0]).astype(jnp.float32) * 1e-12

        return f, upd0

    timed_fb("sort_key_val 2.36M int32", mk_argsort)

    # full sorted-backward pipeline: sort keys once, gather rows, scatter-add
    # with sorted flag
    def mk_full_sorted_bwd():
        @jax.jit
        def f(u, t):
            ii = idx0 + (u[0, 0] * 0).astype(jnp.int32)
            sk, perm = jax.lax.sort_key_val(ii, jnp.arange(N, dtype=jnp.int32))
            su = u[perm]
            out = jnp.zeros((T, 16), jnp.float32).at[sk].add(
                su, indices_are_sorted=True
            )
            return fb_of(out, upd0)

        return f, upd0

    timed_fb("sort+gather+sorted-scatter-add", mk_full_sorted_bwd)

    # scatter-add bf16 rows (does byte width matter at all?)
    def mk_bf16():
        @jax.jit
        def f(u, t):
            out = jnp.zeros((T, 16), jnp.bfloat16).at[idx0].add(u.astype(jnp.bfloat16))
            return fb_of(out.astype(jnp.float32), upd0)

        return f, upd0

    timed_fb("scatter-add bf16 rows (N,16)", mk_bf16)

    # scatter-add wider rows: pack 16 levels into one (N*?) — index-count test:
    # same total bytes, 1/4 the indices (N/4 rows of width 64)
    def mk_wide64():
        u64 = upd0.reshape(N // 4, 64)
        i4 = idx0[: N // 4]

        @jax.jit
        def f(u, t):
            out = jnp.zeros((T, 64), jnp.float32).at[i4].add(u.reshape(N // 4, 64))
            return fb_of(out, upd0)

        return f, upd0

    timed_fb("scatter-add rows (N/4,64)", mk_wide64)

    # quarter the points, same width (pure index-count scaling check)
    def mk_quarter():
        i4 = idx0[: N // 4]

        @jax.jit
        def f(u, t):
            out = jnp.zeros((T, 16), jnp.float32).at[i4].add(u[: N // 4])
            return fb_of(out, upd0)

        return f, upd0

    timed_fb("scatter-add rows (N/4,16)", mk_quarter)


if __name__ == "__main__":
    main()
