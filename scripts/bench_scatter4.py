"""Scatter strategies with TRACED indices (like the real backward graph).

Everything feedback-dependent; indices passed as jit arguments.
"""
import sys, os, time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, T = 2_359_296, 65536


def timed(name, f, args, iters=8):
    try:
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:42s} compile {time.perf_counter()-t0:7.1f}s", flush=True)
        u = args[0]
        t0 = time.perf_counter()
        for i in range(iters):
            leaf = jax.tree.leaves(out)[0]
            u = u + leaf.reshape(-1)[0] * 1e-12
            out = f(u, *args[1:])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:42s} {dt*1e3:9.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:110]}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T)
    upd = jax.random.normal(key, (N, 16), jnp.float32)
    idx_sorted = jnp.sort(idx)
    jax.block_until_ready((idx, upd, idx_sorted))

    @jax.jit
    def plain(u, ii):
        return jnp.zeros((T, 16), jnp.float32).at[ii].add(u)

    timed("scatter-add traced idx", plain, (upd, idx))

    @jax.jit
    def sortedflag(u, ii):
        return jnp.zeros((T, 16), jnp.float32).at[ii].add(u, indices_are_sorted=True)

    timed("scatter-add sorted flag", sortedflag, (upd, idx_sorted))

    @jax.jit
    def segsum(u, ii):
        return jax.ops.segment_sum(u, ii, num_segments=T, indices_are_sorted=True)

    timed("segment_sum sorted", segsum, (upd, idx_sorted))

    @jax.jit
    def sortcost(u, ii):
        sk, perm = jax.lax.sort_key_val(ii, jnp.arange(N, dtype=jnp.int32))
        return u[0, 0] + sk[0] + perm[0]

    timed("sort_key_val 2.36M", sortcost, (upd, idx))

    @jax.jit
    def gatherperm(u, ii):
        return u[ii % N]

    timed("gather rows (N,16) by idx", gatherperm, (upd, idx))

    @jax.jit
    def fullpipe(u, ii):
        sk, perm = jax.lax.sort_key_val(ii, jnp.arange(N, dtype=jnp.int32))
        su = u[perm]
        return jnp.zeros((T, 16), jnp.float32).at[sk].add(su, indices_are_sorted=True)

    timed("sort+gather+sorted-scatter", fullpipe, (upd, idx))


if __name__ == "__main__":
    main()
