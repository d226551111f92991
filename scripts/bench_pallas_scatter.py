"""Measure Mosaic dynamic-row accumulate throughput (the scatter-add core).

Grid over point-chunks; idx chunk in SMEM, upd chunk in VMEM, (T,16)
accumulator lives in VMEM scratch across grid steps.
"""
import sys, os, time, functools

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 65536
N = 262144
C = 8192  # points per grid step


def timed(name, f, args, iters=6):
    try:
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:44s} compile {time.perf_counter()-t0:6.1f}s", flush=True)
        u = args[0]
        t0 = time.perf_counter()
        for i in range(iters):
            u = u + jax.tree.leaves(out)[0].reshape(-1)[0] * 1e-12
            out = f(u, *args[1:])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        ns_per = dt / N * 1e9
        print(f"{name:44s} {dt*1e3:9.3f} ms  ({ns_per:6.2f} ns/row)", flush=True)
        return dt
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def _mk(nshadow, acc_dtype):
    def kernel(idx_ref, upd_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, _):
            base = i * nshadow
            for s in range(nshadow):
                t = idx_ref[base + s]
                acc_ref[s, pl.ds(t, 1), :] = (
                    acc_ref[s, pl.ds(t, 1), :]
                    + upd_ref[pl.ds(base + s, 1), :].astype(acc_dtype)
                )
            return _

        jax.lax.fori_loop(0, C // nshadow, body, None)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            total = acc_ref[0]
            for s in range(1, nshadow):
                total = total + acc_ref[s]
            out_ref[:] = total.astype(jnp.float32)

    @jax.jit
    def run(upd, idx):
        return pl.pallas_call(
            kernel,
            grid=(N // C,),
            out_shape=jax.ShapeDtypeStruct((T, 16), jnp.float32),
            in_specs=[
                pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((C, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nshadow, T, 16), acc_dtype)],
        )(idx, upd)

    return run


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    upd = jax.random.normal(key, (N, 16), jnp.float32)
    jax.block_until_ready((idx, upd))

    @jax.jit
    def xla_plain(upd, idx):
        return jnp.zeros((T, 16), jnp.float32).at[idx].add(upd)

    ref = xla_plain(upd, idx)

    for nsh, dt_, label in [
        (1, jnp.float32, "pallas 1-shadow f32"),
        (2, jnp.float32, "pallas 2-shadow f32"),
        (4, jnp.bfloat16, "pallas 4-shadow bf16"),
        (8, jnp.bfloat16, "pallas 8-shadow bf16"),
    ]:
        run = _mk(nsh, dt_)
        try:
            out = run(upd, idx)
            err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
            print(f"  {label}: rel err vs XLA = {err:.2e}", flush=True)
        except Exception as e:
            print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        timed(label, run, (upd, idx))


if __name__ == "__main__":
    main()
