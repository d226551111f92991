"""Probe: Mosaic lane dynamic-gather for CP line interpolation.

Checks whether `jnp.take_along_axis(line_bcast, idx, axis=1)` lowers inside
a Pallas TPU kernel when the 128-entry line is broadcast across sublanes,
and times a gather-based CP forward against the W-matmul kernel.

Usage: python scripts/bench_lane_gather.py
"""
import sys, os, time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8
F = 16
R = 128


def chain_timed(name, body, init):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, body, c)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:52s} {dt*1e3:9.2f} ms/iter (compile {compile_s:4.0f}s)", flush=True)
    return dt


def _gather_fwd_kernel(pts_ref, lines_ref, out_ref, *, resolutions, n_features):
    """CP fwd via lane dynamic-gather: out[lvl] = prod_axis lerp(line, pix)."""
    pts = pts_ref[:]  # (3, c)
    c = pts.shape[-1]
    for lvl, res in enumerate(resolutions):
        feats = []
        for a in range(3):
            pix = jnp.clip(pts[a], 0.0, 1.0) * (res - 1)  # (c,)
            i0 = jnp.clip(jnp.floor(pix), 0.0, res - 2.0).astype(jnp.int32)
            fr = pix - i0.astype(jnp.float32)  # (c,)
            line = lines_ref[3 * lvl + a]  # (F, 128)
            idx = jnp.broadcast_to(i0[None, :], (F, c))
            v0 = jnp.take_along_axis(line, idx, axis=1)  # (F, c)
            v1 = jnp.take_along_axis(line, idx + 1, axis=1)
            feats.append(v0 * (1.0 - fr)[None, :] + v1 * fr[None, :])
        out_ref[lvl * n_features : (lvl + 1) * n_features, :] = (
            feats[0] * feats[1] * feats[2]
        )


def main():
    from loner_tpu.ops.cp_kernel import _fwd_pallas, init_cp_lines, _pad_pts

    key = jax.random.PRNGKey(0)
    n = 2_359_296
    resolutions = (16, 32, 64, 128)
    lines = init_cp_lines(key, resolutions, F)
    pts0 = jax.random.uniform(key, (3, n), jnp.float32)

    # current matmul kernel
    def b_mm(i, p):
        out = _fwd_pallas(lines, p, resolutions, F)
        return jnp.clip(p + out[:3] * 1e-9, 0.0, 1.0)

    chain_timed("cp fwd matmul-W kernel", b_mm, pts0)

    # gather kernel
    nl = len(resolutions)
    c = 2048

    def gather_call(pts_p):
        np_ = pts_p.shape[-1]
        return pl.pallas_call(
            partial(_gather_fwd_kernel, resolutions=resolutions, n_features=F),
            grid=(np_ // c,),
            in_specs=[
                pl.BlockSpec((3, c), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * nl, F, R), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nl * F, c), lambda j: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nl * F, np_), jnp.float32),
        )(pts_p, lines)

    def b_g(i, p):
        out = gather_call(p)
        return jnp.clip(p + out[:3] * 1e-9, 0.0, 1.0)

    chain_timed("cp fwd lane-gather kernel", b_g, pts0)

    # equivalence check (tiny)
    pts_s = jax.random.uniform(jax.random.PRNGKey(1), (3, 2048), jnp.float32)
    a = _fwd_pallas(lines, pts_s, resolutions, F)
    b = gather_call(pts_s)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max |matmul - gather| = {err:.2e}")


if __name__ == "__main__":
    main()
