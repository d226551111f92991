"""Micro-bench of the pose-backward extras (the D-minus-B ~33 ms of
scripts/profile_knockout.py): each d_pts / sampler-backward component at the
triad flagship shape (2.36M pts, 4608 rays x 512 samples).

Usage: python scripts/bench_pose_parts.py [--only a,b,...]
"""
import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(x):
        return only is None or x in only

    import numpy as np

    from loner_tpu.ops.cp_kernel import cp_encode_t, init_cp_lines
    from loner_tpu.ops.fused_encoder import (
        FusedHashConfig,
        _dpts_pallas,
        init_fused_table,
    )
    from loner_tpu.ops.triad_field import TriadConfig, fourier_encode_t, init_triad, triad_encode_t

    key = jax.random.PRNGKey(0)
    n = 2_359_296
    n_rays, s = 4608, 512
    tri = TriadConfig()
    pts0 = jax.random.uniform(key, (3, n), jnp.float32)

    # a. hash d_pts kernel (v_t read + kernel), 1 fat level
    if want("a"):
        hcfg = tri.hash_config(slot_period=s)
        v0 = jax.random.normal(key, (1, hcfg.row_width, n), jnp.bfloat16)
        g0 = jax.random.normal(key, (hcfg.n_features, n), jnp.float32)
        scales = jnp.asarray(hcfg.level_scales()).reshape(-1, 1)

        def b(i, p):
            d = _dpts_pallas(p, v0, g0, hcfg, scales)
            return jnp.clip(p + d * 1e-9, 0.0, 1.0)

        chain_timed("a: hash d_pts pallas (1 fat level)", b, pts0)

    # b. CP fwd only vs fwd+dx
    if want("b"):
        lines = init_cp_lines(key, tri.cp_resolutions, tri.cp_features)

        def bf(i, p):
            out = cp_encode_t(lines, p, tri.cp_resolutions, tri.cp_features)
            return jnp.clip(p + out[:3] * 1e-9, 0.0, 1.0)

        chain_timed("b1: cp fwd", bf, pts0)

        def bb(i, p):
            d = jax.grad(
                lambda q: cp_encode_t(lines, q, tri.cp_resolutions, tri.cp_features).sum()
            )(p)
            return jnp.clip(p + d * 1e-9, 0.0, 1.0)

        chain_timed("b2: cp fwd+dx", bb, pts0)

    # c. fourier fwd+dx
    if want("c"):
        def bc(i, p):
            d = jax.grad(lambda q: fourier_encode_t(q, tri.fourier_freqs).sum())(p)
            return jnp.clip(p + d * 1e-9, 0.0, 1.0)

        chain_timed("c: fourier fwd+dx", bc, pts0)

    # d. full triad encode fwd+dx (pts grads) vs fwd only
    if want("d"):
        params = init_triad(key, tri)

        def df(i, p):
            out = triad_encode_t(params, p, tri, None, s)
            return jnp.clip(p + out[:3] * 1e-9, 0.0, 1.0)

        chain_timed("d1: triad fwd", df, pts0)

        def db(i, p):
            d = jax.grad(lambda q: triad_encode_t(params, q, tri, None, s).sum())(p)
            return jnp.clip(p + d * 1e-9, 0.0, 1.0)

        chain_timed("d2: triad fwd + d_pts", db, pts0)

        def dtb(i, p):
            dt = jax.grad(
                lambda t: triad_encode_t(t, p, tri, None, s).sum()
            )(params)
            leaves = jax.tree.leaves(dt)
            acc = sum(l.sum() for l in leaves)
            return jnp.clip(p + acc * 1e-30, 0.0, 1.0)

        chain_timed("d3: triad fwd + d_table", dtb, pts0)

    # e. sort fwd and fwd+grad at sampler shape
    if want("e"):
        zc = jax.random.uniform(key, (n_rays, s), jnp.float32)

        def ef(i, z):
            return jnp.sort(z, axis=-1) * 0.9999 + 1e-9

        chain_timed("e1: jnp.sort (4608,512) fwd", ef, zc)

        def eb(i, z):
            g = jax.grad(lambda x: jnp.sum(jnp.sort(x, axis=-1) ** 2))(z)
            return z - 1e-9 * g

        chain_timed("e2: jnp.sort fwd+VJP", eb, zc)

    # f. sampler z_vals fwd+grad wrt near/far (the joint-phase z backward)
    if want("f"):
        from loner_tpu.models import sampling

        class B:
            pass

        near0 = jnp.full((n_rays,), 0.1)
        far0 = jnp.full((n_rays,), 1.5)
        o0 = jax.random.normal(key, (n_rays, 3)) * 0.01
        d0 = jax.random.normal(key, (n_rays, 3))
        occ = jnp.zeros((100, 100, 100), jnp.float32)

        from loner_tpu.geometry.rays import RayBundle

        def mk_bundle(near, far):
            return RayBundle(
                origins=o0,
                directions=d0,
                viewdirs=d0,
                near=near,
                far=far,
                depth=far0,
                valid=jnp.ones((n_rays,), bool),
            )

        def ff(i, carry):
            near, far = carry
            b = mk_bundle(near, far)
            z = sampling.occ_grid_sampler_z_vals(jax.random.PRNGKey(0), b, occ, s, 1.0)
            return (near + z.sum() * 1e-30, far)

        chain_timed("f1: occ sampler fwd", ff, (near0, far0))

        def fb(i, carry):
            near, far = carry
            gn, gf = jax.grad(
                lambda nn, fmax: sampling.occ_grid_sampler_z_vals(
                    jax.random.PRNGKey(0), mk_bundle(nn, fmax), occ, s, 1.0
                ).sum(),
                argnums=(0, 1),
            )(near, far)
            return (near - gn * 1e-9, far - gf * 1e-9)

        chain_timed("f2: occ sampler fwd+grad(near,far)", fb, (near0, far0))


if __name__ == "__main__":
    main()
