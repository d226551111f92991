"""Full-step A/B harness: times the flagship train step (frozen + joint)
across named config variants. Per-op micro-benchmarks are not trustworthy
on the remote backend (async dispatch + result reuse make sub-ms numbers
meaningless), so every comparison here is a real state-threaded step loop —
the same instrument as bench.py.

    python scripts/bench_ab.py [--variants base,cp_bf16,...] [--iters 40]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
os.makedirs(cache_dir, exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def apply_variant(cfg, name: str):
    """Returns the flagship config for a named variant. All knobs flow
    through the config (part of the jit cache key) — ADVICE r04 found the
    earlier mutable-global dtype setter was a no-op because triad_encode_t
    always passes cfg.cp_dtype."""
    nerf = cfg.nerf
    if name == "base":
        return cfg
    if name == "cp_bf16":
        t = nerf.triad._replace(cp_dtype="bf16")
        return cfg._replace(nerf=nerf._replace(triad=t))
    if name == "no_hash":
        t = nerf.triad._replace(hash_levels=0)
        return cfg._replace(nerf=nerf._replace(triad=t))
    if name == "no_chunks":
        return cfg._replace(nerf=nerf._replace(point_chunks=1))
    if name == "regather":
        t = nerf.triad._replace(hash_save_residual=False)
        return cfg._replace(nerf=nerf._replace(triad=t))
    if name == "fused":
        return cfg._replace(nerf=nerf._replace(encoding_impl="fused"))
    if name == "cp_more_fourier":  # no hash, wider CP + more fourier detail
        t = nerf.triad._replace(hash_levels=0, cp_features=32, fourier_freqs=8)
        return cfg._replace(nerf=nerf._replace(triad=t))
    if name == "fast":  # cp bf16 + no hash level + single point pass
        t = nerf.triad._replace(hash_levels=0, cp_dtype="bf16")
        return cfg._replace(nerf=nerf._replace(triad=t, point_chunks=1))
    if name == "fast_hash":  # cp bf16 + single point pass, hash kept
        t = nerf.triad._replace(cp_dtype="bf16")
        return cfg._replace(nerf=nerf._replace(triad=t, point_chunks=1))
    if name == "small_hash":  # 4 MB hash table: gathers from a <4 MB operand
        # run far cheaper on v5e (scripts/bench_honest.py). NeRFConfig derives
        # triad.hash_log2_cells from the branch encoding (log2 - 2)
        enc = nerf.pos_encoding_sigma._replace(log2_hashmap_size=16)
        return cfg._replace(
            nerf=nerf._replace(pos_encoding_sigma=enc, point_chunks=1)
        )
    raise ValueError(name)


def measure(step, state, window, flags, pose_mask, n_iters):
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    state, _ = step(state, window, sub, flags, pose_mask, jnp.asarray(0))
    jax.block_until_ready(state.params)
    occ_true = flags._replace(do_occ_update=jnp.asarray(True))
    t0 = time.perf_counter()
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        f = occ_true if (i % 10 == 9) else flags
        state, _ = step(state, window, sub, f, pose_mask, jnp.asarray(i))
    jax.block_until_ready(state.params)
    return n_iters / (time.perf_counter() - t0), state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,cp_bf16,no_hash,no_chunks")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from __graft_entry__ import _flagship
    from loner_tpu.mapping.optimizer import (
        TrainStepFlags,
        init_mapper_state,
        make_train_step,
    )

    base_cfg, cube, _, window = _flagship()
    results = {}
    for name in args.variants.split(","):
        cfg = apply_variant(base_cfg, name)
        state = init_mapper_state(jax.random.PRNGKey(0), cfg)
        state = state._replace(poses=_flagship_poses(state))
        step = make_train_step(cfg, cube, donate=True)
        frozen = TrainStepFlags(
            freeze_sigma=jnp.asarray(False), freeze_rgb=jnp.asarray(True),
            freeze_poses=jnp.asarray(True), do_occ_update=jnp.asarray(False),
        )
        joint = frozen._replace(freeze_poses=jnp.asarray(False))
        no_mask = jnp.zeros((cfg.max_keyframes,))
        all_mask = jnp.ones((cfg.max_keyframes,)).at[0].set(0.0)
        fr, state = measure(step, state, window, frozen, no_mask, args.iters)
        jr, state = measure(step, state, window, joint, all_mask, args.iters)
        results[name] = {"frozen_it_s": round(fr, 2), "joint_it_s": round(jr, 2)}
        print(json.dumps({name: results[name]}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


def _flagship_poses(state):
    import numpy as np

    from loner_tpu.data import synthetic
    from loner_tpu.geometry import se3

    poses, _ = synthetic.circular_trajectory(n_poses=8, radius=6.0, z=1.5)
    pose6 = jax.jit(se3.matrix_to_pose)(jnp.asarray(np.stack(poses), jnp.float32))
    return state.poses.at[: len(poses)].set(pose6)


if __name__ == "__main__":
    main()
