"""Scaling-efficiency harness: mapper it/s at mesh sizes 1..N (DP over the
keyframe/ray axis), plus optional DPxTP. Reports efficiency vs linear scaling
from the 1-device point (BASELINE.md target: >70% at >=2 hosts).

On a multi-chip TPU slice this measures the real thing; on CPU it validates
the harness (XLA_FLAGS=--xla_force_host_platform_device_count=8).

    python scripts/bench_scaling.py [--sizes 1,2,4,8] [--tp 2] [--iters 30]
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
import numpy as np  # noqa: E402


def build_problem(window_size: int):
    """Flagship-shaped problem with window_size keyframes (rays scale with
    the window, so N devices process N/1 x the rays of the 1-device run —
    weak scaling, the SLAM-relevant axis: more chips = bigger active window)."""
    from loner_tpu.data import synthetic
    from loner_tpu.data.scan import make_lidar_scan, sky_scan
    from loner_tpu.geometry import se3
    from loner_tpu.geometry.world_cube import compute_world_cube
    from loner_tpu.mapping.keyframe import KeyFrame, stack_window
    from loner_tpu.mapping.optimizer import MapperConfig, init_mapper_state

    scene = synthetic.Scene.default()
    poses, ts = synthetic.circular_trajectory(n_poses=window_size, radius=6.0, z=1.5)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=False)
    cfg = MapperConfig(
        world_scale=float(cube.scale_factor),
        ray_range=(1.0, 40.0),
        window_size=window_size,
        max_keyframes=max(512, window_size),
    )
    kfs = []
    for i, (T, t0) in enumerate(zip(poses, ts)):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=32, n_azimuth=512, max_range=40.0
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=16384)
        sky = sky_scan(dirs[~hit][:1024], cfg.ray_range[1] + 1.0, t0, pad_to=1024)
        kfs.append(KeyFrame(scan=scan, timestamp=t0, pose_index=i, tracked_pose=T, gt_pose=T, sky=sky))
    window = stack_window(kfs, n_sky_pad=1024)
    pose6 = jax.jit(se3.matrix_to_pose)(jnp.asarray(np.stack(poses), jnp.float32))
    state = init_mapper_state(jax.random.PRNGKey(0), cfg)
    state = state._replace(poses=state.poses.at[: len(kfs)].set(pose6))
    return cfg, cube, state, window


def time_step(step, state, window, cfg, iters: int) -> float:
    from loner_tpu.mapping.optimizer import TrainStepFlags

    flags = TrainStepFlags(
        freeze_sigma=jnp.asarray(False),
        freeze_rgb=jnp.asarray(True),
        freeze_poses=jnp.asarray(True),
        do_occ_update=jnp.asarray(False),
    )
    pose_mask = jnp.zeros((cfg.max_keyframes,))
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    state, _ = step(state, window, sub, flags, pose_mask, jnp.asarray(0))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, _ = step(state, window, sub, flags, pose_mask, jnp.asarray(i))
    jax.block_until_ready(state.params)
    return iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=None, help="comma list of mesh sizes")
    ap.add_argument("--tp", type=int, default=0, help="also run DPxTP at the largest size")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--base-window", type=int, default=8)
    args = ap.parse_args()

    from loner_tpu.mapping.optimizer import make_train_step
    from loner_tpu.parallel.sharding import make_mesh, make_sharded_train_step

    n_avail = len(jax.devices())
    sizes = (
        [int(s) for s in args.sizes.split(",")]
        if args.sizes
        else sorted({s for s in (1, 2, 4, 8) if s <= n_avail})
    )

    results = []
    base_rate = None
    for n in sizes:
        cfg, cube, state, window = build_problem(args.base_window * n)
        mesh = make_mesh(n)
        step = make_sharded_train_step(make_train_step(cfg, cube), mesh)
        rate = time_step(step, state, window, cfg, args.iters)
        rays_per_sec = rate * cfg.rays_per_window
        if base_rate is None:
            base_rate = rays_per_sec
        eff = rays_per_sec / (base_rate * n)
        results.append(
            {
                "devices": n,
                "window": cfg.window_size,
                "it_per_sec": round(rate, 3),
                "rays_per_sec": round(rays_per_sec),
                "scaling_efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    if args.tp and n_avail >= args.tp * 2:
        from loner_tpu.parallel.tp import make_dp_tp_mesh, make_tp_train_step

        n = max(sizes)
        cfg, cube, state, window = build_problem(args.base_window * (n // args.tp))
        mesh = make_dp_tp_mesh(n, tp=args.tp)
        step = make_tp_train_step(make_train_step(cfg, cube), mesh)
        rate = time_step(step, state, window, cfg, args.iters)
        print(
            json.dumps(
                {
                    "devices": n,
                    "tp": args.tp,
                    "window": cfg.window_size,
                    "it_per_sec": round(rate, 3),
                    "rays_per_sec": round(rate * cfg.rays_per_window),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
