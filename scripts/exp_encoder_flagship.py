"""Flagship-scale encoder experiment (VERDICT r02 item 5): offline
optimization on a full-extent synthetic forest at the reference operating
point (window 16, 512+64 rays/KF, 512 samples, MASK trunk-band sampling,
held-out L1 early stop at 1.05 m — fdt_optimize_implicit_map.py budgets),
comparing the encoder implementations the framework ships:

  triad  — CP lines + Fourier + one fat hash level (TPU default)
  fused  — per-level hash gathers with Pallas interp
  cell   — round-1 cell-packed jnp hash

Writes ENCODER_EXP_r05.json (the committed artifact; see BASELINE.md):
per-encoder L1 history, iterations, wall time.
Run on the TPU chip (default backend); pass --cpu for a harness check.

    python scripts/exp_encoder_flagship.py [--cpu] [--trees 80] [--kfs 40]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trees", type=int, default=80)
    ap.add_argument("--kfs", type=int, default=40)
    ap.add_argument("--extent", type=float, default=40.0)
    ap.add_argument("--encoders", default="triad,fused,cell")
    ap.add_argument("--max-epochs", type=int, default=8)
    # window 16 in ONE pass is 4.7M field points — the backward's activations
    # overwhelm the remote XLA compile (observed: compile never returns).
    # chunks=2 runs each pass at the bench-proven 2.36M-point program shape.
    ap.add_argument("--point-chunks", type=int, default=2)
    ap.add_argument("--small", action="store_true", help="tiny shapes (harness check)")
    ap.add_argument("--out", default="ENCODER_EXP_r05.json")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from loner_tpu.data import synthetic
    from loner_tpu.data.scan import make_lidar_scan, sky_scan
    from loner_tpu.geometry.world_cube import compute_world_cube
    from loner_tpu.mapping.keyframe import KeyFrame
    from loner_tpu.mapping.offline import OfflineConfig, optimize_implicit_map
    from loner_tpu.mapping.optimizer import MapperConfig

    scene = synthetic.Scene.forest(seed=1, extent=args.extent, n_trees=args.trees)
    # figure-eight-ish coverage: two circles over the extent
    poses_a, ts_a = synthetic.circular_trajectory(
        n_poses=args.kfs // 2, radius=args.extent * 0.45, z=1.8, period=args.kfs / 2.0
    )
    poses_b, ts_b = synthetic.circular_trajectory(
        n_poses=args.kfs - args.kfs // 2, radius=args.extent * 0.22, z=1.8,
        period=args.kfs / 2.0,
    )
    poses = np.concatenate([poses_a, poses_b])
    ts = np.concatenate([ts_a, ts_b + ts_a[-1] + 1.0])

    ray_range = (2.5, 45.0)  # Haveri forest operating point
    cube = compute_world_cube(poses, ray_range=ray_range, rebase_to_first_pose=False)

    if args.small:
        n_channels, n_azimuth, pad, spad = 8, 128, 2048, 128
        rays, sky_rays, samples = 64, 8, 64
    else:
        n_channels, n_azimuth, pad, spad = 32, 512, 16384, 1024
        rays, sky_rays, samples = 512, 64, 512

    kfs = []
    rng = np.random.default_rng(0)
    for i, (T, t0) in enumerate(zip(poses, ts)):
        dirs, dists, stamps, hit = synthetic.simulate_scan(
            scene, T, t0, n_channels=n_channels, n_azimuth=n_azimuth,
            max_range=ray_range[1], rng=rng, noise_std=0.01,
        )
        scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=pad)
        sky = sky_scan(dirs[~hit][:spad], ray_range[1] + 1.0, t0, pad_to=spad)
        kf = KeyFrame(scan=scan, timestamp=t0, pose_index=i, tracked_pose=T, gt_pose=T, sky=sky)
        kf.compute_band_indices()  # MASK trunk-band sampling (forest)
        kfs.append(kf)

    results = {}
    for enc in args.encoders.split(","):
        cfg = MapperConfig(
            ray_range=ray_range,
            world_scale=float(cube.scale_factor),
            window_size=16,
            max_keyframes=max(64, args.kfs),
            rays_per_kf=rays,
            sky_rays_per_kf=sky_rays,
            n_samples_train=samples,
            n_samples_test=samples * 2,
            rays_strategy="MASK",
            train_point_chunks=args.point_chunks,
        )
        # encoder spec: "triad" | "fused" | "cell" | "triad_nohash" |
        # "triad:cp=bf16" | "triad:cp=bf16,hash=0" (triad knob overrides)
        impl, _, knobs = enc.partition(":")
        triad = cfg.nerf.triad
        if impl == "triad_nohash":
            impl, knobs = "triad", (knobs + ",hash=0").strip(",")
        for kv in filter(None, knobs.split(",")):
            k, v = kv.split("=")
            if k == "cp":
                triad = triad._replace(cp_dtype=v)
            elif k == "hash":
                triad = triad._replace(hash_levels=int(v))
            elif k == "fourier":
                triad = triad._replace(fourier_freqs=int(v))
            elif k == "cpf":
                triad = triad._replace(cp_features=int(v))
            elif k == "hlog2":
                # NeRFConfig derives triad.hash_log2_cells from the branch
                # encoding's log2_hashmap_size - 2
                cfg = cfg._replace(
                    nerf=cfg.nerf._replace(
                        pos_encoding_sigma=cfg.nerf.pos_encoding_sigma._replace(
                            log2_hashmap_size=int(v) + 2
                        )
                    )
                )
            else:
                raise ValueError(f"unknown triad knob {k!r}")
        cfg = cfg._replace(
            nerf=cfg.nerf._replace(encoding_impl=impl, num_colors=1, triad=triad)
        )
        t0 = time.time()
        res = optimize_implicit_map(
            cfg,
            cube,
            list(kfs),
            OfflineConfig(
                window_size=16,
                iterations_per_window=32,
                max_epochs=args.max_epochs,
                n_eval_scans=6,
                eval_rays_per_scan=1024,
            ),
            log_fn=lambda s, e=enc: print(f"[{e}] {s}", flush=True),
        )
        results[enc] = {
            "l1_history_m": [round(x, 4) for x in res.l1_history],
            "final_l1_m": round(res.l1_history[-1], 4) if res.l1_history else None,
            "epochs": res.epochs_run,
            "iterations": res.iterations,
            "wall_time_s": round(time.time() - t0, 1),
        }
        print(json.dumps({enc: results[enc]}), flush=True)

        # write after EVERY encoder: remote-compile stalls can overrun the
        # harness timeout and a partial artifact beats none
        payload = {
            "experiment": "offline forest, flagship operating point"
            if not args.small
            else "offline forest, SMALL harness check",
            "scene": {"trees": args.trees, "extent_m": args.extent, "kfs": args.kfs},
            "ray_range": ray_range,
            "platform": jax.devices()[0].platform,
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
