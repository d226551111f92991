#!/usr/bin/env python
"""Online SLAM driver: run tracking + mapping over an on-disk sequence.

The counterpart of the reference's ``examples/run_loner.py``: load the YAML
settings (baseline + per-sequence changes + optional ablation overrides),
compute the world cube, stream scans through the SLAM engine, and write the
output-directory contract (full_config.yaml, world_cube.yaml, trajectory/,
timing CSVs, runtime.txt).

Usage:
    python examples/run_slam.py cfg/defaults.yaml --dataset <dir> [--out outputs/run]
    python examples/run_slam.py cfg/defaults.yaml --synthetic [--gt-poses]
    python examples/run_slam.py ... --overrides cfg/ablation.yaml --num-repeats 3
"""
import argparse
import datetime
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def run_trial(settings, dataset, out_dir: str, use_gt: bool, profile: bool = False):
    import numpy as np

    from loner_tpu.config.build import build_slam_config
    from loner_tpu.geometry.world_cube import compute_world_cube
    from loner_tpu.runtime.profiling import maybe_trace
    from loner_tpu.slam import LonerSLAM

    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)

    ray_range = tuple(settings.data.ray_range)
    if dataset.gt_poses is not None and settings.system.world_cube.compute_from_groundtruth:
        cube = compute_world_cube(dataset.gt_poses, ray_range)
    else:
        cube = compute_world_cube(
            None, ray_range, traj_bounding_box=settings.system.world_cube.trajectory_bounding_box
        )

    slam_cfg = build_slam_config(settings, float(cube.scale_factor))
    slam_cfg.use_groundtruth_poses = use_gt
    slam = LonerSLAM(slam_cfg, cube, out_dir=out_dir)

    # persist the resolved config + world cube (the reference's contract)
    settings.dump_yaml(os.path.join(out_dir, "full_config.yaml"))
    settings.dump_pickle(os.path.join(out_dir, "full_config.pkl"))
    with open(os.path.join(out_dir, "world_cube.yaml"), "w") as f:
        yaml.safe_dump(cube.as_dict(), f)

    gt0_inv = None
    n = 0
    with maybe_trace(out_dir, enabled=profile):
        for scan, ts in dataset:
            gt = dataset.gt_pose_at(ts)
            if gt is not None:
                if gt0_inv is None:
                    gt0_inv = np.linalg.inv(gt)
                gt = gt0_inv @ gt  # tracker frame is anchored at the first scan
            slam.process_scan(scan, ts, gt_pose=gt)
            n += 1
        slam.stop(out_dir)

    wall = time.time() - t_start
    with open(os.path.join(out_dir, "runtime.txt"), "w") as f:
        f.write(f"{wall:.3f}\n")
    print(f"[run_slam] {n} scans in {wall:.1f}s -> {out_dir}")

    # post-run ATE if groundtruth known
    if dataset.gt_poses is not None:
        from loner_tpu.analysis.metrics import ate_rmse
        from loner_tpu.runtime.trajectory_logger import load_tum

        est, est_t = load_tum(os.path.join(out_dir, "trajectory", "estimated_trajectory.txt"))
        gt_rel = np.linalg.inv(dataset.gt_poses[0])[None] @ dataset.gt_poses
        m = ate_rmse(est, gt_rel, est_t, dataset.gt_times)
        print(f"[run_slam] ATE rmse={m['rmse']:.4f} m over {m['n']} poses")
        with open(os.path.join(out_dir, "ate.yaml"), "w") as f:
            yaml.safe_dump(m, f)
        return m["rmse"]
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="settings yaml (baseline or sequence file)")
    ap.add_argument("--dataset", help="sequence directory (scans/*.npz)")
    ap.add_argument("--synthetic", action="store_true", help="generate + run the synthetic sequence")
    ap.add_argument("--out", default=None)
    ap.add_argument("--gt-poses", action="store_true", help="map with groundtruth poses (debug)")
    ap.add_argument("--overrides", help="ablation overrides yaml (dotted path -> list)")
    ap.add_argument("--run-all-combos", action="store_true")
    ap.add_argument("--num-repeats", type=int, default=1)
    ap.add_argument(
        "--profile", action="store_true",
        help="write a jax.profiler trace under <out>/profile (reference loner.py:175-186)",
    )
    ap.add_argument(
        "--parallel", type=int, default=1,
        help="worker processes for ablation grids x repeats (the reference "
        "farms trials across GPUs via a job queue, run_loner.py:394-424; "
        "here workers are CPU processes — a single TPU chip cannot be "
        "shared, so parallel>1 forces JAX_PLATFORMS=cpu in the workers)",
    )
    args = ap.parse_args()

    from loner_tpu.config.settings import generate_options_spec, load_settings
    from loner_tpu.data.dataset import SequenceDataset, write_synthetic_dataset

    settings = load_settings(args.config)

    if args.synthetic:
        root = args.dataset or "/tmp/loner_tpu_synth"
        if not os.path.isdir(os.path.join(root, "scans")):
            write_synthetic_dataset(root)
        args.dataset = root
    assert args.dataset, "--dataset or --synthetic required"
    dataset = SequenceDataset(args.dataset, pad_to=settings.data.get("scan_points_budget"))

    stamp = datetime.datetime.now().strftime("%m%d%y_%H%M%S")
    base_out = args.out or os.path.join(
        settings.system.get("log_dir_prefix", "outputs/"), f"{dataset.meta.name}_{stamp}"
    )

    if args.overrides:
        with open(args.overrides) as f:
            overrides = yaml.safe_load(f)
        options = generate_options_spec(settings, overrides, args.run_all_combos)
    else:
        options = [(settings, "baseline")]

    jobs = []
    for ci, (cfg_i, desc) in enumerate(options):
        for trial in range(args.num_repeats):
            out = base_out
            if len(options) > 1:
                out = os.path.join(out, f"config_{ci}_{desc.replace('=', '_')}")
            if args.num_repeats > 1:
                out = os.path.join(out, f"trial_{trial}")
            jobs.append((ci, desc, trial, cfg_i, out))

    if args.parallel <= 1 or len(jobs) <= 1:
        for ci, desc, trial, cfg_i, out in jobs:
            print(f"[run_slam] config {ci} ({desc}) trial {trial} -> {out}")
            run_trial(cfg_i, dataset, out, args.gt_poses, profile=args.profile)
        return

    # trial farm (reference run_loner.py:394-424: a GPU job queue). Workers
    # are separate CPU processes: each run_trial holds big device state, and
    # the one TPU chip cannot be shared — so workers pin JAX_PLATFORMS=cpu.
    import concurrent.futures as cf
    import multiprocessing as mp

    print(f"[run_slam] farming {len(jobs)} trials over {args.parallel} CPU workers")
    with cf.ProcessPoolExecutor(
        max_workers=args.parallel, mp_context=mp.get_context("spawn")
    ) as pool:
        futs = {
            pool.submit(
                _parallel_worker,
                cfg_i.to_dict(),
                args.dataset,
                settings.data.get("scan_points_budget"),
                out,
                args.gt_poses,
            ): (ci, desc, trial, out)
            for ci, desc, trial, cfg_i, out in jobs
        }
        for fut in cf.as_completed(futs):
            ci, desc, trial, out = futs[fut]
            err = fut.exception()
            status = f"FAILED: {err}" if err else f"ate={fut.result()}"
            print(f"[run_slam] config {ci} ({desc}) trial {trial} done ({status})")


def _parallel_worker(settings_dict, dataset_path, pad_to, out_dir, use_gt):
    """One farmed trial in a fresh process (spawn): force the CPU backend
    before jax initializes, rebuild Settings/dataset, run."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from loner_tpu.config.settings import Settings
    from loner_tpu.data.dataset import SequenceDataset

    dataset = SequenceDataset(dataset_path, pad_to=pad_to)
    return run_trial(Settings(settings_dict), dataset, out_dir, use_gt)


if __name__ == "__main__":
    main()
