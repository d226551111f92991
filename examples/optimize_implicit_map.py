#!/usr/bin/env python
"""Offline implicit-map optimization from groundtruth poses (FDT workload).

Counterpart of ``examples/fdt_optimize_implicit_map.py``: build keyframes
from every scan of a sequence with slerp-interpolated GT poses, train the
sigma field epoch-wise with held-out L1 early stopping, checkpoint the
result.

Usage:
    python examples/optimize_implicit_map.py cfg/defaults.yaml --dataset <dir> \
        [--out outputs/map] [--epochs 8] [--window 16] [--submaps]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--dataset", required=False)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="outputs/implicit_map")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--its-per-window", type=int, default=32)
    ap.add_argument("--l1-threshold", type=float, default=1.05)
    ap.add_argument("--submaps", action="store_true", help="segment + per-submap optimization")
    ap.add_argument("--segment-length", type=float, default=50.0)
    args = ap.parse_args()

    from loner_tpu.config.build import build_mapper_config
    from loner_tpu.config.settings import load_settings
    from loner_tpu.data.dataset import SequenceDataset, interpolate_gt_poses, write_synthetic_dataset
    from loner_tpu.data.scan import sky_scan
    from loner_tpu.geometry.world_cube import compute_world_cube
    from loner_tpu.mapping.keyframe import KeyFrame
    from loner_tpu.mapping.offline import OfflineConfig, optimize_implicit_map
    from loner_tpu.mapping.submaps import segment_and_optimize_submaps
    from loner_tpu.runtime.checkpoints import save_checkpoint

    settings = load_settings(args.config)
    if args.synthetic:
        root = args.dataset or "/tmp/loner_tpu_synth"
        if not os.path.isdir(os.path.join(root, "scans")):
            write_synthetic_dataset(root)
        args.dataset = root
    dataset = SequenceDataset(args.dataset, pad_to=settings.data.get("scan_points_budget"))
    assert dataset.gt_poses is not None, "offline optimization needs poses_gt.tum"

    ray_range = tuple(settings.data.ray_range)
    cube = compute_world_cube(dataset.gt_poses, ray_range, rebase_to_first_pose=False)
    cfg = build_mapper_config(settings, float(cube.scale_factor))
    cfg = cfg._replace(max_keyframes=max(cfg.max_keyframes, len(dataset) + 8))

    keyframes = []
    sky_budget = settings.data.get("sky_points_budget", 4096)
    for i in range(len(dataset)):
        scan, ts = dataset.load_scan(i)
        gt = interpolate_gt_poses(dataset.gt_poses, dataset.gt_times, np.asarray([ts]))[0]
        sky = None
        with np.load(os.path.join(dataset.scan_dir, dataset.files[i])) as z:
            if "sky_directions" in z and len(z["sky_directions"]):
                sky = sky_scan(z["sky_directions"][:sky_budget], ray_range[1] + 1.0, ts, pad_to=sky_budget)
        keyframes.append(
            KeyFrame(scan=scan, timestamp=ts, pose_index=i, tracked_pose=gt, gt_pose=gt, sky=sky)
        )

    os.makedirs(args.out, exist_ok=True)
    offline = OfflineConfig(
        window_size=args.window,
        iterations_per_window=args.its_per_window,
        max_epochs=args.epochs,
        l1_stop_threshold=args.l1_threshold,
        log_dir=args.out,
    )

    if args.submaps:
        collection, results = segment_and_optimize_submaps(
            cfg, keyframes, segment_length_m=args.segment_length,
            offline=offline, out_dir=args.out, cube=cube,
        )
        for name, res in zip(collection.names, results):
            save_checkpoint(os.path.join(args.out, name, "checkpoints"), res.iterations, res.state)
            print(f"[{name}] L1 history: {[round(x, 3) for x in res.l1_history]}")
    else:
        result = optimize_implicit_map(cfg, cube, keyframes, offline)
        save_checkpoint(os.path.join(args.out, "checkpoints"), result.iterations, result.state)
        with open(os.path.join(args.out, "world_cube.yaml"), "w") as f:
            yaml.safe_dump(cube.as_dict(), f)
        settings.dump_pickle(os.path.join(args.out, "full_config.pkl"))
        print(
            f"[optimize_implicit_map] epochs={result.epochs_run} "
            f"L1 history={[round(x, 3) for x in result.l1_history]} "
            f"wall={result.wall_time_s:.0f}s"
        )


if __name__ == "__main__":
    main()
