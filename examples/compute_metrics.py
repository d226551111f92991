#!/usr/bin/env python
"""Metric CLI: trajectory ATE/RPE and map quality from a run directory.

Counterpart of ``analysis/compute_metrics/`` (evo-style trajectory
evaluation) and ``analysis/evaluate_lidar_map.py`` / ``compute_l1_depth.py``.

Usage:
    python examples/compute_metrics.py traj --est outputs/run/trajectory/estimated_trajectory.txt \
        --gt outputs/run/trajectory/groundtruth.txt
    python examples/compute_metrics.py map --est est_cloud.npy --gt gt_cloud.npy [--threshold 0.1]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)

    t = sub.add_parser("traj")
    t.add_argument("--est", required=True)
    t.add_argument("--gt", required=True)
    t.add_argument("--t-max-diff", type=float, default=0.1)
    t.add_argument("--rpe-delta", type=int, default=1)
    t.add_argument("--out")

    m = sub.add_parser("map")
    m.add_argument("--est", required=True, help=".npy (N,3) or ascii pcd")
    m.add_argument("--gt", required=True)
    m.add_argument("--threshold", type=float, default=0.1)
    m.add_argument("--no-realign", action="store_true")
    m.add_argument("--out")

    args = ap.parse_args()

    from loner_tpu.analysis.metrics import ate_rmse, map_metrics, rpe
    from loner_tpu.runtime.trajectory_logger import load_tum

    if args.mode == "traj":
        est, est_t = load_tum(args.est)
        gt, gt_t = load_tum(args.gt)
        result = {
            "ate": ate_rmse(est, gt, est_t, gt_t, args.t_max_diff),
            "rpe": rpe(est, gt, args.rpe_delta),
        }
    else:
        def load_cloud(p):
            if p.endswith(".npy"):
                return np.load(p)
            # ascii pcd
            lines = open(p).read().splitlines()
            start = lines.index("DATA ascii") + 1
            return np.loadtxt(lines[start:])

        result = map_metrics(
            load_cloud(args.est), load_cloud(args.gt),
            f_score_threshold=args.threshold, realign=not args.no_realign,
        )

    print(yaml.safe_dump(result, default_flow_style=False))
    if args.out:
        with open(args.out, "w") as f:
            yaml.safe_dump(result, f)


if __name__ == "__main__":
    main()
