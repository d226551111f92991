#!/usr/bin/env python
"""Summarize ablation/trial runs into a CSV + text table.

Counterpart of ``analysis/compute_metrics/traj/summarize_results.py``: walk
an output tree of config_*/trial_* run directories (as produced by
``run_slam.py --overrides ... --num-repeats N``), collect ate.yaml /
runtime.txt / l1_history.json, and emit per-config mean +- std tables.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def collect_run(run_dir):
    out = {}
    ate = os.path.join(run_dir, "ate.yaml")
    if os.path.exists(ate):
        with open(ate) as f:
            out["ate_rmse"] = yaml.safe_load(f)["rmse"]
    rt = os.path.join(run_dir, "runtime.txt")
    if os.path.exists(rt):
        out["runtime_s"] = float(open(rt).read().strip())
    l1 = os.path.join(run_dir, "l1_history.json")
    if os.path.exists(l1):
        with open(l1) as f:
            hist = json.load(f)
        if hist:
            out["l1_final"] = hist[-1]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="output tree root")
    ap.add_argument("--csv", help="write csv here")
    args = ap.parse_args()

    rows = []
    for dirpath, dirnames, filenames in os.walk(args.root):
        if any(f in filenames for f in ("ate.yaml", "runtime.txt", "l1_history.json")):
            rel = os.path.relpath(dirpath, args.root)
            metrics = collect_run(dirpath)
            if metrics:
                rows.append((rel, metrics))

    # group trials by config (strip trailing /trial_N)
    groups = {}
    for rel, metrics in rows:
        cfg = rel
        base = os.path.basename(rel)
        if base.startswith("trial_"):
            cfg = os.path.dirname(rel)
        groups.setdefault(cfg, []).append(metrics)

    keys = sorted({k for _, m in rows for k in m})
    print(f"{'config':40s} " + " ".join(f"{k:>18s}" for k in keys))
    lines = ["config," + ",".join(f"{k}_mean,{k}_std" for k in keys)]
    for cfg in sorted(groups):
        trials = groups[cfg]
        cells = []
        csv_cells = [cfg]
        for k in keys:
            vals = [t[k] for t in trials if k in t]
            if vals:
                m, s = float(np.mean(vals)), float(np.std(vals))
                cells.append(f"{m:>10.4f}+-{s:<6.4f}")
                csv_cells += [f"{m:.6f}", f"{s:.6f}"]
            else:
                cells.append(f"{'-':>18s}")
                csv_cells += ["", ""]
        print(f"{cfg:40s} " + " ".join(cells))
        lines.append(",".join(csv_cells))

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"\nwrote {args.csv}")


if __name__ == "__main__":
    main()
