#!/usr/bin/env python
"""Plot keyframe trajectories (ground truth vs tracked vs optimized) from a
run directory's pose-state dump, with an RMSE annotation.

Counterpart of ``analysis/plot_poses.py``: reads the per-keyframe pose
states (our ``checkpoints/kf_poses.npz``, the analog of the reference's
checkpoint ``poses`` list), plots XY tracks, and reports translation RMSE
per experiment.

Usage:
    python examples/plot_poses.py RUN_DIR [RUN_DIR ...] [--plot-tracked]
        [--title T] [--out poses.png]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_pose_states(run_dir: str):
    """(timestamps, tracked (K,4,4), optimized (K,4,4), gt (K,4,4)|None)."""
    path = os.path.join(run_dir, "checkpoints", "kf_poses.npz")
    if not os.path.exists(path):
        path = os.path.join(run_dir, "kf_poses.npz")
    d = np.load(path)
    gt = d["gt"] if bool(np.all(d["has_gt"])) and len(d["gt"]) else None
    return d["timestamps"], d["tracked"], d["optimized"], gt


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.sum((a[:, :3, 3] - b[:, :3, 3]) ** 2, axis=1))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--plot-tracked", action="store_true",
                    help="side-by-side ICP-tracked vs optimized panels")
    ap.add_argument("--title", default=None)
    ap.add_argument("--out", default=None, help="default: RUN_DIR/poses.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for run_dir in args.run_dirs:
        ts, tracked, opt, gt = load_pose_states(run_dir)
        xy = lambda P: (P[:, 0, 3], P[:, 1, 3])  # noqa: E731

        if args.plot_tracked:
            fig, axes = plt.subplots(1, 2, figsize=(10, 5))
            for ax, (track, name) in zip(
                axes, [(tracked, "Tracked"), (opt, "Optimized")]
            ):
                ax.set_aspect("equal")
                if gt is not None:
                    ax.plot(*xy(gt), label="Ground Truth")
                ax.plot(*xy(track), label=name)
                start = gt if gt is not None else track
                ax.scatter(*xy(start[:1]), s=20, color="red", label="Start Point")
                ax.set_xlabel("X (m)")
                ax.set_ylabel("Y (m)")
                title = f"{name}"
                if gt is not None:
                    title += f" (RMSE {rmse(track, gt):.3f} m)"
                ax.set_title(title)
                ax.legend(loc="upper right", fontsize=7)
        else:
            fig = plt.figure(figsize=(6, 6))
            ax = plt.gca()
            ax.set_aspect("equal")
            if gt is not None:
                ax.plot(*xy(gt), label="Ground Truth")
            ax.plot(*xy(opt), label="Optimized")
            start = gt if gt is not None else opt
            ax.scatter(*xy(start[:1]), s=20, color="red", label="Start Point")
            ax.set_xlabel("X (m)")
            ax.set_ylabel("Y (m)")
            if gt is not None:
                ax.set_title(f"RMSE {rmse(opt, gt):.3f} m")
            ax.legend(loc="upper right")

        if args.title:
            fig.suptitle(args.title)
        plt.tight_layout()
        out = args.out or os.path.join(run_dir, "poses.png")
        plt.savefig(out, dpi=200)
        plt.close(fig)
        msg = f"[plot_poses] {len(ts)} keyframes -> {out}"
        if gt is not None:
            msg += f"  (optimized RMSE {rmse(opt, gt):.3f} m)"
        print(msg)


if __name__ == "__main__":
    main()
