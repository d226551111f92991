"""Debug-flag observability: point-cloud dumps + loss-distribution plots.

The analog of the reference's ``debug.flags`` visual-dump suite: the
reference writes ICP input/aligned clouds from the tracker
(``src/tracking/tracker.py:126-137,239-250``), sampled ray/point clouds from
the optimizer (``src/mapping/optimizer.py:391-396``), and loss-distribution
figures (``src/mapping/optimizer.py:927-1017``). TPU-first shape: the hot
jitted train step is NEVER touched — when a flag is on, the mapper runs one
extra jitted *probe* pass per window (same ray build / sampler / renderer,
per-ray reductions kept) and everything lands host-side under
``<dump_dir>/keyframe_<k>/``.

PCD files are ASCII PCD v0.7 (readable by Open3D/CloudCompare/pcl); plots
fall back to npz histograms when matplotlib is unavailable.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np


@dataclass
class DebugFlags:
    """Mirror of the cfg ``debug:`` block's visual-dump flags.

    ``global_enabled`` gates everything (reference ``settings.debug
    .global_enabled``); each flag then opts into one dump family.
    """

    global_enabled: bool = False
    draw_icp_clouds: bool = False  # tracker: pre-align + aligned clouds
    draw_rays: bool = False  # mapper probe: ray origin->endpoint clouds
    draw_samples: bool = False  # mapper probe: sampled field points
    draw_loss_distribution: bool = False  # mapper probe: per-ray loss hists
    dump_dir: Optional[str] = None  # set from the run dir by LonerSLAM

    def on(self, name: str) -> bool:
        return bool(self.global_enabled and getattr(self, name) and self.dump_dir)

    @property
    def mapper_any(self) -> bool:
        return any(
            self.on(n) for n in ("draw_rays", "draw_samples", "draw_loss_distribution")
        )


def write_pcd(path: str, points: np.ndarray, intensity: Optional[np.ndarray] = None):
    """Minimal ASCII PCD v0.7 writer (x y z [intensity])."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    cols = ["x", "y", "z"]
    data = pts
    if intensity is not None:
        data = np.concatenate(
            [pts, np.asarray(intensity, np.float32).reshape(-1, 1)], axis=1
        )
        cols.append("intensity")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(data)
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n")
        f.write(f"FIELDS {' '.join(cols)}\n")
        f.write(f"SIZE {' '.join(['4'] * len(cols))}\n")
        f.write(f"TYPE {' '.join(['F'] * len(cols))}\n")
        f.write(f"COUNT {' '.join(['1'] * len(cols))}\n")
        f.write(f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n")
        f.write("DATA ascii\n")
        np.savetxt(f, data, fmt="%.6f")


def read_pcd(path: str) -> np.ndarray:
    """Read back an ASCII PCD written by write_pcd (tests / quick analysis)."""
    with open(path) as f:
        lines = f.readlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("DATA")) + 1
    return np.loadtxt(lines[start:], dtype=np.float32).reshape(len(lines) - start, -1)


def write_loss_distribution(directory: str, per_ray: Dict[str, np.ndarray]):
    """Histogram figure (or npz fallback) of per-ray loss diagnostics —
    the reference's ``plot_loss_distribution``
    (``src/mapping/optimizer.py:927-1017``)."""
    os.makedirs(directory, exist_ok=True)
    arrays = {k: np.asarray(v).ravel() for k, v in per_ray.items()}
    np.savez(os.path.join(directory, "loss_distribution.npz"), **arrays)
    try:  # pragma: no cover - depends on env matplotlib
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    keys = [k for k in arrays if arrays[k].size and k not in ("valid", "opaque")]
    if not keys:
        return
    fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3))
    if len(keys) == 1:
        axes = [axes]
    mask = arrays.get("valid")
    for ax, k in zip(axes, keys):
        v = arrays[k]
        if mask is not None and mask.shape == v.shape:
            v = v[mask > 0]
        v = v[np.isfinite(v)]
        if v.size:
            ax.hist(v, bins=50)
        ax.set_title(k)
    fig.tight_layout()
    fig.savefig(os.path.join(directory, "loss_distribution.png"), dpi=100)
    plt.close(fig)


def dump_window_probe(
    flags: DebugFlags,
    tag: str,
    probe_out: Dict[str, np.ndarray],
    scale: float,
    shift: np.ndarray,
):
    """Write the mapper probe's diagnostics for one window. ``probe_out``
    holds cube-frame arrays (origins/endpoints/points in [0,1]^3-ish cube
    coords); they are mapped back to metric world coordinates with the
    world-cube transform before writing."""
    d = os.path.join(flags.dump_dir, tag)
    shift = np.asarray(shift, np.float32).reshape(1, 3)

    def to_world(p):
        return np.asarray(p, np.float32).reshape(-1, 3) * scale - shift

    valid = np.asarray(probe_out["valid"]).astype(bool).ravel()
    if flags.on("draw_rays"):
        write_pcd(
            os.path.join(d, "ray_origins.pcd"), to_world(probe_out["origins"])[valid]
        )
        write_pcd(
            os.path.join(d, "ray_endpoints.pcd"),
            to_world(probe_out["endpoints"])[valid],
            intensity=np.asarray(probe_out["depth_err"]).ravel()[valid],
        )
    if flags.on("draw_samples"):
        pts = np.asarray(probe_out["points"], np.float32)  # (N, S, 3)
        w = np.asarray(probe_out["weights"], np.float32)  # (N, S)
        pts = pts[valid].reshape(-1, 3)
        w = w[valid].ravel()
        write_pcd(os.path.join(d, "sample_points.pcd"), pts * scale - shift, intensity=w)
    if flags.on("draw_loss_distribution"):
        write_loss_distribution(
            d,
            {
                "depth_err_m": np.asarray(probe_out["depth_err"]),
                "js": np.asarray(probe_out["js"]),
                "los": np.asarray(probe_out["los"]),
                "valid": valid.astype(np.float32),
            },
        )
