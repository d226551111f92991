"""End-to-end quality artifact at the reference operating point (VERDICT r04
item 3): one ONLINE synthetic run through the full cfg/defaults.yaml budgets
(window 8, 512+64 rays, 512 samples, 1000-iteration first keyframe then
50/KF, TEMPORAL keyframes, 5 Hz decimation) reporting tracking-only vs
BA-corrected ATE, per-phase its/s and wall time; plus the OFFLINE held-out
L1 at full budgets (the reference's FDT quality gate,
``examples/fdt_optimize_implicit_map.py:74``: L1 < 1.05 m).

Writes QUALITY_r{N}.json. The offline half can be skipped if an
ENCODER_EXP artifact already carries it (--skip-offline).

    python scripts/exp_quality_flagship.py [--cpu] [--out QUALITY_r05.json]
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
    ap.add_argument("--out", default="QUALITY_r05.json")
    ap.add_argument("--run-dir", default="/tmp/quality_flagship_run")
    ap.add_argument(
        "--n-poses", type=int, default=126,
        help="one 12.6 s lap at 10 Hz: ~0.5 m per processed (5 Hz) frame, "
        "inside the ICP identity-init capture range",
    )
    ap.add_argument("--skip-offline", action="store_true")
    ap.add_argument("--skip-online", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    payload = {
        "experiment": "online SLAM + offline FDT at the reference operating point",
        "platform": jax.devices()[0].platform,
    }

    if not args.skip_online:
        payload["online"] = run_online(args.run_dir, args.n_poses)
        print(json.dumps({"online": payload["online"]}), flush=True)
    if not args.skip_offline:
        payload["offline"] = run_offline()
        print(json.dumps({"offline": payload["offline"]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", args.out)


def run_online(run_dir: str, n_poses: int) -> dict:
    """Full-budget online run on the synthetic loop via the cfg tier (the
    exact path a user runs: examples/run_slam.py cfg/defaults.yaml)."""
    import numpy as np

    from examples.run_slam import run_trial
    from loner_tpu.config.settings import load_settings
    from loner_tpu.data import synthetic
    from loner_tpu.data.dataset import SequenceDataset, write_synthetic_dataset

    root = os.path.join(run_dir, "seq")
    if not os.path.isdir(os.path.join(root, "scans")):
        # a 31 m loop at 10 Hz scan rate (decimated to 5 Hz by
        # FrameSynthesis -> ~0.5 m per processed frame), denser channels
        # than the test dataset. write_synthetic_dataset runs ONE lap over
        # `period` seconds.
        write_synthetic_dataset(
            root,
            scene=synthetic.Scene.default(),
            n_poses=n_poses,
            radius=5.0,
            period=n_poses / 10.0,
            n_channels=32,
            n_azimuth=512,
            noise_std=0.01,
        )
    settings = load_settings(
        "cfg/defaults.yaml",
        overrides={
            "data": {"ray_range": [1, 40], "scan_points_budget": 16384},
            "system": {"loop_closure": {"enabled": True}},
            # the synthetic scans are INSTANTANEOUS (simulated from a static
            # pose, nominal per-point stamps), so per-point motion
            # compensation warps rigid geometry and degrades ICP fitness
            # 0.5 -> ~0.28 (measured r5); it stays ON for real sequences
            "tracker": {"motion_compensation": {"enabled": False}},
            "mapper": {
                "keyframe_manager": {
                    "keyframe_selection": {"temporal": {"time_diff_seconds": 1.5}}
                }
            },
        },
    )
    dataset = SequenceDataset(root, pad_to=16384)
    out = os.path.join(run_dir, "run")
    t0 = time.time()
    ate_est = run_trial(settings, dataset, out, use_gt=False)
    wall = time.time() - t0

    # tracking-only ATE for the tracked-vs-corrected comparison
    from loner_tpu.analysis.metrics import ate_rmse
    from loner_tpu.runtime.trajectory_logger import load_tum

    gt_rel = np.linalg.inv(dataset.gt_poses[0])[None] @ dataset.gt_poses
    track, t_track = load_tum(os.path.join(out, "trajectory", "tracking_only.txt"))
    ate_track = ate_rmse(track, gt_rel, t_track, dataset.gt_times)["rmse"]

    import csv

    its_per_sec = []
    with open(os.path.join(out, "timing.csv")) as f:
        for row in csv.DictReader(f):
            its_per_sec.append(float(row["its_per_sec"]))
    ba_info = None
    ba_path = os.path.join(out, "ba_info.json")
    if os.path.exists(ba_path):
        with open(ba_path) as f:
            ba_info = json.load(f)
    return {
        "n_scans": len(dataset),
        "wall_time_s": round(wall, 1),
        "ate_tracking_only_m": round(float(ate_track), 4),
        "ate_estimated_m": round(float(ate_est), 4),
        "ba": ba_info,
        "median_its_per_sec": round(float(np.median(its_per_sec)), 2)
        if its_per_sec
        else None,
    }


def run_offline() -> dict:
    """The flagship offline forest run with the default encoder — the same
    protocol as scripts/exp_encoder_flagship.py, single variant."""
    import subprocess
    import tempfile

    out = tempfile.mktemp(suffix=".json")
    cmd = [
        sys.executable,
        "scripts/exp_encoder_flagship.py",
        "--encoders",
        "triad",
        "--out",
        out,
    ]
    if jax.config.read("jax_platforms") == "cpu":
        cmd.append("--cpu")
    subprocess.run(cmd, check=True)
    with open(out) as f:
        return json.load(f)["results"]["triad"]


if __name__ == "__main__":
    main()
