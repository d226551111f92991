"""Online-run output contract, end-to-end: run_slam's run_trial on a small
synthetic sequence must leave a run directory that every downstream tool can
consume — checkpoints (online cadence + final), trajectories, configs — the
chain the reference supports via mapper checkpointing
(``src/mapping/mapper.py:110-119,177-180``) + ``analysis/*`` loaders."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.run_slam import run_trial  # noqa: E402


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from loner_tpu.config.settings import load_settings
    from loner_tpu.data.dataset import SequenceDataset, write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("synth_seq"))
    # 36 poses on the 31 m loop keeps per-frame motion <= ~0.9 m, inside
    # the ICP identity-init capture range (see .claude/skills/verify)
    write_synthetic_dataset(root, n_poses=36, period=7.2)
    dataset = SequenceDataset(root, pad_to=4096)

    settings = load_settings("cfg/synthetic_tiny.yaml")
    out = str(tmp_path_factory.mktemp("run_out"))
    ate = run_trial(settings, dataset, out, use_gt=False)
    return out, ate


class TestRunContract:
    def test_trajectories_and_configs(self, run_dir):
        out, ate = run_dir
        for f in (
            "full_config.yaml",
            "full_config.pkl",
            "world_cube.yaml",
            "runtime.txt",
            "timing.csv",
            os.path.join("trajectory", "tracking_only.txt"),
            os.path.join("trajectory", "estimated_trajectory.txt"),
            os.path.join("trajectory", "keyframe_trajectory.txt"),
            os.path.join("trajectory", "online_estimates.txt"),
        ):
            assert os.path.exists(os.path.join(out, f)), f"missing {f}"
        assert ate is not None and ate < 1.0

    def test_online_checkpoints_written(self, run_dir):
        out, _ = run_dir
        ckpt_dir = os.path.join(out, "checkpoints")
        names = os.listdir(ckpt_dir)
        assert any(n.startswith("ckpt_") for n in names), names
        assert "kf_poses.npz" in names
        kf = np.load(os.path.join(ckpt_dir, "kf_poses.npz"))
        assert len(kf["timestamps"]) >= 2
        assert kf["optimized"].shape[1:] == (4, 4)

    def test_downstream_load_and_render(self, run_dir):
        """render_map's loader path: load_run -> render a small depth image
        from the final checkpoint of an ONLINE run."""
        import jax

        from loner_tpu.analysis.renderer import render_camera_image
        from loner_tpu.runtime.run_io import load_run

        out, _ = run_dir
        cfg, cube, state = load_run(out)
        K = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1.0]])
        img = render_camera_image(cfg, cube, state, np.eye(4), K, 48, 64)
        assert img["depth"].shape == (48, 64)
        assert np.isfinite(np.asarray(img["depth"])).all()

    def test_metrics_on_run_dir(self, run_dir):
        from loner_tpu.analysis.metrics import ate_rmse
        from loner_tpu.runtime.trajectory_logger import load_tum

        out, _ = run_dir
        est, est_t = load_tum(os.path.join(out, "trajectory", "estimated_trajectory.txt"))
        kf, kf_t = load_tum(os.path.join(out, "trajectory", "keyframe_trajectory.txt"))
        m = ate_rmse(est, kf, est_t, kf_t)
        assert np.isfinite(m["rmse"])


@pytest.mark.slow
def test_parallel_trial_farm(tmp_path):
    """--parallel N farms config x trial jobs over CPU worker processes
    (reference run_loner.py:394-424's GPU job queue analog); every trial
    must land its own complete run directory."""
    import subprocess

    from loner_tpu.data.dataset import write_synthetic_dataset

    root = str(tmp_path / "seq")
    write_synthetic_dataset(root, n_poses=12, period=7.2)
    out = str(tmp_path / "farm")
    r = subprocess.run(
        [
            sys.executable, "examples/run_slam.py", "cfg/synthetic_tiny.yaml",
            "--dataset", root, "--out", out,
            "--num-repeats", "2", "--parallel", "2",
        ],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    for trial in range(2):
        tdir = os.path.join(out, f"trial_{trial}")
        assert os.path.exists(
            os.path.join(tdir, "trajectory", "estimated_trajectory.txt")
        ), r.stdout + r.stderr
