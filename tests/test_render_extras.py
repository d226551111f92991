"""Render/analysis extras: peak-depth-consistency maps, depth colormaps,
interpolated fly-through camera paths, video writer, trajectory plots
(reference ``analysis/renderer.py:181-216,330-420``, ``render_utils.py:
106-127``, ``plot_poses.py``)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from loner_tpu.analysis.render_utils import (
    depth_colormap,
    interpolate_camera_path,
    save_depth_png,
    write_video,
)


def test_depth_colormap_ranges():
    d = np.array([[0.0, 10.0], [49.0, 80.0]])
    img = depth_colormap(d, min_depth=1.0, max_depth=50.0)
    assert img.shape == (2, 2, 4) and img.dtype == np.uint8
    # beyond max_depth -> black
    np.testing.assert_array_equal(img[1, 1, :3], [0, 0, 0])
    # in-range pixels are colored
    assert img[0, 1, :3].sum() > 0


def test_save_depth_and_video(tmp_path):
    d = np.random.default_rng(0).uniform(1, 40, (16, 24))
    p = str(tmp_path / "d.png")
    save_depth_png(d, p)
    assert os.path.getsize(p) > 0
    frames = [depth_colormap(d + i) for i in range(4)]
    v = str(tmp_path / "v.gif")
    write_video(frames, v, fps=2)
    assert os.path.getsize(v) > 0


def test_interpolate_camera_path_spins_and_velocity():
    # straight 30 m line of key poses
    n = 7
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.linspace(0.0, 30.0, n)
    out, spins = interpolate_camera_path(
        poses, velocity=2.0, fps=4.0, spin_spacing_m=10.0, spin_duration_s=1.0
    )
    # 30 m at 2 m/s = 15 s -> 60 interp frames plus spin frames
    n_spin_frames = len(spins) * 4  # 1 s x 4 fps each
    assert len(out) == 60 + n_spin_frames
    assert len(spins) >= 2  # a spin every ~10 m over 30 m
    # spin frames rotate in place: translation constant through each spin
    s0 = spins[0]
    np.testing.assert_allclose(out[s0][:3, 3], out[s0 - 1][:3, 3], atol=1e-9)
    # non-spin frames advance monotonically in x
    assert out[-1][0, 3] == pytest.approx(30.0, abs=1e-6)

    raw, spins2 = interpolate_camera_path(poses, no_interp=True)
    assert len(raw) == n and spins2 == []


def test_peak_depth_consistency_output():
    import jax

    from loner_tpu.analysis.renderer import render_camera_image
    from loner_tpu.geometry.world_cube import compute_world_cube
    from loner_tpu.mapping.optimizer import init_mapper_state
    from tests.test_train_step import tiny_mapper_config

    poses = np.eye(4)[None].repeat(2, axis=0)
    cube = compute_world_cube(poses, ray_range=(1.0, 40.0))
    cfg = tiny_mapper_config(float(cube.scale_factor))
    state = init_mapper_state(jax.random.PRNGKey(0), cfg)
    K = np.array([[8.0, 0, 8], [0, 8, 6], [0, 0, 1]])
    out = render_camera_image(
        cfg, cube, state, np.eye(4), K, 12, 16, rgb=False, peak_consistency=True
    )
    assert out["peak_depth"].shape == (12, 16)
    assert np.all(np.isfinite(out["peak_depth"]))
    assert np.all(out["peak_depth"] >= 0)


def test_plot_poses_cli(tmp_path):
    d = tmp_path / "run" / "checkpoints"
    os.makedirs(d)
    k = 10
    t = np.linspace(0, 9, k)
    gt = np.tile(np.eye(4), (k, 1, 1))
    gt[:, 0, 3] = np.linspace(0, 5, k)
    noisy = gt.copy()
    noisy[:, 1, 3] += 0.05
    np.savez(
        d / "kf_poses.npz",
        timestamps=t, tracked=noisy, optimized=gt,
        has_gt=np.ones(k, bool), gt=gt,
    )
    r = subprocess.run(
        [sys.executable, "examples/plot_poses.py", str(tmp_path / "run"), "--plot-tracked"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "run" / "poses.png").exists()
