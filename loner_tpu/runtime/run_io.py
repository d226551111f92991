"""Run-directory IO: the output contract every downstream tool boots from.

The reference's downstream tools (renderers, mesher, metrics, ROS nodes)
all reload ``full_config.pkl`` + ``world_cube.yaml`` + a checkpoint
(``analysis/renderer.py:104-160``); this is the shared loader for our
equivalent run directories.
"""
from __future__ import annotations

import os

import jax
import yaml

from loner_tpu.config.settings import Settings
from loner_tpu.geometry.world_cube import WorldCube
from loner_tpu.runtime.checkpoints import latest_checkpoint, load_checkpoint


def load_run(run_dir: str):
    """(cfg, cube, state) from a run directory containing full_config.pkl,
    world_cube.yaml and checkpoints/."""
    from loner_tpu.config.build import build_mapper_config
    from loner_tpu.mapping.optimizer import init_mapper_state

    settings = Settings.load_pickle(os.path.join(run_dir, "full_config.pkl"))
    with open(os.path.join(run_dir, "world_cube.yaml")) as f:
        cube = WorldCube.from_dict(yaml.safe_load(f))
    cfg = build_mapper_config(settings, float(cube.scale_factor))
    ckpt = latest_checkpoint(os.path.join(run_dir, "checkpoints"))
    assert ckpt, f"no checkpoint under {run_dir}/checkpoints"
    template = {"state": init_mapper_state(jax.random.PRNGKey(0), cfg)}
    state = load_checkpoint(ckpt, template)["state"]
    return cfg, cube, state
