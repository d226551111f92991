"""Checkpoint save/load for mapper state via orbax.

Covers the reference's torch ``.tar`` checkpoints
(``src/mapping/mapper.py:161-180``: network + optimizer state + per-KF poses
+ optional occupancy grid state; cadence VERBOSE/STANDARD/DISABLED; final
always) and the FDT resume path
(``examples/fdt_optimize_implicit_map.py:135-161``).
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, state: Any, extras: Optional[dict] = None):
    """Save a mapper-state pytree (+ host-side extras) under
    ``directory/ckpt_<step>``."""
    path = os.path.abspath(os.path.join(directory, f"ckpt_{step}"))
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state}
    if extras:
        payload["extras"] = jax.tree.map(np.asarray, extras)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, name), int(m.group(1))
    return best


def load_checkpoint(path: str, template: Any):
    """Restore into the structure of ``template`` (a matching pytree, e.g. a
    freshly-initialized MapperState wrapped as {"state": ..., "extras": ...})."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
