"""Multi-chip scaling via jax.sharding: data-parallel ray batches.

The reference is single-device (SURVEY §2.4); distribution is the genuinely
new part of this framework. v1 axis: **ray-batch data parallelism** — the
active window's keyframes are partitioned across chips, parameters and poses
are replicated, and XLA inserts the psum for gradients over the replicated
parameters automatically ("computation follows sharding"). Collectives ride
ICI; nothing crosses hosts in this mode.

Planned further axes (tracked in ROADMAP): hash-table tensor parallelism for
maps that exceed per-chip HBM, and submap-per-host partitioning over DCN.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate_to_mesh(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_window(window, mesh: Mesh, axis: str = "data"):
    """Partition a KeyFrameWindow's leading (keyframe) axis across chips.
    window_size must be divisible by the mesh size."""
    return jax.device_put(window, NamedSharding(mesh, P(axis)))


def make_sharded_train_step(
    cfg, cube, mesh: Mesh, axis: str = "data", donate: bool = False,
    apply_updates: bool = True,
):
    """Build a DP train step: state replicated, the window's keyframe axis
    sharded over ``axis``. XLA partitions the jitted step according to the
    argument shardings and all-reduces parameter gradients over ICI.

    Output shardings are pinned to the input shardings, so the per-call
    ``device_put`` is a placement no-op from the second step on — the state
    stays resident on the mesh and only the (small) window re-ships.
    """
    from loner_tpu.mapping.optimizer import make_train_step

    repl = NamedSharding(mesh, P())
    win_s = NamedSharding(mesh, P(axis))
    n_mesh = int(np.prod(mesh.devices.shape))
    step = make_train_step(
        cfg, cube, donate=donate, out_shardings=(repl, repl),
        apply_updates=apply_updates,
    )

    def sharded_step(state, window, key, flags, pose_mask, iteration):
        state = jax.device_put(state, repl)  # no-op once placed
        # early windows may hold fewer keyframes than the mesh is wide;
        # replicate those instead of failing the divisibility check
        w = jax.tree.leaves(window)[0].shape[0]
        window = jax.device_put(window, win_s if w % n_mesh == 0 else repl)
        return step(state, window, key, flags, pose_mask, iteration)

    return sharded_step
