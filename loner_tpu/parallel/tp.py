"""Hash-table tensor parallelism: shard the multi-resolution hash tables
(the dominant parameter, e.g. 16 levels x 2^16 cells x 16 features) across a
"model" mesh axis while ray batches stay data-parallel over "data".

The reference has no TP analog (SURVEY §2.4 — single GPU, tables fit); on
TPU slices the table axis is how maps larger than one chip's HBM scale: each
chip owns a contiguous slab of every level's cell table, a gather becomes a
masked local gather + all-reduce over "model" (the standard sharded-embedding
pattern), and the backward scatter-add lands only on the owning chip. All of
that is derived by XLA's SPMD partitioner from ONE sharding annotation on the
table leaves — computation follows sharding; no hand-written collectives.

Usage:
    mesh = make_dp_tp_mesh(8, tp=2)            # 4-way data x 2-way model
    step = make_tp_train_step(train_step, mesh)
    state = shard_mapper_state(state, mesh)    # tables + their Adam moments
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(n_devices: Optional[int] = None, tp: int = 2) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % tp != 0:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    return Mesh(np.asarray(devs).reshape(n // tp, tp), ("data", "model"))


def _is_table_path(path) -> bool:
    for entry in path:
        key = getattr(entry, "key", getattr(entry, "name", None))
        if key == "table":
            return True
    return False


def mapper_state_shardings(state, mesh: Mesh):
    """Per-leaf shardings: hash-table leaves (and their optimizer moments,
    which mirror the param tree under the same 'table' key) are sharded over
    the cell axis; everything else (MLPs, poses, occ grid) is replicated."""
    table_s = NamedSharding(mesh, P(None, "model"))
    repl = NamedSharding(mesh, P())

    def leaf_sharding(path, leaf):
        # shard only leaves whose second-to-last axis is the cell axis of a
        # real hash table; tiny CP lines / Fourier-free leaves stay replicated
        if (
            _is_table_path(path)
            and getattr(leaf, "ndim", 0) >= 2
            and leaf.shape[-2] >= 4096
        ):
            return table_s
        return repl

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_mapper_state(state, mesh: Mesh):
    return jax.device_put(state, mapper_state_shardings(state, mesh))


def shard_window(window, mesh: Mesh):
    """Keyframe axis over "data", replicated over "model"."""
    return jax.device_put(window, NamedSharding(mesh, P("data")))


def make_tp_train_step(cfg, cube, mesh: Mesh, donate: bool = False):
    """Build a DP x TP train step: hash-table leaves (and their Adam
    moments) sharded over "model", rays over "data". XLA partitions the
    jitted step: masked local gathers + all-reduce over "model" for the
    encoding, grad psum over "data" for replicated params.

    Output shardings are pinned to the input shardings so the per-call
    ``device_put`` is a no-op from the second step on.
    """
    import jax.random

    from loner_tpu.mapping.optimizer import init_mapper_state, make_train_step

    state_shape = jax.eval_shape(
        lambda k: init_mapper_state(k, cfg), jax.random.PRNGKey(0)
    )
    state_s = mapper_state_shardings(state_shape, mesh)
    repl = NamedSharding(mesh, P())
    win_s = NamedSharding(mesh, P("data"))
    step = make_train_step(cfg, cube, donate=donate, out_shardings=(state_s, repl))

    def sharded_step(state, window, key, flags, pose_mask, iteration):
        state = jax.device_put(state, state_s)  # no-op once placed
        window = jax.device_put(window, win_s)
        return step(state, window, key, flags, pose_mask, iteration)

    return sharded_step
