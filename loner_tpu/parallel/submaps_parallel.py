"""Submap-parallel training: the expert-parallel (EP) analog.

The reference optimizes submaps one after another on one GPU
(``examples/fdt_segment_and_optimize_submaps.py``); SURVEY §2.4 marks
submaps as the MoE-like axis. Here S independent submap models train
SIMULTANEOUSLY: their states and windows are stacked on a leading submap
axis, the un-jitted train-step body (``make_train_step_body``) is vmapped
over that axis, and the axis is sharded over the mesh — each device owns
S/N submaps end-to-end. No collectives are needed in the step (submaps are
independent); XLA partitions the whole vmapped program by the sharding
annotation alone.

This is the right decomposition for maps bigger than one chip: DP shards
rays of ONE model, TP shards ONE model's table, EP gives every chip its own
complete (small) model over a disjoint region — HBM and FLOPs both scale
linearly with zero ICI traffic.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loner_tpu.mapping.optimizer import (
    MapperConfig,
    MapperState,
    TrainStepFlags,
    init_mapper_state,
    make_train_step_body,
)


def stack_states(states: Sequence[MapperState]) -> MapperState:
    """S per-submap states -> one state with a leading submap axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(stacked: MapperState, s: int) -> List[MapperState]:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(s)]


def stack_windows(windows: Sequence) -> object:
    """S KeyFrameWindows (same static shapes) -> leading submap axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *windows)


def init_stacked_states(key: jax.Array, cfg: MapperConfig, n_submaps: int) -> MapperState:
    keys = jax.random.split(key, n_submaps)
    return stack_states([init_mapper_state(k, cfg) for k in keys])


def make_submap_parallel_step(
    cfg: MapperConfig,
    cube,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    donate: bool = False,
):
    """One jitted step over S stacked submaps:
    ``step(stacked_state, stacked_window, keys (S,), flags, pose_mask,
    iteration) -> (stacked_state, aux)``. Offline-submap semantics: poses
    frozen to groundtruth (pose_grads compiled out)."""
    body = partial(make_train_step_body(cfg, cube), False)  # pose_grads off

    # vmap over (state, window, key); flags / pose_mask / iteration shared
    vstep = jax.vmap(body, in_axes=(0, 0, 0, None, None, None))

    jit_kwargs = {}
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        jit_kwargs["out_shardings"] = (shard, shard)
        jitted = jax.jit(vstep, **jit_kwargs)

        def step(state, window, keys, flags, pose_mask, iteration):
            state = jax.device_put(state, shard)  # no-op once placed
            window = jax.device_put(window, shard)
            return jitted(state, window, keys, flags, pose_mask, iteration)

        return step
    return jax.jit(vstep, **jit_kwargs)


def optimize_submaps_parallel(
    cfg: MapperConfig,
    cube,
    submap_windows: Sequence,  # S stacked KeyFrameWindows (same shapes)
    submap_poses: Sequence[np.ndarray],  # S x (K, 6) groundtruth pose arrays
    n_iterations: int = 512,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    occ_every: Optional[int] = None,
) -> List[MapperState]:
    """Synchronized-epoch training of S independent submap models; returns
    per-submap final states. Windows must share static shapes (same padded
    scan budget — enforced by the dataset layer)."""
    s = len(submap_windows)
    assert s == len(submap_poses)
    if mesh is not None and s % np.prod(mesh.devices.shape) != 0:
        raise ValueError(
            f"n_submaps={s} must be divisible by mesh size {mesh.devices.shape}"
        )
    occ_every = occ_every or cfg.occ.n_iters_acc

    states = []
    for i in range(s):
        st = init_mapper_state(jax.random.PRNGKey(seed + i), cfg)
        p6 = jnp.asarray(submap_poses[i], jnp.float32)
        states.append(st._replace(poses=st.poses.at[: p6.shape[0]].set(p6)))
    state = stack_states(states)
    window = stack_windows(submap_windows)

    step = make_submap_parallel_step(cfg, cube, mesh, donate=True)
    flags = TrainStepFlags(
        freeze_sigma=jnp.asarray(False),
        freeze_rgb=jnp.asarray(True),
        freeze_poses=jnp.asarray(True),
        do_occ_update=jnp.asarray(False),
    )
    pose_mask = jnp.zeros((cfg.max_keyframes,))
    key = jax.random.PRNGKey(seed)
    for it in range(n_iterations):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, s)
        f = flags._replace(
            do_occ_update=jnp.asarray((it % occ_every) == occ_every - 1)
        )
        state, aux = step(state, window, keys, f, pose_mask, jnp.asarray(it))
    jax.block_until_ready(state.params)
    return unstack_states(state, s)
