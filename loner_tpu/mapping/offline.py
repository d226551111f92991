"""Offline implicit-map optimization from known (groundtruth) trajectories.

The TPU counterpart of the reference's FDT driver
(``examples/fdt_optimize_implicit_map.py``): train the sigma field against
all scans of a sequence with poses fixed to (interpolated) groundtruth,
epoch-style shuffled windows, periodic occupancy-grid updates, an L1-depth
eval on held-out scans with early stopping, and checkpointing.

Everything dataset-shaped stays host-side numpy; each window trains through
the single jitted ``train_step``.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.geometry.rays import build_lidar_rays
from loner_tpu.geometry import se3
from loner_tpu.mapping.keyframe import KeyFrame, stack_window
from loner_tpu.mapping.optimizer import (
    MapperConfig,
    MapperState,
    TrainStepFlags,
    init_mapper_state,
    make_render_fn,
    make_train_step,
)


@dataclass
class OfflineConfig:
    """Hyperparameters of the offline optimization loop; defaults mirror the
    reference's module-level constants
    (``examples/fdt_optimize_implicit_map.py:62-104``)."""

    window_size: int = 16
    iterations_per_window: int = 32  # 2**5
    max_epochs: int = 8
    l1_stop_threshold: float = 1.05  # meters, early-stop on held-out scans
    n_eval_scans: int = 6
    eval_seed: int = 8
    eval_rays_per_scan: int = 1024
    log_dir: Optional[str] = None
    # occupancy-update transpose for OFFLINE optimization: "exact" — the
    # offline FDT protocol has no real-time floor, and the r5 gate
    # measurement (ENCODER_EXP_r05.json) found the stochastic one-corner
    # estimator 1.058 m vs exact 1.002 m at the 8-epoch budget (the online
    # path keeps the stochastic default: its ~70 ms/occurrence saving is
    # what clears the 16.7 it/s floor, and the online occ grid refreshes
    # over hundreds of windows where the noise averages out)
    occ_estimator: str = "exact"


@dataclass
class OfflineResult:
    state: MapperState
    l1_history: List[float] = field(default_factory=list)
    epochs_run: int = 0
    wall_time_s: float = 0.0
    iterations: int = 0


def evaluate_l1_depth(
    cfg: MapperConfig,
    cube,
    state: MapperState,
    keyframes: Sequence[KeyFrame],
    n_rays: int = 1024,
    seed: int = 0,
) -> float:
    """Mean L1 between rendered and measured depth over sampled rays of the
    given keyframes (the reference's ``compute_l1_depth`` protocol: ranges in
    [near, far - 0.25], ``analysis/compute_l1_depth.py:42-64``)."""
    render_fn = make_render_fn(cfg, test=True)
    rng = np.random.default_rng(seed)
    scale = cfg.world_scale
    errs = []
    for kf in keyframes:
        valid = np.asarray(kf.scan.valid)
        dist = np.asarray(kf.scan.distances)
        keep = valid & (dist > cfg.ray_range[0]) & (dist < cfg.ray_range[1] - 0.25)
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            continue
        idx = rng.choice(idx, size=min(n_rays, len(idx)), replace=False)
        # pad to the fixed eval batch for a single jit signature
        pad = n_rays - len(idx)
        idx = np.concatenate([idx, np.zeros(pad, np.int64)]) if pad else idx
        mask = np.concatenate([np.ones(len(idx) - pad, bool), np.zeros(pad, bool)])

        pose = kf.gt_pose if kf.gt_pose is not None else kf.tracked_pose
        bundle = build_lidar_rays(
            kf.scan.ray_directions[idx],
            kf.scan.distances[idx],
            jnp.asarray(pose, jnp.float32),
            cube,
            cfg.ray_range,
            point_valid=jnp.asarray(mask),
        )
        render = render_fn(state.params, state.occ_grid, bundle, jax.random.PRNGKey(seed))
        pred = np.asarray(render.depth) * scale
        gt = np.asarray(bundle.depth) * scale
        m = np.asarray(bundle.valid)
        if m.sum():
            errs.append(np.abs(pred[m] - gt[m]))
    return float(np.concatenate(errs).mean()) if errs else float("nan")


def optimize_implicit_map(
    cfg: MapperConfig,
    cube,
    keyframes: List[KeyFrame],
    offline: OfflineConfig = OfflineConfig(),
    state: Optional[MapperState] = None,
    seed: int = 8,
    log_fn: Callable[[str], None] = print,
) -> OfflineResult:
    """Epoch loop over shuffled scan windows with GT poses (poses frozen),
    matching ``optimize_implicit_map``'s training phase
    (``examples/fdt_optimize_implicit_map.py:570-727``)."""
    assert len(keyframes) >= 1
    t_start = time.time()

    cfg = cfg._replace(
        window_size=min(offline.window_size, max(1, len(keyframes))),
        occ=cfg.occ._replace(estimator=offline.occ_estimator),
    )

    if state is None:
        state = init_mapper_state(jax.random.PRNGKey(seed), cfg)
    # poses: groundtruth, never optimized in this mode
    pose6 = np.stack(
        [
            np.asarray(
                se3.matrix_to_pose(
                    jnp.asarray(
                        kf.gt_pose if kf.gt_pose is not None else kf.tracked_pose,
                        jnp.float32,
                    )
                )
            )
            for kf in keyframes
        ]
    )
    state = state._replace(poses=state.poses.at[: len(keyframes)].set(jnp.asarray(pose6)))

    # result.state is threaded linearly through the loop -> donation safe
    train_step = make_train_step(cfg, cube, donate=True)
    flags = TrainStepFlags(
        freeze_sigma=jnp.asarray(False),
        freeze_rgb=jnp.asarray(True),
        freeze_poses=jnp.asarray(True),
        do_occ_update=jnp.asarray(False),
    )
    pose_mask = jnp.zeros((cfg.max_keyframes,))

    # train/test split (the reference holds out n_eval scans, seed 8)
    rng = np.random.default_rng(offline.eval_seed)
    order = rng.permutation(len(keyframes))
    n_eval = min(offline.n_eval_scans, max(0, len(keyframes) - cfg.window_size))
    eval_kfs = [keyframes[i] for i in order[:n_eval]]
    train_kfs = [keyframes[i] for i in order[n_eval:]] or keyframes

    result = OfflineResult(state=state)
    key = jax.random.PRNGKey(seed)
    it_total = 0
    best_l1 = float("inf")

    for epoch in range(offline.max_epochs):
        perm = rng.permutation(len(train_kfs))
        for w_start in range(0, len(perm), cfg.window_size):
            sel = perm[w_start : w_start + cfg.window_size]
            if len(sel) < cfg.window_size:  # wrap for fixed shape
                sel = np.concatenate([sel, perm[: cfg.window_size - len(sel)]])
            window = stack_window([train_kfs[i] for i in sel], n_sky_pad=_sky_pad(train_kfs))
            for it in range(offline.iterations_per_window):
                key, sub = jax.random.split(key)
                occ = jnp.asarray(
                    (it_total % cfg.occ.n_iters_acc) == cfg.occ.n_iters_acc - 1
                )
                result.state, aux = train_step(
                    result.state,
                    window,
                    sub,
                    flags._replace(do_occ_update=occ),
                    pose_mask,
                    jnp.asarray(it),
                )
                it_total += 1

        eval_set = eval_kfs if eval_kfs else train_kfs[: min(4, len(train_kfs))]
        l1 = evaluate_l1_depth(
            cfg, cube, result.state, eval_set, offline.eval_rays_per_scan, offline.eval_seed
        )
        result.l1_history.append(l1)
        result.epochs_run = epoch + 1
        log_fn(
            f"[offline] epoch {epoch + 1}/{offline.max_epochs}: "
            f"L1 depth {l1:.3f} m, {it_total} iterations, "
            f"loss {float(aux['loss']):.4f}, "
            f"{time.time() - t_start:.0f}s elapsed"
        )
        if offline.log_dir:
            os.makedirs(offline.log_dir, exist_ok=True)
            with open(os.path.join(offline.log_dir, "l1_history.json"), "w") as f:
                json.dump(result.l1_history, f)
        # early stop: threshold reached, or worsening vs best (reference
        # fdt_optimize_implicit_map.py:681-727)
        if l1 < offline.l1_stop_threshold:
            log_fn(f"[offline] early stop: L1 {l1:.3f} < {offline.l1_stop_threshold}")
            break
        if l1 > best_l1 * 1.5 and epoch > 0:
            log_fn(f"[offline] early stop: L1 worsening ({l1:.3f} > {best_l1:.3f})")
            break
        best_l1 = min(best_l1, l1)

    result.wall_time_s = time.time() - t_start
    result.iterations = it_total
    return result


def _sky_pad(kfs: Sequence[KeyFrame]) -> int:
    for kf in kfs:
        if kf.sky is not None:
            return kf.sky.ray_directions.shape[0]
    return 64
