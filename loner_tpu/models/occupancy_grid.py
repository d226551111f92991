"""Occupancy grid: a V^3 log-odds grid guiding importance sampling.

Plays the role of the reference's ``OccupancyGridModel``
(``src/models/model_tcnn.py:111-134``): a single learnable logit grid,
trilinearly interpolated at sample points (torch ``grid_sample`` semantics
with ``align_corners=False`` and zero padding), updated every N iterations
with a hand-specified gradient (``src/models/losses.py:54-62``
get_logits_grad: +l_free before the return, -l_occ within +-eps of it)
pushed through the interpolation transpose and an Adam step.

Grid axes are ordered [z, y, x]: a point's x coordinate indexes the last
axis, matching torch grid_sample's convention for (D, H, W) volumes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class OccGridConfig(NamedTuple):
    voxel_size: int = 100  # V, grid is V^3
    lr: float = 1e-4
    n_iters_acc: int = 10  # update cadence in optimizer iterations


def init_occ_grid(cfg: OccGridConfig, dtype=jnp.float32) -> jnp.ndarray:
    v = cfg.voxel_size
    return jnp.zeros((v, v, v), dtype=dtype)


def _pack_occ_cells(grid: jnp.ndarray) -> jnp.ndarray:
    """(V,V,V) logits -> ((V+1)^3, 8) per-CELL corner rows over the
    zero-padded grid, so interpolation needs ONE row-gather per point (the
    CellHash trick; gather cost on TPU is index count, and the 8-corner
    formulation was 8x more indices). Corner order: (dz, dy, dx) binary."""
    v = grid.shape[0]
    padded = jnp.pad(grid, 1)  # zero border = align_corners=False zero padding
    slabs = [
        padded[dz : dz + v + 1, dy : dy + v + 1, dx : dx + v + 1]
        for dz in (0, 1)
        for dy in (0, 1)
        for dx in (0, 1)
    ]
    return jnp.stack(slabs, axis=-1).reshape((v + 1) ** 3, 8)


def occ_grid_interpolate_t(grid: jnp.ndarray, pts_t: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of ``grid`` (V,V,V ordered [z,y,x]) at
    ``pts_t`` (3, ...) with coords in [-1, 1] — component axis LEADING so the
    batch axes stay minor (TPU lane padding).

    align_corners=False: coordinate c maps to pixel index ((c+1)*V - 1)/2;
    out-of-range corners contribute zero (zero padding).
    """
    v = grid.shape[0]
    packed = _pack_occ_cells(grid)  # ((V+1)^3, 8)
    pix = ((pts_t + 1.0) * v - 1.0) / 2.0  # (3, ...)
    lo = jnp.floor(pix)
    frac = pix - lo
    cell = lo.astype(jnp.int32) + 1  # [-1, V-1] -> [0, V] within range
    inb = jnp.all((cell >= 0) & (cell <= v), axis=0)
    cc = jnp.clip(cell, 0, v)
    lin = cc[2] * ((v + 1) * (v + 1)) + cc[1] * (v + 1) + cc[0]
    rows = packed[lin]  # (..., 8) — one gather per point

    wx1, wy1, wz1 = frac[0], frac[1], frac[2]
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1
    # weights in the same (dz, dy, dx) binary corner order as _pack_occ_cells
    w = jnp.stack(
        [
            wz0 * wy0 * wx0,
            wz0 * wy0 * wx1,
            wz0 * wy1 * wx0,
            wz0 * wy1 * wx1,
            wz1 * wy0 * wx0,
            wz1 * wy0 * wx1,
            wz1 * wy1 * wx0,
            wz1 * wy1 * wx1,
        ],
        axis=-1,
    )
    return jnp.where(inb, jnp.sum(rows * w, axis=-1), 0.0)


def occ_grid_interpolate(grid: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3)-layout wrapper over ``occ_grid_interpolate_t``."""
    return occ_grid_interpolate_t(grid, jnp.moveaxis(pts, -1, 0))


def occupancy_probs_t(grid: jnp.ndarray, pts_t: jnp.ndarray) -> jnp.ndarray:
    """Sampling probabilities from logits (transposed points), as
    ``OccGridRaySampler`` computes them (``src/models/ray_sampling.py:78-81``):
    sigmoid, clamp to [0.5, 1], rescale to [0, 1]."""
    logits = occ_grid_interpolate_t(grid, pts_t)
    probs = jax.nn.sigmoid(logits)
    return 2.0 * (jnp.clip(probs, 0.5, 1.0) - 0.5)


def occupancy_probs(grid: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3)-layout wrapper."""
    return occupancy_probs_t(grid, jnp.moveaxis(pts, -1, 0))


def occ_logits_grad(
    z_vals_metric: jnp.ndarray,  # (N, S) sample depths in meters
    depth_gt_metric: jnp.ndarray,  # (N, 1) measured depth in meters
    eps: float = 2.0,
    l_free: float = 0.25,
    l_occ: float = 2.5,
) -> jnp.ndarray:
    """The hand-written log-odds gradient of ``get_logits_grad``
    (``src/models/losses.py:54-62``): +l_free for samples more than eps in
    front of the return (drives logits down via gradient descent), -l_occ
    within +-eps of it (drives logits up), 0 behind."""
    x = z_vals_metric - depth_gt_metric
    before = jnp.heaviside(-x - eps, jnp.zeros_like(x))
    near = jnp.heaviside(x + eps, jnp.zeros_like(x)) * jnp.heaviside(eps - x, jnp.zeros_like(x))
    return l_free * before - l_occ * near


def occ_grid_cotangent(
    grid: jnp.ndarray,
    points_cube_t: jnp.ndarray,  # (3, N, S) sample points in [-1,1]
    z_vals_metric: jnp.ndarray,  # (N, S)
    depth_gt_metric: jnp.ndarray,  # (N, 1)
    valid: jnp.ndarray,  # (N,) ray validity mask
    eps: float = 2.0,
    l_free: float = 0.25,
    l_occ: float = 2.5,
) -> jnp.ndarray:
    """Gradient w.r.t. the grid: the hand-written per-sample logit gradient
    scattered back through the trilinear interpolation (the reference's
    ``point_logits.backward(gradient=point_logits_grad)``,
    ``src/mapping/optimizer.py:897-907``)."""
    g_logits = occ_logits_grad(z_vals_metric, depth_gt_metric, eps, l_free, l_occ)
    g_logits = g_logits * valid[:, None].astype(g_logits.dtype)
    _, vjp_fn = jax.vjp(lambda g: occ_grid_interpolate_t(g, points_cube_t), grid)
    (g_grid,) = vjp_fn(g_logits)
    return g_grid
