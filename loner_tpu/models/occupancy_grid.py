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
    # grid-update transpose estimator. v5e scatter costs ~8 ns per scattered
    # ELEMENT, so the exact trilinear transpose (8 corners/point) costs
    # ~103 ms at the flagship batch vs ~19 ms for one corner/point.
    # "stochastic" (default) samples ONE corner per point with probability
    # equal to its trilinear weight — an UNBIASED estimator of the exact
    # transpose (E[update] identical; the evidence batch is itself a random
    # ray subsample each update, so the added variance is same-order).
    # "exact" keeps the full 8-corner transpose (the reference's
    # grid_sample backward semantics, src/mapping/optimizer.py:897-907).
    estimator: str = "stochastic"


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


def _corner_geometry(points_cube_t: jnp.ndarray, v: int):
    """Shared coordinate math with occ_grid_interpolate_t: packed-cell row
    index (..., ), in-bounds mask, and the 8 trilinear corner weights
    (..., 8) in (dz, dy, dx) binary order (dx fastest)."""
    pix = ((points_cube_t + 1.0) * v - 1.0) / 2.0
    lo = jnp.floor(pix)
    frac = pix - lo
    cell = lo.astype(jnp.int32) + 1
    inb = jnp.all((cell >= 0) & (cell <= v), axis=0)
    cc = jnp.clip(cell, 0, v)
    lin = cc[2] * ((v + 1) * (v + 1)) + cc[1] * (v + 1) + cc[0]
    wx1, wy1, wz1 = frac[0], frac[1], frac[2]
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1
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
    return lin, inb, w


def _unpack_transpose(packed_ct: jnp.ndarray, v: int) -> jnp.ndarray:
    """Transpose of _pack_occ_cells: slab k of the packed table came from
    padded[dz:dz+v+1, dy:dy+v+1, dx:dx+v+1], so its cotangent adds back
    into those positions of the padded grid; the zero border then drops."""
    p1 = v + 1
    padded_ct = jnp.zeros((v + 2, v + 2, v + 2), dtype=packed_ct.dtype)
    k = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                padded_ct = jax.lax.dynamic_update_slice(
                    padded_ct,
                    jax.lax.dynamic_slice(padded_ct, (dz, dy, dx), (p1, p1, p1))
                    + packed_ct[..., k],
                    (dz, dy, dx),
                )
                k += 1
    return padded_ct[1:-1, 1:-1, 1:-1]


def occ_grid_cotangent(
    grid: jnp.ndarray,
    points_cube_t: jnp.ndarray,  # (3, N, S) sample points in [-1,1]
    z_vals_metric: jnp.ndarray,  # (N, S)
    depth_gt_metric: jnp.ndarray,  # (N, 1)
    valid: jnp.ndarray,  # (N,) ray validity mask
    eps: float = 2.0,
    l_free: float = 0.25,
    l_occ: float = 2.5,
    key: "jax.Array" = None,
    estimator: str = "exact",
) -> jnp.ndarray:
    """Gradient w.r.t. the grid: the hand-written per-sample logit gradient
    scattered back through the trilinear interpolation (the reference's
    ``point_logits.backward(gradient=point_logits_grad)``,
    ``src/mapping/optimizer.py:897-907``).

    v5e scatter costs ~8 ns per scattered ELEMENT (scripts r5 probe), so:

    * ``estimator="exact"``: the full trilinear transpose, hand-written as
      one (P, 8) row scatter into the packed cell table + static slab
      folds — same cost class as autodiff's transpose (~103 ms at the
      flagship batch; XLA prices the row scatter per element), kept as the
      reference-exact path and the testing oracle.
    * ``estimator="stochastic"`` (requires ``key``): sample ONE corner per
      point with probability equal to its trilinear weight and scatter a
      single element — an unbiased estimator of the exact transpose
      (E[update] identical) at ~19 ms. Statistically tested against the
      exact path (tests/test_field.py)."""
    v = grid.shape[0]
    g_logits = occ_logits_grad(z_vals_metric, depth_gt_metric, eps, l_free, l_occ)
    g_logits = g_logits * valid[:, None].astype(g_logits.dtype)

    lin, inb, w = _corner_geometry(points_cube_t, v)
    g_eff = jnp.where(inb, g_logits, 0.0)
    p1 = v + 1

    if estimator == "stochastic":
        assert key is not None, "stochastic occ estimator needs a PRNG key"
        # corner ~ Categorical(w): trilinear weights are non-negative and
        # sum to 1, so an inverse-CDF draw over the 8-way cumsum is exact
        u = jax.random.uniform(key, g_eff.shape, dtype=w.dtype)
        cum = jnp.cumsum(w, axis=-1)  # (..., 8), last = 1
        corner = jnp.sum((u[..., None] > cum).astype(jnp.int32), axis=-1)
        corner = jnp.clip(corner, 0, 7)
        flat = lin * 8 + corner
        packed_ct = (
            jnp.zeros((p1 * p1 * p1 * 8,), dtype=grid.dtype)
            .at[flat.reshape(-1)]
            .add(g_eff.reshape(-1))
        ).reshape(p1, p1, p1, 8)
        return _unpack_transpose(packed_ct, v)

    rows_ct = g_eff[..., None] * w  # (N, S, 8)
    packed_ct = (
        jnp.zeros((p1 * p1 * p1, 8), dtype=grid.dtype)
        .at[lin.reshape(-1)]
        .add(rows_ct.reshape(-1, 8))
    ).reshape(p1, p1, p1, 8)
    return _unpack_transpose(packed_ct, v)
