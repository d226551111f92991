"""Point-to-plane ICP as jitted Gauss-Newton on TPU.

The reference tracks frame-to-frame with Open3D's C++ ICP
(``src/tracking/tracker.py:203-221``: two stages, thresholds 1.5 -> 0.125 m,
10 iterations each, point-to-plane, identity initialization). This module is
the TPU-native replacement, per SURVEY §7.1: correspondences come from a
fixed-size voxel-hash grid (no KD-tree), normals from a small batched PCA,
and the 6-DoF update from a dense 6x6 Gauss-Newton solve — all static
shapes, one jit per stage schedule.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.geometry import se3

_PRIMES = (73856093, 19349663, 83492791)

# 27 neighbor-cell offsets, (27, 3)
_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)


class IcpStage(NamedTuple):
    threshold: float = 1.0  # correspondence distance gate (meters)
    max_iterations: int = 10


class IcpConfig(NamedTuple):
    stages: Tuple[IcpStage, ...] = (IcpStage(1.5, 10), IcpStage(0.125, 10))
    n_buckets: int = 1 << 14
    bucket_slots: int = 8
    normal_neighbors: int = 10
    damping: float = 1e-6  # Levenberg damping on the 6x6 system


class VoxelHashGrid(NamedTuple):
    table: jnp.ndarray  # (B, S) int32 indices into points, -1 = empty
    points: jnp.ndarray  # (M, 3)
    valid: jnp.ndarray  # (M,)
    cell_size: jnp.ndarray  # scalar


def _hash_cells(cells: jnp.ndarray, n_buckets: int) -> jnp.ndarray:
    c = cells.astype(jnp.uint32)
    h = (
        c[..., 0] * jnp.uint32(_PRIMES[0])
        ^ c[..., 1] * jnp.uint32(_PRIMES[1])
        ^ c[..., 2] * jnp.uint32(_PRIMES[2])
    )
    return (h % jnp.uint32(n_buckets)).astype(jnp.int32)


def build_voxel_grid(
    points: jnp.ndarray,  # (M, 3)
    valid: jnp.ndarray,  # (M,) bool
    cell_size: jnp.ndarray,  # scalar (typically the ICP threshold)
    n_buckets: int = 1 << 14,
    slots: int = 8,
) -> VoxelHashGrid:
    """Scatter points into hash buckets of up to ``slots`` entries each.

    Within-bucket ranks are computed by sorting the hashes; points whose rank
    exceeds the slot budget are dropped (bounded candidates per cell — the
    price of static shapes, negligible at ICP's 5k-point scale).
    """
    m = points.shape[0]
    cells = jnp.floor(points / cell_size).astype(jnp.int32)
    h = _hash_cells(cells, n_buckets)
    h = jnp.where(valid, h, n_buckets)  # invalid points -> overflow bucket

    order = jnp.argsort(h)
    h_sorted = h[order]
    # rank of each sorted entry within its equal-hash run
    first_of_run = jnp.searchsorted(h_sorted, h_sorted, side="left")
    ranks = jnp.arange(m, dtype=jnp.int32) - first_of_run.astype(jnp.int32)

    flat = jnp.full((n_buckets * slots,), -1, dtype=jnp.int32)
    dest = h_sorted * slots + ranks
    # drop rank >= slots and the overflow bucket via out-of-bounds drop mode
    dest = jnp.where((ranks < slots) & (h_sorted < n_buckets), dest, n_buckets * slots)
    flat = flat.at[dest].set(order.astype(jnp.int32), mode="drop")
    return VoxelHashGrid(flat.reshape(n_buckets, slots), points, valid, cell_size)


def nearest_neighbor(
    grid: VoxelHashGrid,
    queries: jnp.ndarray,  # (Q, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest stored point for each query via the 27 surrounding cells.

    Returns (index (Q,), distance (Q,)); distance is +inf when no candidate
    was found in the neighborhood.
    """
    n_buckets, slots = grid.table.shape
    cells = jnp.floor(queries / grid.cell_size).astype(jnp.int32)  # (Q, 3)
    neigh = cells[:, None, :] + _OFFSETS[None, :, :]  # (Q, 27, 3)
    bucket_ids = _hash_cells(neigh, n_buckets)  # (Q, 27)
    cand = grid.table[bucket_ids].reshape(queries.shape[0], -1)  # (Q, 27*S)

    cand_pts = grid.points[jnp.maximum(cand, 0)]  # (Q, C, 3)
    d2 = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    cand_valid = (cand >= 0) & grid.valid[jnp.maximum(cand, 0)]
    d2 = jnp.where(cand_valid, d2, jnp.inf)

    best = jnp.argmin(d2, axis=-1)
    best_idx = jnp.take_along_axis(cand, best[:, None], axis=-1)[:, 0]
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    return best_idx, jnp.sqrt(best_d2)


def k_nearest(
    grid: VoxelHashGrid, queries: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest stored points per query from the 27-cell neighborhood.
    Returns (indices (Q,k), distances (Q,k)), inf-padded."""
    n_buckets, slots = grid.table.shape
    cells = jnp.floor(queries / grid.cell_size).astype(jnp.int32)
    neigh = cells[:, None, :] + _OFFSETS[None, :, :]
    bucket_ids = _hash_cells(neigh, n_buckets)
    cand = grid.table[bucket_ids].reshape(queries.shape[0], -1)

    cand_pts = grid.points[jnp.maximum(cand, 0)]
    d2 = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    cand_valid = (cand >= 0) & grid.valid[jnp.maximum(cand, 0)]
    d2 = jnp.where(cand_valid, d2, jnp.inf)

    neg_d2, pos = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cand, pos, axis=-1)
    return idx, jnp.sqrt(-neg_d2)


def estimate_normals(
    points: jnp.ndarray,  # (M, 3)
    valid: jnp.ndarray,  # (M,)
    radius: jnp.ndarray,  # neighborhood radius (also the grid cell size)
    k: int = 10,
    n_buckets: int = 1 << 14,
    slots: int = 8,
) -> jnp.ndarray:
    """Per-point normals: smallest-eigenvector PCA over k neighbors (the
    role Open3D's ``estimate_normals`` plays for the reference's
    point-to-plane ICP). Sign is arbitrary — point-to-plane GN is invariant.
    """
    grid = build_voxel_grid(points, valid, radius, n_buckets, slots)
    idx, dist = k_nearest(grid, points, k)
    neigh = points[jnp.maximum(idx, 0)]  # (M, k, 3)
    w = jnp.isfinite(dist) & (idx >= 0)
    wf = w.astype(points.dtype)[..., None]
    count = jnp.maximum(jnp.sum(wf, axis=1), 1.0)
    mean = jnp.sum(neigh * wf, axis=1) / count
    centered = (neigh - mean[:, None, :]) * wf
    cov = jnp.einsum("mki,mkj->mij", centered, centered) / count[..., None]
    # regularize so degenerate neighborhoods stay finite
    cov = cov + 1e-9 * jnp.eye(3, dtype=points.dtype)
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[..., 0]  # eigenvector of the smallest eigenvalue


def _gn_step(
    T: jnp.ndarray,  # (4,4) current estimate
    src: jnp.ndarray,  # (N,3)
    src_valid: jnp.ndarray,  # (N,)
    grid: VoxelHashGrid,
    normals: jnp.ndarray,  # (M,3) normals of grid.points
    threshold: jnp.ndarray,
    damping: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One point-to-plane Gauss-Newton update T <- exp(delta) @ T."""
    p = src @ T[:3, :3].T + T[:3, 3]  # transformed source (N,3)
    idx, dist = nearest_neighbor(grid, p)
    q = grid.points[jnp.maximum(idx, 0)]
    n = normals[jnp.maximum(idx, 0)]

    w = src_valid & (idx >= 0) & (dist < threshold) & jnp.isfinite(dist)
    wf = w.astype(p.dtype)

    r = jnp.sum(n * (p - q), axis=-1)  # (N,)
    # Perturbation p' = p + t + omega x p  =>  dr/dt = n, dr/domega = p x n
    J = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)  # (N, 6)

    H = (J * wf[:, None]).T @ J  # (6,6)
    b = -(J * (wf * r)[:, None]).sum(axis=0)  # (6,)
    H = H + damping * jnp.eye(6, dtype=p.dtype)
    delta = jnp.linalg.solve(H, b)

    dT = se3.pose_to_matrix(jnp.concatenate([delta[:3], delta[3:]]))
    T_new = dT @ T

    inlier_rmse = jnp.sqrt(jnp.sum(wf * r * r) / jnp.maximum(jnp.sum(wf), 1.0))
    fitness = jnp.sum(wf) / jnp.maximum(jnp.sum(src_valid.astype(p.dtype)), 1.0)
    return T_new, inlier_rmse, fitness


def make_icp(cfg: IcpConfig):
    """Build the jitted multi-stage ICP.

    Returned fn: (src (N,3), src_valid, tgt (M,3), tgt_valid, T_init) ->
    (T (4,4), rmse, fitness). Stage schedule (coarse->fine thresholds) is
    baked in statically, like the reference's
    ``tracker.icp.schedule``.
    """

    @jax.jit
    def run(src, src_valid, tgt, tgt_valid, T_init):
        # Normals at the finest stage's resolution; radius = coarse threshold
        # keeps neighborhoods populated.
        normals = estimate_normals(
            tgt, tgt_valid, jnp.asarray(cfg.stages[0].threshold), cfg.normal_neighbors,
            cfg.n_buckets, cfg.bucket_slots,
        )
        T = T_init
        rmse = jnp.asarray(0.0, src.dtype)
        fitness = jnp.asarray(0.0, src.dtype)
        for stage in cfg.stages:
            grid = build_voxel_grid(
                tgt, tgt_valid, jnp.asarray(stage.threshold), cfg.n_buckets, cfg.bucket_slots
            )

            def body(_, carry):
                T, rmse, fit = carry
                T, rmse, fit = _gn_step(
                    T, src, src_valid, grid, normals, jnp.asarray(stage.threshold), cfg.damping
                )
                return T, rmse, fit

            T, rmse, fitness = jax.lax.fori_loop(
                0, stage.max_iterations, body, (T, rmse, fitness)
            )
        return T, rmse, fitness

    return run


def icp_point_to_plane(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    T_init: jnp.ndarray = None,
    cfg: IcpConfig = IcpConfig(),
    src_valid: jnp.ndarray = None,
    tgt_valid: jnp.ndarray = None,
):
    """Convenience one-shot entry (builds + runs the jitted ICP)."""
    if T_init is None:
        T_init = jnp.eye(4, dtype=src.dtype)
    if src_valid is None:
        src_valid = jnp.ones(src.shape[0], bool)
    if tgt_valid is None:
        tgt_valid = jnp.ones(tgt.shape[0], bool)
    return make_icp(cfg)(src, src_valid, tgt, tgt_valid, T_init)
