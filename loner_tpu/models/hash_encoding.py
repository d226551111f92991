"""Multi-resolution hash-grid encoding (Instant-NGP style), in JAX.

This plays the role tiny-cuda-nn's ``HashGrid`` encoding plays in the
reference (``src/models/nerf_tcnn.py:35-56`` + ``cfg/nerf_config/
default_nerf_hash.yaml``): L levels of trilinear feature grids, dense at
coarse resolutions and spatially hashed once a level exceeds the table size.

Matching tcnn semantics:
  * level scale  s_l = base_resolution * growth^l - 1, resolution = ceil(s)+1
  * position x in [0,1] maps to x * s_l + 0.5, floor -> cell, frac -> weights
  * spatial hash (x*1) xor (y*2654435761) xor (z*805459861) mod T
  * dense tight indexing while resolution^3 <= T
  * table init uniform in [-1e-4, 1e-4]

TPU layout: everything keeps the POINT axis minor. The table is stored
``(L, F, T)`` (features leading) and the encoder returns ``(L*F, N)``,
because XLA/TPU pads the last dimension to 128 lanes — a ``(N, 2)`` feature
layout inflates 64x in HBM (measured: the 32 MB sigma table ballooned to a
2.0 GB padded temp). With points minor, nothing pads.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


class HashEncodingConfig(NamedTuple):
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 18
    base_resolution: int = 16
    per_level_scale: float = 2.0

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_scales(self) -> np.ndarray:
        """s_l per level (float)."""
        ls = np.arange(self.n_levels, dtype=np.float64)
        return self.base_resolution * self.per_level_scale**ls - 1.0

    def level_resolutions(self) -> np.ndarray:
        return np.ceil(self.level_scales()).astype(np.int64) + 1

    def level_is_dense(self) -> np.ndarray:
        res = self.level_resolutions()
        return (res.astype(object) ** 3 <= self.table_size).astype(bool)


def init_hash_table(key: jax.Array, cfg: HashEncodingConfig, dtype=jnp.float32) -> jnp.ndarray:
    """(L, F, T) feature table, uniform in [-1e-4, 1e-4] like tcnn."""
    shape = (cfg.n_levels, cfg.n_features_per_level, cfg.table_size)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


# 8 corner offsets of a unit cube, shape (8, 3)
_CORNERS = np.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], dtype=np.int32
)


def _corner_indices_t(cells: jnp.ndarray, res: int, dense: bool, table_size: int) -> jnp.ndarray:
    """Table index for each of 8 corners, corner axis LEADING.
    cells: (3, N) int32 -> (8, N)."""
    corners = cells[None, :, :] + _CORNERS[:, :, None]  # (8, 3, N)
    corners = jnp.clip(corners, 0, res - 1)
    if dense:
        idx = corners[:, 0] + corners[:, 1] * res + corners[:, 2] * (res * res)
    else:
        c = corners.astype(jnp.uint32)
        idx = (
            c[:, 0] * jnp.uint32(_PRIMES[0])
            ^ c[:, 1] * jnp.uint32(_PRIMES[1])
            ^ c[:, 2] * jnp.uint32(_PRIMES[2])
        )
        idx = (idx % jnp.uint32(table_size)).astype(jnp.int32)
    return idx


def hash_encode_t(table: jnp.ndarray, pts_t: jnp.ndarray, cfg: HashEncodingConfig) -> jnp.ndarray:
    """Encode points, transposed layout.

    table: (L, F, T). pts_t: (3, N) in [0, 1] — point axis minor. Returns
    (L*F, N), level-major feature order, matching tcnn's output layout
    (transposed).
    """
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    dense = cfg.level_is_dense()
    corner_f = _CORNERS.astype(np.float32)  # (8, 3)

    outputs = []
    for lvl in range(cfg.n_levels):
        scaled = pts_t * jnp.float32(scales[lvl]) + 0.5  # (3, N)
        cells = jnp.floor(scaled)
        frac = scaled - cells  # (3, N)
        cells = cells.astype(jnp.int32)

        idx = _corner_indices_t(cells, int(resolutions[lvl]), bool(dense[lvl]), cfg.table_size)

        feats = table[lvl][:, idx]  # (F, 8, N)

        # Trilinear weights (8, N): prod over axes of frac or (1-frac).
        w = jnp.prod(
            corner_f[:, :, None] * frac[None, :, :]
            + (1.0 - corner_f[:, :, None]) * (1.0 - frac[None, :, :]),
            axis=1,
        )
        outputs.append(jnp.einsum("fcn,cn->fn", feats, w))  # (F, N)

    return jnp.concatenate(outputs, axis=0)


def hash_encode(table: jnp.ndarray, pts: jnp.ndarray, cfg: HashEncodingConfig) -> jnp.ndarray:
    """(N, 3) -> (N, L*F) convenience wrapper (use ``hash_encode_t`` on hot
    paths)."""
    return hash_encode_t(table, pts.T, cfg).T
