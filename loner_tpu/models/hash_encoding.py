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

The table is stored as one (L, T, F) array so all levels gather with a single
batched op. The forward here is pure jnp (XLA gather); a Pallas TPU kernel for
the gather/scatter hot path lives in ``loner_tpu.ops``.
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
    """(L, T, F) feature table, uniform in [-1e-4, 1e-4] like tcnn."""
    shape = (cfg.n_levels, cfg.table_size, cfg.n_features_per_level)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


# 8 corner offsets of a unit cube, shape (8, 3)
_CORNERS = np.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], dtype=np.int32
)


def _corner_indices(cells: jnp.ndarray, res: int, dense: bool, table_size: int) -> jnp.ndarray:
    """Table index for each of 8 corners. cells: (N, 3) int32 -> (N, 8)."""
    corners = cells[:, None, :] + _CORNERS[None, :, :]  # (N, 8, 3)
    corners = jnp.clip(corners, 0, res - 1)
    if dense:
        idx = corners[..., 0] + corners[..., 1] * res + corners[..., 2] * (res * res)
    else:
        c = corners.astype(jnp.uint32)
        idx = (
            c[..., 0] * jnp.uint32(_PRIMES[0])
            ^ c[..., 1] * jnp.uint32(_PRIMES[1])
            ^ c[..., 2] * jnp.uint32(_PRIMES[2])
        )
        idx = (idx % jnp.uint32(table_size)).astype(jnp.int32)
    return idx


def hash_encode(table: jnp.ndarray, pts: jnp.ndarray, cfg: HashEncodingConfig) -> jnp.ndarray:
    """Encode points.

    table: (L, T, F). pts: (N, 3) in [0, 1]. Returns (N, L*F), level-major
    feature order (level 0 features first), matching tcnn's output layout.
    """
    n = pts.shape[0]
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    dense = cfg.level_is_dense()

    outputs = []
    for lvl in range(cfg.n_levels):
        scaled = pts * jnp.float32(scales[lvl]) + 0.5
        cells = jnp.floor(scaled)
        frac = scaled - cells  # (N, 3)
        cells = cells.astype(jnp.int32)

        idx = _corner_indices(cells, int(resolutions[lvl]), bool(dense[lvl]), cfg.table_size)

        feats = table[lvl][idx]  # (N, 8, F)

        # Trilinear weights: prod over axes of frac or (1-frac) per corner.
        corner_f = _CORNERS.astype(np.float32)  # (8, 3)
        w = jnp.prod(
            corner_f[None] * frac[:, None, :] + (1.0 - corner_f[None]) * (1.0 - frac[:, None, :]),
            axis=-1,
        )  # (N, 8)
        outputs.append(jnp.sum(feats * w[..., None], axis=1))  # (N, F)

    return jnp.concatenate(outputs, axis=-1)
