"""CellHash: a TPU-native multi-resolution hash encoding with one gather per
(point, level).

Motivation (measured on v5e, see ROADMAP): XLA's TPU gather/scatter move a
full 4 KB vector register per random index, so encoding cost is index COUNT,
not bytes. The classic vertex-hash layout needs 8 corner gathers per point
per level (302M touches/step at the flagship operating point ~= seconds).

CellHash stores, for every CELL, all 8 corner feature pairs as one packed
record (8 f32 words = 16 bf16 features), so trilinear interpolation needs
ONE row-gather per (point, level): 37.7M touches/step — 8x fewer. The
backward scatters one 16-wide row per (point, level) (optionally one
weight-sampled corner — unbiased — for another 8x on scattered bytes).

The trade: corner features are per-cell (not shared between neighboring
cells), so the encoding is discontinuous at cell boundaries within a level.
Like hash collisions in Instant-NGP, the multi-level sum + MLP absorb it;
convergence parity is validated on the synthetic L1 benchmark
(tests/test_cell_hash.py).

Layout discipline: the only minor-8/16 tensors are gather/scatter operands
and their immediately-consumed outputs (fusable); residuals are saved
transposed (corner axis leading), and trilinear weights are recomputed in
backward instead of saved.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.models.hash_encoding import _CORNERS, _PRIMES


class CellHashConfig(NamedTuple):
    n_levels: int = 16
    log2_cells: int = 16  # cells per level; 8 corner-pairs per cell
    base_resolution: int = 16
    per_level_scale: float = 2.0
    # Backward d_table strategy. "exact": one N-row scatter-add PER LEVEL
    # (16 scatters). "level1": each point scatters to ONE level, chosen by
    # hashing the jitter bits of its coordinates, via a single combined
    # (L*T)-row scatter scaled by L — unbiased across the stratified-jitter
    # distribution and 16x fewer scattered rows (the measured per-index
    # scatter cost dominates the whole train step on TPU: 41 ms per 2.36M
    # rows x 16 levels ~= 2/3 of a 967 ms step).
    bwd: str = "exact"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_cells

    @property
    def output_dim(self) -> int:
        return self.n_levels * 2

    def level_scales(self) -> np.ndarray:
        ls = np.arange(self.n_levels, dtype=np.float64)
        return self.base_resolution * self.per_level_scale**ls - 1.0

    def level_resolutions(self) -> np.ndarray:
        return np.ceil(self.level_scales()).astype(np.int64) + 1

    def level_is_dense(self) -> np.ndarray:
        # dense cell indexing while the CELL count fits the table
        res = self.level_resolutions()
        return ((res.astype(object)) ** 3 <= self.table_size).astype(bool)


def init_cell_table(key: jax.Array, cfg: CellHashConfig, dtype=jnp.float32) -> jnp.ndarray:
    """(L, T, 16) f32 master: per cell, 8 corners x 2 features (corner-major:
    [c0f0, c0f1, c1f0, ...])."""
    shape = (cfg.n_levels, cfg.table_size, 16)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


def _cell_and_frac(pts_t: jnp.ndarray, scale: float, res: int):
    scaled = pts_t * jnp.float32(scale) + 0.5
    cells = jnp.floor(scaled)
    frac = scaled - cells  # (3, N)
    cells = jnp.clip(cells.astype(jnp.int32), 0, res - 1)
    return cells, frac


def _cell_ids(cells: jnp.ndarray, res: int, dense: bool, table_size: int) -> jnp.ndarray:
    if dense:
        return cells[0] + cells[1] * res + cells[2] * (res * res)
    c = cells.astype(jnp.uint32)
    h = (
        c[0] * jnp.uint32(_PRIMES[0])
        ^ c[1] * jnp.uint32(_PRIMES[1])
        ^ c[2] * jnp.uint32(_PRIMES[2])
    )
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def _trilinear_w(frac: jnp.ndarray) -> jnp.ndarray:
    """(3, N) frac -> (8, N) corner weights."""
    corner_f = _CORNERS.astype(np.float32)  # (8, 3)
    return jnp.prod(
        corner_f[:, :, None] * frac[None, :, :]
        + (1.0 - corner_f[:, :, None]) * (1.0 - frac[None, :, :]),
        axis=1,
    )


def _pack_cells(table: jnp.ndarray) -> jnp.ndarray:
    """(L, T, 16) f32 -> (L, T, 8) f32 words of packed bf16 pairs."""
    return jax.lax.bitcast_convert_type(
        table.astype(jnp.bfloat16).reshape(*table.shape[:-1], 8, 2), jnp.float32
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _cell_hash_core(
    table: jnp.ndarray,  # (L, T, 16) f32 master
    pts_t: jnp.ndarray,  # (3, N) in [0, 1]
    bwd_key: jnp.ndarray,  # (2,) uint32 key data (corner-sampled scatter)
    cfg: CellHashConfig,
    bwd_corner_sample: bool,
) -> jnp.ndarray:
    out, _ = _cell_fwd(table, pts_t, bwd_key, cfg, bwd_corner_sample)
    return out


def _cell_fwd(table, pts_t, bwd_key, cfg: CellHashConfig, bwd_corner_sample: bool):
    packed = _pack_cells(table)  # (L, T, 8)
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    dense = cfg.level_is_dense()

    outs = []
    idxs = []
    v_ts = []
    for lvl in range(cfg.n_levels):
        cells, frac = _cell_and_frac(pts_t, float(scales[lvl]), int(resolutions[lvl]))
        idx = _cell_ids(cells, int(resolutions[lvl]), bool(dense[lvl]), cfg.table_size)
        w = _trilinear_w(frac)  # (8, N)

        v = packed[lvl][idx]  # (N, 8) — ONE row-gather per point
        pair = jax.lax.bitcast_convert_type(v, jnp.bfloat16)  # (N, 8, 2)
        f0 = pair[..., 0].astype(jnp.float32)  # (N, 8)
        f1 = pair[..., 1].astype(jnp.float32)
        outs.append(jnp.stack([jnp.sum(f0 * w.T, axis=1), jnp.sum(f1 * w.T, axis=1)]))
        idxs.append(idx)
        v_ts.append(v.T)  # save transposed (8, N): point axis minor, no padding

    out = jnp.concatenate(outs, axis=0)  # (L*2, N)
    return out, (jnp.stack(idxs), jnp.stack(v_ts), pts_t, bwd_key)


def _corner_sample_w(w: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Replace trilinear weights (8, N) with a one-hot corner sampled ∝ w."""
    cdf = jnp.cumsum(w, axis=0)
    choice = jnp.clip(jnp.sum((u[None, :] > cdf).astype(jnp.int32), axis=0), 0, 7)
    return jax.nn.one_hot(choice, 8, axis=0)


def _jitter_level_choice(pts_t: jnp.ndarray, n_levels: int) -> jnp.ndarray:
    """Per-point level choice from the low mantissa bits of the coordinates.

    The training sampler jitters every z-value (stratified sampling), so the
    mantissa LSBs are fresh uniform noise each step; a multiplicative hash of
    them is an effectively independent uniform level draw with no PRNG-key
    plumbing through the VJP."""
    b = jax.lax.bitcast_convert_type(pts_t, jnp.uint32)  # (3, N)
    h = (
        b[0] * jnp.uint32(2654435761)
        ^ b[1] * jnp.uint32(805459861)
        ^ b[2] * jnp.uint32(3674653429)
    )
    return (h % jnp.uint32(n_levels)).astype(jnp.int32)


def _cell_bwd(cfg: CellHashConfig, bwd_corner_sample: bool, res, g):
    idx, v_t, pts_t, bwd_key = res  # idx (L, N); v_t (L, 8, N) packed
    l, n = idx.shape
    g = g.reshape(l, 2, n)

    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    corner_f = _CORNERS.astype(np.float32)
    sign = (2.0 * corner_f - 1.0)[:, :, None]  # (8, 3, 1)

    if bwd_corner_sample:
        key = jax.random.wrap_key_data(bwd_key)
        u_all = jax.random.uniform(key, (l, n))

    level_sample = cfg.bwd == "level1"
    if level_sample:
        # ---- d/dtable, ONE combined scatter: each point updates a single
        # jitter-chosen level, scaled by L (scatter rows are the dominant
        # TPU cost; see CellHashConfig.bwd) ------------------------------
        lvl_choice = _jitter_level_choice(pts_t, l)  # (N,)
        onehot = (
            lvl_choice[None, :] == jnp.arange(l, dtype=jnp.int32)[:, None]
        )  # (L, N) bool
        onef = onehot.astype(jnp.float32)
        g_sel = jnp.sum(g * onef[:, None, :], axis=0)  # (2, N)
        scale_sel = jnp.sum(jnp.asarray(scales, jnp.float32)[:, None] * onef, axis=0)
        scaled = pts_t * scale_sel[None, :] + 0.5
        frac_sel = scaled - jnp.floor(scaled)  # (3, N)
        w_sel = _trilinear_w(frac_sel)  # (8, N)
        if bwd_corner_sample:
            w_sel = _corner_sample_w(w_sel, u_all[0])
        idx_sel = jnp.sum(idx * onehot.astype(jnp.int32), axis=0)  # (N,)
        combined = lvl_choice * jnp.int32(cfg.table_size) + idx_sel
        upd = jnp.einsum("cn,fn->ncf", w_sel, g_sel).reshape(n, 16) * jnp.float32(l)
        d_table = (
            jnp.zeros((l * cfg.table_size, 16), jnp.float32)
            .at[combined]
            .add(upd)
            .reshape(l, cfg.table_size, 16)
        )
    else:
        d_table = jnp.zeros((l, cfg.table_size, 16), jnp.float32)

    d_pts = jnp.zeros_like(pts_t)

    for lvl in range(cfg.n_levels):
        scale = float(scales[lvl])
        _, frac = _cell_and_frac(pts_t, scale, int(resolutions[lvl]))
        w = _trilinear_w(frac)  # (8, N)

        if not level_sample:
            # ---- d/dtable: one 16-wide row per point per level ------------
            eff_w = _corner_sample_w(w, u_all[lvl]) if bwd_corner_sample else w
            # upd[n, c*2+f] = eff_w[c, n] * g[f, n]
            upd = jnp.einsum("cn,fn->ncf", eff_w, g[lvl]).reshape(n, 16)
            d_table = d_table.at[lvl].add(
                jnp.zeros((cfg.table_size, 16), jnp.float32).at[idx[lvl]].add(upd)
            )

        # ---- d/dpts -------------------------------------------------------
        pair = jax.lax.bitcast_convert_type(v_t[lvl], jnp.bfloat16)  # (8, N, 2)
        pc = (
            pair[..., 0].astype(jnp.float32) * g[lvl, 0][None, :]
            + pair[..., 1].astype(jnp.float32) * g[lvl, 1][None, :]
        )  # (8, N)
        w_axis = corner_f[:, :, None] * frac[None] + (1 - corner_f[:, :, None]) * (1 - frac[None])
        prod_others = jnp.stack(
            [
                w_axis[:, 1] * w_axis[:, 2],
                w_axis[:, 0] * w_axis[:, 2],
                w_axis[:, 0] * w_axis[:, 1],
            ],
            axis=1,
        )  # (8, 3, N)
        dfrac = jnp.sum(pc[:, None, :] * sign * prod_others, axis=0)  # (3, N)
        d_pts = d_pts + dfrac * jnp.float32(scale)

    return d_table, d_pts, jnp.zeros_like(res[3])


_cell_hash_core.defvjp(_cell_fwd, _cell_bwd)


def cell_hash_encode_t(
    table: jnp.ndarray,
    pts_t: jnp.ndarray,
    cfg: CellHashConfig,
    bwd_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(L*2, N) encoding with one gather per (point, level)."""
    sample = bwd_key is not None
    if bwd_key is None:
        key_data = jnp.zeros((2,), jnp.uint32)
    else:
        key_data = (
            jax.random.key_data(bwd_key)
            if jnp.issubdtype(bwd_key.dtype, jax.dtypes.prng_key)
            else bwd_key
        )
    return _cell_hash_core(table, pts_t, key_data, cfg, sample)
