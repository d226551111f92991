"""FusedHash: the TPU-native multi-resolution hash encoding, v2.

Plays tiny-cuda-nn's HashGrid role (reference ``src/models/nerf_tcnn.py:35-56``)
with a design driven by measured v5e behavior (scripts/bench_scatter_chained,
scripts/profile_chained):

  * XLA row-gathers are fast (~0.1 ns/row) ONLY from small (<~4 MB) operands
    that XLA keeps on-chip; the same gather from a 64 MB operand costs 24 ns.
    -> per-level gathers from (T, 16) bf16 slabs (2 MB each), never one big
    combined-table gather.
  * XLA scatter-add costs ~15 ns/PROCESSED row into a 4 MB operand (80 ns
    into 64 MB) regardless of masking, so the only way to cheapen the table
    gradient is to hand scatter FEWER rows, compacted by construction.
    -> "slot-strided" backward: training points arrive as rays x S z-slots;
    slot s updates level (s + rot) % L with keep-phase (s // L) % k == p,
    (rot, p) drawn per step. Each level's update rows are then a contiguous
    strided SLICE (compaction without sort), scattered into that level's own
    (T, 16) operand, scaled by L*k (unbiased over the per-step draw).
  * Everything between gather and MLP (trilinear weights, bf16 unpack,
    corner reduction, and the d_pts backward) is one Pallas kernel each way:
    the jnp formulation spends ~100 ms/step on unfused (8,3,N) temporaries
    and layout changes; the kernel holds them in VMEM registers.

Table layout: (L, T, 16) float32 master, FEATURE-major rows
[f0c0..f0c7, f1c0..f1c7] (corner order: bit0=x, bit1=y, bit2=z), cast to
bf16 once per step for gathers. One row per CELL (the round-1 CellHash
trade: corner features are per-cell, discontinuous at cell borders within a
level; the multi-level sum + MLP absorb it — convergence parity is tested
on the synthetic L1 benchmark, tests/test_fused_encoder.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRIMES = (1, 2654435761, 805459861)

_CHUNK = 32768  # points per kernel program at row_width 16; scaled down for
# fat rows so the per-program v slab stays ~1 MB bf16 (VMEM budget)


def _chunk_for(row_width: int) -> int:
    return max(2048, _CHUNK * 16 // row_width)


class FusedHashConfig(NamedTuple):
    n_levels: int = 16
    log2_cells: int = 16  # cells per level (one 16-feature row per cell)
    base_resolution: int = 16
    per_level_scale: float = 2.0
    # backward table-gradient strategy:
    #   "exact"   — every (point, level) scatters (L x N rows; offline/small)
    #   "strided" — slot-strided level1 with keep-stride k (see module doc)
    bwd: str = "strided"
    bwd_stride: int = 2  # k: keep every k-th slot-group per level
    slot_period: int = 512  # S, samples per ray; 0 disables strided bwd
    n_features: int = 2  # bf16 features per corner (= per level); even
    # save the gathered corner rows v_t (L, 8F, N bf16) as a VJP residual
    # (re-reading the slab is sequential-bandwidth, ~20x cheaper than the
    # ~12 ns/row re-gather) — but the slab stays resident fwd->bwd
    # (~0.5 GB at the 1.2M-point flagship batch). Set False to re-gather in
    # the backward instead when HBM headroom is tight (16 GB v5e + donation).
    save_residual: bool = True

    @property
    def table_size(self) -> int:
        return 1 << self.log2_cells

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def row_width(self) -> int:
        return 8 * self.n_features

    def level_scales(self) -> np.ndarray:
        ls = np.arange(self.n_levels, dtype=np.float64)
        return (self.base_resolution * self.per_level_scale**ls - 1.0).astype(np.float32)

    def level_resolutions(self) -> np.ndarray:
        return np.ceil(self.level_scales().astype(np.float64)).astype(np.int32) + 1

    def level_is_dense(self) -> np.ndarray:
        res = self.level_resolutions()
        return ((res.astype(object)) ** 3 <= self.table_size).astype(bool)


def init_fused_table(key: jax.Array, cfg: FusedHashConfig, dtype=jnp.float32) -> jnp.ndarray:
    """(L, T, 8*F) f32 master, feature-major rows [f0c0..f0c7, f1c0.., ...]."""
    shape = (cfg.n_levels, cfg.table_size, cfg.row_width)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


# ---------------------------------------------------------------------------
# index / weight math shared by XLA side and (re-derived inside) the kernels
# ---------------------------------------------------------------------------


def _cell_frac(pts_t: jnp.ndarray, scale: float, res: int):
    """pts_t (3, N) in [0,1] -> clipped int cells (3, N), frac (3, N)."""
    scaled = pts_t * jnp.float32(scale) + 0.5
    cellf = jnp.floor(scaled)
    frac = scaled - cellf
    cells = jnp.clip(cellf.astype(jnp.int32), 0, res - 1)
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
    return jnp.bitwise_and(h, jnp.uint32(table_size - 1)).astype(jnp.int32)


def _level_indices(pts_t: jnp.ndarray, cfg: FusedHashConfig, lvl: int) -> jnp.ndarray:
    scales = cfg.level_scales()
    res = cfg.level_resolutions()
    dense = cfg.level_is_dense()
    cells, _ = _cell_frac(pts_t, float(scales[lvl]), int(res[lvl]))
    return _cell_ids(cells, int(res[lvl]), bool(dense[lvl]), cfg.table_size)


def _corner_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """frac (3, N) -> (8, N); corner s bits: bit0=x, bit1=y, bit2=z."""
    fx, fy, fz = frac[0], frac[1], frac[2]
    s = np.arange(8)
    wx = jnp.stack([fx if b & 1 else 1.0 - fx for b in s])
    wy = jnp.stack([fy if b & 2 else 1.0 - fy for b in s])
    wz = jnp.stack([fz if b & 4 else 1.0 - fz for b in s])
    return wx * wy * wz


# ---------------------------------------------------------------------------
# jnp reference implementation (CPU tests / fallback; same math as kernels)
# ---------------------------------------------------------------------------


def _gather_v_t(tables_bf16: jnp.ndarray, pts_t: jnp.ndarray, cfg: FusedHashConfig):
    """Per-level 2 MB-operand gathers -> v_t (L, 16, N) bf16."""
    vs = []
    for lvl in range(cfg.n_levels):
        idx = _level_indices(pts_t, cfg, lvl)
        vs.append(tables_bf16[lvl][idx].T)  # (16, N)
    return jnp.stack(vs)


def _interp_fwd_ref(pts_t: jnp.ndarray, v_t: jnp.ndarray, cfg: FusedHashConfig) -> jnp.ndarray:
    scales = cfg.level_scales()
    res = cfg.level_resolutions()
    outs = []
    for lvl in range(cfg.n_levels):
        _, frac = _cell_frac(pts_t, float(scales[lvl]), int(res[lvl]))
        w = _corner_weights(frac)  # (8, N)
        v = v_t[lvl].astype(jnp.float32)  # (8F, N)
        for f in range(cfg.n_features):
            outs.append(jnp.sum(v[8 * f : 8 * f + 8] * w, axis=0))
    return jnp.stack(outs)  # (L*F, N)


def _dpts_ref(
    pts_t: jnp.ndarray, v_t: jnp.ndarray, g: jnp.ndarray, cfg: FusedHashConfig
) -> jnp.ndarray:
    scales = cfg.level_scales()
    res = cfg.level_resolutions()
    d = jnp.zeros_like(pts_t)
    s = np.arange(8)
    for lvl in range(cfg.n_levels):
        _, frac = _cell_frac(pts_t, float(scales[lvl]), int(res[lvl]))
        fx, fy, fz = frac[0], frac[1], frac[2]
        wx = jnp.stack([fx if b & 1 else 1.0 - fx for b in s])
        wy = jnp.stack([fy if b & 2 else 1.0 - fy for b in s])
        wz = jnp.stack([fz if b & 4 else 1.0 - fz for b in s])
        sx = jnp.asarray([1.0 if b & 1 else -1.0 for b in s], jnp.float32)[:, None]
        sy = jnp.asarray([1.0 if b & 2 else -1.0 for b in s], jnp.float32)[:, None]
        sz = jnp.asarray([1.0 if b & 4 else -1.0 for b in s], jnp.float32)[:, None]
        v = v_t[lvl].astype(jnp.float32)
        nf = cfg.n_features
        pc = sum(
            v[8 * f : 8 * f + 8] * g[nf * lvl + f][None, :] for f in range(nf)
        )  # (8, N)
        dx = jnp.sum(sx * wy * wz * pc, axis=0)
        dy = jnp.sum(sy * wx * wz * pc, axis=0)
        dz = jnp.sum(sz * wx * wy * pc, axis=0)
        d = d + jnp.stack([dx, dy, dz]) * jnp.float32(scales[lvl])
    return d


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _corner_masks(c: int):
    s = jax.lax.broadcasted_iota(jnp.int32, (8, c), 0)
    return (s & 1) > 0, (s & 2) > 0, (s & 4) > 0


def _fwd_kernel(scale_ref, pts_ref, v_ref, out_ref):
    scale = scale_ref[pl.program_id(0), 0]
    pts = pts_ref[:]  # (3, c)
    scaled = pts * scale + 0.5
    frac = scaled - jnp.floor(scaled)
    c = pts.shape[-1]
    bx, by, bz = _corner_masks(c)
    fx, fy, fz = frac[0:1], frac[1:2], frac[2:3]
    wx = jnp.where(bx, fx, 1.0 - fx)
    wy = jnp.where(by, fy, 1.0 - fy)
    wz = jnp.where(bz, fz, 1.0 - fz)
    w = wx * wy * wz  # (8, c)
    v = v_ref[0].astype(jnp.float32)  # (8F, c)
    nf = v.shape[0] // 8
    outs = [
        jnp.sum(v[8 * f : 8 * f + 8] * w, axis=0, keepdims=True) for f in range(nf)
    ]
    out_ref[0] = jnp.concatenate(outs, axis=0)  # (F, c)


def _interp_fwd_pallas(pts_t, v_t, cfg: FusedHashConfig, scales):
    l, nf, w = cfg.n_levels, cfg.n_features, cfg.row_width
    n = pts_t.shape[-1]
    c = min(_chunk_for(w), n)
    grid = (l, n // c)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nf, c), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, nf, n), jnp.float32),
    )(scales, pts_t, v_t).reshape(l * nf, n)


def _dpts_kernel(scale_ref, pts_ref, v_ref, g_ref, out_ref):
    lvl = pl.program_id(1)
    scale = scale_ref[lvl, 0]
    pts = pts_ref[:]  # (3, c)
    scaled = pts * scale + 0.5
    frac = scaled - jnp.floor(scaled)
    c = pts.shape[-1]
    bx, by, bz = _corner_masks(c)
    fx, fy, fz = frac[0:1], frac[1:2], frac[2:3]
    wx = jnp.where(bx, fx, 1.0 - fx)
    wy = jnp.where(by, fy, 1.0 - fy)
    wz = jnp.where(bz, fz, 1.0 - fz)
    sx = jnp.where(bx, 1.0, -1.0)
    sy = jnp.where(by, 1.0, -1.0)
    sz = jnp.where(bz, 1.0, -1.0)
    v = v_ref[0].astype(jnp.float32)  # (8F, c)
    g = g_ref[0]  # (F, c)
    nf = v.shape[0] // 8
    pc = sum(v[8 * f : 8 * f + 8] * g[f : f + 1] for f in range(nf))  # (8, c)
    dx = jnp.sum(sx * wy * wz * pc, axis=0, keepdims=True)
    dy = jnp.sum(sy * wx * wz * pc, axis=0, keepdims=True)
    dz = jnp.sum(sz * wx * wy * pc, axis=0, keepdims=True)
    d = jnp.concatenate([dx, dy, dz], axis=0) * scale  # (3, c)

    @pl.when(lvl == 0)
    def _():
        out_ref[:] = d

    @pl.when(lvl > 0)
    def _():
        out_ref[:] = out_ref[:] + d


def _dpts_pallas(pts_t, v_t, g, cfg: FusedHashConfig, scales):
    l, nf, w = cfg.n_levels, cfg.n_features, cfg.row_width
    n = pts_t.shape[-1]
    c = min(_chunk_for(w), n)
    grid = (n // c, l)  # level innermost: out block revisited, accumulates
    return pl.pallas_call(
        _dpts_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, c), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf, c), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, c), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
    )(scales, pts_t, v_t, g.reshape(cfg.n_levels, nf, n))


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# custom-VJP encode
# ---------------------------------------------------------------------------


def _pad_pts(pts_t: jnp.ndarray, row_width: int = 16) -> Tuple[jnp.ndarray, int]:
    n = pts_t.shape[-1]
    c = min(_chunk_for(row_width), ((n + 127) // 128) * 128)
    pad = (-n) % c
    if pad:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, pad)))
    return pts_t, n


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_encode(table, pts_t, key_data, cfg: FusedHashConfig):
    out, _ = _encode_fwd_impl(table, pts_t, cfg)
    return out


def _encode_fwd_impl(table, pts_t, cfg: FusedHashConfig):
    tables_bf16 = table.astype(jnp.bfloat16)
    pts_p, n = _pad_pts(pts_t, cfg.row_width)
    v_t = _gather_v_t(tables_bf16, pts_p, cfg)
    if _use_pallas():
        scales = jnp.asarray(cfg.level_scales()).reshape(-1, 1)
        out = _interp_fwd_pallas(pts_p, v_t, cfg, scales)
    else:
        out = _interp_fwd_ref(pts_p, v_t, cfg)
    return out[:, :n], v_t


def _fused_fwd(table, pts_t, key_data, cfg: FusedHashConfig):
    out, v_t = _encode_fwd_impl(table, pts_t, cfg)
    # v_t (the gathered corner rows) is saved as a residual: the d_pts
    # backward needs it, and re-gathering costs ~12 ns/row on v5e while
    # re-reading the saved slab is sequential-bandwidth (~20x cheaper).
    # cfg.save_residual=False trades that back for peak-HBM headroom.
    if not cfg.save_residual:
        v_t = None
    return out, (table, pts_t, key_data, v_t)


def _bwd_dtable_exact(pts_t, g, cfg: FusedHashConfig):
    """(L, T, 8F) f32: every (point, level) contributes (L x N scatter rows)."""
    scales = cfg.level_scales()
    res = cfg.level_resolutions()
    d_levels = []
    for lvl in range(cfg.n_levels):
        idx = _level_indices(pts_t, cfg, lvl)
        _, frac = _cell_frac(pts_t, float(scales[lvl]), int(res[lvl]))
        w = _corner_weights(frac)  # (8, N)
        nf = cfg.n_features
        gl = g[nf * lvl : nf * lvl + nf]  # (F, N)
        upd = jnp.einsum("sn,fn->nfs", w, gl).reshape(-1, cfg.row_width)
        d_levels.append(
            jnp.zeros((cfg.table_size, cfg.row_width), jnp.float32).at[idx].add(upd)
        )
    return jnp.stack(d_levels)


def _bwd_dtable_strided(pts_t, g, key_data, cfg: FusedHashConfig):
    """Slot-strided level1 table gradient (see module doc). pts_t (3, N) with
    N = n_rays * S, S = cfg.slot_period; slot s of each ray updates level
    (s % S' ...) chosen by per-step rotation, strided compaction by k."""
    l, k, s_per = cfg.n_levels, cfg.bwd_stride, cfg.slot_period
    n = pts_t.shape[-1]
    group = l * k
    n_rays = n // s_per
    scales = cfg.level_scales()
    res = cfg.level_resolutions()

    rot = (key_data[0] % np.uint32(l)).astype(jnp.int32)
    phase = (key_data[1] % np.uint32(k)).astype(jnp.int32)

    # (3, n_rays, S/group, k, L): last axis = s % L, k axis = (s // L) % k
    nf = cfg.n_features
    pts_g = pts_t.reshape(3, n_rays, s_per // group, k, l)
    g_g = g.reshape(nf * l, n_rays, s_per // group, k, l)
    pts_ph = jnp.take(pts_g, phase, axis=3)  # (3, R, S/group, L)
    g_ph = jnp.take(g_g, phase, axis=3)

    d_levels = []
    for lvl in range(cfg.n_levels):
        cls = (jnp.int32(lvl) + rot) % l  # slot class feeding this level
        p_l = jnp.take(pts_ph, cls, axis=3).reshape(3, -1)  # (3, m)
        idx = _level_indices(p_l, cfg, lvl)
        _, frac = _cell_frac(p_l, float(scales[lvl]), int(res[lvl]))
        w = _corner_weights(frac)  # (8, m)
        gl = jnp.take(g_ph[nf * lvl : nf * lvl + nf], cls, axis=3).reshape(nf, -1)
        upd = jnp.einsum("sn,fn->nfs", w, gl).reshape(-1, cfg.row_width) * jnp.float32(
            l * k
        )
        d_levels.append(
            jnp.zeros((cfg.table_size, cfg.row_width), jnp.float32).at[idx].add(upd)
        )
    return jnp.stack(d_levels)


def _fused_bwd(cfg: FusedHashConfig, resids, g):
    table, pts_t, key_data, v_t = resids
    pts_p, n = _pad_pts(pts_t, cfg.row_width)
    if v_t is None:  # save_residual=False: rematerialize the corner rows
        v_t = _gather_v_t(table.astype(jnp.bfloat16), pts_p, cfg)
    g_p = jnp.pad(g, ((0, 0), (0, pts_p.shape[-1] - n))) if pts_p.shape[-1] != n else g

    if _use_pallas():
        scales = jnp.asarray(cfg.level_scales()).reshape(-1, 1)
        d_pts = _dpts_pallas(pts_p, v_t, g_p, cfg, scales)[:, :n]
    else:
        d_pts = _dpts_ref(pts_p, v_t, g_p, cfg)[:, :n]

    strided_ok = (
        cfg.bwd == "strided"
        and cfg.slot_period > 0
        and n % cfg.slot_period == 0
        and cfg.slot_period % (cfg.n_levels * cfg.bwd_stride) == 0
    )
    if strided_ok:
        d_table = _bwd_dtable_strided(pts_t, g, key_data, cfg)
    else:
        d_table = _bwd_dtable_exact(pts_t, g, cfg)
    return d_table, d_pts, jnp.zeros_like(resids[2])


_fused_encode.defvjp(_fused_fwd, _fused_bwd)


def fused_hash_encode_t(
    table: jnp.ndarray,
    pts_t: jnp.ndarray,
    cfg: FusedHashConfig,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(L*2, N) encoding of pts_t (3, N) in [0, 1]. ``key`` drives the
    strided-backward rotation/phase draw (pass fresh per step; None falls
    back to a fixed draw, fine for eval/fwd-only)."""
    if key is None:
        # Per-step rotation/phase without key plumbing: the training sampler
        # jitters every z-value, so the mantissa LSBs of the first few points
        # are fresh uniform noise each step; fold them into a shared draw.
        b = jax.lax.bitcast_convert_type(
            jax.lax.stop_gradient(pts_t[:, : min(8, pts_t.shape[-1])]), jnp.uint32
        )
        h0 = jnp.bitwise_xor(
            b[0] * jnp.uint32(2654435761), b[1] * jnp.uint32(805459861)
        )
        h1 = jnp.bitwise_xor(h0, b[2] * jnp.uint32(3674653429))
        key_data = jnp.stack([h0.sum(dtype=jnp.uint32), h1.sum(dtype=jnp.uint32)])
    else:
        key_data = (
            jax.random.key_data(key)
            if jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
            else key
        )
    return _fused_encode(table, pts_t, key_data.astype(jnp.uint32), cfg)
