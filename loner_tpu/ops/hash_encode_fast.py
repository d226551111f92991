"""Fast hash-grid encoding: packed-pair gathers with a custom VJP.

Measured on TPU v5e (see ROADMAP perf notes): XLA's gather/scatter engines
sustain ~130-140M random 4-byte touches/s regardless of layout, so the hash
grid's cost is touch COUNT. This implementation cuts touches three ways:

  * **bf16 pair packing** — each table entry's two bf16 features live in one
    32-bit word; one gather fetches both (2x fewer gathers). The parameter
    pytree keeps an f32 master copy (L, F, T); packing happens on the fly
    (cheap, dense, bandwidth-bound sequential reads).
  * **level fusion** — all levels gather from one flat (L*T,) packed table
    with level-offset indices: one big gather instead of L launches.
  * **custom VJP** — backward never re-gathers: the forward saves the packed
    features and fused indices, and d/dtable is a direct scatter-add of
    (trilinear_weight x cotangent). Optionally the scatter samples ONE
    corner per (level, point) proportionally to its trilinear weight — an
    unbiased gradient estimator with 8x fewer scatter touches
    (``bwd_corner_sample``).

Semantics (level scales, tcnn spatial hash, dense tight indexing for small
levels) match ``loner_tpu.models.hash_encoding``; equivalence is tested in
``tests/test_hash_fast.py``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.models.hash_encoding import (
    HashEncodingConfig,
    _CORNERS,
    _PRIMES,
)


def _level_indices_t(pts_t: jnp.ndarray, scale: float, res: int, dense: bool, table_size: int):
    """Corner table indices (8, N) + trilinear weights (8, N) for one level.
    pts_t: (3, N) in [0, 1]."""
    scaled = pts_t * jnp.float32(scale) + 0.5
    cells = jnp.floor(scaled)
    frac = scaled - cells  # (3, N)
    cells = cells.astype(jnp.int32)

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

    corner_f = _CORNERS.astype(np.float32)  # (8, 3)
    w = jnp.prod(
        corner_f[:, :, None] * frac[None, :, :]
        + (1.0 - corner_f[:, :, None]) * (1.0 - frac[None, :, :]),
        axis=1,
    )  # (8, N)
    return idx, w


def _pack_tables(table_f32: jnp.ndarray) -> jnp.ndarray:
    """(L, F=2, T) f32 -> (L*T,) f32 words each holding two bf16 features."""
    l, f, t = table_f32.shape
    assert f == 2, "pair packing requires n_features_per_level == 2"
    pairs = jnp.stack([table_f32[:, 0], table_f32[:, 1]], axis=-1).astype(jnp.bfloat16)
    return jax.lax.bitcast_convert_type(pairs, jnp.float32).reshape(l * t)


def _unpack_gathered(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(...,) f32 packed words -> two (...,) f32 features."""
    pair = jax.lax.bitcast_convert_type(v, jnp.bfloat16)  # (..., 2)
    return pair[..., 0].astype(jnp.float32), pair[..., 1].astype(jnp.float32)


def _fused_indices(pts_t: jnp.ndarray, cfg: HashEncodingConfig):
    """Level-fused corner indices (L, 8, N) into the flat (L*T,) table, plus
    trilinear weights (L, 8, N)."""
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    dense = cfg.level_is_dense()
    idxs, ws = [], []
    for lvl in range(cfg.n_levels):
        idx, w = _level_indices_t(
            pts_t, float(scales[lvl]), int(resolutions[lvl]), bool(dense[lvl]), cfg.table_size
        )
        idxs.append(idx + lvl * cfg.table_size)
        ws.append(w)
    return jnp.stack(idxs), jnp.stack(ws)  # (L, 8, N) each


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _hash_encode_packed_core(
    table: jnp.ndarray,  # (L, 2, T) float32 master
    pts_t: jnp.ndarray,  # (3, N) in [0, 1]
    bwd_key: jnp.ndarray,  # (2,) PRNG key data (unused unless corner sampling)
    cfg: HashEncodingConfig,
    bwd_corner_sample: bool,
) -> jnp.ndarray:
    out, _ = _fwd(table, pts_t, bwd_key, cfg, bwd_corner_sample)
    return out


def _fwd(table, pts_t, bwd_key, cfg: HashEncodingConfig, bwd_corner_sample: bool):
    packed = _pack_tables(table)  # (L*T,)
    idx, w = _fused_indices(pts_t, cfg)  # (L, 8, N)
    v = packed[idx]  # (L, 8, N) packed pairs — ONE fused gather
    f0, f1 = _unpack_gathered(v)
    out = jnp.stack([jnp.sum(w * f0, axis=1), jnp.sum(w * f1, axis=1)], axis=1)  # (L, 2, N)
    out = out.reshape(cfg.n_levels * 2, -1)
    return out, (idx, w, v, pts_t, bwd_key)


def _bwd(cfg: HashEncodingConfig, bwd_corner_sample: bool, res, g):
    idx, w, v, pts_t, bwd_key = res  # idx/w/v: (L, 8, N)
    l, c, n = idx.shape
    g = g.reshape(l, 2, n)

    f0, f1 = _unpack_gathered(v)  # (L, 8, N)

    # ---- d/dtable ----------------------------------------------------
    if bwd_corner_sample:
        # one corner per (level, point) ~ trilinear weight: E = full scatter
        key = jax.random.wrap_key_data(bwd_key)
        u = jax.random.uniform(key, (l, n))
        cdf = jnp.cumsum(w, axis=1)  # (L, 8, N) rows sum to 1
        choice = jnp.sum((u[:, None, :] > cdf).astype(jnp.int32), axis=1)
        choice = jnp.clip(choice, 0, c - 1)  # (L, N)
        sel_idx = jnp.take_along_axis(idx, choice[:, None, :], axis=1)[:, 0]  # (L, N)
        flat_idx = sel_idx.reshape(-1)
        upd0 = g[:, 0].reshape(-1)
        upd1 = g[:, 1].reshape(-1)
    else:
        flat_idx = idx.reshape(-1)
        upd0 = (w * g[:, 0][:, None, :]).reshape(-1)
        upd1 = (w * g[:, 1][:, None, :]).reshape(-1)

    d_flat0 = jnp.zeros((l * cfg.table_size,), jnp.float32).at[flat_idx].add(upd0)
    d_flat1 = jnp.zeros((l * cfg.table_size,), jnp.float32).at[flat_idx].add(upd1)
    d_table = jnp.stack(
        [d_flat0.reshape(l, cfg.table_size), d_flat1.reshape(l, cfg.table_size)], axis=1
    )

    # ---- d/dpts ------------------------------------------------------
    scales = cfg.level_scales()
    corner_f = _CORNERS.astype(np.float32)  # (8, 3)
    sign = (2.0 * corner_f - 1.0)[:, :, None]  # (8, 3, 1)
    per_corner = f0 * g[:, 0][:, None, :] + f1 * g[:, 1][:, None, :]  # (L, 8, N)
    d_pts = jnp.zeros_like(pts_t)
    for lvl in range(cfg.n_levels):
        scale = jnp.float32(scales[lvl])
        scaled = pts_t * scale + 0.5
        frac = scaled - jnp.floor(scaled)  # (3, N)
        w_axis = corner_f[:, :, None] * frac[None] + (1 - corner_f[:, :, None]) * (1 - frac[None])
        # leave-one-out product over the other two axes
        prod_others = jnp.stack(
            [
                w_axis[:, 1] * w_axis[:, 2],
                w_axis[:, 0] * w_axis[:, 2],
                w_axis[:, 0] * w_axis[:, 1],
            ],
            axis=1,
        )  # (8, 3, N)
        dfrac = jnp.sum(per_corner[lvl][:, None, :] * sign * prod_others, axis=0)  # (3, N)
        d_pts = d_pts + dfrac * scale

    return d_table, d_pts, jnp.zeros_like(res[4])


_hash_encode_packed_core.defvjp(_fwd, _bwd)


def hash_encode_packed_t(
    table: jnp.ndarray,
    pts_t: jnp.ndarray,
    cfg: HashEncodingConfig,
    bwd_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(L*2, N) encoding, bf16 feature precision, fused single-gather.

    ``bwd_key`` enables the stochastic-scatter backward (8x fewer scatter
    touches, unbiased); None keeps the exact backward.
    """
    sample = bwd_key is not None
    if bwd_key is None:
        key_data = jnp.zeros((2,), jnp.uint32)
    else:
        key_data = jax.random.key_data(bwd_key) if jnp.issubdtype(bwd_key.dtype, jax.dtypes.prng_key) else bwd_key
    return _hash_encode_packed_core(table, pts_t, key_data, cfg, sample)
