"""Fast hash-grid encoding: packed-pair gathers with a custom VJP.

Measured on TPU v5e (see ROADMAP perf notes): XLA's gather/scatter engines
sustain ~130-140M random 4-byte touches/s regardless of layout, so the hash
grid's cost is touch COUNT. This implementation cuts touches two ways:

  * **bf16 pair packing** — each table entry's two bf16 features live in one
    32-bit word; one gather fetches both (2x fewer gathers). The parameter
    pytree keeps an f32 master copy (L, F, T); packing happens on the fly
    (cheap, dense, bandwidth-bound sequential reads).
  * **custom VJP** — backward never re-gathers: the forward saves the packed
    features and indices, and d/dtable is a direct scatter-add of
    (trilinear_weight x cotangent).
  * optional **stochastic corner sampling** — one corner per point per call,
    importance-sampled by its trilinear weight (an unbiased estimator of the
    full 8-corner interpolation): 8x fewer touches for training steps that
    tolerate sampling noise.

Semantics (level scales, tcnn spatial hash, dense tight indexing for small
levels) match ``loner_tpu.models.hash_encoding``; equivalence is tested.
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
    return idx, w, frac


def _pack_tables(table_f32: jnp.ndarray) -> jnp.ndarray:
    """(L, F=2, T) f32 -> (L, T) f32 words each holding two bf16 features."""
    l, f, t = table_f32.shape
    assert f == 2, "pair packing requires n_features_per_level == 2"
    pairs = jnp.stack([table_f32[:, 0], table_f32[:, 1]], axis=-1).astype(jnp.bfloat16)
    return jax.lax.bitcast_convert_type(pairs, jnp.float32)  # (L, T)


def _unpack_gathered(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(...,) f32 packed words -> two (...,) f32 features."""
    pair = jax.lax.bitcast_convert_type(v, jnp.bfloat16)  # (..., 2)
    return pair[..., 0].astype(jnp.float32), pair[..., 1].astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode_packed_t(
    table: jnp.ndarray,  # (L, 2, T) float32 master
    pts_t: jnp.ndarray,  # (3, N) in [0, 1]
    cfg: HashEncodingConfig,
    stochastic_key: Optional[jax.Array] = None,  # None = full trilinear
) -> jnp.ndarray:
    """(L*2, N) encoding, bf16 feature precision, half the gather traffic."""
    out, _ = _fwd(table, pts_t, cfg, stochastic_key)
    return out


def _fwd(table, pts_t, cfg: HashEncodingConfig, stochastic_key):
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    dense = cfg.level_is_dense()
    packed = _pack_tables(table)  # (L, T)

    n = pts_t.shape[1]
    outs = []
    saved_idx = []
    saved_w = []
    saved_v = []
    for lvl in range(cfg.n_levels):
        idx, w, frac = _level_indices_t(
            pts_t, float(scales[lvl]), int(resolutions[lvl]), bool(dense[lvl]), cfg.table_size
        )
        if stochastic_key is not None:
            # sample one corner ~ trilinear weight; E[f_c] = sum_c w_c f_c
            k = jax.random.fold_in(stochastic_key, lvl)
            u = jax.random.uniform(k, (n,))
            cdf = jnp.cumsum(w, axis=0)  # (8, N), sums to 1
            choice = jnp.sum((u[None, :] > cdf).astype(jnp.int32), axis=0)  # (N,)
            choice = jnp.clip(choice, 0, 7)
            idx = jnp.take_along_axis(idx, choice[None, :], axis=0)  # (1, N)
            w = jnp.ones_like(idx, dtype=w.dtype)  # estimator weight 1
        v = packed[lvl][idx]  # (C, N) packed pairs; C = 8 or 1
        f0, f1 = _unpack_gathered(v)
        outs.append(jnp.stack([jnp.sum(w * f0, axis=0), jnp.sum(w * f1, axis=0)]))
        saved_idx.append(idx)
        saved_w.append(w)
        saved_v.append(v)

    out = jnp.concatenate(outs, axis=0)  # (L*2, N)
    res = (
        jnp.stack(saved_idx),  # (L, C, N)
        jnp.stack(saved_w),  # (L, C, N)
        jnp.stack(saved_v),  # (L, C, N) packed
        pts_t,
    )
    return out, res


def _bwd(cfg: HashEncodingConfig, stochastic_key, res, g):
    idx, w, v, pts_t = res  # (L, C, N) each; g: (L*2, N)
    l, c, n = idx.shape
    g = g.reshape(l, 2, n)

    scales = jnp.asarray(cfg.level_scales(), jnp.float32)  # (L,)

    f0, f1 = _unpack_gathered(v)  # (L, C, N)

    # d/dtable: scatter w*g into each level's feature rows
    upd0 = w * g[:, 0][:, None, :]  # (L, C, N)
    upd1 = w * g[:, 1][:, None, :]
    level_ids = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[:, None, None], idx.shape)
    flat_idx = (level_ids * cfg.table_size + idx).reshape(-1)
    d_flat0 = jnp.zeros((l * cfg.table_size,), jnp.float32).at[flat_idx].add(upd0.reshape(-1))
    d_flat1 = jnp.zeros((l * cfg.table_size,), jnp.float32).at[flat_idx].add(upd1.reshape(-1))
    d_table = jnp.stack(
        [d_flat0.reshape(l, cfg.table_size), d_flat1.reshape(l, cfg.table_size)], axis=1
    )  # (L, 2, T)

    if stochastic_key is not None or c == 1:
        # stochastic mode: skip point grads (training phases using it run
        # with frozen poses; the estimator's dw is zero anyway)
        return d_table, jnp.zeros_like(pts_t)

    # d/dpts: dL/dfrac_a = sum_c (corner_a ? +1 : -1) * prod_{b!=a} w_b(c) * f.g
    # Recompute per-level fracs (cheap VPU) rather than saving them.
    corner_f = _CORNERS.astype(np.float32)  # (8, 3)
    d_pts = jnp.zeros_like(pts_t)
    per_corner = f0 * g[:, 0][:, None, :] + f1 * g[:, 1][:, None, :]  # (L, 8, N)
    for lvl in range(cfg.n_levels):
        scale = scales[lvl]
        scaled = pts_t * scale + 0.5
        frac = scaled - jnp.floor(scaled)  # (3, N)
        # w_axis[c, a, n] = frac or (1-frac) per corner/axis
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
        sign = (2.0 * corner_f - 1.0)[:, :, None]  # (8, 3, 1)
        dfrac = jnp.sum(per_corner[lvl][:, None, :] * sign * prod_others, axis=0)  # (3, N)
        d_pts = d_pts + dfrac * scale

    return d_table, d_pts


hash_encode_packed_t.defvjp(_fwd, _bwd)
