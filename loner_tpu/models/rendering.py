"""Volume rendering: alpha compositing of field outputs along rays.

Semantics match the reference's ``raw2outputs`` / ``render_rays``
(``src/models/rendering_tcnn.py:219-295,340-425``): classic NeRF compositing
with relu-sigma, a 1e10 terminal delta, expected depth that includes the
unallocated probability mass placed at the far plane, opacity = sum of
weights, and optional per-ray depth variance.

TPU-first: one fused jitted function per batch, no chunking loop (the batch
size IS the chunk; callers pick shapes that fit HBM), static shapes, results
as a NamedTuple pytree.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from loner_tpu.models.nerf import NeRFConfig, query_nerf_t, query_sigma_t


class RenderResult(NamedTuple):
    rgb: jnp.ndarray  # (N, num_colors) or (N, 1) dummy when sigma_only
    depth: jnp.ndarray  # (N,)
    weights: jnp.ndarray  # (N, S)
    opacity: jnp.ndarray  # (N,)
    variance: jnp.ndarray  # (N,)
    z_vals: jnp.ndarray  # (N, S)
    points: jnp.ndarray  # (3, N, S) cube coords, TRANSPOSED (lane layout)
    raw: jnp.ndarray  # (C+1, N, S) or (1, N, S), TRANSPOSED


def composite_t(
    raw_t: jnp.ndarray,  # (C+1, N, S) or (1, N, S) when sigma_only
    z_vals: jnp.ndarray,  # (N, S)
    rays_d: jnp.ndarray,  # (N, 3)
    far: Optional[jnp.ndarray] = None,  # (N,) -> depth includes far-plane mass
    sigma_only: bool = False,
    num_colors: int = 3,
    softplus: bool = False,
):
    """Returns (rgb, depth, weights, opacity, variance). ``raw_t`` keeps the
    channel axis leading (TPU lane layout: the big N*S axes stay minor)."""
    if sigma_only:
        sigmas = raw_t[0]
        rgbs = None
    else:
        rgbs = raw_t[:num_colors]  # (C, N, S)
        sigmas = raw_t[num_colors]

    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)
    # eps-safe norm: padded rays have zero directions; a bare norm yields NaN
    # gradients there that leak past the loss mask into the pose gradients.
    d_norm = jnp.sqrt(jnp.sum(rays_d * rays_d, axis=-1, keepdims=True) + 1e-20)
    deltas = deltas * d_norm

    density = jax.nn.softplus(sigmas) if softplus else jax.nn.relu(sigmas)
    alphas = 1.0 - jnp.exp(-deltas * density)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1),
        axis=-1,
    )[:, :-1]
    weights = alphas * trans  # (N, S)

    opacity = jnp.sum(weights, axis=-1)

    if far is not None:
        residual = 1.0 - opacity  # mass that never terminated
        depth = jnp.sum(weights * z_vals, axis=-1) + residual * far
    else:
        depth = jnp.sum(weights * z_vals, axis=-1)

    if sigma_only:
        rgb = jnp.full((sigmas.shape[0], 1), -1.0, dtype=sigmas.dtype)
    else:
        rgb = jnp.einsum("ns,cns->nc", weights, rgbs)

    variance = jnp.sum(weights * (depth[:, None] - z_vals) ** 2, axis=-1)
    return rgb, depth, weights, opacity, variance


def composite(
    raw: jnp.ndarray,  # (N, S, C+1) or (N, S, 1) when sigma_only
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    far: Optional[jnp.ndarray] = None,
    sigma_only: bool = False,
    num_colors: int = 3,
    softplus: bool = False,
):
    """Channel-minor wrapper over ``composite_t``."""
    return composite_t(
        jnp.moveaxis(raw, -1, 0), z_vals, rays_d, far, sigma_only, num_colors, softplus
    )


def composite_peak_adjusted(
    raw_t: jnp.ndarray,  # (C+1, N, S)
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    far: Optional[jnp.ndarray] = None,
    sigma_only: bool = False,
    num_colors: int = 3,
    termination_threshold: float = 0.5,
    prominence_threshold_max: float = 0.45,
    prominence_threshold_min: float = 0.35,
):
    """FDT's "adjusted" strategy (``raw2outputs_adjusted``,
    ``src/models/rendering_tcnn.py:70-214``), for foliage-like multi-return
    ambiguity:

      * depth = z at the first sample where transmittance T drops below 0.5;
        rays that never cross are invalid (depth 0).
      * the T profile is discretized at thresholds 0.9/0.8/0.7/0.6/0.501;
        the distances between consecutive crossing depths ("rise deltas",
        normalized by the 0.501 depth) measure how sharply termination
        probability rises. The segment with the SMALLEST normalized delta is
        the steepest peak.
      * isolation test: if the two steepest segments are adjacent in
        threshold space (|i2-i1| == 1) the peak is broad -> RESAMPLE the
        depth at the steepest segment's crossing; if they are maximally
        separated (== 3) the profile is multi-peaked -> DROP the ray.
      * prominence test: m1/|m1+m2| > 0.45 -> resample at the steepest
        crossing; m1/mean < 0.35 -> drop.

    T is monotone non-increasing, so each threshold has at most one
    crossing — the dynamic ``nonzero`` bookkeeping of the reference becomes
    a static argmax per ray. (The reference's in-place writes through
    chained advanced indexing are silent no-ops in torch — a defect; this
    implements the documented intent, applied in the same order so later
    rules win.)
    """
    rgb, exp_depth, weights, opacity, _ = composite_t(
        raw_t, z_vals, rays_d, far, sigma_only, num_colors
    )

    # transmittance BEFORE each sample (T in the reference), (N, S)
    sigmas = raw_t[0] if sigma_only else raw_t[num_colors]
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate([deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1)
    d_norm = jnp.sqrt(jnp.sum(rays_d * rays_d, axis=-1, keepdims=True) + 1e-20)
    alphas = 1.0 - jnp.exp(-deltas * d_norm * jax.nn.relu(sigmas))
    T = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1),
        axis=-1,
    )[:, :-1]
    T_shifted = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=-1)

    def crossing(th):
        """(depth, sample index, crossed?) of the unique T-crossing of th."""
        mask = jnp.logical_and(jnp.logical_not(T > th), T_shifted > th)
        any_c = jnp.any(mask, axis=-1)
        idx = jnp.argmax(mask, axis=-1)
        d = jnp.take_along_axis(z_vals, idx[:, None], axis=-1)[:, 0]
        return jnp.where(any_c, d, 0.0), idx, any_c

    depth_term, _, valid = crossing(termination_threshold)

    ths = (0.9, 0.8, 0.7, 0.6, 0.501)
    cross = [crossing(th) for th in ths]
    d_th = jnp.stack([c[0] for c in cross])  # (5, N)
    i_th = jnp.stack([c[1] for c in cross])  # (5, N)

    rise = d_th[1:] - d_th[:-1]  # (4, N)
    norm_rise = rise / (d_th[-1] + 1e-10)

    # the two steepest (smallest normalized) segments
    order = jnp.argsort(norm_rise, axis=0)  # ascending
    i1, i2 = order[0], order[1]  # (N,)
    m1 = jnp.take_along_axis(norm_rise, i1[None], axis=0)[0]
    m2 = jnp.take_along_axis(norm_rise, i2[None], axis=0)[0]

    # crossing sample at the steepest segment's upper threshold
    steep_idx = jnp.take_along_axis(i_th, i1[None], axis=0)[0]  # (N,)
    steep_depth = jnp.take_along_axis(z_vals, steep_idx[:, None], axis=-1)[:, 0]

    # NOTE: 0/0 = NaN and NaN comparisons are False, exactly like torch —
    # a perfectly sharp wall (all-zero rise deltas) is neither resampled
    # nor dropped. Do not add epsilons here.
    iso = jnp.abs(i2 - i1)
    resample = jnp.logical_or(
        iso == 1, m1 / jnp.abs(m1 + m2) > prominence_threshold_max
    )
    drop = jnp.logical_or(
        iso == 3, m1 / jnp.mean(norm_rise, axis=0) < prominence_threshold_min
    )

    depth = depth_term
    depth = jnp.where(jnp.logical_and(valid, resample), steep_depth, depth)
    depth = jnp.where(jnp.logical_and(valid, drop), 0.0, depth)  # drop wins
    depth = jnp.where(valid, depth, 0.0)

    variance = jnp.sum(weights * (depth[:, None] - z_vals) ** 2, axis=-1)
    return rgb, depth, weights, opacity, variance


def _apply_point_chunks_t(fn, x_t, n_chunks: int, remat: bool = False):
    """Evaluate ``fn`` over the MINOR (last) axis in ``n_chunks`` sequential
    chunks via lax.map — the TPU netchunk: bounds the HBM temps of the
    per-point pipeline. ``x_t`` leaves are (..., N); ``fn`` maps (..., c) ->
    (..., c); result concatenated back to (..., N)."""
    leaves = jax.tree.leaves(x_t)
    n = leaves[0].shape[-1]
    if n_chunks <= 1 or n % n_chunks != 0:
        return fn(x_t)
    c = n // n_chunks

    def split(a):
        # (..., N) -> (n_chunks, ..., c): chunk axis leading for lax.map
        a2 = a.reshape(*a.shape[:-1], n_chunks, c)
        return jnp.moveaxis(a2, -2, 0)

    xs = jax.tree.map(split, x_t)
    # optional per-chunk remat: only useful for the exact (non-custom-VJP)
    # encoder, where saved residuals would otherwise stack up; the packed
    # encoder's custom VJP already bounds what is saved, and rematting it
    # would re-run the gathers in backward.
    ys = jax.lax.map(jax.checkpoint(fn) if remat else fn, xs)  # (n_chunks, ..., c)
    ys = jnp.moveaxis(ys, 0, -2)  # (..., n_chunks, c)
    return ys.reshape(*ys.shape[:-2], n)


def render_rays(
    params: dict,
    bundle,
    z_vals: jnp.ndarray,  # (N, S) from a sampler
    cfg: NeRFConfig,
    sigma_only: bool = False,
    detach_sigma: bool = True,
    render_strategy: str = "default",
    point_chunks: Optional[int] = None,  # None -> cfg.point_chunks
    remat_chunks: bool = False,
    key: Optional[jnp.ndarray] = None,
) -> RenderResult:
    """Evaluate the field at o + d*z and composite.

    The reference's ``render_rays`` (``src/models/rendering_tcnn.py:340-425``)
    with the sampler factored out. The forward is deterministic; ``key``
    only seeds the encoder's stochastic table-gradient slot rotation
    (training steps must pass it — see NeRFConfig.encoding_bwd).
    """
    n, s = z_vals.shape
    if point_chunks is None:
        point_chunks = getattr(cfg, "point_chunks", 4)
    # transposed points (3, N, S): component axis leading, point axes minor
    pts_t = bundle.origins.T[:, :, None] + bundle.directions.T[:, :, None] * z_vals[None]

    flat_pts_t = pts_t.reshape(3, n * s)
    if sigma_only:
        sig_flat = _apply_point_chunks_t(
            lambda p: query_sigma_t(params, p, cfg, key),
            flat_pts_t,
            point_chunks,
            remat_chunks,
        )  # (n*s,)
        raw_t = sig_flat.reshape(1, n, s)
    else:
        flat_dirs_t = jnp.repeat(bundle.viewdirs.T[:, :, None], s, axis=2).reshape(3, n * s)
        raw_t = _apply_point_chunks_t(
            lambda args: query_nerf_t(
                params,
                args[0],
                args[1],
                cfg,
                sigma_only=False,
                detach_sigma=detach_sigma,
                key=key,
            ),
            (flat_pts_t, flat_dirs_t),
            point_chunks,
            remat_chunks,
        ).reshape(-1, n, s)  # (C+1, n, s)

    if render_strategy == "default":
        rgb, depth, weights, opacity, variance = composite_t(
            raw_t, z_vals, bundle.directions, far=bundle.far, sigma_only=sigma_only, num_colors=cfg.num_colors
        )
    elif render_strategy == "adjusted":
        rgb, depth, weights, opacity, variance = composite_peak_adjusted(
            raw_t, z_vals, bundle.directions, far=bundle.far, sigma_only=sigma_only, num_colors=cfg.num_colors
        )
    else:
        raise ValueError(f"Unknown render strategy: {render_strategy}")

    return RenderResult(rgb, depth, weights, opacity, variance, z_vals, pts_t, raw_t)
