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
):
    """FDT's "adjusted" strategy (``raw2outputs_adjusted``,
    ``src/models/rendering_tcnn.py:70-214``): for foliage-like multi-return
    ambiguity, take depth at the first sample where accumulated termination
    probability crosses ``termination_threshold`` instead of the full
    expectation; falls back to expected depth for rays that never cross.
    """
    rgb, exp_depth, weights, opacity, variance = composite_t(
        raw_t, z_vals, rays_d, far, sigma_only, num_colors
    )
    cum_w = jnp.cumsum(weights, axis=-1)
    crossed = cum_w >= termination_threshold
    any_crossed = jnp.any(crossed, axis=-1)
    first_idx = jnp.argmax(crossed, axis=-1)
    peak_depth = jnp.take_along_axis(z_vals, first_idx[:, None], axis=-1)[:, 0]
    depth = jnp.where(any_crossed, peak_depth, exp_depth)
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
    point_chunks: int = 4,
    remat_chunks: bool = False,
) -> RenderResult:
    """Evaluate the field at o + d*z and composite.

    The reference's ``render_rays`` (``src/models/rendering_tcnn.py:340-425``)
    with the sampler factored out (samplers need RNG keys; keeping them
    outside makes this function a pure deterministic map).
    """
    n, s = z_vals.shape
    # transposed points (3, N, S): component axis leading, point axes minor
    pts_t = bundle.origins.T[:, :, None] + bundle.directions.T[:, :, None] * z_vals[None]

    flat_pts_t = pts_t.reshape(3, n * s)
    if sigma_only:
        sig_flat = _apply_point_chunks_t(
            lambda p: query_sigma_t(params, p, cfg), flat_pts_t, point_chunks, remat_chunks
        )  # (n*s,)
        raw_t = sig_flat.reshape(1, n, s)
    else:
        flat_dirs_t = jnp.repeat(bundle.viewdirs.T[:, :, None], s, axis=2).reshape(3, n * s)
        raw_t = _apply_point_chunks_t(
            lambda args: query_nerf_t(
                params, args[0], args[1], cfg, sigma_only=False, detach_sigma=detach_sigma
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
