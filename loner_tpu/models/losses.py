"""Training losses: truncated-Gaussian line-of-sight targets, JS-divergence
dynamic tolerance, depth MSE, opacity — the paper's core numerics.

Semantics follow ``src/models/losses.py:29-51`` (get_weights_gt),
``src/mapping/optimizer.py:701-859`` (compute_loss) and ``:910-925``
(KL/JS helpers). All reductions are mask-aware so padded/invalid rays are
excluded (the reference drops such rays before batching instead; results
agree because the reference's means normalize by the surviving count).

Sky rays arrive as "transparent" rays (measured depth beyond the far plane);
their target weight distribution is all-zero, so the L1 line-of-sight term
actively clears density along them.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LossConfig(NamedTuple):
    loss_selection: str = "L1_JS"  # L1_LOS | L2_LOS | L1_JS | L2_JS
    min_js_score: float = 1.0
    max_js_score: float = 10.0
    js_alpha: float = 1.0
    decay_los_lambda: bool = False
    los_lambda: float = 1000.0
    min_los_lambda: float = 10.0
    los_lambda_decay_rate: float = 0.001
    los_lambda_decay_steps: float = 15000.0
    decay_depth_eps: bool = True
    depth_eps: float = 3.0
    min_depth_eps: float = 0.5
    depth_eps_decay_rate: float = 0.95
    depth_eps_decay_steps: float = 1.0
    depthloss_lambda: float = 0.005
    cam_lambda: float = 1.0


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(x * m) / count


def get_weights_gt(
    sampled_depth: jnp.ndarray,  # (N, S) metric
    gt_depth: jnp.ndarray,  # (N, 1) metric
    eps,  # scalar or (N, 1)
    norm: bool = True,
) -> jnp.ndarray:
    """Truncated-Gaussian target weight distribution around the measured
    depth: sigma = eps/9, support clipped to +-eps, rows normalized."""
    sigma = eps / 9.0
    inv_sqrt_2pi = 1.0 / math.sqrt(2.0 * math.pi)

    x = (sampled_depth - gt_depth) / sigma
    pdf = inv_sqrt_2pi * jnp.exp(-0.5 * x * x) / sigma

    # cdf(9) - cdf(-9): kept for exact parity with the reference formula.
    clip = jnp.asarray(9.0, dtype=sampled_depth.dtype)
    denom = 0.5 * (1 + jax.lax.erf(clip / math.sqrt(2.0))) - 0.5 * (
        1 + jax.lax.erf(-clip / math.sqrt(2.0))
    )
    w = pdf / denom

    inside = jnp.heaviside(sampled_depth - (gt_depth - eps), jnp.zeros_like(sampled_depth)) * jnp.heaviside(
        (gt_depth + eps) - sampled_depth, jnp.zeros_like(sampled_depth)
    )
    w = w * inside
    if norm:
        w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-6)
    return w


def kl_divergence_gaussians(mean1, std1, mean2, std2):
    var1 = std1 * std1
    var2 = std2 * std2
    return jnp.log(std2 / std1) + (var1 + (mean1 - mean2) ** 2) / (2.0 * var2) - 0.5


def js_divergence_gaussians(mean1, std1, mean2, std2):
    """JS divergence between two Gaussians via the mixture-moment
    approximation the reference uses (``optimizer.py:920-925``)."""
    mean_m = 0.5 * (mean1 + mean2)
    std_m = 0.5 * jnp.sqrt(std1**2 + std2**2)
    return 0.5 * kl_divergence_gaussians(mean1, std1, mean_m, std_m) + 0.5 * kl_divergence_gaussians(
        mean2, std2, mean_m, std_m
    )


def los_lambda_at_step(cfg: LossConfig, global_step) -> jnp.ndarray:
    if not cfg.decay_los_lambda:
        return jnp.asarray(cfg.los_lambda, dtype=jnp.float32)
    lam = cfg.los_lambda * cfg.los_lambda_decay_rate ** (
        (global_step + 1.0) / cfg.los_lambda_decay_steps
    )
    return jnp.maximum(lam, cfg.min_los_lambda)


def depth_eps_at_iteration(cfg: LossConfig, iteration) -> jnp.ndarray:
    if not cfg.decay_depth_eps:
        return jnp.asarray(cfg.depth_eps, dtype=jnp.float32)
    eps = cfg.depth_eps * cfg.depth_eps_decay_rate ** (iteration / cfg.depth_eps_decay_steps)
    return jnp.maximum(eps, cfg.min_depth_eps)


def compute_lidar_loss(
    render,  # RenderResult
    bundle,  # RayBundle (depth = measured range in cube units)
    scale_factor,  # world-cube scale (cube->metric)
    cfg: LossConfig,
    global_step,
    iteration,
    return_per_ray: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Full lidar loss (depth MSE + LOS/JS + opacity), mask-aware.

    Returns (scalar loss, aux dict). Matches ``Optimizer.compute_loss``
    (``src/mapping/optimizer.py:701-859``). ``return_per_ray`` (static;
    used only by the debug probe, never the train step) adds the pre-mean
    per-ray vectors to aux for loss-distribution dumps (the reference's
    ``plot_loss_distribution``, ``optimizer.py:927-1017``).
    """
    valid = bundle.valid
    depth_gt_cube = bundle.depth  # (N,)
    transparent = depth_gt_cube > bundle.far
    opaque = (depth_gt_cube > 0) & (~transparent) & valid

    z_metric = render.z_vals * scale_factor  # (N, S)
    depth_gt_metric = (depth_gt_cube * scale_factor)[:, None]  # (N, 1)
    w_pred = render.weights  # (N, S)

    # Predicted depth distribution moments (for JS tolerance + diagnostics).
    w_sum = jnp.sum(w_pred, axis=1) + 1e-10
    mean = jnp.sum(z_metric * w_pred, axis=1) / w_sum  # (N,)
    var = jnp.sum((z_metric - mean[:, None]) ** 2 * w_pred, axis=1) / w_sum + 1e-10
    std = jnp.sqrt(var)

    eps_min = cfg.min_depth_eps
    js = js_divergence_gaussians(depth_gt_metric[:, 0], eps_min / 3.0, mean, std)  # (N,)

    # Depth MSE on expected termination depth, opaque rays only.
    depth_pred_metric = render.depth * scale_factor
    depth_mse = _masked_mean((depth_pred_metric - depth_gt_metric[:, 0]) ** 2, opaque)

    # Per-ray tolerance.
    if cfg.loss_selection in ("L1_JS", "L2_JS"):
        js_c = jnp.where(js < cfg.min_js_score, 0.0, js)
        js_c = jnp.where(js_c > cfg.max_js_score, cfg.max_js_score, js_c)
        eps_dyn = eps_min * (1.0 + cfg.js_alpha * js_c)
        eps = jax.lax.stop_gradient(eps_dyn)[:, None]  # (N, 1)
    elif cfg.loss_selection in ("L1_LOS", "L2_LOS"):
        eps = depth_eps_at_iteration(cfg, iteration)
    else:
        raise ValueError(f"Unknown loss selection {cfg.loss_selection}")

    w_gt = get_weights_gt(z_metric, depth_gt_metric, eps)
    w_gt = jnp.where(opaque[:, None], w_gt, 0.0)

    # LOS loss over all valid rays (mean over N*S elements).
    err = w_pred - w_gt
    if cfg.loss_selection in ("L1_JS", "L1_LOS"):
        per_elem = jnp.abs(err)
    else:
        per_elem = err * err
    los_loss = _masked_mean(jnp.mean(per_elem, axis=1), valid)

    opacity_loss = _masked_mean(jnp.abs(render.opacity - 1.0), opaque)

    lam = los_lambda_at_step(cfg, global_step)
    loss = cfg.depthloss_lambda * depth_mse + lam * los_loss + opacity_loss

    if isinstance(eps, jnp.ndarray) and eps.ndim == 2:
        eps_mean = _masked_mean(eps[:, 0], valid)
    else:
        eps_mean = jnp.asarray(eps)

    aux = {
        "depth_mse": depth_mse,
        "los_loss": los_loss,
        "opacity_loss": opacity_loss,
        "los_lambda": lam,
        "depth_eps": eps_mean,
        "js_mean": _masked_mean(js, valid),
        "pred_depth_std": _masked_mean(std, valid),
        "n_opaque": jnp.sum(opaque.astype(jnp.float32)),
        "n_valid": jnp.sum(valid.astype(jnp.float32)),
    }
    if return_per_ray:
        aux["per_ray"] = {
            "depth_err_m": depth_pred_metric - depth_gt_metric[:, 0],
            "js": js,
            "los": jnp.mean(per_elem, axis=1),
            "valid": valid,
            "opaque": opaque,
        }
    return loss, aux


def compute_camera_loss(render, intensities_gt: jnp.ndarray, valid: jnp.ndarray, cfg: LossConfig):
    """L1 intensity loss (``Optimizer.compute_loss_camera``,
    ``src/mapping/optimizer.py:861-894``)."""
    err = jnp.abs(render.rgb - intensities_gt)
    loss = cfg.cam_lambda * _masked_mean(jnp.mean(err, axis=-1), valid)
    return loss, {"cam_l1": loss}
