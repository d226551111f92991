"""Ray samplers: stratified-uniform and occupancy-guided importance sampling.

Mirrors the reference's ``UniformRaySampler`` / ``OccGridRaySampler``
(``src/models/ray_sampling.py:18-92``) and nerf_pl-style ``sample_pdf``
(``src/models/rendering_tcnn.py:19-68``), reformulated with static shapes:
every ray always yields exactly ``n_samples`` z-values; invalid rays still
produce (masked) samples.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from loner_tpu.models.occupancy_grid import occupancy_probs_t


def stratified_z_vals(
    key: jax.Array,
    near: jnp.ndarray,  # (N,)
    far: jnp.ndarray,  # (N,)
    n_samples: int,
    perturb: float = 1.0,
) -> jnp.ndarray:
    """(N, S) linear near->far samples, jittered between interval midpoints."""
    n = near.shape[0]
    steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z = near[:, None] * (1.0 - steps) + far[:, None] * steps  # (N, S)
    if perturb > 0:
        mids = 0.5 * (z[:, :-1] + z[:, 1:])
        upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mids], axis=-1)
        u = jax.random.uniform(key, (n, n_samples), dtype=near.dtype)
        z = lower + (upper - lower) * (perturb * u)
    return z


def _count_le(cdf: jnp.ndarray, u: jnp.ndarray, method: str) -> jnp.ndarray:
    """inds[i, k] = #{j: cdf[i, j] <= u[i, k]} = searchsorted(side="right").

    ``count``: broadcast compare-reduce — simple, but chained-measured at
    52 ms/step on v5e at the flagship shape (N=4608, M=255, K=256).
    ``bisect``: branchless binary search, log2(M) take_along_axis lane
    gathers — the TPU path.
    """
    if method == "count":
        return jnp.sum((cdf[:, :, None] <= u[:, None, :]).astype(jnp.int32), axis=1)
    m1 = cdf.shape[-1]
    p = 1 << max(m1 - 1, 1).bit_length()  # pow2 >= m1
    big = jnp.asarray(jnp.finfo(cdf.dtype).max, cdf.dtype)
    cdfp = jnp.pad(cdf, ((0, 0), (0, p - m1)), constant_values=big)
    inds = jnp.zeros(u.shape, jnp.int32)
    step = p >> 1
    while step:
        cand = inds + step
        c = jnp.take_along_axis(cdfp, cand - 1, axis=-1)
        inds = jnp.where(c <= u, cand, inds)
        step >>= 1
    return inds


def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,  # (N, M+1) bin edges (midpoints of coarse z)
    weights: jnp.ndarray,  # (N, M)
    n_importance: int,
    det: bool = False,
    eps: float = 1e-5,
    method: str = "count",
) -> jnp.ndarray:
    """Inverse-CDF sampling from a piecewise-constant pdf. (N, K)."""
    n_rays, m = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, M+1)

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype), (n_rays, n_importance))
    else:
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=bins.dtype)

    inds = _count_le(cdf, u, method)  # (N, K)
    below = jnp.clip(inds - 1, 0, None)
    above = jnp.clip(inds, None, m)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bins_lo = jnp.take_along_axis(bins, below, axis=-1)
    bins_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


def uniform_sampler_z_vals(key, bundle, n_samples: int, perturb: float = 1.0):
    return stratified_z_vals(key, bundle.near, bundle.far, n_samples, perturb)


def _reattach_affine_z(z_sg: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray) -> jnp.ndarray:
    """Re-attach (near, far) gradients to sampler output analytically.

    Every z the sampler emits — stratified-uniform, jittered, or
    inverse-CDF importance — is ``near + t * (far - near)`` where the
    fraction ``t`` does not depend on (near, far): stratified fractions are
    fixed by construction, and importance fractions come from the
    (stop-gradient) occupancy CDF over fixed fractional bins. So instead of
    differentiating through the sampler (the lax.sort transpose alone costs
    ~21 ms/step at the flagship shape, scripts/bench_pose_parts.py), the
    whole sampler runs under stop_gradient and the exact affine gradient is
    restored here for two reductions' worth of backward work.

    Deliberate deviation from the reference: the affine gradient is
    re-attached to ALL emitted z values, including the importance-sampled
    half that the reference fully detaches
    (``src/models/ray_sampling.py:86-92`` returns sampled z under
    no-grad). The gradient here is exact *conditional on the frozen CDF*
    — the importance fractions t really are (near, far)-independent given
    the stop-gradient occupancy CDF — so this adds the true affine term
    the reference drops. Pose-convergence parity is held by the e2e
    tracking test (tests/test_slam_e2e.py ATE gate) and the joint-step
    benchmark; if parity ever degrades, reattach only through the
    stratified half's sort permutation.
    """
    span = far - near
    t = jax.lax.stop_gradient(z_sg - near[:, None]) / jax.lax.stop_gradient(
        jnp.where(jnp.abs(span) < 1e-12, 1.0, span)
    )[:, None]
    return near[:, None] + t * span[:, None]


def occ_grid_sampler_z_vals(
    key: jax.Array,
    bundle,
    occ_grid: jnp.ndarray,
    n_samples: int,
    perturb: float = 1.0,
) -> jnp.ndarray:
    """Half stratified-uniform, half importance-sampled from the occupancy
    grid, sorted-merged (``OccGridRaySampler.get_samples``,
    ``src/models/ray_sampling.py:53-92``). (N, n_samples).

    The sampler body is non-differentiable (see ``_reattach_affine_z``);
    (near, far) — and through them the poses — get their exact gradients
    re-attached on the way out.
    """
    near = bundle.near
    far = bundle.far
    k_unif, k_pdf = jax.random.split(key)
    half = n_samples // 2

    near_sg = jax.lax.stop_gradient(near)
    far_sg = jax.lax.stop_gradient(far)
    origins_sg = jax.lax.stop_gradient(bundle.origins)
    dirs_sg = jax.lax.stop_gradient(bundle.directions)

    z = stratified_z_vals(k_unif, near_sg, far_sg, half, perturb)

    # transposed points (3, N, half): component axis leading, batch minor
    pts_t = origins_sg.T[:, :, None] + dirs_sg.T[:, :, None] * z[None, :, :]
    probs = occupancy_probs_t(occ_grid, pts_t)  # (N, half)

    mids = 0.5 * (z[:, :-1] + z[:, 1:])  # (N, half-1)
    if jax.default_backend() == "tpu":
        from loner_tpu.ops.pdf_kernel import sample_pdf_pallas

        z_imp = sample_pdf_pallas(k_pdf, mids, probs[:, 1:-1], half, det=False)
    else:
        z_imp = sample_pdf(k_pdf, mids, probs[:, 1:-1], half, det=False)

    z_sorted = jnp.sort(jnp.concatenate([z, z_imp], axis=-1), axis=-1)
    return _reattach_affine_z(jax.lax.stop_gradient(z_sorted), near, far)
