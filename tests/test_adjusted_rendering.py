"""Golden tests for the FDT "adjusted" rendering strategy: the vectorized
static-shape implementation must match a literal per-ray transcription of
the reference's rise-delta peak detection with prominence/isolation tests
(``/root/reference/src/models/rendering_tcnn.py:70-214``; the reference's
chained-advanced-indexing writes are silent no-ops — the transcription
implements the documented intent, like our implementation)."""
import jax.numpy as jnp
import numpy as np

from loner_tpu.models.rendering import composite_peak_adjusted, composite_t


def _reference_adjusted_depth(sigmas, z_vals, rays_d):
    """Per-ray python transcription of raw2outputs_adjusted's depth logic."""
    n, s = sigmas.shape
    deltas = np.concatenate([z_vals[:, 1:] - z_vals[:, :-1], np.full((n, 1), 1e10)], axis=1)
    deltas = deltas * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    alphas = 1 - np.exp(-deltas * np.maximum(sigmas, 0.0))
    shifted = np.concatenate([np.ones((n, 1)), 1 - alphas + 1e-10], axis=1)
    T = np.cumprod(shifted, axis=1)[:, :-1]
    T_shift = np.concatenate([np.ones((n, 1)), T[:, :-1]], axis=1)

    depths = np.zeros(n)
    for r in range(n):
        def cross(th):
            m = np.logical_and(~(T[r] > th), T_shift[r] > th)
            if not m.any():
                return 0.0, 0, False
            i = int(np.argmax(m))
            return float(z_vals[r, i]), i, True

        d_term, _, valid = cross(0.5)
        if not valid:
            continue
        ths = (0.9, 0.8, 0.7, 0.6, 0.501)
        ds, idxs = [], []
        for th in ths:
            d, i, _ = cross(th)
            ds.append(d)
            idxs.append(i)
        ds = np.asarray(ds)
        rise = ds[1:] - ds[:-1]
        norm_rise = rise / (ds[-1] + 1e-10)
        order = np.argsort(norm_rise, kind="stable")
        i1, i2 = int(order[0]), int(order[1])
        m1, m2 = norm_rise[i1], norm_rise[i2]
        steep_depth = z_vals[r, idxs[i1]]

        depth = d_term
        iso = abs(i2 - i1)
        # 0/0 -> nan, nan comparisons False (IEEE, like torch): a sharp
        # wall with all-zero rises is neither resampled nor dropped
        with np.errstate(invalid="ignore", divide="ignore"):
            prom_hi = m1 / abs(m1 + m2) > 0.45
            prom_lo = m1 / norm_rise.mean() < 0.35
        if iso == 1 or prom_hi:
            depth = steep_depth
        if iso == 3 or prom_lo:
            depth = 0.0
        depths[r] = depth
    return depths


def _run(sigmas, z_vals):
    n = sigmas.shape[0]
    rays_d = np.tile(np.array([[1.0, 0.0, 0.0]]), (n, 1))
    raw_t = jnp.asarray(sigmas)[None]  # (1, N, S)
    _, depth, weights, opacity, variance = composite_peak_adjusted(
        raw_t, jnp.asarray(z_vals), jnp.asarray(rays_d), sigma_only=True
    )
    want = _reference_adjusted_depth(sigmas, z_vals, rays_d)
    return np.asarray(depth), want, np.asarray(opacity)


class TestAdjustedRendering:
    def test_sharp_single_peak_terminates_at_peak(self):
        """A wall at z=10: depth lands on the first sample past the wall."""
        s = 64
        z = np.tile(np.linspace(1.0, 20.0, s), (1, 1))
        sigmas = np.zeros((1, s))
        sigmas[0, z[0] >= 10.0] = 50.0
        got, want, _ = _run(sigmas, z)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert abs(got[0] - 10.0) < 0.5

    def test_empty_ray_is_invalid(self):
        s = 64
        z = np.tile(np.linspace(1.0, 20.0, s), (1, 1))
        sigmas = np.zeros((1, s))
        got, want, _ = _run(sigmas, z)
        assert got[0] == 0.0 and want[0] == 0.0

    def test_random_multi_peak_profiles_match_reference(self):
        """Random foliage-like multi-peak sigma profiles: the vectorized
        implementation matches the per-ray transcription exactly."""
        rng = np.random.default_rng(3)
        n, s = 256, 96
        z = np.sort(rng.uniform(1.0, 30.0, size=(n, s)), axis=1)
        sigmas = np.zeros((n, s))
        for r in range(n):
            for _ in range(rng.integers(0, 4)):
                c = rng.uniform(2.0, 28.0)
                w = rng.uniform(0.1, 2.0)
                a = rng.uniform(0.1, 30.0)
                sigmas[r] += a * np.exp(-0.5 * ((z[r] - c) / w) ** 2)
        got, want, _ = _run(sigmas, z)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_weights_opacity_match_default_compositing(self):
        """Adjusted only changes depth: weights/opacity equal composite_t."""
        rng = np.random.default_rng(1)
        n, s = 32, 48
        z = np.tile(np.linspace(1.0, 20.0, s), (n, 1))
        sigmas = rng.uniform(0.0, 5.0, size=(n, s))
        rays_d = np.tile(np.array([[1.0, 0.0, 0.0]]), (n, 1))
        raw_t = jnp.asarray(sigmas)[None]
        _, _, w_adj, op_adj, _ = composite_peak_adjusted(
            raw_t, jnp.asarray(z), jnp.asarray(rays_d), sigma_only=True
        )
        _, _, w_def, op_def, _ = composite_t(
            raw_t, jnp.asarray(z), jnp.asarray(rays_d), sigma_only=True
        )
        np.testing.assert_allclose(np.asarray(w_adj), np.asarray(w_def), atol=1e-6)
        np.testing.assert_allclose(np.asarray(op_adj), np.asarray(op_def), atol=1e-6)
