"""Packed/custom-VJP hash encoder vs the reference jnp implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.models.hash_encoding import HashEncodingConfig, hash_encode_t, init_hash_table
from loner_tpu.ops.hash_encode_fast import hash_encode_packed_t


@pytest.fixture(scope="module")
def setup():
    cfg = HashEncodingConfig(n_levels=6, log2_hashmap_size=12)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, cfg) * 1e4  # ~U[-1,1] so bf16 error is relative
    pts_t = jax.random.uniform(jax.random.PRNGKey(1), (3, 513))
    return cfg, table, pts_t


class TestPackedForward:
    def test_matches_reference_within_bf16(self, setup):
        cfg, table, pts_t = setup
        ref = hash_encode_t(table, pts_t, cfg)
        fast = hash_encode_packed_t(table, pts_t, cfg, None)
        assert fast.shape == ref.shape
        # bf16 has ~3 decimal digits
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-2, rtol=2e-2)

    def test_jittable(self, setup):
        cfg, table, pts_t = setup
        out = jax.jit(lambda t, p: hash_encode_packed_t(t, p, cfg, None))(table, pts_t)
        assert np.isfinite(np.asarray(out)).all()


class TestPackedBackward:
    def test_table_grad_matches_reference(self, setup):
        cfg, table, pts_t = setup

        def loss_ref(t):
            return jnp.sum(jnp.sin(hash_encode_t(t, pts_t, cfg)))

        def loss_fast(t):
            return jnp.sum(jnp.sin(hash_encode_packed_t(t, pts_t, cfg, None)))

        g_ref = jax.grad(loss_ref)(table)
        g_fast = jax.grad(loss_fast)(table)
        # compare on the entries that received gradient
        mask = np.abs(np.asarray(g_ref)) > 1e-6
        np.testing.assert_allclose(
            np.asarray(g_fast)[mask], np.asarray(g_ref)[mask], atol=5e-2, rtol=5e-2
        )

    def test_point_grad_matches_reference(self, setup):
        cfg, table, pts_t = setup

        def loss_ref(p):
            return jnp.sum(jnp.sin(hash_encode_t(table, p, cfg)))

        def loss_fast(p):
            return jnp.sum(jnp.sin(hash_encode_packed_t(table, p, cfg, None)))

        g_ref = np.asarray(jax.grad(loss_ref)(pts_t))
        g_fast = np.asarray(jax.grad(loss_fast)(pts_t))
        denom = np.abs(g_ref).max() + 1e-6
        np.testing.assert_allclose(g_fast / denom, g_ref / denom, atol=5e-2)


class TestStochasticBackward:
    def test_forward_unchanged_by_bwd_key(self, setup):
        cfg, table, pts_t = setup
        a = hash_encode_packed_t(table, pts_t, cfg, None)
        b = hash_encode_packed_t(table, pts_t, cfg, jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_table_grad_unbiased(self, setup):
        cfg, table, pts_t = setup

        def loss(t, key):
            return jnp.sum(hash_encode_packed_t(t, pts_t, cfg, key) ** 2)

        g_exact = np.asarray(jax.grad(lambda t: loss(t, None))(table))
        acc = np.zeros_like(g_exact)
        k = 64
        gf = jax.jit(jax.grad(loss))
        for i in range(k):
            acc += np.asarray(gf(table, jax.random.PRNGKey(i)))
        mean = acc / k
        denom = np.abs(g_exact).max() + 1e-9
        # expectation matches the exact scatter (normalized comparison)
        mask = np.abs(g_exact) > denom * 0.05
        rel_err = np.abs(mean[mask] - g_exact[mask]) / denom
        assert np.median(rel_err) < 0.15, float(np.median(rel_err))
