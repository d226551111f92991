"""CP two-hot matmul kernel: Pallas (interpret mode) vs jnp reference, and
VJP correctness of the hand-written backward against jax.vjp of the
reference. Covers the CP term of TriadField (ops/triad_field.py), the TPU
replacement for the reference's tcnn HashGrid (src/models/nerf_tcnn.py:35-56)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from loner_tpu.ops.cp_kernel import (
    _bwd_pallas,
    _fwd_pallas,
    cp_encode_ref,
    cp_encode_t,
    init_cp_lines,
)

RES = (16, 32, 64, 128)
F = 16


def _setup(n=717):
    key = jax.random.PRNGKey(0)
    lines = init_cp_lines(key, RES, F)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (3, n), minval=0.0, maxval=1.0)
    # include exact boundary points
    pts = pts.at[:, 0].set(0.0).at[:, 1].set(1.0)
    return lines, pts


def test_fwd_pallas_matches_ref():
    lines, pts = _setup()
    ref = cp_encode_ref(lines, pts, RES)
    with pltpu.force_tpu_interpret_mode():
        out = _fwd_pallas(lines, pts, RES, F)
    assert out.shape == (len(RES) * F, pts.shape[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_bwd_pallas_matches_vjp_of_ref():
    lines, pts = _setup(n=333)
    g = jax.random.normal(jax.random.PRNGKey(2), (len(RES) * F, pts.shape[-1]))
    _, vjp = jax.vjp(lambda l, p: cp_encode_ref(l, p, RES), lines, pts)
    dl_ref, dp_ref = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        dl_k, dp_k = _bwd_pallas(lines, pts, g, RES, F)
    np.testing.assert_allclose(np.asarray(dl_k), np.asarray(dl_ref), rtol=1e-4, atol=1e-4)
    # dpts: the reference clips at cell boundaries identically except at the
    # exact 0/1 boundary points (indices 0, 1) where the kernel zeroes the
    # derivative through the clip
    np.testing.assert_allclose(
        np.asarray(dp_k[:, 2:]), np.asarray(dp_ref[:, 2:]), rtol=2e-3, atol=5e-4
    )


def test_custom_vjp_grads_flow_cpu_path():
    lines, pts = _setup(n=64)

    def loss(l, p):
        return jnp.sum(cp_encode_t(l, p, RES, F) ** 2)

    gl, gp = jax.grad(loss, argnums=(0, 1))(lines, pts)
    assert float(jnp.sum(jnp.abs(gl))) > 0
    assert float(jnp.sum(jnp.abs(gp))) > 0
    # padded tail rows of each line never receive gradient
    for lvl, res in enumerate(RES):
        for a in range(3):
            tail = gl[3 * lvl + a, :, res:]
            assert float(jnp.sum(jnp.abs(tail))) == 0.0


def test_padded_rows_unused():
    lines, pts = _setup(n=64)
    poisoned = lines.at[:, :, RES[-1] :].set(1e6)
    # levels with res < 128 have poisoned rows inside [res, 128) too
    for lvl, res in enumerate(RES):
        for a in range(3):
            poisoned = poisoned.at[3 * lvl + a, :, res:].set(1e6)
    ref = cp_encode_ref(lines, pts, RES)
    out = cp_encode_ref(poisoned, pts, RES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
