"""Real spherical-harmonics direction encoding (degree <= 4).

Plays tcnn's ``SphericalHarmonics`` role for view dependence
(``dir_encoding_intensity`` in ``cfg/nerf_config/default_nerf_hash.yaml``,
degree 4 -> 16 coefficients). Takes unit direction vectors directly (the
reference passes (dir+1)/2 because tcnn rescales internally; we skip the
round-trip).
"""
from __future__ import annotations

import jax.numpy as jnp


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """dirs: (N, 3) unit vectors -> (N, degree**2) SH basis values."""
    assert 1 <= degree <= 4
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            -0.59004358992664352 * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def sh_encode_t(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Transposed variant: (N, 3) unit dirs -> (degree**2, N) with the point
    axis minor (no lane padding on TPU)."""
    return jnp.moveaxis(sh_encode(dirs, degree), -1, 0)
