"""CP feature-line interpolation as two-hot MXU matmuls (Pallas TPU).

The CP term of TriadField (ops/triad_field.py) evaluates, per level l and
axis a, a 1-D linear interpolation into a feature line ``L_{l,a} (R_l, F)``
at 2.36M points/step. Expressed as gathers this costs ~157 ms/step on v5e
(measured, /tmp/triad_tpu.log protocol: XLA keeps nothing fused around a
gather and the (N, F) temporaries round-trip HBM). Expressed as a matmul it
is almost free: interpolation = ``W @ L`` where ``W (N, R)`` is the TWO-HOT
weight matrix (1-f at i0, f at i0+1). W is never materialized in HBM — each
kernel program builds its (c, 128) slice in VMEM from an iota comparison
and feeds the MXU directly. Gradients are the same shape of matmul:

    dL = W^T @ (g * feat_b * feat_c)        (128, c) x (c, F)
    dx = sum_F[(g * feat_b * feat_c) * (L^T @ dW/dx)] * (R-1)

so the CP term has NO random memory access in either direction — the one
property v5e rewards (SURVEY.md §7.3 "hash-grid scatter-add backward").

Line layout: lines_t ``(3*L, F, 128)`` f32, level-major ([lvl0_x, lvl0_y,
lvl0_z, lvl1_x, ...]), rows padded to 128 (resolutions must be <= 128;
unused tail rows stay zero and receive zero gradient). Weights live on the
128-lane axis so no transposes appear anywhere in the hot path.

Plays part of tcnn HashGrid's role from the reference
(``src/models/nerf_tcnn.py:35-56``); capability parity is judged on the
L1-depth benchmark (tests/test_cp_kernel.py + scripts/bench_honest.py).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP_PAD_R = 128  # padded line length; = one TPU lane register row


def _chunk() -> int:
    """Points per kernel program. The f32(HIGHEST) path holds ~2x the VMEM
    of bf16 (w/dw/gother slices at full width + bf16x3 pass buffers) and
    overflows the 16 MB scoped-vmem limit at 2048."""
    return 1024 if _MATMUL_DTYPE == jnp.float32 else 2048

# Operand dtype for the kernel matmuls. f32 is the default: it is the path the
# equivalence tests (tests/test_cp_kernel.py) hold to rtol=1e-5 against the
# gather reference. bf16 runs the MXU at native rate but quantizes W and the
# lines to ~2^-9 relative; enabling it requires a measured L1-quality
# justification (scripts/exp_encoder_flagship.py), not just a speedup.
_MATMUL_DTYPE = jnp.float32


def set_cp_matmul_dtype(dtype) -> None:
    """Set the operand dtype for the Pallas CP matmuls (f32 or bf16)."""
    global _MATMUL_DTYPE
    _MATMUL_DTYPE = dtype


def _mm_precision():
    # TPU MXU default precision multiplies f32 operands as bf16; the f32
    # path must request HIGHEST (bf16x3 passes) to actually hold the
    # rtol=1e-5 equivalence bar. bf16 operands take the native rate.
    return (
        jax.lax.Precision.HIGHEST
        if _MATMUL_DTYPE == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def init_cp_lines(
    key: jax.Array, resolutions: Tuple[int, ...], n_features: int, dtype=jnp.float32
) -> jnp.ndarray:
    """(3L, F, 128) f32 lines_t; active rows ~ 1 + 0.1*N(0,1) (TensoRF-style
    multiplicative init: products of three axis values start near 1), padded
    rows zero."""
    nl = len(resolutions)
    ks = jax.random.split(key, 3 * nl)
    lines = np.zeros((3 * nl, n_features, CP_PAD_R), np.float32)
    out = jnp.asarray(lines, dtype)
    for i, res in enumerate(np.repeat(resolutions, 3)):
        if res > CP_PAD_R:
            raise ValueError(f"cp resolution {res} > {CP_PAD_R}")
        vals = 1.0 + 0.1 * jax.random.normal(ks[i], (n_features, int(res)), dtype)
        out = out.at[i, :, : int(res)].set(vals)
    return out


# ---------------------------------------------------------------------------
# jnp reference (CPU path / kernel equivalence tests)
# ---------------------------------------------------------------------------


def _axis_iwf(x: jnp.ndarray, res: int):
    """x (N,) in [0,1] -> (i0 int32, f frac) for an res-row line."""
    pix = jnp.clip(x, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(pix).astype(jnp.int32), 0, res - 2)
    f = pix - i0.astype(pix.dtype)
    return i0, f


def cp_encode_ref(
    lines_t: jnp.ndarray, pts_t: jnp.ndarray, resolutions: Tuple[int, ...]
) -> jnp.ndarray:
    """(L*F, N) reference via gathers; differentiable (used for CPU and as
    the VJP oracle in tests)."""
    outs = []
    for lvl, res in enumerate(resolutions):
        feats = []
        for a in range(3):
            line = lines_t[3 * lvl + a]  # (F, 128)
            i0, f = _axis_iwf(pts_t[a], int(res))
            v0 = line[:, i0]  # (F, N)
            v1 = line[:, i0 + 1]
            feats.append(v0 * (1.0 - f)[None, :] + v1 * f[None, :])
        outs.append(feats[0] * feats[1] * feats[2])  # (F, N)
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _build_w(x: jnp.ndarray, res: int, c: int) -> jnp.ndarray:
    """x (c,) in [0,1] -> two-hot W (128, c) f32."""
    pix = jnp.clip(x, 0.0, 1.0) * (res - 1)
    # two-hot interpolation weights ARE the triangle hat function: one
    # |sub| + relu instead of two iota compares + selects (W build is the
    # VPU-bound part of this kernel)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CP_PAD_R, c), 0).astype(jnp.float32)
    return jax.nn.relu(1.0 - jnp.abs(rows - pix[None, :]))


def _build_dw(x: jnp.ndarray, res: int, c: int) -> jnp.ndarray:
    """dW/dx (128, c): (onehot(i0+1) - onehot(i0)) * (res-1), zero outside
    the clip range."""
    pix = jnp.clip(x, 0.0, 1.0) * (res - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CP_PAD_R, c), 0).astype(jnp.float32)
    d = rows - pix[None, :]
    live = ((x > 0.0) & (x < 1.0)).astype(jnp.float32)[None, :] * jnp.float32(res - 1)
    # dW/dpix under floor semantics: -1 at row i0 (d in (-1, 0]), +1 at row
    # i0+1 (d in (0, 1]). Half-open masks so grid-aligned pix (d == 0 / 1)
    # still gets the two-hot -1/+1 pair the gather reference produces.
    dw = jnp.where((d > -1.0) & (d <= 0.0), -1.0, 0.0) + jnp.where(
        (d > 0.0) & (d <= 1.0), 1.0, 0.0
    )
    return dw * live


def _fwd_kernel(pts_ref, lines_ref, out_ref, *, resolutions, n_features):
    pts = pts_ref[:]  # (3, c)
    c = pts.shape[-1]
    f_dim = n_features
    for lvl, res in enumerate(resolutions):
        feats = []
        for a in range(3):
            # W built in f32 (pix needs the mantissa); operand dtype for the
            # matmul is the module flag (f32 default, see set_cp_matmul_dtype)
            w = _build_w(pts[a], int(res), c).astype(_MATMUL_DTYPE)  # (128, c)
            feats.append(
                jnp.dot(
                    lines_ref[3 * lvl + a].astype(_MATMUL_DTYPE),
                    w,
                    preferred_element_type=jnp.float32,
                    precision=_mm_precision(),
                )
            )  # (F, c)
        out_ref[lvl * f_dim : (lvl + 1) * f_dim, :] = feats[0] * feats[1] * feats[2]


def _bwd_kernel(
    pts_ref, lines_ref, g_ref, dlines_ref, dpts_ref, *, resolutions, n_features
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        dlines_ref[...] = jnp.zeros_like(dlines_ref)

    pts = pts_ref[:]  # (3, c)
    c = pts.shape[-1]
    f_dim = n_features
    dxyz = [jnp.zeros((c,), jnp.float32) for _ in range(3)]
    for lvl, res in enumerate(resolutions):
        gl = g_ref[lvl * f_dim : (lvl + 1) * f_dim, :]  # (F, c)
        line_bf = [lines_ref[3 * lvl + a].astype(_MATMUL_DTYPE) for a in range(3)]
        ws = [_build_w(pts[a], int(res), c).astype(_MATMUL_DTYPE) for a in range(3)]
        feats = [
            jnp.dot(
                line_bf[a],
                ws[a],
                preferred_element_type=jnp.float32,
                precision=_mm_precision(),
            )
            for a in range(3)
        ]
        for a in range(3):
            gother = gl * feats[(a + 1) % 3] * feats[(a + 2) % 3]  # (F, c)
            # dL (F, 128) = gother (F, c) @ W^T — contract the c axes
            dl = jax.lax.dot_general(
                gother.astype(_MATMUL_DTYPE),
                ws[a],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(),
            )
            dlines_ref[3 * lvl + a] = dlines_ref[3 * lvl + a] + dl
            dw = _build_dw(pts[a], int(res), c).astype(_MATMUL_DTYPE)  # (128, c)
            diff = jnp.dot(
                line_bf[a], dw, preferred_element_type=jnp.float32,
                precision=_mm_precision(),
            )  # (F, c)
            dxyz[a] = dxyz[a] + jnp.sum(gother * diff, axis=0)
    dpts_ref[0, :] = dxyz[0]
    dpts_ref[1, :] = dxyz[1]
    dpts_ref[2, :] = dxyz[2]


def _pad_pts(pts_t: jnp.ndarray):
    n = pts_t.shape[-1]
    c = min(_chunk(), ((n + 127) // 128) * 128)
    pad = (-n) % c
    if pad:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, pad)))
    return pts_t, n, c


def _fwd_pallas(lines_t, pts_t, resolutions, n_features):
    pts_p, n, c = _pad_pts(pts_t)
    np_ = pts_p.shape[-1]
    nl = len(resolutions)
    out = pl.pallas_call(
        partial(_fwd_kernel, resolutions=resolutions, n_features=n_features),
        grid=(np_ // c,),
        in_specs=[
            pl.BlockSpec((3, c), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3 * nl, n_features, CP_PAD_R),
                lambda j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nl * n_features, c), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nl * n_features, np_), jnp.float32),
    )(pts_p, lines_t)
    return out[:, :n]


def _bwd_pallas(lines_t, pts_t, g, resolutions, n_features):
    pts_p, n, c = _pad_pts(pts_t)
    np_ = pts_p.shape[-1]
    nl = len(resolutions)
    g_p = jnp.pad(g, ((0, 0), (0, np_ - n))) if np_ != n else g
    dlines, dpts = pl.pallas_call(
        partial(_bwd_kernel, resolutions=resolutions, n_features=n_features),
        grid=(np_ // c,),
        in_specs=[
            pl.BlockSpec((3, c), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3 * nl, n_features, CP_PAD_R),
                lambda j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((nl * n_features, c), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (3 * nl, n_features, CP_PAD_R),
                lambda j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, c), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3 * nl, n_features, CP_PAD_R), jnp.float32),
            jax.ShapeDtypeStruct((3, np_), jnp.float32),
        ],
    )(pts_p, lines_t, g_p)
    return dlines, dpts[:, :n]


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# custom-VJP encode
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cp_encode_t(lines_t, pts_t, resolutions: Tuple[int, ...], n_features: int):
    """(L*F, N) CP features of pts_t (3, N) in [0, 1]."""
    out, _ = _cp_fwd(lines_t, pts_t, resolutions, n_features)
    return out


def _cp_fwd(lines_t, pts_t, resolutions, n_features):
    if _use_pallas():
        out = _fwd_pallas(lines_t, pts_t, resolutions, n_features)
    else:
        out = cp_encode_ref(lines_t, pts_t, resolutions)
    return out, (lines_t, pts_t)


def _cp_bwd(resolutions, n_features, resids, g):
    lines_t, pts_t = resids
    if _use_pallas():
        return _bwd_pallas(lines_t, pts_t, g, resolutions, n_features)
    _, vjp = jax.vjp(lambda l, p: cp_encode_ref(l, p, resolutions), lines_t, pts_t)
    return vjp(g)


cp_encode_t.defvjp(_cp_fwd, _cp_bwd)
