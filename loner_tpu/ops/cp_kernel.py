"""CP feature-line interpolation via Mosaic lane dynamic-gather (Pallas TPU).

The CP term of TriadField (ops/triad_field.py) evaluates, per level l and
axis a, a 1-D linear interpolation into a feature line ``L_{l,a} (R_l, F)``
at 2.36M points/step. Expressed as XLA gathers this costs ~157 ms/step on
v5e (XLA keeps nothing fused around a gather and the (N, F) temporaries
round-trip HBM). Inside the kernel, the lines are VMEM-resident (F, 128)
tiles, so Mosaic's ``tpu.dynamic_gather`` (the lane-axis take_along_axis
with index tile shape == operand tile shape) makes the lookup a register
operation:

  * forward: v0/v1 lane-gathers + lerp, EXACT f32 — no weight matrix, no
    matmul, no quantization (the round-3 two-hot-matmul form paid a W-build
    on the VPU plus an MXU pass per axis-level, 2-3x this cost, and forced
    a bf16-vs-HIGHEST precision tradeoff this form does not have).
  * backward dx: regather v0/v1; d feat / d pix = (v1 - v0) * (R-1), exact.
  * backward dL: the one place the two-hot weight matrix W (1-f at i0, f at
    i0+1) is still built: dL = (g * feat_b * feat_c) @ W^T on the MXU.
    ``mm`` selects its operand dtype; f32(HIGHEST) is the default (the
    rtol=1e-5 equivalence-tested path). NOTE the r4 "f32 == bf16 rate"
    A/B was invalid (ADVICE r04: the dtype knob was a no-op, f32 was
    compared against itself); the bf16 mode is functional but its step-rate
    benefit is unmeasured — rerun scripts/bench_ab.py --variants base,cp_bf16
    before citing one.

Gather group selection must be a SUBLANE slice (see _axis_lerp) — lane-axis
slicing of a wide index vector ahead of tpu.dynamic_gather crashes the
Mosaic compiler.

Line layout: lines_t ``(3*L, F, 128)`` f32, level-major ([lvl0_x, lvl0_y,
lvl0_z, lvl1_x, ...]), rows padded to 128 (resolutions must be <= 128;
unused tail rows stay zero and receive zero gradient).

Plays part of tcnn HashGrid's role from the reference
(``src/models/nerf_tcnn.py:35-56``); capability parity is judged on the
L1-depth benchmark (tests/test_cp_kernel.py + scripts/exp_encoder_flagship).
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


def _chunk(dtype) -> int:
    """Points per kernel program. The fwd holds no W at all (gather-lerp);
    the bwd materializes one (128, c) W slice at a time, so 2048 fits the
    scoped-vmem limit in either matmul dtype."""
    del dtype
    return 2048

def _resolve_mm(mm: str):
    """mm string -> (operand dtype, MXU precision) for the ONE remaining
    kernel matmul (the backward dL accumulation — fwd and dx are matmul-free
    gather-lerps, exact in f32). Configs pass an explicit mode so the choice
    lives in the jit cache key; the earlier mutable-global setter was removed
    (ADVICE r04: it was dead — triad_encode_t always passes cfg.cp_dtype).
    f32 requests HIGHEST (bf16x6 passes) to hold the rtol=1e-5 equivalence
    bar; bf16 takes the native MXU rate."""
    if mm == "f32":
        return jnp.float32, jax.lax.Precision.HIGHEST
    if mm == "bf16":
        return jnp.bfloat16, jax.lax.Precision.DEFAULT
    raise ValueError(f"unknown cp matmul mode {mm!r}")


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


def _axis_lerp(line, x2, res: int, n_features: int):
    """Exact 1-D interpolation of line (F, 128) at x2 (1, c) via Mosaic's
    lane dynamic-gather (idx shape == operand shape, one 128-lane group at a
    time) — no W matrix, no matmul, f32 throughout. Returns (feat (F, c),
    diff (F, c)) with diff = v1 - v0 (the exact d feat / d pix).

    Group selection must be a SUBLANE slice: indices are reshaped
    (1, c) -> (c/128, 128) first — lane-axis slicing of a wide index vector
    ahead of tpu.dynamic_gather crashes the Mosaic compiler (verified on
    libtpu 2026-08; the sublane-slice form compiles and is exact)."""
    c = x2.shape[-1]
    g_n = c // 128
    pix = jnp.clip(x2, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(pix).astype(jnp.int32), 0, res - 2)
    f = pix - i0.astype(jnp.float32)  # (1, c)
    i0g = i0.reshape(g_n, 128)
    fg = f.reshape(g_n, 128)
    feats, diffs = [], []
    for g in range(g_n):
        idx = jnp.broadcast_to(i0g[g : g + 1, :], (n_features, 128))
        v0 = jnp.take_along_axis(line, idx, axis=1)  # (F, 128)
        v1 = jnp.take_along_axis(line, idx + 1, axis=1)
        w = jnp.broadcast_to(fg[g : g + 1, :], (n_features, 128))
        feats.append(v0 + (v1 - v0) * w)
        diffs.append(v1 - v0)
    if len(feats) == 1:
        return feats[0], diffs[0]
    return jnp.concatenate(feats, axis=1), jnp.concatenate(diffs, axis=1)


def _fwd_kernel(pts_ref, lines_ref, out_ref, *, resolutions, n_features, mm_dtype, mm_prec):
    del mm_dtype, mm_prec  # fwd is exact: gather-lerp, no matmul anywhere
    pts = pts_ref[:]  # (3, c)
    f_dim = n_features
    for lvl, res in enumerate(resolutions):
        feats = [
            _axis_lerp(lines_ref[3 * lvl + a], pts[a : a + 1, :], int(res), f_dim)[0]
            for a in range(3)
        ]
        out_ref[lvl * f_dim : (lvl + 1) * f_dim, :] = feats[0] * feats[1] * feats[2]


def _bwd_kernel(
    pts_ref, lines_ref, g_ref, dlines_ref, dpts_ref, *, resolutions, n_features,
    mm_dtype, mm_prec,
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
        # exact regather-lerp (same primitive as fwd): feats + d feat / d pix
        fd = [
            _axis_lerp(lines_ref[3 * lvl + a], pts[a : a + 1, :], int(res), f_dim)
            for a in range(3)
        ]
        feats = [f for f, _ in fd]
        for a in range(3):
            res_f = jnp.float32(res - 1)
            live = (pts[a] > 0.0) & (pts[a] < 1.0)
            gother = gl * feats[(a + 1) % 3] * feats[(a + 2) % 3]  # (F, c)
            # dx: exact — gother . (v1 - v0) * (res-1), zero through the clip
            diff = fd[a][1]  # (F, c)
            dxa = jnp.sum(gother * diff, axis=0) * res_f
            dxyz[a] = dxyz[a] + jnp.where(live, dxa, 0.0)
            # dL (F, 128) = gother (F, c) @ W^T — the one place W (two-hot
            # interp weights) is still materialized; mm_dtype applies HERE
            # only (bf16 perturbs a gradient, never the function value)
            w = _build_w(pts[a], int(res), c).astype(mm_dtype)  # (128, c)
            dl = jax.lax.dot_general(
                gother.astype(mm_dtype),
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_prec,
            )
            dlines_ref[3 * lvl + a] = dlines_ref[3 * lvl + a] + dl
    dpts_ref[0, :] = dxyz[0]
    dpts_ref[1, :] = dxyz[1]
    dpts_ref[2, :] = dxyz[2]


def _pad_pts(pts_t: jnp.ndarray, mm_dtype):
    n = pts_t.shape[-1]
    c = min(_chunk(mm_dtype), ((n + 127) // 128) * 128)
    pad = (-n) % c
    if pad:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, pad)))
    return pts_t, n, c


def _fwd_pallas(lines_t, pts_t, resolutions, n_features, mm="f32"):
    mm_dtype, mm_prec = _resolve_mm(mm)
    pts_p, n, c = _pad_pts(pts_t, mm_dtype)
    np_ = pts_p.shape[-1]
    nl = len(resolutions)
    out = pl.pallas_call(
        partial(_fwd_kernel, resolutions=resolutions, n_features=n_features,
                mm_dtype=mm_dtype, mm_prec=mm_prec),
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


def _bwd_pallas(lines_t, pts_t, g, resolutions, n_features, mm="f32"):
    mm_dtype, mm_prec = _resolve_mm(mm)
    pts_p, n, c = _pad_pts(pts_t, mm_dtype)
    np_ = pts_p.shape[-1]
    nl = len(resolutions)
    g_p = jnp.pad(g, ((0, 0), (0, np_ - n))) if np_ != n else g
    dlines, dpts = pl.pallas_call(
        partial(_bwd_kernel, resolutions=resolutions, n_features=n_features,
                mm_dtype=mm_dtype, mm_prec=mm_prec),
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


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cp_encode_t(
    lines_t, pts_t, resolutions: Tuple[int, ...], n_features: int, mm: str = "f32"
):
    """(L*F, N) CP features of pts_t (3, N) in [0, 1]. ``mm`` selects the
    kernel matmul mode ("f32" | "bf16")."""
    out, _ = _cp_fwd(lines_t, pts_t, resolutions, n_features, mm)
    return out


def _cp_fwd(lines_t, pts_t, resolutions, n_features, mm="f32"):
    if _use_pallas():
        out = _fwd_pallas(lines_t, pts_t, resolutions, n_features, mm)
    else:
        out = cp_encode_ref(lines_t, pts_t, resolutions)
    return out, (lines_t, pts_t)


def _cp_bwd(resolutions, n_features, mm, resids, g):
    lines_t, pts_t = resids
    if _use_pallas():
        return _bwd_pallas(lines_t, pts_t, g, resolutions, n_features, mm)
    _, vjp = jax.vjp(lambda l, p: cp_encode_ref(l, p, resolutions), lines_t, pts_t)
    return vjp(g)


cp_encode_t.defvjp(_cp_fwd, _cp_bwd)
