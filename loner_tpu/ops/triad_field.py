"""TriadField: a TPU-native positional encoding with (almost) no random
memory access.

Honest (fetch-forced) v5e measurements killed the multi-level hash-grid: a
single 2.36M-row XLA gather costs ~12 ns/row (~28 ms), so Instant-NGP's 16
per-(point, level) lookups are ~450 ms/step — random access is the one
thing this hardware cannot do fast (no SparseCore on v5e; Mosaic's lane
dynamic-gather reaches only 128 entries). The TPU-shaped replacement
composes three parts whose gradients are dense or tiny:

  1. CP feature lines (TensoRF-CP style): per level l and axis a, a line
     ``L_{l,a} (res_l, F)``; the level's feature vector is the elementwise
     product of the three linearly-interpolated axis vectors. Lookups and
     gradients are expressible as two-hot interpolation MATMULS (MXU) and
     the tables are KBs — no scatter anywhere. Carries the coarse/smooth
     structure (res <= 128).
  2. Fourier features sin/cos(2^j pi p) — pure VPU, unlimited spatial
     frequency, carries fine detail globally.
  3. (optional) a SINGLE fat-row hash level (the one affordable random
     access per point) for localized fine detail, reusing
     ops/fused_encoder.py with n_levels=1.

Plays tcnn's HashGrid role in the reference (``src/models/nerf_tcnn.py:
35-56``); capability parity is judged by the same L1-depth benchmark, not
by structural equivalence.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TriadConfig(NamedTuple):
    cp_resolutions: Tuple[int, ...] = (16, 32, 64, 128)
    cp_features: int = 16
    fourier_freqs: int = 6  # per axis: sin+cos of 2^j pi p, j < fourier_freqs
    # 0 disables the hash term. DEFAULT 0 since r5: the flagship held-out-L1
    # experiment (ENCODER_EXP_r05.json, reference FDT protocol + its 1.05 m
    # gate) measured hash-off at 1.002 m vs hash-on 1.027 m — the fat row
    # buys no quality here and its 2.36M-row gather costs ~24 ms/step on
    # v5e (BASELINE.md). Set 1 for the fat-row level (e.g. for maps larger
    # than this benchmark's; it TP-shards over the mesh, parallel/tp.py).
    hash_levels: int = 0
    hash_base_resolution: int = 512
    hash_per_level_scale: float = 2.0
    hash_log2_cells: int = 16
    hash_bwd: str = "strided"
    # with a single hash level the strided backward has no level axis to
    # thin by, so the keep-stride carries the whole row reduction
    hash_bwd_stride: int = 8
    # bf16 features per corner: gather cost is flat in row width up to 64
    # f32 words on v5e (scripts/bench_honest.py), so fat rows are free
    hash_features: int = 16
    hash_save_residual: bool = True  # VJP residual vs re-gather (fused_encoder)
    # CP kernel matmul mode: "f32" (HIGHEST precision, the rtol=1e-5
    # equivalence-tested path) | "bf16" (MXU-native
    # rate; requires the measured L1 justification in ENCODER_EXP_*.json)
    cp_dtype: str = "f32"

    @property
    def output_dim(self) -> int:
        d = len(self.cp_resolutions) * self.cp_features
        d += 2 * 3 * self.fourier_freqs
        d += self.hash_features * self.hash_levels
        return d

    def hash_config(self, slot_period: int = 512):
        from loner_tpu.ops.fused_encoder import FusedHashConfig

        return FusedHashConfig(
            n_levels=self.hash_levels,
            log2_cells=self.hash_log2_cells,
            base_resolution=self.hash_base_resolution,
            per_level_scale=self.hash_per_level_scale,
            bwd=self.hash_bwd,
            bwd_stride=self.hash_bwd_stride,
            slot_period=slot_period,
            n_features=self.hash_features,
            save_residual=self.hash_save_residual,
        )


def init_triad(key: jax.Array, cfg: TriadConfig, dtype=jnp.float32) -> dict:
    k_cp, k_hash = jax.random.split(key)
    params = {}
    if len(cfg.cp_resolutions) > 0:
        from loner_tpu.ops.cp_kernel import init_cp_lines

        params["cp"] = init_cp_lines(k_cp, cfg.cp_resolutions, cfg.cp_features, dtype)
    if cfg.hash_levels > 0:
        from loner_tpu.ops.fused_encoder import init_fused_table

        params["hash"] = init_fused_table(k_hash, cfg.hash_config(), dtype)
    return params


def triad_out_dim(cfg: TriadConfig) -> int:
    return cfg.output_dim


def fourier_encode_t(pts_t: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """(2*3*J, N) sin/cos(2^j pi p) with p = 2x-1 in [-1,1]."""
    p = 2.0 * pts_t - 1.0  # (3, N)
    outs = []
    for j in range(n_freqs):
        arg = p * (np.pi * (2.0**j))
        outs.append(jnp.sin(arg))
        outs.append(jnp.cos(arg))
    return jnp.concatenate(outs, axis=0)


def triad_encode_t(
    params: dict,
    pts_t: jnp.ndarray,  # (3, N) in [0, 1]
    cfg: TriadConfig,
    key: Optional[jax.Array] = None,
    slot_period: int = 512,
) -> jnp.ndarray:
    """(output_dim, N) features."""
    feats = []
    if len(cfg.cp_resolutions) > 0:
        from loner_tpu.ops.cp_kernel import cp_encode_t

        feats.append(
            cp_encode_t(
                params["cp"], pts_t, cfg.cp_resolutions, cfg.cp_features, cfg.cp_dtype
            )
        )
    if cfg.fourier_freqs > 0:
        feats.append(fourier_encode_t(pts_t, cfg.fourier_freqs))
    if cfg.hash_levels > 0:
        from loner_tpu.ops.fused_encoder import fused_hash_encode_t

        feats.append(
            fused_hash_encode_t(params["hash"], pts_t, cfg.hash_config(slot_period), key)
        )
    return jnp.concatenate(feats, axis=0)
