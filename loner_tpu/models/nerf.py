"""Decoupled sigma/intensity neural field (the reference's ``DecoupledNeRF``,
``src/models/nerf_tcnn.py:20-96``), as pure functions over a parameter pytree.

  * sigma branch:      hash-encode(pos) -> MLP(64 x 1 hidden) -> 1 logit
  * intensity branch:  hash-encode(pos) [+ SH(viewdir)] -> MLP(64 x 4 hidden)
                       -> sigmoid -> num_colors

Positions arrive in world-cube coords [-1, 1]^3 and are mapped to [0, 1]^3 at
the input, like the reference's ``(pos+1)/2``. ``detach_sigma`` stops
gradients into the sigma branch when training intensity (the reference's
``no_grad`` path). Non-finite sigma is sanitized like the reference's clamp.

TPU layout: the core is *transposed* — features on leading axes, the point
axis minor (``query_sigma_t`` -> (N,), ``query_nerf_t`` -> (C+1, N)) so
nothing lane-pads; the untransposed wrappers exist for analysis-time use.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from loner_tpu.models.hash_encoding import HashEncodingConfig, hash_encode_t, init_hash_table
from loner_tpu.models.mlp import MLPConfig, init_mlp, mlp_apply_t
from loner_tpu.models.sh_encoding import sh_encode_t
from loner_tpu.ops.triad_field import TriadConfig


class NeRFConfig(NamedTuple):
    num_colors: int = 3
    enable_view_dependence: bool = True
    sh_degree: int = 4
    pos_encoding_sigma: HashEncodingConfig = HashEncodingConfig(log2_hashmap_size=18)
    pos_encoding_intensity: HashEncodingConfig = HashEncodingConfig(log2_hashmap_size=19)
    sigma_hidden_dim: int = 64
    sigma_hidden_layers: int = 1
    intensity_hidden_dim: int = 64
    intensity_hidden_layers: int = 4
    compute_dtype: str = "bfloat16"
    # "triad" = TriadField (ops/triad_field.py): CP feature lines + Fourier
    # features + at most ONE hash gather per point — the TPU default (honest
    # v5e numbers: each 2.36M-row gather costs ~28 ms, so per-level lookups
    # are unaffordable; since r5 the default triad runs gather-FREE —
    # hash_levels=0, quality-gated by ENCODER_EXP_r05.json). "fused" =
    # FusedHash per-level gathers + Pallas interp. "cell" = round-1
    # CellHash (jnp). "packed", "exact" = legacy.
    encoding_impl: str = "triad"
    # triad sub-config (used when encoding_impl == "triad"); the sigma
    # branch uses it as-is, the intensity branch reuses it with the hash
    # table sized by pos_encoding_intensity.log2_hashmap_size
    triad: TriadConfig = TriadConfig()
    # table-gradient strategy: "strided" = slot-strided level1 with
    # keep-stride (fused impl; compacted per-level scatters — the measured
    # scatter cost is ~15 ns per PROCESSED row, so rows must be few AND
    # contiguous); "level1" = jitter-hash level choice (cell impl);
    # "exact" = every (point, level) scatters.
    encoding_bwd: str = "strided"
    encoding_bwd_stride: int = 2  # fused/strided: keep every k-th slot group
    encoding_slot_period: int = 512  # fused/strided: samples per ray (S)
    # sequential point chunks for the per-point pipeline (HBM-temp bound);
    # 1 = single pass (fastest when the batch fits)
    point_chunks: int = 4

    def _triad_for(self, enc: HashEncodingConfig) -> TriadConfig:
        """Per-branch triad config: the hash table is sized from the
        branch's HashEncodingConfig so sigma/intensity keep distinct
        capacities like the reference (log2 18 vs 19)."""
        return self.triad._replace(hash_log2_cells=max(enc.log2_hashmap_size - 2, 8))

    def _encoding_dim(self, enc: HashEncodingConfig) -> int:
        if self.encoding_impl == "triad":
            return self._triad_for(enc).output_dim
        return enc.output_dim

    def sigma_mlp_config(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self._encoding_dim(self.pos_encoding_sigma),
            out_dim=1,
            hidden_dim=self.sigma_hidden_dim,
            n_hidden_layers=self.sigma_hidden_layers,
            compute_dtype=self.compute_dtype,
        )

    def intensity_mlp_config(self) -> MLPConfig:
        in_dim = self._encoding_dim(self.pos_encoding_intensity)
        if self.enable_view_dependence:
            in_dim += self.sh_degree**2
        return MLPConfig(
            in_dim=in_dim,
            out_dim=self.num_colors,
            hidden_dim=self.intensity_hidden_dim,
            n_hidden_layers=self.intensity_hidden_layers,
            compute_dtype=self.compute_dtype,
        )


def cell_config_from(enc: HashEncodingConfig, bwd: str = "exact") -> "CellHashConfig":
    """Capacity-comparable CellHash config: 2^log2 vertices x 2 features ->
    2^(log2-2) cells x 16 features."""
    from loner_tpu.ops.cell_hash import CellHashConfig

    return CellHashConfig(
        n_levels=enc.n_levels,
        log2_cells=max(enc.log2_hashmap_size - 2, 8),
        base_resolution=enc.base_resolution,
        per_level_scale=enc.per_level_scale,
        bwd=bwd,
    )


def fused_config_from(cfg: "NeRFConfig", enc: HashEncodingConfig) -> "FusedHashConfig":
    """Capacity-comparable FusedHash config: 2^log2 vertices x 2 features ->
    2^(log2-2) cells x 16 features (one row per cell)."""
    from loner_tpu.ops.fused_encoder import FusedHashConfig

    return FusedHashConfig(
        n_levels=enc.n_levels,
        log2_cells=max(enc.log2_hashmap_size - 2, 8),
        base_resolution=enc.base_resolution,
        per_level_scale=enc.per_level_scale,
        bwd="strided" if cfg.encoding_bwd == "strided" else "exact",
        bwd_stride=cfg.encoding_bwd_stride,
        slot_period=cfg.encoding_slot_period,
    )


def _init_table(key, cfg: "NeRFConfig", enc: HashEncodingConfig, impl: str):
    if impl == "triad":
        from loner_tpu.ops.triad_field import init_triad

        return init_triad(key, cfg._triad_for(enc))
    if impl == "fused":
        from loner_tpu.ops.fused_encoder import init_fused_table

        return init_fused_table(key, fused_config_from(cfg, enc))
    if impl == "cell":
        from loner_tpu.ops.cell_hash import init_cell_table

        return init_cell_table(key, cell_config_from(enc))
    return init_hash_table(key, enc)


def init_nerf(key: jax.Array, cfg: NeRFConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "sigma": {
            "table": _init_table(k1, cfg, cfg.pos_encoding_sigma, cfg.encoding_impl),
            "mlp": init_mlp(k2, cfg.sigma_mlp_config()),
        },
        "intensity": {
            "table": _init_table(k3, cfg, cfg.pos_encoding_intensity, cfg.encoding_impl),
            "mlp": init_mlp(k4, cfg.intensity_mlp_config()),
        },
    }


def _sanitize_sigma(sigma: jnp.ndarray) -> jnp.ndarray:
    """Reference clamps non-finite sigma (``nerf_tcnn.py:74-78``)."""
    big = jnp.float32(3.4e38)
    return jnp.nan_to_num(sigma, nan=0.0, posinf=big, neginf=-big)


def _encode_t(
    cfg: "NeRFConfig",
    table,
    pos_t,
    enc_cfg: HashEncodingConfig,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """``key`` drives the stochastic slot-rotation draw of the strided
    table backward; when None the encoder falls back to hashing coordinate
    mantissa bits (fragile with deterministic z-vals — training paths must
    plumb the step key through)."""
    impl = cfg.encoding_impl
    if impl == "triad":
        from loner_tpu.ops.triad_field import triad_encode_t

        return triad_encode_t(
            table, pos_t, cfg._triad_for(enc_cfg), key, cfg.encoding_slot_period
        )
    if impl == "fused":
        from loner_tpu.ops.fused_encoder import fused_hash_encode_t

        return fused_hash_encode_t(table, pos_t, fused_config_from(cfg, enc_cfg), key)
    if impl == "cell":
        from loner_tpu.ops.cell_hash import cell_hash_encode_t

        bwd = "level1" if cfg.encoding_bwd in ("level1", "strided") else "exact"
        return cell_hash_encode_t(table, pos_t, cell_config_from(enc_cfg, bwd), key)
    if impl == "packed":
        from loner_tpu.ops.hash_encode_fast import hash_encode_packed_t

        return hash_encode_packed_t(table, pos_t, enc_cfg, None)
    return hash_encode_t(table, pos_t, enc_cfg)


def query_sigma_t(
    params: dict,
    pts_cube_t: jnp.ndarray,
    cfg: NeRFConfig,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """pts_cube_t: (3, N) in [-1,1], point axis minor -> sigma logits (N,)."""
    pos = (pts_cube_t + 1.0) / 2.0
    h = _encode_t(cfg, params["sigma"]["table"], pos, cfg.pos_encoding_sigma, key)
    sigma = mlp_apply_t(params["sigma"]["mlp"], h, cfg.sigma_mlp_config())  # (1, N)
    return _sanitize_sigma(sigma[0])


def query_sigma(params: dict, pts_cube: jnp.ndarray, cfg: NeRFConfig) -> jnp.ndarray:
    """(N, 3) -> (N, 1) wrapper."""
    return query_sigma_t(params, pts_cube.T, cfg)[:, None]


def query_nerf_t(
    params: dict,
    pts_cube_t: jnp.ndarray,  # (3, N) in [-1, 1]
    viewdirs_t: Optional[jnp.ndarray],  # (3, N) unit, or None
    cfg: NeRFConfig,
    sigma_only: bool = False,
    detach_sigma: bool = True,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Transposed query: (1, N) sigma if sigma_only else (num_colors+1, N)
    rows [color..., sigma]."""
    sigma_params = params
    if detach_sigma and not sigma_only:
        sigma_params = jax.lax.stop_gradient(params)
    sigma = query_sigma_t(sigma_params, pts_cube_t, cfg, key)  # (N,)
    if detach_sigma and not sigma_only:
        sigma = jax.lax.stop_gradient(sigma)
    if sigma_only:
        return sigma[None, :]

    pos = (pts_cube_t + 1.0) / 2.0
    key_i = None if key is None else jax.random.fold_in(key, 1)
    h_x = _encode_t(
        cfg, params["intensity"]["table"], pos, cfg.pos_encoding_intensity, key_i
    )
    if cfg.enable_view_dependence:
        h_d = sh_encode_t(viewdirs_t.T, cfg.sh_degree)
        h_x = jnp.concatenate([h_x, h_d], axis=0)
    color = jax.nn.sigmoid(
        mlp_apply_t(params["intensity"]["mlp"], h_x, cfg.intensity_mlp_config())
    )  # (C, N)
    return jnp.concatenate([color, sigma[None, :]], axis=0)


def query_nerf(
    params: dict,
    pts_cube: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    cfg: NeRFConfig,
    sigma_only: bool = False,
    detach_sigma: bool = True,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Untransposed wrapper: (N, 3) [+ dirs] -> (N, 1) or (N, num_colors+1)."""
    vt = None if viewdirs is None else viewdirs.T
    return query_nerf_t(params, pts_cube.T, vt, cfg, sigma_only, detach_sigma, key).T
