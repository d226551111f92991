"""Decoupled sigma/intensity neural field (the reference's ``DecoupledNeRF``,
``src/models/nerf_tcnn.py:20-96``), as pure functions over a parameter pytree.

  * sigma branch:      hash-encode(pos) -> MLP(64 x 1 hidden) -> 1 logit
  * intensity branch:  hash-encode(pos) [+ SH(viewdir)] -> MLP(64 x 4 hidden)
                       -> sigmoid -> num_colors

Positions arrive in world-cube coords [-1, 1]^3 and are mapped to [0, 1]^3 at
the input, like the reference's ``(pos+1)/2``. ``detach_sigma`` stops
gradients into the sigma branch when training intensity (the reference's
``no_grad`` path). Non-finite sigma is sanitized like the reference's clamp.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from loner_tpu.models.hash_encoding import HashEncodingConfig, hash_encode, init_hash_table
from loner_tpu.models.mlp import MLPConfig, init_mlp, mlp_apply
from loner_tpu.models.sh_encoding import sh_encode


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
    compute_dtype: str = "float32"

    def sigma_mlp_config(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.pos_encoding_sigma.output_dim,
            out_dim=1,
            hidden_dim=self.sigma_hidden_dim,
            n_hidden_layers=self.sigma_hidden_layers,
            compute_dtype=self.compute_dtype,
        )

    def intensity_mlp_config(self) -> MLPConfig:
        in_dim = self.pos_encoding_intensity.output_dim
        if self.enable_view_dependence:
            in_dim += self.sh_degree**2
        return MLPConfig(
            in_dim=in_dim,
            out_dim=self.num_colors,
            hidden_dim=self.intensity_hidden_dim,
            n_hidden_layers=self.intensity_hidden_layers,
            compute_dtype=self.compute_dtype,
        )


def init_nerf(key: jax.Array, cfg: NeRFConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "sigma": {
            "table": init_hash_table(k1, cfg.pos_encoding_sigma),
            "mlp": init_mlp(k2, cfg.sigma_mlp_config()),
        },
        "intensity": {
            "table": init_hash_table(k3, cfg.pos_encoding_intensity),
            "mlp": init_mlp(k4, cfg.intensity_mlp_config()),
        },
    }


def _sanitize_sigma(sigma: jnp.ndarray) -> jnp.ndarray:
    """Reference clamps non-finite sigma (``nerf_tcnn.py:74-78``)."""
    big = jnp.float32(3.4e38)
    return jnp.nan_to_num(sigma, nan=0.0, posinf=big, neginf=-big)


def query_sigma(params: dict, pts_cube: jnp.ndarray, cfg: NeRFConfig) -> jnp.ndarray:
    """pts_cube: (N, 3) in [-1,1] -> sigma logits (N, 1)."""
    pos = (pts_cube + 1.0) / 2.0
    h = hash_encode(params["sigma"]["table"], pos, cfg.pos_encoding_sigma)
    sigma = mlp_apply(params["sigma"]["mlp"], h, cfg.sigma_mlp_config())
    return _sanitize_sigma(sigma[..., :1])


def query_nerf(
    params: dict,
    pts_cube: jnp.ndarray,  # (N, 3) in [-1, 1]
    viewdirs: Optional[jnp.ndarray],  # (N, 3) unit, or None
    cfg: NeRFConfig,
    sigma_only: bool = False,
    detach_sigma: bool = True,
) -> jnp.ndarray:
    """Returns (N, 1) sigma if sigma_only else (N, num_colors+1) [color, sigma]."""
    sigma_params = params["sigma"]
    if detach_sigma and not sigma_only:
        sigma_params = jax.lax.stop_gradient(sigma_params)
    sigma = query_sigma({"sigma": sigma_params}, pts_cube, cfg)
    if detach_sigma and not sigma_only:
        sigma = jax.lax.stop_gradient(sigma)
    if sigma_only:
        return sigma

    pos = (pts_cube + 1.0) / 2.0
    h_x = hash_encode(params["intensity"]["table"], pos, cfg.pos_encoding_intensity)
    if cfg.enable_view_dependence:
        h_d = sh_encode(viewdirs, cfg.sh_degree)
        h_x = jnp.concatenate([h_x, h_d], axis=-1)
    color = jax.nn.sigmoid(
        mlp_apply(params["intensity"]["mlp"], h_x, cfg.intensity_mlp_config())
    )
    return jnp.concatenate([color, sigma], axis=-1)
