"""Small dense MLPs as plain parameter pytrees.

Plays the role of tcnn's FullyFusedMLP in the reference
(``sigma_network``/``intensity_network`` in ``cfg/nerf_config/
default_nerf_hash.yaml``: width 64, ReLU, linear output). Widths of 64/128
map cleanly onto MXU tiles; matmuls run in bfloat16 with float32 accumulation
when ``compute_dtype`` is bf16.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MLPConfig(NamedTuple):
    in_dim: int
    out_dim: int
    hidden_dim: int = 64
    n_hidden_layers: int = 1
    activation: str = "relu"
    compute_dtype: str = "float32"


_ACTS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "none": lambda x: x,
}


def init_mlp(key: jax.Array, cfg: MLPConfig, dtype=jnp.float32) -> dict:
    """He-normal init; returns {"w": [W0, W1, ...], "b": [b0, b1, ...]}."""
    dims = [cfg.in_dim] + [cfg.hidden_dim] * cfg.n_hidden_layers + [cfg.out_dim]
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        std = jnp.sqrt(2.0 / dims[i])
        ws.append(jax.random.normal(sub, (dims[i], dims[i + 1]), dtype=dtype) * std)
        bs.append(jnp.zeros((dims[i + 1],), dtype=dtype))
    return {"w": ws, "b": bs}


def mlp_apply(params: dict, x: jnp.ndarray, cfg: MLPConfig) -> jnp.ndarray:
    act = _ACTS[cfg.activation]
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    h = x
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        h = (
            jnp.dot(h.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + b
        )
        if i < n - 1:
            h = act(h)
    return h


def mlp_apply_t(params: dict, x_t: jnp.ndarray, cfg: MLPConfig) -> jnp.ndarray:
    """Transposed MLP: x_t is (in_dim, N), result (out_dim, N).

    The hot-path variant: with the point axis minor nothing lane-pads, and
    every matmul is (out, in) @ (in, N) — MXU-shaped for N >= 128.
    """
    act = _ACTS[cfg.activation]
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    h = x_t
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        h = (
            jnp.dot(w.T.astype(compute_dtype), h.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + b[:, None]
        )
        if i < n - 1:
            h = act(h)
    return h
