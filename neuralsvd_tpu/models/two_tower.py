"""Two-tower (hetero) network for CDK / cross-domain retrieval.

Separate x/y backbones + projectors with output-norm regularization onto the
radius-sqrt(mu) L2 ball/sphere (reference: examples/models/siam.py:132-208).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from neuralsvd_tpu.models.mlp import make_mlp


def normalize_embedding(z: jax.Array, r_up: float, mode: str) -> jax.Array:
    """Constrain embedding rows (reference: examples/models/siam.py:189-208)."""
    if r_up <= 0:
        return z
    if mode == "l2_ball":
        norms = jnp.linalg.norm(z, axis=-1, keepdims=True)
        inside = (norms < r_up).astype(z.dtype)
        unit = z / jnp.maximum(norms, 1e-12)
        return inside * z + (1 - inside) * r_up * unit
    if mode == "l2_sphere":
        norms = jnp.linalg.norm(z, axis=-1, keepdims=True)
        return r_up * z / jnp.maximum(norms, 1e-12)
    if mode == "clip":
        return jnp.clip(z, -r_up, r_up)
    if mode == "tanh":
        return r_up * jnp.tanh(z)
    raise NotImplementedError(mode)


def make_hetero_network(
    input_dim: int,
    network_dims: Sequence[int],
    nonlinearity: str = "lrelu0.2",
    mu: float = 1.0,
    regularize_mode: str = "l2_ball",
):
    """Two independent MLP towers; apply(params, x, y) -> (fx, fy).

    ``apply_single(params, x, 'x'|'y')`` embeds one side (used at retrieval
    time).  Output rows are normalized to the sqrt(mu)-ball (the CDK loss's
    boundedness constraint).
    """
    sizes = [input_dim] + list(network_dims)
    x_init, x_apply = make_mlp(sizes, nonlinearity, bias=True)
    y_init, y_apply = make_mlp(sizes, nonlinearity, bias=True)
    r_up = float(jnp.sqrt(mu))
    towers = {"x": x_apply, "y": y_apply}

    def init(key):
        kx, ky = jax.random.split(key)
        return {"x": x_init(kx), "y": y_init(ky)}

    def apply_single(params, v, side):
        emb = towers[side](params[side], v)
        return normalize_embedding(emb, r_up, regularize_mode)

    def apply(params, x, y):
        return apply_single(params, x, "x"), apply_single(params, y, "y")

    return init, apply, apply_single
