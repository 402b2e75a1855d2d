"""Two-tower (hetero) network for CDK / cross-domain retrieval.

Separate x/y backbones + projectors with output-norm regularization onto the
radius-sqrt(mu) L2 ball/sphere (reference: examples/models/siam.py:132-208).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

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


def make_siam_network(
    input_dim: int,
    backbone_dims: Sequence[int],
    projector_dims: Sequence[int],
    nonlinearity: str = "relu",
    mu: float = 1.0,
    regularize_mode: str = "l2_ball",
    separation: bool = False,
    batch_l2norm: bool = False,
    momentum: float = 0.9,
):
    """Shared-weight two-tower network (SSL-style) with optional per-mode
    separation scales and batch-L2 normalization.

    Reference: examples/models/siam.py:9-129 (SiamNetwork; not used by the
    shipped mains but part of the model zoo).  The l2norm EMA is explicit
    state: ``apply(params, state, z1, z2=None, train=...)`` returns
    ``(f1_emb[, f2_emb], new_state)``.
    """
    assert not (separation and batch_l2norm)
    bb_init, bb_apply = make_mlp([input_dim] + list(backbone_dims),
                                 nonlinearity, bias=True)
    feature_dim = (list(projector_dims) or list(backbone_dims))[-1]
    pj_init, pj_apply = (
        make_mlp([backbone_dims[-1]] + list(projector_dims), nonlinearity,
                 bias=True)
        if projector_dims else (lambda k: {}, lambda p, x: x))
    r_up = float(np.sqrt(mu)) if mu > 0 else 0.0

    def init(key):
        kb, kp = jax.random.split(key)
        params = {"backbone": bb_init(kb), "projector": pj_init(kp)}
        if separation:
            scales = jnp.linspace(mu / feature_dim, mu, feature_dim)[::-1]
            params["scales_param"] = scales[None, :]
        return params

    def init_state():
        return {"l2norm": jnp.ones((feature_dim,)),
                "initialized": jnp.zeros((), jnp.bool_)}

    def _scales(params):
        scales = jnp.sqrt(jnp.abs(params["scales_param"]))
        return normalize_embedding(scales, r_up, "l2_ball")

    def embed_single(params, state, z, train: bool):
        rep = bb_apply(params["backbone"], z)
        emb = pj_apply(params["projector"], rep)
        new_state = state
        if separation or batch_l2norm:
            if train:
                bn = jnp.linalg.norm(emb, axis=0) / jnp.sqrt(emb.shape[0])
                ema = jnp.sqrt(momentum * state["l2norm"] ** 2
                               + (1 - momentum) * bn ** 2)
                l2 = jnp.where(state["initialized"], ema, bn)
                new_state = {"l2norm": jax.lax.stop_gradient(l2),
                             "initialized": jnp.ones((), jnp.bool_)}
                norm = bn
            else:
                norm = state["l2norm"]
            if separation:
                emb = emb / jnp.clip(norm, min=1e-6)
                emb = emb * _scales(params)
            else:
                total = jnp.sqrt(jnp.sum(norm ** 2))
                scale = jnp.where(total > r_up, r_up / jnp.clip(total, min=1e-6),
                                  1.0)
                emb = emb * scale
        else:
            emb = normalize_embedding(emb, r_up, regularize_mode)
        return rep, emb, new_state

    def apply(params, state, z1, z2=None, train: bool = False):
        rep1, emb1, state = embed_single(params, state, z1, train)
        if z2 is None:
            return rep1, emb1, state
        rep2, emb2, state = embed_single(params, state, z2, train)
        return rep1, emb1, rep2, emb2, state

    return init, init_state, apply


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


def make_hetero_network(
    input_dim: int,
    network_dims: Sequence[int],
    nonlinearity: str = "lrelu0.2",
    mu: float = 1.0,
    regularize_mode: str = "l2_ball",
    num_classes: int = 0,
    compute_dtype=None,
):
    """Two independent MLP towers; apply(params, x, y) -> (fx, fy).

    ``apply_single(params, x, 'x'|'y')`` embeds one side (used at retrieval
    time).  Output rows are normalized to the sqrt(mu)-ball (the CDK loss's
    boundedness constraint).

    ``num_classes > 0`` adds per-side online linear classifier heads over
    the (stop_gradient'ed) embeddings: ``apply_single(..., classify=True)``
    returns (emb, logits) (reference: siam.py:139-166 ``online_heads`` /
    ``forward_single(classify=True)``).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the tower matmuls in
    reduced precision on the MXU while keeping float32 master weights and
    float32 embeddings/Grams — the TPU-native analog of the reference's AMP
    autocast (main_sketchy.py:194-207; bf16 shares float32's exponent range
    so no GradScaler is needed, and the existing non-finite skip covers the
    rest).  Casts sit inside ``apply``: gradients flow through them and
    accumulate in float32.
    """
    sizes = [input_dim] + list(network_dims)
    x_init, x_apply = make_mlp(sizes, nonlinearity, bias=True)
    y_init, y_apply = make_mlp(sizes, nonlinearity, bias=True)
    r_up = float(jnp.sqrt(mu))
    towers = {"x": x_apply, "y": y_apply}
    head_init = head_apply = None
    if num_classes > 0:
        head_init, head_apply = make_mlp([network_dims[-1], num_classes],
                                         bias=True)

    def init(key):
        kx, ky, khx, khy = jax.random.split(key, 4)
        params = {"x": x_init(kx), "y": y_init(ky)}
        if head_init is not None:
            params["head_x"] = head_init(khx)
            params["head_y"] = head_init(khy)
        return params

    def apply_single(params, v, side, classify: bool = False):
        tower_params = params[side]
        if compute_dtype is not None:
            tower_params = _cast_floats(tower_params, compute_dtype)
            v = v.astype(compute_dtype)
        emb = towers[side](tower_params, v)
        if compute_dtype is not None:
            emb = emb.astype(jnp.float32)
        emb = normalize_embedding(emb, r_up, regularize_mode)
        if classify:
            if head_apply is None:
                raise ValueError("built without num_classes: no online heads")
            logits = head_apply(params[f"head_{side}"],
                                jax.lax.stop_gradient(emb))
            return emb, logits
        return emb

    def apply(params, x, y):
        return apply_single(params, x, "x"), apply_single(params, y, "y")

    return init, apply, apply_single
