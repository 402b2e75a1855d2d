"""Eigenfunction networks: shared-trunk MLP and ParallelMLP.

Functional modules: each ``make_*`` returns ``(init, apply)`` where
``init(key) -> params`` (a pytree of arrays) and ``apply(params, x) -> out``.
No framework classes — pure pytrees keep custom-VJP losses, shard_map and
optax composition trivial.

TPU notes:
- ``ParallelMLP`` evaluates L independent MLPs as one batched einsum
  ``(L,h,d) x (B,d) -> (L,B,h)`` — L batched matmuls on the MXU in a single
  XLA op (reference equivalent: examples/models/mlp.py:167-221).
- Hidden matmuls run at default (fast, bf16-pass) precision; the loss-side
  Gram contractions pin float32 (see ops/gram.py).

Reference: examples/models/mlp.py.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Activations (reference: examples/models/mlp.py:65-88)
# ---------------------------------------------------------------------------

def _sin_and_cos(x):
    assert x.shape[-1] % 2 == 0, "sin_and_cos needs an even feature dim"
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([jnp.sin(x1), jnp.cos(x2)], axis=-1)


def get_activation(nonlinearity: str) -> Callable[[jax.Array], jax.Array]:
    if nonlinearity == "relu":
        return jax.nn.relu
    if nonlinearity.startswith("lrelu"):
        slope = float(nonlinearity.replace("lrelu", ""))
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if nonlinearity.startswith("elu"):
        suffix = nonlinearity.replace("elu", "")
        alpha = float(suffix) if suffix else 1.0
        return lambda x: jax.nn.elu(x, alpha=alpha)
    if nonlinearity == "tanh":
        return jnp.tanh
    if nonlinearity == "erf":
        return jax.lax.erf
    if nonlinearity == "sin_and_cos":
        return _sin_and_cos
    if nonlinearity == "siren":
        return jnp.sin
    if nonlinearity == "softplus":
        return jax.nn.softplus
    if nonlinearity == "linear":
        return lambda x: x
    raise NotImplementedError(f"unknown nonlinearity: {nonlinearity}")


# ---------------------------------------------------------------------------
# Shared-trunk MLP
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in):
    # torch.nn.Linear default init (kaiming uniform, a=sqrt(5)) for parity
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def make_mlp(
    sizes: Sequence[int],
    nonlinearity: str = "relu",
    bias: bool = True,
    weight_normalization: bool = False,
    feature_map: Optional[Tuple[Callable, Callable]] = None,
    matmul_precision=None,
):
    """Plain MLP ``sizes[0] -> ... -> sizes[-1]``, no final activation.

    ``feature_map`` is an optional ``(init, apply)`` pair prepended to the
    network (e.g. Fourier features).  ``matmul_precision``: see
    make_parallel_mlp.  Reference: examples/models/mlp.py:129-164.
    """
    sizes = list(sizes)
    act = get_activation(nonlinearity)
    prec = resolve_matmul_precision(matmul_precision)
    if _is_split(prec):
        raise ValueError("split matmul_precision specs ('head@k,tail') "
                         "require the per-mode ParallelMLP (parallel=True)")
    n_layers = len(sizes) - 1
    fm_init, fm_apply = feature_map if feature_map is not None else (None, None)

    def init(key):
        params = {"layers": []}
        if fm_init is not None:
            key, sub = jax.random.split(key)
            params["feature_map"] = fm_init(sub)
        for i in range(n_layers):
            key, kw, kb = jax.random.split(key, 3)
            layer = {"w": _kaiming_uniform(kw, (sizes[i], sizes[i + 1]), sizes[i])}
            if bias:
                layer["b"] = _kaiming_uniform(kb, (sizes[i + 1],), sizes[i])
            if weight_normalization:
                layer["g"] = jnp.linalg.norm(layer["w"], axis=0)
            params["layers"].append(layer)
        return params

    def apply(params, x):
        if fm_apply is not None:
            x = fm_apply(params.get("feature_map"), x)
        h = x
        for i, layer in enumerate(params["layers"]):
            w = layer["w"]
            if weight_normalization:
                w = w * (layer["g"] / (jnp.linalg.norm(w, axis=0) + 1e-12))
            h = jnp.matmul(h, w, precision=prec)
            if bias:
                h = h + layer["b"]
            if i < n_layers - 1:
                h = act(h)
        return h

    return init, apply


# ---------------------------------------------------------------------------
# ParallelMLP: L independent MLPs as batched einsums
# ---------------------------------------------------------------------------

def resolve_matmul_precision(precision):
    """None | 'default' | 'high' | 'highest' | lax.Precision | split spec.

    TPU tiers: DEFAULT = 1-pass bf16, HIGH = 3-pass bf16 (~2x slower than
    DEFAULT, ~f32-grade error 2^-21), HIGHEST = 6-pass bf16 (f32 emulation).
    ``None`` inherits the ambient jax_default_matmul_precision.

    A split spec ``'<head>@<k>,<tail>'`` (e.g. ``'highest@1,high'``) runs
    the first k towers at <head> and the rest at <tail> — ParallelMLP
    only.  Measured outcome (BASELINE.md E7): pinning the ground-state
    tower at HIGHEST did NOT recover the 1s accuracy lost under the
    3-pass tier (the degradation couples through the shared metric
    terms, not tower 0's own compute) and the split concat breaks the
    fused tower einsum (200 steps/s vs uniform-'high' 434) — uniform
    tiers dominate; the knob is kept for experimentation only.
    Returns ``('split', head, k, tail)``.
    """
    if precision is None or isinstance(precision, jax.lax.Precision):
        return precision
    if isinstance(precision, str) and "@" in precision:
        head, rest = precision.split("@", 1)
        k_str, tail = rest.split(",", 1)
        return ("split", resolve_matmul_precision(head), int(k_str),
                resolve_matmul_precision(tail))
    return jax.lax.Precision(
        {"default": "fastest", "high": "high", "highest": "highest"}
        .get(precision, precision))


def _is_split(prec) -> bool:
    return isinstance(prec, tuple) and len(prec) == 4 and prec[0] == "split"


def _tower_einsum(eq, w, h, prec):
    """Tower einsum with optional per-mode split precision.

    ``w`` is (L, ...) per-mode weights; ``h`` is either the shared input
    (B, d) (first layer) or per-mode activations (L, ..., B).
    """
    if not _is_split(prec):
        return jnp.einsum(eq, w, h, precision=prec)
    _, p_head, k, p_tail = prec
    if h.ndim == 2:  # first layer: input shared across towers
        h_head = h_tail = h
    else:
        h_head, h_tail = h[:k], h[k:]
    return jnp.concatenate(
        [jnp.einsum(eq, w[:k], h_head, precision=p_head),
         jnp.einsum(eq, w[k:], h_tail, precision=p_tail)], axis=0)


def make_parallel_mlp(
    input_dim: int,
    mlp_hidden_dims: Sequence[int],
    num_copies: int,
    output_dim: int = 1,
    nonlinearity: str = "relu",
    bias: bool = False,
    weight_normalization: bool = False,
    feature_map: Optional[Tuple[Callable, Callable]] = None,
    debug: bool = False,
    compute_dtype=None,
    matmul_precision=None,
):
    """L independent MLPs evaluated as one batched einsum chain.

    Weight layout (L, h_out, h_in): a rank-3 operand that XLA maps to L
    batched MXU matmuls.  ``debug=True`` sets all weights to 0.1 for
    reproducible numerics (reference: examples/models/mlp.py:186-193).

    Faithful reference quirk: under weight normalization every layer is
    divided by the *first* layer's norm (examples/models/mlp.py:220-221);
    normalization defaults off, as in the experiments.

    ``compute_dtype`` (e.g. jnp.bfloat16): run the tower einsums in a
    lower precision while master weights, input features and the output
    stay float32 — the CDK bf16-tower recipe (models/two_tower.py
    compute_dtype, 3.1x e2e on v5e) applied to the eigenfunction towers.
    Downstream Gram/Cholesky stays f32 (ops/gram.py pins HIGHEST).

    ``matmul_precision`` ('default'/'high'/'highest' or lax.Precision):
    per-einsum MXU pass count for the tower matmuls only, overriding the
    ambient jax_default_matmul_precision.  'high' (3-pass bf16, error
    ~2^-21) keeps f32 *storage* — a finer knob than ``compute_dtype``
    =bf16, whose input rounding (2^-8) measurably degrades exact-JVP
    eigvals (BASELINE.md E5).  A split spec ``'highest@1,high'`` pins the
    first tower(s) at HIGHEST and runs the rest at the cheap tier (see
    resolve_matmul_precision).
    """
    act = get_activation(nonlinearity)
    prec = resolve_matmul_precision(matmul_precision)
    if _is_split(prec):
        _, p_head, k, p_tail = prec
        if not 0 < k < num_copies:  # degenerate split: single tier
            prec = p_head if k >= num_copies else p_tail
    dims = list(mlp_hidden_dims) + [output_dim]
    fm_init, fm_apply = feature_map if feature_map is not None else (None, None)

    def init(key):
        params = {"ws": [], "bs": []}
        if fm_init is not None:
            key, sub = jax.random.split(key)
            params["feature_map"] = fm_init(sub)
        hdim_prev = input_dim if fm_apply is None else _feature_dim(feature_map)
        for hdim in dims:
            key, sub = jax.random.split(key)
            if debug:
                w = 0.1 * jnp.ones((num_copies, hdim, hdim_prev), jnp.float32)
                b = 0.1 * jnp.ones((num_copies, hdim, 1), jnp.float32)
            else:
                w = math.sqrt(2.0 / hdim_prev) * jax.random.normal(
                    sub, (num_copies, hdim, hdim_prev), jnp.float32)
                b = jnp.zeros((num_copies, hdim, 1), jnp.float32)
            params["ws"].append(w)
            if bias:
                params["bs"].append(b)
            hdim_prev = hdim
        return params

    def _norm(w):
        if not weight_normalization:
            return 1.0
        return jnp.linalg.norm(w, axis=(-1, -2), keepdims=True)

    def apply(params, x):
        if fm_apply is not None:
            x = fm_apply(params.get("feature_map"), x)
        ws = params["ws"]
        bs = params["bs"] if bias else [0.0] * len(ws)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            ws = [w.astype(compute_dtype) for w in ws]
            bs = [b.astype(compute_dtype) if hasattr(b, "astype") else b
                  for b in bs]
        norm0 = _norm(ws[0])
        h = _tower_einsum("lhd,bd->lhb", ws[0] / norm0, x, prec) + bs[0]
        h = act(h)
        for i in range(1, len(ws)):
            h = _tower_einsum("lhp,lpb->lhb", ws[i] / norm0, h, prec) + bs[i]
            if i < len(ws) - 1:
                h = act(h)
        out = jnp.transpose(h, (2, 0, 1))  # (B, L, O)
        if output_dim == 1:
            out = out[..., 0]  # (B, L)
        if compute_dtype is not None:
            out = out.astype(jnp.float32)
        return out

    return init, apply


def _feature_dim(feature_map) -> int:
    fd = getattr(feature_map[1], "feature_dim", None)
    if fd is None:
        raise ValueError("feature_map apply must carry a .feature_dim attribute")
    return fd


# ---------------------------------------------------------------------------
# Factory mirroring get_mlp_eigfuncs (examples/models/mlp.py:93-126)
# ---------------------------------------------------------------------------

def make_mlp_eigfuncs(
    input_dim: int,
    neigs: int,
    mlp_hidden_dims: Sequence[int],
    nonlinearity: str,
    bias: bool = True,
    weight_normalization: bool = False,
    parallel: bool = False,
    feature_map: Optional[Tuple[Callable, Callable]] = None,
    debug: bool = False,
    compute_dtype=None,
    matmul_precision=None,
):
    if not parallel:
        in_dim = input_dim if feature_map is None else _feature_dim(feature_map)
        sizes = [in_dim] + list(mlp_hidden_dims) + [neigs]
        return make_mlp(sizes, nonlinearity, bias=bias,
                        weight_normalization=weight_normalization,
                        feature_map=feature_map,
                        matmul_precision=matmul_precision)
    return make_parallel_mlp(
        input_dim=input_dim,
        mlp_hidden_dims=mlp_hidden_dims,
        num_copies=neigs,
        output_dim=1,
        nonlinearity=nonlinearity,
        bias=bias,
        weight_normalization=weight_normalization,
        feature_map=feature_map,
        debug=debug,
        compute_dtype=compute_dtype,
        matmul_precision=matmul_precision,
    )


def parse_dims(dims_str: str):
    """'512,512' -> [512, 512] (reference: methods/utils.py:32-33)."""
    return [int(d) for d in dims_str.split(",")] if dims_str else []
