"""Serving export: AOT-serializable eigenfunction/embedding evaluators.

Serialize a trained model (params baked in as constants) to a StableHLO
artifact via ``jax.export`` with a symbolic batch dimension, so a serving
process can load ONE file and evaluate at any batch size without Python
model code, checkpoints, or retracing.  Covers the two serving surfaces:
learned eigenfunctions Ψ(x) (PDE spectra) and CDK tower embedders (the
retrieval path).  No reference counterpart — the reference serves nothing
(torch checkpoints + source required everywhere).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as _jexport


def export_evaluator(apply_fn: Callable, params, input_dim: int,
                     dtype=jnp.float32) -> bytes:
    """Serialize ``x (b, input_dim) -> apply_fn(params, x)`` with a
    symbolic batch dimension; params are baked into the artifact."""
    fn = jax.jit(lambda x: apply_fn(params, x))
    shape = _jexport.symbolic_shape(f"b, {input_dim}")
    exp = _jexport.export(fn)(jax.ShapeDtypeStruct(shape, dtype))
    return bytes(exp.serialize())


def load_evaluator(blob: bytes) -> Callable:
    """Rehydrate an :func:`export_evaluator` artifact into a callable."""
    return _jexport.deserialize(blob).call


def save_evaluator(path: str, apply_fn: Callable, params, input_dim: int,
                   dtype=jnp.float32) -> None:
    with open(path, "wb") as f:
        f.write(export_evaluator(apply_fn, params, input_dim, dtype))


def load_evaluator_file(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_evaluator(f.read())
