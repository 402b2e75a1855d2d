"""Gram/covariance contractions — the O(B·L²) core of every loss.

All contractions run in float32 on the MXU (``preferred_element_type`` +
HIGHEST precision): eigenvalue estimates degrade visibly in bf16 grams.

Every function takes an optional ``axis_name``: inside ``shard_map`` over a
data-parallel mesh axis, grams of locally-sharded activations are reduced
with ``lax.pmean`` so each device sees the *global* batch statistics
(reference equivalent: the vestigial DDP all-gather at tools/generic.py:142-180;
here the collective is a tiny (L, L) psum over ICI).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


def _maybe_pmean(x, axis_name):
    if axis_name is None:
        return x
    return lax.pmean(x, axis_name)


def global_batch_size(local_batch: int, axis_name) -> int:
    """Global batch size across the mapped axis (static under jit)."""
    if axis_name is None:
        return local_batch
    return local_batch * lax.axis_size(axis_name)


def compute_lambda(f: jax.Array, axis_name=None) -> jax.Array:
    """E[f fᵀ] gram over the (global) batch: (B, L[, O]) -> (L, L).

    Reference: methods/nestedlora.py:10-11.
    """
    B = f.shape[0]
    lam = jnp.einsum("bl...,bm...->lm", f, f, precision=_HI,
                     preferred_element_type=jnp.float32) / B
    return _maybe_pmean(lam, axis_name)


def compute_gram(f: jax.Array, g: jax.Array | None = None, axis_name=None) -> jax.Array:
    """E[f gᵀ] cross-gram: (B, L[, O]) x (B, L[, O]) -> (L, L).

    Reference: methods/neuralef.py:7-10.
    """
    if g is None:
        g = f
    B = f.shape[0]
    gram = jnp.einsum("bl...,bm...->lm", f, g, precision=_HI,
                      preferred_element_type=jnp.float32) / B
    return _maybe_pmean(gram, axis_name)


def compute_loss_metric(f1, f2, matrix_mask, axis_name=None):
    """Masked metric loss  Σ_{lm} M_{lm} Λf1_{lm} Λf2_{lm}  plus the two grams.

    Estimates E_{p(x)p(x')}[(f(x)ᵀ f(x'))²]-type terms with *independent*
    sample groups f1, f2 (reference: methods/nestedlora.py:57-64).
    """
    lam_f1 = compute_lambda(f1, axis_name)
    lam_f2 = compute_lambda(f2, axis_name)
    loss = jnp.sum(matrix_mask * lam_f1 * lam_f2)
    return loss, lam_f1, lam_f2


def off_diagonal(x: jax.Array) -> jax.Array:
    """Flattened view of the off-diagonal entries of a square matrix.

    Reference: methods/utils.py:16-22.
    """
    n, m = x.shape[-2], x.shape[-1]
    assert n == m, "off_diagonal expects a square matrix"
    batch_shape = x.shape[:-2]
    flat = x.reshape(*batch_shape, n * n)[..., :-1]
    return flat.reshape(*batch_shape, n - 1, n + 1)[..., 1:].reshape(*batch_shape, -1)
