"""NestedLoRA loss kernels with hand-derived VJPs.

These are the performance/correctness core of the framework — the TPU-native
equivalents of the reference's ``torch.autograd.Function`` subclasses
(reference: methods/nestedlora.py:67-332).

IMPORTANT SEMANTICS (do not "fix"): the backward passes deliberately differ
from the gradient of the forward scalar.  For the EVD objective the operator
term forward is ``-2·E[Σ_l w_l f_l·(Tf)_l]`` but its backward routes the
*entire* gradient ``-4/B·w⊙Tf`` through ``f`` and none through ``Tf``
(reference: methods/nestedlora.py:92,108).  For a self-adjoint operator this
equals the true functional gradient while skipping backprop through the
operator application entirely — on TPU this means the (2D+1)-point Laplacian
stencil never appears in the backward graph, a large win.

All losses accept ``axis_name`` (static): inside ``shard_map`` over a
data-parallel axis the Gram statistics are ``pmean``-reduced so every device
computes the same global loss/gradients.  Under plain GSPMD-sharded jit,
leave ``axis_name=None`` — XLA inserts the collectives itself.

The f1/f2 sample groups MUST be statistically independent (the unbiasedness
of the metric gradient depends on it); under data parallelism each device
contributes an independent half-batch pair, and the pmean of their Grams
preserves independence between the two unions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from neuralsvd_tpu.ops.gram import compute_loss_metric, off_diagonal

_HI = lax.Precision.HIGHEST


def _axis_scale(axis_name) -> int:
    """Number of shards along the mapped axis (1 when unmapped)."""
    if axis_name is None:
        return 1
    return lax.axis_size(axis_name)


def _pmean(x, axis_name):
    return x if axis_name is None else lax.pmean(x, axis_name)


# ---------------------------------------------------------------------------
# EVD (self-adjoint operator) loss
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def nestedlora_evd_loss(axis_name, f, Tf, f1, f2, vector_mask, matrix_mask):
    """NestedLoRA EVD loss (reference: methods/nestedlora.py:67-111).

    Args:
      f, Tf: (B, L) or (B, L, O) — eigenfunction values and operator images.
      f1, f2: independent half-batches of f values (chunked outside).
      vector_mask: (L,), matrix_mask: (L, L) nesting masks.
    Returns the scalar loss (operator term + metric term).
    """
    loss, _ = _evd_fwd_impl(axis_name, f, Tf, f1, f2, vector_mask, matrix_mask)
    return loss


def _evd_fwd_impl(axis_name, f, Tf, f1, f2, vector_mask, matrix_mask):
    loss_metric, lam_f1, lam_f2 = compute_loss_metric(f1, f2, matrix_mask, axis_name)
    # loss_operator = -2 E_{p(x)}[Σ_l w_l f_l(x)·(Tf_l)(x)]   — O(B·L·O)
    op = jnp.einsum("l,bl...,bl...->b", vector_mask, f, Tf, precision=_HI,
                    preferred_element_type=jnp.float32)
    loss_operator = -2.0 * _pmean(jnp.mean(op), axis_name)
    loss = loss_operator + loss_metric
    return loss, (f, Tf, f1, f2, lam_f1, lam_f2, vector_mask, matrix_mask)


def _evd_fwd(axis_name, f, Tf, f1, f2, vector_mask, matrix_mask):
    return _evd_fwd_impl(axis_name, f, Tf, f1, f2, vector_mask, matrix_mask)


def _evd_bwd(axis_name, res, g):
    f, Tf, f1, f2, lam_f1, lam_f2, vector_mask, matrix_mask = res
    n = _axis_scale(axis_name)
    # Deliberate: -4/B (not -2/B) routed through f only; Tf gets no gradient
    # (reference: methods/nestedlora.py:108).  B is the *global* batch.
    operator_f = (-4.0 / (f.shape[0] * n)) * jnp.einsum(
        "l,bl...->bl...", vector_mask, Tf)
    metric_f1 = (2.0 / (f1.shape[0] * n)) * jnp.einsum(
        "lm,lm,bl...->bm...", matrix_mask, lam_f2, f1, precision=_HI,
        preferred_element_type=jnp.float32)
    metric_f2 = (2.0 / (f2.shape[0] * n)) * jnp.einsum(
        "lm,lm,bl...->bm...", matrix_mask, lam_f1, f2, precision=_HI,
        preferred_element_type=jnp.float32)
    zeros_v = jnp.zeros_like(vector_mask)
    zeros_m = jnp.zeros_like(matrix_mask)
    return (g * operator_f, jnp.zeros_like(Tf), g * metric_f1, g * metric_f2,
            zeros_v, zeros_m)


nestedlora_evd_loss.defvjp(_evd_fwd, _evd_bwd)


# ---------------------------------------------------------------------------
# SVD (non-self-adjoint operator) loss
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def nestedlora_svd_loss(axis_name, f, Tg, g, Tadjf, vector_mask, matrix_mask):
    """NestedLoRA SVD loss (reference: methods/nestedlora.py:114-164).

    f, Tg live on the X side; g, T†f on the Y side.  O(B·L) operator term.
    """
    loss, _ = _svd_fwd_impl(axis_name, f, Tg, g, Tadjf, vector_mask, matrix_mask)
    return loss


def _svd_fwd_impl(axis_name, f, Tg, g, Tadjf, vector_mask, matrix_mask):
    loss_metric, lam_f, lam_g = compute_loss_metric(f, g, matrix_mask, axis_name)
    op = jnp.einsum("l,bl,bl->b", vector_mask, f, Tg, precision=_HI,
                    preferred_element_type=jnp.float32)
    loss_operator = -2.0 * _pmean(jnp.mean(op), axis_name)
    loss = loss_operator + loss_metric
    return loss, (f, Tg, g, Tadjf, lam_f, lam_g, vector_mask, matrix_mask)


def _svd_fwd(axis_name, f, Tg, g, Tadjf, vector_mask, matrix_mask):
    return _svd_fwd_impl(axis_name, f, Tg, g, Tadjf, vector_mask, matrix_mask)


def _svd_bwd(axis_name, res, gout):
    f, Tg, g, Tadjf, lam_f, lam_g, vector_mask, matrix_mask = res
    n = _axis_scale(axis_name)
    Bf = f.shape[0] * n
    Bg = g.shape[0] * n
    operator_f = (-2.0 / Bf) * jnp.einsum("l,bl->bl", vector_mask, Tg)
    metric_f = (2.0 / Bf) * jnp.einsum("bi,il,il->bl", f, matrix_mask, lam_g,
                                       precision=_HI,
                                       preferred_element_type=jnp.float32)
    operator_g = (-2.0 / Bg) * jnp.einsum("l,bl->bl", vector_mask, Tadjf)
    metric_g = (2.0 / Bg) * jnp.einsum("bi,il,il->bl", g, matrix_mask, lam_f,
                                       precision=_HI,
                                       preferred_element_type=jnp.float32)
    return (gout * (operator_f + metric_f), jnp.zeros_like(Tg),
            gout * (operator_g + metric_g), jnp.zeros_like(Tadjf),
            jnp.zeros_like(vector_mask), jnp.zeros_like(matrix_mask))


nestedlora_svd_loss.defvjp(_svd_fwd, _svd_bwd)


# ---------------------------------------------------------------------------
# CDK (canonical dependence kernel, paired samples) loss
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def nestedlora_cdk_loss(axis_name, set_first_mode_const, f, g, vector_mask,
                        matrix_mask, batch_weights):
    """NestedLoRA loss for the canonical dependence kernel p(x,y)/p(x)p(y).

    Learned from *paired* samples only: the operator term is
    ``-2 E_{p(x,y)}[f(x)ᵀ g(y)]`` and the metric term uses independent
    marginal Grams (reference: methods/nestedlora.py:270-332).

    Returns (loss, loss_operator, loss_metric, rs_joint, rs_indep) where
    rs_joint/rs_indep are the diagonal / off-diagonal of the (B, B) density
    -ratio gram (for histogram diagnostics).  Only the ``loss`` output
    propagates gradients, mirroring the reference backward.

    With ``set_first_mode_const`` a constant-1 zeroth mode is prepended to
    both f and g before the loss; its gradient slot is stripped in backward
    (reference: methods/nestedlora.py:287-290,329-331).
    """
    out, _ = _cdk_fwd_impl(axis_name, set_first_mode_const, f, g, vector_mask,
                           matrix_mask, batch_weights)
    return out


def _pad_const_mode(f):
    ones = jnp.ones((f.shape[0], 1), dtype=f.dtype)
    return jnp.concatenate([ones, f], axis=1)


def _cdk_fwd_impl(axis_name, set_first_mode_const, f, g, vector_mask,
                  matrix_mask, batch_weights):
    if set_first_mode_const:
        f = _pad_const_mode(f)
        g = _pad_const_mode(g)
    if batch_weights is not None:
        f = f * batch_weights
        g = g * batch_weights
    loss_metric, lam_f, lam_g = compute_loss_metric(f, g, matrix_mask, axis_name)
    op = jnp.einsum("l,bl,bl->b", vector_mask, f, g, precision=_HI,
                    preferred_element_type=jnp.float32)
    loss_operator = -2.0 * _pmean(jnp.mean(op), axis_name)
    loss = loss_operator + loss_metric
    # density-ratio gram (diagnostics only; local shard under DP)
    gram = jnp.einsum("bl,cl->bc", f, g, precision=_HI,
                      preferred_element_type=jnp.float32)
    rs_joint = jnp.diagonal(gram)
    rs_indep = off_diagonal(gram)
    out = (loss, loss_operator, loss_metric, rs_joint, rs_indep)
    return out, (f, g, lam_f, lam_g, vector_mask, matrix_mask, batch_weights)


def _cdk_fwd(axis_name, set_first_mode_const, f, g, vector_mask, matrix_mask,
             batch_weights):
    return _cdk_fwd_impl(axis_name, set_first_mode_const, f, g, vector_mask,
                         matrix_mask, batch_weights)


def _cdk_bwd(axis_name, set_first_mode_const, res, cts):
    f, g, lam_f, lam_g, vector_mask, matrix_mask, batch_weights = res
    gout = cts[0]  # only the scalar loss output carries gradient (reference)
    n = _axis_scale(axis_name)
    B = f.shape[0] * n
    operator_f = (-2.0 / B) * jnp.einsum("l,bl->bl", vector_mask, g)
    metric_f = (2.0 / B) * jnp.einsum("il,il,bi->bl", matrix_mask, lam_g, f,
                                      precision=_HI,
                                      preferred_element_type=jnp.float32)
    grad_f = operator_f + metric_f
    operator_g = (-2.0 / B) * jnp.einsum("l,bl->bl", vector_mask, f)
    metric_g = (2.0 / B) * jnp.einsum("il,il,bi->bl", matrix_mask, lam_f, g,
                                      precision=_HI,
                                      preferred_element_type=jnp.float32)
    grad_g = operator_g + metric_g
    if set_first_mode_const:
        grad_f = grad_f[:, 1:]
        grad_g = grad_g[:, 1:]
    zeros_w = None if batch_weights is None else jnp.zeros_like(batch_weights)
    return (gout * grad_f, gout * grad_g, jnp.zeros_like(vector_mask),
            jnp.zeros_like(matrix_mask), zeros_w)


nestedlora_cdk_loss.defvjp(_cdk_fwd, _cdk_bwd)
