"""NeuralEF / mu-EigenGame / Sanger reimplementation.

Reference: methods/neuralef.py.  The loss is a custom-VJP whose backward
returns scaled saved terms (4x variance, 2x align — deliberately not the
gradient of the forward scalar; reference :55-62).  The model is wrapped in
a batch-L2 normalizer whose EMA norms live in explicit method state
(reference BatchL2NormalizedFunctions, methods/utils.py:36-86).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from neuralsvd_tpu.ops.gram import compute_gram

_HI = jax.lax.Precision.HIGHEST


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def neuralef_loss(axis_name, unbiased, diagonal, phi, Tphi, phi1, Tphi1,
                  phi2, Tphi2):
    loss, _ = _nef_fwd_impl(axis_name, unbiased, diagonal, phi, Tphi, phi1,
                            Tphi1, phi2, Tphi2)
    return loss


def _nef_fwd_impl(axis_name, unbiased, diagonal, phi, Tphi, phi1, Tphi1,
                  phi2, Tphi2):
    variance_term = -Tphi / phi.shape[0]  # (B, L)
    if unbiased:
        # mu-EigenGame variant: coefficients from plain grams
        gram_phi1 = compute_gram(phi1, axis_name=axis_name)
        gram_phi2 = compute_gram(phi2, axis_name=axis_name)
        coeff_phi1 = jnp.triu(gram_phi1, k=diagonal)
        coeff_phi2 = jnp.triu(gram_phi2, k=diagonal)
    else:
        # original NeuralEF: quad-normalized coefficients
        quad_phi1 = compute_gram(phi1, Tphi1, axis_name=axis_name)
        quad_phi2 = compute_gram(phi2, Tphi2, axis_name=axis_name)
        coeff_phi1 = jnp.triu(quad_phi2, k=diagonal) / (
            jnp.diagonal(quad_phi2) + 1e-5)[:, None]
        coeff_phi2 = jnp.triu(quad_phi1, k=diagonal) / (
            jnp.diagonal(quad_phi1) + 1e-5)[:, None]
    align_term_phi1 = jnp.einsum("bl...,lm->bm...", Tphi1, coeff_phi1,
                                 precision=_HI) / phi1.shape[0]
    align_term_phi2 = jnp.einsum("bl...,lm->bm...", Tphi2, coeff_phi2,
                                 precision=_HI) / phi2.shape[0]
    loss = (jnp.sum(phi * variance_term)
            + 0.5 * (jnp.sum(phi1 * align_term_phi1)
                     + jnp.sum(phi2 * align_term_phi2)))
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss, (variance_term, align_term_phi1, align_term_phi2,
                  phi, Tphi, phi1, Tphi1, phi2, Tphi2)


def _nef_fwd(axis_name, unbiased, diagonal, phi, Tphi, phi1, Tphi1, phi2, Tphi2):
    return _nef_fwd_impl(axis_name, unbiased, diagonal, phi, Tphi, phi1,
                         Tphi1, phi2, Tphi2)


def _nef_bwd(axis_name, unbiased, diagonal, res, g):
    (variance_term, align1, align2, phi, Tphi, phi1, Tphi1, phi2, Tphi2) = res
    # deliberate estimator scaling (reference: methods/neuralef.py:62)
    return (g * 4 * variance_term, jnp.zeros_like(Tphi),
            g * 2 * align1, jnp.zeros_like(Tphi1),
            g * 2 * align2, jnp.zeros_like(Tphi2))


neuralef_loss.defvjp(_nef_fwd, _nef_bwd)


class NeuralEigenfunctions:
    """NeuralEF behind the uniform method interface.

    ``batchnorm_mode``: 'biased' | 'unbiased' | 'none' — whether/how model
    outputs are divided by an EMA of batch L2 norms; the mode selects which
    EMA is used at eval time (reference: methods/utils.py:48-56).
    """

    name = "neuralef"

    def __init__(self, apply_fn: Callable, neigs: int,
                 batchnorm_mode: str = "unbiased", unbiased: bool = False,
                 include_diag: bool = False, momentum: float = 0.9,
                 sort: bool = False, axis_name: Optional[str] = None):
        assert batchnorm_mode in ("biased", "unbiased", "none")
        self.apply_fn = apply_fn
        self.neigs = neigs
        self.batchnorm_mode = batchnorm_mode
        self.unbiased = unbiased
        self.diagonal = 0 if include_diag else 1
        self.momentum = momentum
        self.sort = sort
        self.axis_name = axis_name
        self.eigvals = None
        self.sort_indices = None

    def register_eigvals(self, eigvals):
        import numpy as np
        self.eigvals = np.asarray(eigvals)
        self.sort_indices = np.argsort(self.eigvals)[::-1].copy()

    def reset_eigvals(self):
        self.eigvals = None
        self.sort_indices = None

    def init_state(self, params):
        if self.batchnorm_mode == "none":
            return {}
        return {
            "norm_biased": jnp.ones((1, self.neigs), jnp.float32),
            "norm_unbiased": jnp.ones((1, self.neigs), jnp.float32),
            "initialized": jnp.zeros((), jnp.bool_),
        }

    # -- batch-L2 normalization (training path: differentiable norm) --------
    def _train_model(self, params, state):
        """Returns (model, collect) — model normalizes by the live batch norm
        (gradient flows through it, as in the reference), collect(out) gives
        the new EMA state."""
        if self.batchnorm_mode == "none":
            return (lambda x: self._raw(params, x)), (lambda outs: state)

        def model(x):
            out = self._raw(params, x)
            norm = jnp.linalg.norm(out, axis=0, keepdims=True) / jnp.sqrt(
                out.shape[0])
            if self.axis_name is not None:
                norm = jnp.sqrt(jax.lax.pmean(norm ** 2, self.axis_name))
            return out / norm

        def collect(out):
            out = jax.lax.stop_gradient(out)
            bn = jnp.linalg.norm(out, axis=0, keepdims=True) / jnp.sqrt(
                out.shape[0])
            if self.axis_name is not None:
                bn = jnp.sqrt(jax.lax.pmean(bn ** 2, self.axis_name))
            init = state["initialized"]
            m = self.momentum
            biased = jnp.where(init, m * state["norm_biased"] + (1 - m) * bn, bn)
            unbiased = jnp.where(
                init,
                jnp.sqrt(m * state["norm_unbiased"] ** 2 + (1 - m) * bn ** 2),
                bn)
            return {"norm_biased": biased, "norm_unbiased": unbiased,
                    "initialized": jnp.ones((), jnp.bool_)}

        return model, collect

    def _raw(self, params, x):
        out = self.apply_fn(params, x)
        if self.sort_indices is not None:
            out = out[:, jnp.asarray(self.sort_indices)]
        return out

    def eval_apply(self, params, state, x):
        """Stable eval entry (params/state traced — no per-eval retrace)."""
        out = self.apply_fn(params, x)
        if self.batchnorm_mode == "none":
            return out
        key = ("norm_biased" if self.batchnorm_mode == "biased"
               else "norm_unbiased")
        return out / state[key]

    def eval_fn(self, params, state):
        return lambda x: self.eval_apply(params, state, x)

    def register_norm(self, params, state, data, batch_size: int = 8192):
        """Calibrate the normalizer on a full dataset (exact, not EMA).

        Reference: BatchL2NormalizedFunctions.register_norm
        (methods/utils.py:70-86) — there a full-batch forward with an OOM
        -halving retry loop; here fixed-size batched accumulation of
        Σ‖f‖² (static shapes, one compile).  Returns the updated state.
        """
        if self.batchnorm_mode == "none":
            return state
        data = jnp.asarray(data)
        n = data.shape[0]
        sq = jnp.zeros((1, self.neigs), jnp.float32)
        count = 0
        fwd = jax.jit(lambda p, x: jnp.sum(
            jnp.square(self.apply_fn(p, x)), axis=0, keepdims=True))
        for i in range(0, n - batch_size + 1, batch_size):
            sq = sq + fwd(params, data[i:i + batch_size])
            count += batch_size
        rem = n - count
        if rem:  # one ragged tail batch (second compile at most)
            sq = sq + fwd(params, data[count:])
            count = n
        norm = jnp.sqrt(sq / count)
        return {**state, "norm_biased": norm, "norm_unbiased": norm,
                "initialized": jnp.ones((), jnp.bool_)}

    # -- operator path (reference :139-152) ---------------------------------
    def loss_and_grad(self, params, state, x, operator, importance=None):
        def loss_fn(p):
            model, collect = self._train_model(p, state)
            Tphi, phi = operator(model, x, importance)
            phi1, phi2 = jnp.split(phi, 2)
            Tphi1, Tphi2 = jnp.split(Tphi, 2)
            loss = neuralef_loss(self.axis_name, self.unbiased, self.diagonal,
                                 phi, Tphi, phi1, Tphi1, phi2, Tphi2)
            # EMA update from the *unnormalized* batch output
            raw = self._raw(p, x)
            new_state = collect(raw)
            return loss, (phi, Tphi, new_state)

        (loss, (phi, Tphi, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, grads, dict(f=phi, Tf=Tphi, eigvals=None), new_state

    # -- kernel path (reference :117-137) -----------------------------------
    def loss_and_grad_kernel(self, params, state, x, get_approx_kernel_op,
                             importance=None, split_batch: bool = False):
        def loss_fn(p):
            model, collect = self._train_model(p, state)
            if split_batch:
                x1, x2 = jnp.split(x, 2)
                Kphi1, phi1 = get_approx_kernel_op(x2)(model, x1, importance)
                Kphi2, phi2 = get_approx_kernel_op(x1)(model, x2, importance)
                phi = jnp.concatenate([phi1, phi2])
                Kphi = jnp.concatenate([Kphi1, Kphi2])
                loss = neuralef_loss(self.axis_name, self.unbiased,
                                     self.diagonal, phi, Kphi, phi1, Kphi1,
                                     phi2, Kphi2)
            else:
                Kphi, phi = get_approx_kernel_op(x)(model, x, importance)
                loss = neuralef_loss(self.axis_name, self.unbiased,
                                     self.diagonal, phi, Kphi, phi, Kphi,
                                     phi, Kphi)
            raw = self._raw(p, x)
            return loss, (phi, Kphi, collect(raw))

        (loss, (phi, Kphi, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, grads, dict(f=phi, Tf=Kphi, eigvals=None), new_state
