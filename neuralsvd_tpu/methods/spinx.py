"""SpINx — simplified SpIN: trace loss + per-mode residual losses with
NTK-style loss weighting.

Reference: methods/spinx.py.  Unlike SpIN, gradients here are plain
autodiff through the Cholesky whitening (the reference differentiates
through spin_step with regular autograd), so ``loss_and_grad`` is a
standard value_and_grad.  The EMA'd sigma only feeds the eval-time
orthonormalization, and the per-loss weights are refreshed occasionally
from Jacobian norms (NTK balancing, reference :114-146).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from neuralsvd_tpu.methods.spin import spin_step

_HI = jax.lax.Precision.HIGHEST


def spinx_losses(phi, Tphi, phi1, trace_weights, axis_name=None):
    """(L+1,) loss vector [trace, per-mode residuals] + batch sigma.

    Reference: methods/spinx.py:13-23.
    """
    def pmean(v):
        return v if axis_name is None else jax.lax.pmean(v, axis_name)

    sigma = pmean(jnp.einsum("bl,bm->lm", phi1, phi1, precision=_HI)
                  / phi1.shape[0])
    pi = pmean(jnp.einsum("bl,bm->lm", phi, Tphi, precision=_HI)
               / phi.shape[0])
    chol, chol_inv, Lambda, eigvals = spin_step(sigma, pi)
    loss_trace = jnp.sum(trace_weights * eigvals)
    residuals = Tphi @ chol_inv.T - (phi @ chol_inv.T) @ jnp.diag(eigvals)
    loss_residuals = pmean(jnp.mean(residuals ** 2, axis=0))  # (L,)
    losses = jnp.concatenate([loss_trace[None], loss_residuals])
    return losses, sigma


class SpINx:
    name = "spinx"

    def __init__(self, apply_fn: Callable, neigs: int, decay: float = 0.01,
                 axis_name: Optional[str] = None):
        self.apply_fn = apply_fn
        self.neigs = neigs
        self.decay = decay
        self.axis_name = axis_name
        self.trace_weights = jnp.ones((neigs,), jnp.float32)

    def init_state(self, params):
        L = self.neigs
        return {
            "sigma_avg": jnp.zeros((L, L), jnp.float32),
            "chol": jnp.eye(L, dtype=jnp.float32),
            "weights": jnp.ones((L + 1,), jnp.float32),
        }

    def _ema(self, prev, new):
        return (1 - self.decay) * prev + self.decay * new

    def _loss_vector(self, params, x, operator, importance, split_batch=False,
                     kernel_op=None):
        model = lambda xx: self.apply_fn(params, xx)
        if kernel_op is None:
            Tphi, phi = operator(model, x, importance)
            return spinx_losses(phi, Tphi, phi, self.trace_weights,
                                self.axis_name) + (phi, Tphi)
        if split_batch:
            x1, x2 = jnp.split(x, 2)
            Kphi1, phi1 = kernel_op(x2)(model, x1, importance)
            phi2 = model(x2)
            phi_full = jnp.concatenate([phi1, phi2])
            losses, sigma = spinx_losses(phi1, Kphi1, phi_full,
                                         self.trace_weights, self.axis_name)
            return losses, sigma, phi1, Kphi1
        Kphi, phi = kernel_op(x)(model, x, importance)
        losses, sigma = spinx_losses(phi, Kphi, phi, self.trace_weights,
                                     self.axis_name)
        return losses, sigma, phi, Kphi

    def loss_and_grad(self, params, state, x, operator, importance=None):
        weights = state["weights"]

        def loss_fn(p):
            losses, sigma, phi, Tphi = self._loss_vector(p, x, operator,
                                                         importance)
            loss = jnp.sum(losses * weights / self.neigs)
            return loss, (sigma, phi, Tphi)

        (loss, (sigma, phi, Tphi)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        sigma_avg = self._ema(state["sigma_avg"],
                              jax.lax.stop_gradient(sigma))
        chol = jnp.linalg.cholesky(
            sigma_avg + 1e-3 * jnp.eye(self.neigs, dtype=sigma_avg.dtype))
        new_state = {"sigma_avg": sigma_avg, "chol": chol, "weights": weights}
        return loss, grads, dict(f=phi, Tf=Tphi, eigvals=None), new_state

    def loss_and_grad_kernel(self, params, state, x, get_approx_kernel_op,
                             importance=None, split_batch: bool = False):
        weights = state["weights"]

        def loss_fn(p):
            losses, sigma, phi, Kphi = self._loss_vector(
                p, x, None, importance, split_batch, get_approx_kernel_op)
            loss = jnp.sum(losses * weights / self.neigs)
            return loss, (sigma, phi, Kphi)

        (loss, (sigma, phi, Kphi)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        sigma_avg = self._ema(state["sigma_avg"],
                              jax.lax.stop_gradient(sigma))
        chol = jnp.linalg.cholesky(
            sigma_avg + 1e-3 * jnp.eye(self.neigs, dtype=sigma_avg.dtype))
        new_state = {"sigma_avg": sigma_avg, "chol": chol, "weights": weights}
        return loss, grads, dict(f=phi, Tf=Kphi, eigvals=None), new_state

    # -- NTK loss-weight refresh (reference :114-146) ------------------------
    def refresh_weights(self, params, state, x, operator, importance=None,
                        split_batch: bool = False, kernel_op=None):
        def loss_vec(p):
            losses, *_ = self._loss_vector(p, x, operator, importance,
                                           split_batch, kernel_op)
            return losses  # (L+1,)

        jac = jax.jacrev(loss_vec)(params)  # each leaf: (L+1, *param.shape)
        ntk = sum(
            jnp.sum(j.reshape(self.neigs + 1, -1) ** 2, axis=-1)
            for j in jax.tree.leaves(jac))
        weights = jnp.sqrt(jnp.sum(ntk) / ntk)
        new_state = dict(state)
        new_state["weights"] = jax.lax.stop_gradient(weights)
        return new_state

    def eval_apply(self, params, state, x):
        out = self.apply_fn(params, x)
        return jax.scipy.linalg.solve_triangular(
            state["chol"], out.T, lower=True).T

    def eval_fn(self, params, state):
        return lambda x: self.eval_apply(params, state, x)
