"""SpIN (Spectral Inference Networks) — the dual-channel masked gradient.

Reference: methods/spin.py.  The reference combines (a) a pi-channel
gradient flowing through a custom Covariance backward into autograd with
(b) manually-written ``p.grad`` terms contracting EMA'd per-parameter
Jacobian averages with the Cholesky-derived gsigma matrix (:130-169).

JAX restructuring (SURVEY §7 "hard parts"): one pure function returns the
*summed* gradient —

  grads = vjp(operator∘model)(pi-cotangents)  +  Σ gsigma ⊙ j_avg

with sigma_avg / j_avg threaded as explicit method state.  The j_avg
update is computed as jacrev of h(p) = (2/B)·stop_grad(phi)ᵀ·phi(p), whose
Jacobian is exactly the reference's ``2/B Σ_b phi[b,m]·∂phi[b,l]/∂θ``
(L² reverse passes instead of the reference's B·L via vmap(jacrev) —
cheaper whenever L² < B·L, which holds for every shipped config).

Per-parameter j_avg stores an (L, L, *param.shape) tensor — SpIN's inherent
memory cost (the reason NestedLoRA beats it at scale).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def spin_step(sigma, pi, jitter: float = 1e-3):
    """Cholesky whitening step (reference: methods/spin.py:33-38)."""
    L = sigma.shape[0]
    chol = jnp.linalg.cholesky(sigma + jitter * jnp.eye(L, dtype=sigma.dtype))
    chol_inv = jnp.linalg.inv(chol)
    Lambda = chol_inv @ pi @ chol_inv.T
    eigvals = jnp.diagonal(Lambda)
    return chol, chol_inv, Lambda, eigvals


def spin_grad_matrices(sigma_avg, pi):
    """loss, eigvals, chol and the two masked-gradient matrices gsigma/gpi.

    Reference: methods/spin.py:41-59 (SpINFunction.forward).
    """
    chol, chol_inv, Lambda, eigvals = spin_step(sigma_avg, pi)
    loss = jnp.trace(Lambda)
    diag_chol_inv = jnp.diag(jnp.diagonal(chol_inv))
    triu = jnp.triu(Lambda @ diag_chol_inv)
    gsigma = chol_inv.T @ triu
    gpi = -chol_inv.T @ diag_chol_inv
    return loss, eigvals, chol, gsigma, gpi


class SpIN:
    name = "spin"

    def __init__(self, apply_fn: Callable, neigs: int, decay: float = 0.01,
                 axis_name: Optional[str] = None):
        """decay: 0 = frozen moving average, 1 = no memory
        (reference: methods/spin.py:104-109)."""
        self.apply_fn = apply_fn
        self.neigs = neigs
        self.decay = decay
        self.axis_name = axis_name

    def init_state(self, params):
        L = self.neigs
        j_avg = jax.tree.map(
            lambda p: jnp.zeros((L, L) + p.shape, p.dtype), params)
        return {
            "sigma_avg": jnp.zeros((L, L), jnp.float32),
            "chol": jnp.eye(L, dtype=jnp.float32),
            "j_avg": j_avg,
        }

    def _ema(self, prev, new):
        return (1 - self.decay) * prev + self.decay * new

    def _pmean(self, x):
        return x if self.axis_name is None else jax.lax.pmean(x, self.axis_name)

    def loss_and_grad(self, params, state, x, operator, importance=None):
        def fwd(p):
            model = lambda xx: self.apply_fn(p, xx)
            Tphi, phi = operator(model, x, importance)
            return Tphi, phi

        (Tphi, phi), vjp_fn = jax.vjp(fwd, params)
        B = phi.shape[0]
        sigma = self._pmean(
            jnp.einsum("bl,bm->lm", phi, phi, precision=_HI) / B)
        pi = self._pmean(
            jnp.einsum("bl,bm->lm", phi, Tphi, precision=_HI) / B)
        sigma_avg = self._ema(state["sigma_avg"], sigma)
        loss, eigvals, chol, gsigma, gpi = spin_grad_matrices(sigma_avg, pi)

        # pi channel: the reference Covariance backward deliberately returns
        # (y @ g / B, x @ g / B) — NOT the transpose-correct autograd pair
        # (methods/spin.py:76-100, "crucial for the correct behavior").
        n = 1 if self.axis_name is None else jax.lax.axis_size(self.axis_name)
        d_phi = Tphi @ gpi / (B * n)
        d_Tphi = phi @ gpi / (B * n)
        grads_pi = vjp_fn((d_Tphi, d_phi))[0]

        # sigma channel: j_new[m, l, ...] = 2/B Σ_b phi[b,m] ∂phi[b,l]/∂θ
        phi_sg = jax.lax.stop_gradient(phi)

        def h(p):
            out = self.apply_fn(p, x)
            g = jnp.einsum("bm,bl->ml", phi_sg, out, precision=_HI) * (2.0 / B)
            return self._pmean(g)

        j_new = jax.jacrev(h)(params)
        j_avg = jax.tree.map(lambda a, jn: self._ema(a, jn),
                             state["j_avg"], j_new)
        grads_sigma = jax.tree.map(
            lambda j: jnp.einsum("lm,lm...->...", gsigma, j), j_avg)
        grads = jax.tree.map(jnp.add, grads_pi, grads_sigma)

        new_state = {"sigma_avg": sigma_avg, "chol": chol, "j_avg": j_avg}
        aux = dict(f=phi, Tf=Tphi, eigvals=eigvals)
        return loss, grads, aux, new_state

    def loss_and_grad_kernel(self, params, state, x, get_approx_kernel_op,
                             importance=None, split_batch: bool = False):
        if not split_batch:
            op = lambda model, xx, imp=None: get_approx_kernel_op(xx)(model, xx, imp)
            return self.loss_and_grad(params, state, x, op, importance)

        # split-batch kernel path (reference: methods/spin.py:181-188):
        # sigma from [phi1; phi2], pi/jacobians from the first half only.
        x1, x2 = jnp.split(x, 2)

        def fwd(p):
            model = lambda xx: self.apply_fn(p, xx)
            Kphi1, phi1 = get_approx_kernel_op(x2)(model, x1, importance)
            phi2 = model(x2)
            return Kphi1, phi1, phi2

        (Kphi1, phi1, phi2), vjp_fn = jax.vjp(fwd, params)
        phi_full = jnp.concatenate([phi1, phi2])
        Bs = phi_full.shape[0]
        B = phi1.shape[0]
        sigma = self._pmean(
            jnp.einsum("bl,bm->lm", phi_full, phi_full, precision=_HI) / Bs)
        pi = self._pmean(
            jnp.einsum("bl,bm->lm", phi1, Kphi1, precision=_HI) / B)
        sigma_avg = self._ema(state["sigma_avg"], sigma)
        loss, eigvals, chol, gsigma, gpi = spin_grad_matrices(sigma_avg, pi)
        n = 1 if self.axis_name is None else jax.lax.axis_size(self.axis_name)
        d_phi1 = Kphi1 @ gpi / (B * n)
        d_Kphi1 = phi1 @ gpi / (B * n)
        grads_pi = vjp_fn((d_Kphi1, d_phi1, jnp.zeros_like(phi2)))[0]

        phi_sg = jax.lax.stop_gradient(phi1)

        def h(p):
            out = self.apply_fn(p, x1)
            g = jnp.einsum("bm,bl->ml", phi_sg, out, precision=_HI) * (2.0 / B)
            return self._pmean(g)

        j_new = jax.jacrev(h)(params)
        j_avg = jax.tree.map(lambda a, jn: self._ema(a, jn),
                             state["j_avg"], j_new)
        grads_sigma = jax.tree.map(
            lambda j: jnp.einsum("lm,lm...->...", gsigma, j), j_avg)
        grads = jax.tree.map(jnp.add, grads_pi, grads_sigma)
        new_state = {"sigma_avg": sigma_avg, "chol": chol, "j_avg": j_avg}
        return loss, grads, dict(f=phi1, Tf=Kphi1, eigvals=eigvals), new_state

    def eval_apply(self, params, state, x):
        """Orthonormalized eigenfunctions via triangular solve against the
        stored Cholesky (reference: methods/spin.py:209-215).  Stable eval
        entry: params/state traced — no per-eval retrace."""
        out = self.apply_fn(params, x)
        return jax.scipy.linalg.solve_triangular(
            state["chol"], out.T, lower=True).T

    def eval_fn(self, params, state):
        return lambda x: self.eval_apply(params, state, x)
