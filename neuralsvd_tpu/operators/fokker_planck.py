"""Negative linear Fokker–Planck operator.

-K f = -(∇²f + ∇V·∇f + f ∇²V), scaled.  Needs gradients of both f and the
potential — both come from the batched FD (or exact) Laplacian with
``return_grad=True`` (reference: examples/operator/pde/others.py:6-34).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from neuralsvd_tpu.operators.diff_ops import VectorizedLaplacian


def sin_of_cos_potential(xs, cs):
    cs = jnp.asarray(cs, dtype=xs.dtype)
    return jnp.sin(jnp.sum(jnp.cos(xs) * cs[None, :], axis=-1))


class NegativeLinearFokkerPlanck:
    def __init__(self, local_potential_ftn: Callable, scale: float = 1.0,
                 laplacian_eps: float = 1e-5, laplacian_mode: str = "forward"):
        self.laplacian = VectorizedLaplacian(eps=laplacian_eps,
                                             exact_mode=laplacian_mode)
        self.local_potential_ftn = local_potential_ftn
        self.scale = scale

    def __call__(self, f, xs, importance: Optional[Callable] = None):
        if importance is None:
            lap_f, grad_f, fs = self.laplacian(f, xs, return_grad=True)
        else:
            g = lambda x: jnp.sqrt(importance(x)) * f(x)
            lap_g, grad_g, gs = self.laplacian(g, xs, return_grad=True)
            sqrt_ws = jnp.sqrt(importance(xs))  # (B, 1)
            lap_f = lap_g / sqrt_ws
            grad_f = grad_g / sqrt_ws[..., None]
            fs = gs / sqrt_ws
        pot_fn = lambda x: self.local_potential_ftn(x).reshape(-1, 1)
        lap_pot, grad_pot, _ = self.laplacian(
            pot_fn, xs.reshape(xs.shape[0], -1), return_grad=True)
        # grad_pot: (B, 1, D); lap_pot: (B, 1)
        Kf = -(lap_f
               + jnp.einsum("bd,bld->bl", grad_pot[:, 0, :], grad_f)
               + fs * lap_pot)
        return -self.scale * Kf, fs
