"""Nyström method: classical kernel EVD baseline.

Eigendecompose the empirical kernel on a training sample; extend out of
sample via  f(x_new) = k(x_new, X) V / λ / sqrt(n).
Reference: methods/nystrom.py.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


class Nystrom:
    name = "nystrom"

    def __init__(self, kernel: Optional[Callable], xs, dim: int,
                 emp_kernel=None):
        self.kernel = kernel
        self.xs = jnp.asarray(xs)
        self.dim = dim
        self.eigvals, self.eigvecs, self.training_time = self.evd(
            self.xs, kernel, dim, emp_kernel)

    def __call__(self, xnew):
        K = self.kernel(jnp.asarray(xnew), self.xs)  # (B, n)
        return (K @ self.eigvecs / self.eigvals
                / np.sqrt(self.xs.shape[0]))

    @staticmethod
    def evd(xs, kernel, dim, emp_kernel=None):
        start = time.time()
        if emp_kernel is None:
            assert kernel is not None, "need kernel or emp_kernel"
            emp_kernel = kernel(xs, xs)
        emp_kernel = np.asarray(emp_kernel)
        eigvals, eigvecs = np.linalg.eigh(emp_kernel)
        eigvals = eigvals[::-1][:dim] / xs.shape[0]
        eigvecs = eigvecs[:, ::-1][:, :dim]
        return (jnp.asarray(eigvals.copy()), jnp.asarray(eigvecs.copy()),
                time.time() - start)


def run_nystrom(kernel, neigs, train_data, val_data, log_dir=None,
                emp_kernel=None):
    nystrom = Nystrom(kernel, train_data, neigs, emp_kernel)
    eigvals = np.asarray(nystrom.eigvals)
    eigfuncs = np.asarray(nystrom(val_data))
    if log_dir is not None:
        np.savez(f"{log_dir}/eigvals.npz", eigvals=eigvals, eigfuncs=eigfuncs)
    return eigvals, eigfuncs, nystrom.training_time
