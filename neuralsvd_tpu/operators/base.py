"""Operator protocol helpers and simple closed-form operators for testing."""
from __future__ import annotations

import jax.numpy as jnp


class OperatorWrapper:
    """Affine spectral transform ``T -> scale*T + shift*I``.

    Shifts/scales the spectrum so the top-L eigenvalues are positive and
    well-separated (reference: examples/__init__.py:1-9).
    """

    def __init__(self, operator, scale: float = 1.0, shift: float = 0.0):
        self.operator = operator
        self.scale = scale
        self.shift = shift

    @property
    def singular_at_origin(self) -> bool:
        """Forwarded from the wrapped operator (spectrum eval zeroes
        T(phi) at the origin only for singular potentials)."""
        return getattr(self.operator, "singular_at_origin", False)

    @property
    def needs_key(self) -> bool:
        """Forwarded: True for stochastic operators (Hutchinson Laplacian)
        that want a per-step PRNG key bound by the train step."""
        return getattr(self.operator, "needs_key", False)

    def __call__(self, f, x, importance=None, key=None):
        if key is not None and self.needs_key:
            Tf, fs = self.operator(f, x, importance, key=key)
        else:
            Tf, fs = self.operator(f, x, importance)
        return self.scale * Tf + self.shift * fs, fs


class MatrixOperator:
    """Finite symmetric operator ``(Tf)(x_b) = (A f)_b`` on a fixed grid.

    The trivial oracle operator for tests (SURVEY §4): A is (B, B) applied
    to per-batch function values.
    """

    def __init__(self, A):
        self.A = jnp.asarray(A)

    def __call__(self, f, x, importance=None):
        fs = f(x)
        return self.A @ fs, fs


class KernelOperator:
    """Empirical kernel smoothing operator ``(Tf)(x) = E_{x'}[k(x,x') f(x')]``.

    ``kernel(x, xp) -> (B, B')``; expectation over a landmark batch ``xp``.
    Used for kernel-EVD paths (reference: the get_approx_kernel_op closures
    in methods/nestedlora.py:230-252).
    """

    def __init__(self, kernel, landmarks):
        self.kernel = kernel
        self.landmarks = landmarks

    def __call__(self, f, x, importance=None):
        fs = f(x)
        f_land = f(self.landmarks)
        K = self.kernel(x, self.landmarks)  # (B, B')
        Tf = K @ f_land / self.landmarks.shape[0]
        return Tf, fs
