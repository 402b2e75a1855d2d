"""Schrödinger Hamiltonians and potentials.

Reference: examples/operator/pde/schrodinger/__init__.py,
examples/operator/pde/schrodinger/potentials.py.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.operators.diff_ops import VectorizedLaplacian


# ---------------------------------------------------------------------------
# Potentials (reference: schrodinger/potentials.py)
# ---------------------------------------------------------------------------

def hydrogen_potential(x, charge: float = 1.0):
    """V(r) = -Z/|r|; x: (B, n_particles, D) or (B, D). Returns (B, 1)."""
    x = x.reshape(x.shape[0], -1)
    return -(charge / jnp.linalg.norm(x, axis=-1)).reshape(-1, 1)


def hydrogen_mol_ion_potential(x, R: float, charge: float = 2.0):
    """H2+ two-center Coulomb; nuclei at ±R along the last axis."""
    x = x.reshape(x.shape[0], -1)
    e = jnp.zeros((x.shape[-1],), x.dtype).at[-1].set(1.0)
    return (hydrogen_potential(x - R * e, charge)
            + hydrogen_potential(x + R * e, charge))


def infinite_well_potential(x):
    return jnp.zeros((x.shape[0], 1), x.dtype)


def harmonic_oscillator_potential(x, k: float = 1.0):
    x = x.reshape(x.shape[0], -1)
    return (k * jnp.sum(x ** 2, axis=-1)).reshape(-1, 1)


def cosine_potential(x, cs):
    cs = jnp.asarray(cs, dtype=x.dtype)
    x = x.reshape(x.shape[0], -1)
    return jnp.sum(jnp.cos(x) * cs[None, :], axis=-1).reshape(-1, 1)


# quantum chemistry local energy (reference: potentials.py:36-57)

def nuclear_energy(coords, charges):
    diff = coords[:, None, :] - coords[None, :, :]
    dists = jnp.linalg.norm(diff, axis=-1)
    coulombs = charges[:, None] * charges[None, :] / jnp.where(dists > 0, dists, 1.0)
    return jnp.sum(jnp.triu(coulombs, k=1))


def nuclear_potential(rs, coords, charges):
    # rs: (B, n_elec, D)
    dists = jnp.linalg.norm(rs[:, :, None, :] - coords[None, None, :, :], axis=-1)
    return -jnp.sum(charges / dists, axis=(-1, -2))


def electronic_potential(rs):
    n = rs.shape[-2]
    i, j = np.triu_indices(n, k=1)
    dists = jnp.linalg.norm(rs[:, i, :] - rs[:, j, :], axis=-1)
    return jnp.sum(1.0 / dists, axis=-1)


def local_potential_energy(rs, coords, charges):
    return (nuclear_energy(coords, charges)
            + nuclear_potential(rs, coords, charges)
            + electronic_potential(rs)).reshape(-1, 1)


# ---------------------------------------------------------------------------
# Hamiltonian operator
# ---------------------------------------------------------------------------

class NegativeHamiltonian:
    """-H f = -(-scale_kinetic ∇²f + V(x) f).

    Negated so the top eigenvalues correspond to the lowest-energy states
    (reference: schrodinger/__init__.py:4-22).
    """

    def __init__(self, local_potential_ftn: Callable, scale_kinetic: float = 1.0,
                 laplacian_eps: float = 1e-5, laplacian_mode: str = "forward",
                 n_particles: int = 1, laplacian_probes: int = 0):
        self.laplacian = VectorizedLaplacian(eps=laplacian_eps,
                                             exact_mode=laplacian_mode,
                                             num_probes=laplacian_probes)
        self.local_potential_ftn = local_potential_ftn
        self.scale_kinetic = scale_kinetic
        self.n_particles = n_particles

    @property
    def needs_key(self) -> bool:
        """True when the Laplacian is the stochastic Hutchinson estimator
        (the train step then binds a per-step subkey; eval passes none and
        gets the exact engine)."""
        return self.laplacian.needs_key

    def __call__(self, f, xs, importance: Optional[Callable] = None,
                 key=None):
        lap, _, fs = self.laplacian(f, xs, importance, key=key)
        kinetic = -self.scale_kinetic * lap
        V = self.local_potential_ftn(
            xs.reshape(xs.shape[0], self.n_particles, -1)).reshape(-1, 1)
        hamiltonian = kinetic + V * fs
        return -hamiltonian, fs
