"""Training-point samplers and importance densities, device-native.

TPU-first departure from the reference: the reference draws batches on host
and ships them with ``.to(device)`` every step (examples/operator/pde/
main_pde.py:89-135, the single host→device boundary in its hot loop).  Here
samplers are pure functions of a PRNG key that run *inside* the jitted train
step — zero host↔device traffic during training.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_sampler(sampling_mode: str, batch_size: int, n_particles: int,
                ndim: int, sampling_scale: float,
                sampling_weights=None) -> Tuple[Callable, Callable]:
    """Returns (sample(key) -> (B, n_particles*ndim), importance(x) -> (B, 1)).

    The importance function is the sampling density (used for operator
    conjugation and train→val reweighting).  ``sampling_weights`` (mixture
    mode only) sets non-uniform component probabilities — e.g. overweight
    the tightest scale to feed a short-length-scale eigenfunction more
    quadrature without adding components.
    """
    d = n_particles * ndim
    shape = (batch_size, d)

    if sampling_mode == "gaussian":
        def sample(key):
            return sampling_scale * jax.random.normal(key, shape)

        log_norm = -0.5 * d * np.log(2 * np.pi * sampling_scale ** 2)

        def importance(x):
            x = x.reshape(x.shape[0], -1)
            logp = log_norm - 0.5 * jnp.sum(x ** 2, axis=-1) / sampling_scale ** 2
            return jnp.exp(logp).reshape(-1, 1)

        return sample, importance

    if sampling_mode == "laplacian":
        def sample(key):
            return sampling_scale * jax.random.laplace(key, shape)

        log_norm = -d * np.log(2 * sampling_scale)

        def importance(x):
            x = x.reshape(x.shape[0], -1)
            logp = log_norm - jnp.sum(jnp.abs(x), axis=-1) / sampling_scale
            return jnp.exp(logp).reshape(-1, 1)

        return sample, importance

    if sampling_mode == "gaussian_mixture":
        # sampling_scale: sequence of component std-devs (equal weights).
        # A multi-scale mixture is the quadrature fix for problems whose
        # eigenfunctions live on very different length scales (hydrogen:
        # the 1s core at r~0.25 gets ~0.2% of a scale-16 Gaussian's
        # samples; a tight component feeds it signal every batch).  The
        # density is exact, so importance conjugation stays unbiased.
        scales = np.asarray(sampling_scale, dtype=np.float32).ravel()
        assert scales.size > 1, "gaussian_mixture needs >= 2 scales"
        K = scales.size
        if sampling_weights is None:
            weights = np.full(K, 1.0 / K, dtype=np.float32)
        else:
            weights = np.asarray(sampling_weights, dtype=np.float32).ravel()
            assert weights.size == K and (weights > 0).all()
            weights = weights / weights.sum()
        scales_j = jnp.asarray(scales)
        weights_j = jnp.asarray(weights)
        log_norms = -0.5 * d * np.log(2 * np.pi * scales ** 2)  # (K,)
        log_norms_j = jnp.asarray(log_norms.astype(np.float32))
        log_weights_j = jnp.asarray(np.log(weights))

        def sample(key):
            kc, kn = jax.random.split(key)
            comp = jax.random.choice(kc, K, (batch_size,), p=weights_j)
            s = scales_j[comp][:, None]
            return s * jax.random.normal(kn, shape)

        def importance(x):
            x = x.reshape(x.shape[0], -1)
            r2 = jnp.sum(x ** 2, axis=-1, keepdims=True)  # (B, 1)
            logps = (log_weights_j[None, :] + log_norms_j[None, :]
                     - 0.5 * r2 / scales_j[None, :] ** 2)  # (B, K)
            logp = jax.scipy.special.logsumexp(logps, axis=1)
            return jnp.exp(logp).reshape(-1, 1)

        return sample, importance

    if sampling_mode == "uniform":
        def sample(key):
            return sampling_scale * (2 * jax.random.uniform(key, shape) - 1)

        def importance(x):
            density = 1.0 / (2 * sampling_scale) ** d
            return jnp.full((x.shape[0], 1), density, dtype=jnp.float32)

        return sample, importance

    raise NotImplementedError(sampling_mode)


def make_val_mc(sampling_mode: str, n_val: int, n_particles: int, ndim: int,
                sampling_scale, batch_size: int, seed: int = 12345,
                sampling_weights=None):
    """Monte-Carlo validation set for dimensions where a meshgrid explodes
    (ndim > 2 or multi-particle problems — grid size is (2·lim/eps)^D).

    Draws a FIXED set of n_val points from the given sampling density and
    returns (val_data (n_val, D), batch_iter_factory, importance_val) with
    ``importance_val`` = that density, so the spectrum eval's w_train/w_val
    reweighting (methods/spectrum.py::_accumulate_evd_impl) yields unbiased
    Lebesgue Rayleigh quotients — same estimator as the reference's uniform
    grid (main_pde.py:120-130), different quadrature.  The set is fixed
    across evals so eigenvalue traces are comparable run-long.
    """
    sample, importance = get_sampler(sampling_mode, n_val, n_particles,
                                     ndim, sampling_scale,
                                     sampling_weights=sampling_weights)
    val_data = np.asarray(sample(jax.random.key(seed)), dtype=np.float32)

    def batches():
        for i in range(0, len(val_data), batch_size):
            yield val_data[i:i + batch_size]

    return val_data, batches, importance


def make_val_grid(ndim: int, lim: float, val_eps: float, batch_size: int):
    """Meshgrid validation set over [-lim, lim]^ndim with uniform importance.

    Returns (val_data (N, ndim), batch_iter_factory, importance_val).
    Reference: main_pde.py:120-130.  Only sensible for ndim <= 2.
    """
    xs = np.arange(-lim, lim, val_eps)
    grids = np.meshgrid(*(ndim * [xs]))
    val_data = np.stack([g.ravel() for g in grids], axis=1).astype(np.float32)

    def batches():
        for i in range(0, len(val_data), batch_size):
            yield val_data[i:i + batch_size]

    def importance_val(x):
        density = 1.0 / (2 * lim) ** ndim
        return jnp.full((x.shape[0], 1), density, dtype=jnp.float32)

    return val_data, batches, importance_val
