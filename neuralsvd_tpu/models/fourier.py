"""Gaussian / deterministic Fourier feature maps.

Reference: examples/utils.py:90-143 (GaussianFourierFeatureTransform).

The projection matrix B is a fixed (non-trainable) buffer; here it is a
closure constant baked into the jitted graph (it is small: D x mapping_size),
so ``init`` contributes no trainable leaves.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_fourier_features(
    input_dim: int,
    mapping_size: int = 256,
    scale: float = 10.0,
    deterministic: bool = False,
    append_raw: bool = False,
    seed: int = 0,
    append_radial: bool = False,
    append_envelopes=(),
    n_particles: int = 1,
):
    """Returns ``(init, apply)``; ``apply.feature_dim`` gives the output dim.

    deterministic=True uses the integer-frequency bank
    ``B = scale * [I, 2I, ..., mI]`` (for periodic problems on [-pi, pi]);
    otherwise a Gaussian random projection ``2*pi*scale*N(0,1)``.

    ``append_radial`` concatenates per-particle radial norms ‖x_p‖ (cusp
    features, beyond the reference): Coulomb eigenfunctions have r-cusps at
    nuclei that no smooth feature of x can represent, but every hydrogenic
    eigenfunction is smooth in (r, angles) — exposing r makes e^{-βr}
    representable and removes the dominant ground-state bias.

    ``append_envelopes``: decay rates κ_k; concatenates per-particle
    ``exp(-κ_k·‖x_p‖)`` features.  For hydrogenic problems the exact
    asymptotic envelopes are κ_n = Z/(n+1/2) (2D) — giving the network the
    shell envelopes as *inputs* lets every mode combine them linearly,
    strictly more flexible than a multiplicative output mask.
    """
    if deterministic:
        B = scale * np.concatenate(
            [i * np.eye(input_dim) for i in range(1, mapping_size + 1)], axis=0
        ).T  # (input_dim, input_dim * mapping_size)
        eff_mapping = input_dim * mapping_size
    else:
        rng = np.random.default_rng(seed)
        B = 2 * np.pi * scale * rng.standard_normal((input_dim, mapping_size))
        eff_mapping = mapping_size
    B = jnp.asarray(B, dtype=jnp.float32)
    kappas = np.asarray(tuple(append_envelopes), dtype=np.float32)
    feature_dim = (2 * eff_mapping + (input_dim if append_raw else 0)
                   + (n_particles if append_radial else 0)
                   + n_particles * len(kappas))

    def init(key):
        return {}

    def apply(params, x):
        x = x.reshape(x.shape[0], -1)  # (B, n_particles*D) -> flat
        proj = x @ B
        feats = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        if append_raw:
            feats = jnp.concatenate([feats, x], axis=-1)
        if append_radial or len(kappas):
            per_particle = x.reshape(x.shape[0], n_particles, -1)
            r = jnp.sqrt(jnp.sum(per_particle ** 2, axis=-1) + 1e-12)
            if append_radial:
                feats = jnp.concatenate([feats, r], axis=-1)
            if len(kappas):
                env = jnp.exp(-r[:, :, None] * jnp.asarray(kappas))
                feats = jnp.concatenate(
                    [feats, env.reshape(x.shape[0], -1)], axis=-1)
        return feats

    apply.feature_dim = feature_dim
    return init, apply
