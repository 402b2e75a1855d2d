"""Boundary masks and wavefunction assembly for the PDE experiments.

``wavefunction(x) = hard_mul_const * base_mlp(x) * boundary_mask(x)``

Reference: examples/operator/pde/boundary.py and
examples/operator/pde/__init__.py:8-55.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.models.fourier import make_fourier_features
from neuralsvd_tpu.models.mlp import make_mlp_eigfuncs


def dirichlet_box_mask(x: jax.Array, lim: float, mode: str = "dir_box_sqrt"):
    """Zero-Dirichlet mask on the box [-lim, lim]^d.

    'dir_box_sqrt' (Pfau et al. 2018) / 'dir_box_exp' (Jin et al. 2022);
    reference: examples/operator/pde/boundary.py:16-36.  Returns (B, 1).
    """
    x = jnp.clip(x, -lim, lim).reshape(x.shape[0], -1)
    if mode == "dir_box_sqrt":
        per_dim = jnp.maximum(
            (jnp.sqrt(2 * lim**2 - x**2) - lim) / lim, 0.0)
    elif mode == "dir_box_exp":
        per_dim = (1 - jnp.exp(-(lim - x))) * (1 - jnp.exp(-(x + lim)))
    else:
        raise NotImplementedError(mode)
    return jnp.prod(per_dim, axis=-1, keepdims=True)


def make_exponential_mask(output_dim: int, init_scale=1000.0,
                          box_mask=None, conjugate_importance=None):
    """Learnable radial decay ``exp(-r / s_l)`` per mode.

    The scales are trainable parameters (reference:
    examples/operator/pde/boundary.py:39-53).  ``init_scale`` may be a
    scalar or a (min, max) pair giving a geometric ladder across modes —
    under sequential nesting mode order tracks the spectrum, so tight
    scales seed the compact low modes and loose scales the diffuse tail.

    ``conjugate_importance``: sampling density w(x).  Under importance
    conjugation the model learns f = ψ/√w, whose tails decay SLOWER than
    the physical eigenfunction ψ; with this set the mask becomes
    ``e^{-r/s_l} · √(w(0)/w(x))`` so that the *physical* ψ = √w·f carries
    the ``e^{-r/s_l}`` envelope while the MLP only models the smooth part
    (validated finding: Lebesgue-asymptotic masks strangle diffuse modes
    under Gaussian sampling — BASELINE.md).
    """

    def init(key):
        if isinstance(init_scale, (tuple, list, np.ndarray)):
            if len(init_scale) == output_dim:  # explicit per-mode scales
                scales = jnp.asarray(np.asarray(init_scale), jnp.float32)
            else:
                lo, hi = init_scale
                scales = jnp.asarray(
                    np.geomspace(lo, hi, output_dim), jnp.float32)
        else:
            scales = init_scale * jnp.ones((output_dim,), jnp.float32)
        return {"scales": scales}

    def apply(params, x):
        x2 = x.reshape(x.shape[0], -1)
        r = jnp.linalg.norm(x2, axis=-1, keepdims=True)
        mask = jnp.exp(-r / params["scales"][None, :])  # (B, L)
        if conjugate_importance is not None:
            w = conjugate_importance(x2).reshape(-1, 1)
            w0 = conjugate_importance(jnp.zeros_like(x2[:1])).reshape(1, 1)
            mask = mask * jnp.sqrt(w0 / jnp.clip(w, min=1e-30))
        if box_mask is not None:
            mask = mask * box_mask(x)
        return mask

    return init, apply


def scale_mode_amplitudes(params, mode_idx, factors):
    """Multiply the output amplitude of selected ParallelMLP modes.

    Scales the FINAL tower layer's weights/bias for the given mode slots,
    so the wavefunction outputs scale linearly while earlier layers (and
    shared feature maps) are untouched.  Used by the rescue path: a mode
    re-initialized at init-scale norm (~1e0) among converged peers
    (~1e5+) has its RMSprop second moment saturated by the giant
    deflation gradients and cannot grow — matching amplitudes restores
    the balanced race that from-scratch training has (BASELINE.md L=36).

    ``mode_idx``: int array (K,); ``factors``: (K,) per-mode multipliers.
    """
    mode_idx = jnp.asarray(np.asarray(mode_idx))
    factors = jnp.asarray(np.asarray(factors), jnp.float32)
    base = dict(params["base"])
    ws = list(base["ws"])
    f_w = factors.reshape(-1, *([1] * (ws[-1].ndim - 1)))
    ws[-1] = ws[-1].at[mode_idx].multiply(f_w)
    base["ws"] = ws
    if base.get("bs"):
        bs = list(base["bs"])
        f_b = factors.reshape(-1, *([1] * (bs[-1].ndim - 1)))
        bs[-1] = bs[-1].at[mode_idx].multiply(f_b)
        base["bs"] = bs
    return {**params, "base": base}


def make_wavefunctions(
    ndim: int,
    neigs: int,
    mlp_hidden_dims: Sequence[int],
    nonlinearity: str = "relu",
    n_particles: int = 1,
    parallel: bool = False,
    use_fourier_feature: bool = False,
    fourier_mapping_size: int = 256,
    fourier_scale: float = 10.0,
    fourier_deterministic: bool = False,
    fourier_append_raw: bool = False,
    fourier_append_radial: bool = False,
    fourier_append_envelopes=(),
    fourier_seed: int = 0,
    apply_boundary: bool = True,
    boundary_mode: str = "dir_box_sqrt",
    lim: float = 1.0,
    apply_exp_mask: bool = False,
    exp_mask_init_scale=1000.0,
    exp_mask_conjugate_importance=None,
    hard_mul_const: float = 1.0,
    debug: bool = False,
    compute_dtype=None,
    matmul_precision=None,
):
    """Build the full wavefunction model (reference: pde/__init__.py:19-55).

    Returns (init, apply) with apply(params, x)->(B, L).
    """
    input_dim = ndim * n_particles
    feature_map = None
    if use_fourier_feature:
        feature_map = make_fourier_features(
            input_dim=input_dim,
            mapping_size=fourier_mapping_size,
            scale=fourier_scale,
            deterministic=fourier_deterministic,
            append_raw=fourier_append_raw,
            append_radial=fourier_append_radial,
            append_envelopes=fourier_append_envelopes,
            n_particles=n_particles,
            seed=fourier_seed,
        )
    base_init, base_apply = make_mlp_eigfuncs(
        input_dim=input_dim,
        neigs=neigs,
        mlp_hidden_dims=mlp_hidden_dims,
        nonlinearity=nonlinearity,
        parallel=parallel,
        feature_map=feature_map,
        debug=debug,
        compute_dtype=compute_dtype,
        matmul_precision=matmul_precision,
    )

    box = None
    if apply_boundary:
        box = lambda x: dirichlet_box_mask(x, lim=lim, mode=boundary_mode)

    exp_init = exp_apply = None
    if apply_exp_mask:
        exp_init, exp_apply = make_exponential_mask(
            neigs, init_scale=exp_mask_init_scale, box_mask=box,
            conjugate_importance=exp_mask_conjugate_importance)

    def init(key):
        k1, k2 = jax.random.split(key)
        params = {"base": base_init(k1)}
        if exp_init is not None:
            params["mask"] = exp_init(k2)
        return params

    def apply(params, x):
        x2 = x.reshape(x.shape[0], -1)
        out = base_apply(params["base"], x2)
        if exp_apply is not None:
            out = out * exp_apply(params["mask"], x2)
        elif box is not None:
            out = out * box(x2)
        return hard_mul_const * out

    return init, apply
