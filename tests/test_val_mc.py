"""Monte-Carlo validation quadrature for ndim > 2 (make_val_mc).

The reference evaluates spectra on a uniform meshgrid (main_pde.py:120-130),
which explodes past 2D — its high-D problems (cosine 5D/10D) therefore never
get a quantitative eval.  make_val_mc replaces the grid with an importance
-weighted fixed sample from the training density; these tests pin the
estimator against closed-form oscillator eigenvalues.
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.data.samplers import make_val_mc
from neuralsvd_tpu.methods.spectrum import compute_spectrum_evd
from neuralsvd_tpu.operators.base import OperatorWrapper
from neuralsvd_tpu.operators.schrodinger import (
    NegativeHamiltonian,
    harmonic_oscillator_potential,
)


def _exact_oscillator_modes(x):
    """First two 5D oscillator eigenfunctions (k=1): exp(-r²/2) at E=5 and
    x₀·exp(-r²/2) at E=7 (for -H + 10·I: eigvals 5 and 3)."""
    r2 = jnp.sum(x ** 2, axis=-1, keepdims=True)
    g = jnp.exp(-0.5 * r2)
    return jnp.concatenate([g, x[:, :1] * g], axis=1)


def test_val_mc_rayleigh_matches_closed_form():
    op = OperatorWrapper(
        NegativeHamiltonian(local_potential_ftn=harmonic_oscillator_potential,
                            laplacian_eps=-1.0),
        scale=1.0, shift=10.0)
    _, batches, importance_val = make_val_mc(
        "gaussian", n_val=8192, n_particles=1, ndim=5, sampling_scale=1.0,
        batch_size=2048, seed=3)
    out = compute_spectrum_evd(_exact_oscillator_modes, batches(), op,
                               importance_val=importance_val)
    np.testing.assert_allclose(np.asarray(out["eigvals"]), [5.0, 3.0],
                               rtol=0.03)


def test_val_mc_fixed_and_batched():
    """The val set is identical across factory calls (eval-to-eval
    comparability) and the batch iterator tiles it exactly."""
    data1, batches, imp = make_val_mc("gaussian", 100, 1, 3, 2.0, 32, seed=7)
    data2, _, _ = make_val_mc("gaussian", 100, 1, 3, 2.0, 32, seed=7)
    np.testing.assert_array_equal(data1, data2)
    chunks = list(batches())
    assert [len(c) for c in chunks] == [32, 32, 32, 4]
    np.testing.assert_array_equal(np.concatenate(chunks), data1)
    # importance is the true gaussian density of the draw
    w = np.asarray(imp(jnp.asarray(data1[:5])))
    expect = ((2 * np.pi * 4.0) ** -1.5
              * np.exp(-(data1[:5] ** 2).sum(1) / 8.0))
    np.testing.assert_allclose(w[:, 0], expect, rtol=1e-5)


def test_cli_pde_high_d_eval_records_eigvals(tmp_path):
    """ndim=5 through the full CLI: the MC val branch produces finite
    eigenvalues in stats.npz (previously high-D runs recorded nothing),
    with the Hutchinson stochastic Laplacian exercised in training."""
    from neuralsvd_tpu.cli.pde import main
    from neuralsvd_tpu.utils.config import PDEConfig

    cfg = PDEConfig(
        log_dir=str(tmp_path), seed=0, problem="sch",
        potential_type="harmonic_oscillator", ndim=5, neigs=2,
        operator_shift=10.0, laplacian_eps=-1.0, laplacian_probes=2,
        lim=6.0, mlp_hidden_dims="16,16", nonlinearity="softplus",
        apply_boundary=False, apply_exp_mask=True, exp_mask_init_scale=6.0,
        sampling_mode="gaussian", sampling_scale=1.0, val_mc_size=512,
        batch_size=64, num_iters=60, print_freq=30, eval_freq=60,
        optimizer="adam", lr=1e-3)
    _, all_eigvals, _ = main(cfg)
    assert len(all_eigvals) >= 1
    assert np.isfinite(np.asarray(all_eigvals[-1])).all()


def test_val_mc_mixture_and_multi_particle_shapes():
    """The hydrogen eval case (gaussian_mixture scales) and the QC case
    (n_particles > 1) both produce correctly shaped fixed val sets with
    the true sampling density as importance."""
    data, batches, imp = make_val_mc(
        "gaussian_mixture", 64, 1, 2, (0.5, 2.0, 6.0), 32, seed=5)
    assert data.shape == (64, 2)
    w = np.asarray(imp(jnp.asarray(data[:8])))
    assert w.shape == (8, 1) and (w > 0).all()
    # mixture density at the origin: sum_k (1/3) N(0; s_k)
    w0 = np.asarray(imp(jnp.zeros((1, 2))))[0, 0]
    expect = np.mean([1 / (2 * np.pi * s ** 2) for s in (0.5, 2.0, 6.0)])
    np.testing.assert_allclose(w0, expect, rtol=1e-5)

    data2, _, imp2 = make_val_mc("gaussian", 16, 2, 2, 1.0, 8, seed=6)
    assert data2.shape == (16, 4)  # n_particles * ndim columns
    assert np.asarray(imp2(jnp.asarray(data2))).shape == (16, 1)
