"""Hutchinson stochastic-Laplacian wiring: keyed-operator protocol through
the Hamiltonian, the train step, and the eval fallback.

No reference counterpart — the reference's exact Laplacian is always O(D)
backward passes (diff_ops.py:54-121); this is the TPU-native lever for
high-D quantum-chemistry operators (SURVEY §2.2 extension).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuralsvd_tpu.methods.nestedlora import NestedLoRA
from neuralsvd_tpu.models import make_mlp
from neuralsvd_tpu.operators.base import OperatorWrapper
from neuralsvd_tpu.operators.schrodinger import (
    NegativeHamiltonian,
    harmonic_oscillator_potential,
)
from neuralsvd_tpu.training.train_operator import make_train_step
from neuralsvd_tpu.training.train_state import init_train_state


@pytest.fixture(scope="module")
def mlp_problem():
    init, apply = make_mlp([3, 16, 16, 2], nonlinearity="softplus")
    params = init(jax.random.key(0))
    op = NegativeHamiltonian(
        local_potential_ftn=harmonic_oscillator_potential,
        laplacian_eps=-1.0, laplacian_probes=4)
    return params, apply, OperatorWrapper(op, scale=1.0, shift=4.0)


def test_hutchinson_operator_unbiased_vs_exact(mlp_problem):
    """E_key[Tf_hutchinson] -> Tf_exact on a real MLP tower: averaging the
    keyed operator over many probe draws recovers the exact keyless call
    (which must itself be the deterministic forward-engine path)."""
    params, apply, op = mlp_problem
    assert op.needs_key
    x = jax.random.normal(jax.random.key(1), (32, 3))
    f = lambda xx: apply(params, xx)

    Tf_exact, fs_exact = op(f, x)          # keyless -> exact fallback
    Tf_exact2, _ = op(f, x)
    np.testing.assert_array_equal(np.asarray(Tf_exact),
                                  np.asarray(Tf_exact2))

    draws = [op(f, x, key=jax.random.key(k))[0] for k in range(64)]
    # individual draws differ (it IS stochastic) ...
    assert not np.allclose(np.asarray(draws[0]), np.asarray(draws[1]))
    # ... fs is the plain forward either way ...
    np.testing.assert_allclose(np.asarray(op(f, x, key=jax.random.key(9))[1]),
                               np.asarray(fs_exact), rtol=1e-6)
    # ... and the mean converges to the exact operator (MC rate; the
    # potential/shift terms are exact so only the kinetic part fluctuates)
    mean = np.mean(np.stack([np.asarray(d) for d in draws]), 0)
    err = np.abs(mean - np.asarray(Tf_exact)).mean()
    scale = np.abs(np.asarray(Tf_exact)).mean()
    assert err / scale < 0.08, (err, scale)


def test_hutchinson_train_step_runs_and_varies(mlp_problem):
    """make_train_step binds a per-step subkey for needs_key operators:
    the jitted step runs, the loss is finite, and two different step keys
    give different losses at identical params (fresh probes per step)."""
    params, apply, op = mlp_problem
    method = NestedLoRA(apply, neigs=2, sequential=True)
    optimizer = optax.adam(1e-3)
    sampler = lambda key: jax.random.normal(
        jax.random.fold_in(key, 7), (64, 3))
    step = jax.jit(make_train_step(method, op, optimizer, sampler))
    ts = init_train_state(params, optimizer, method)

    ts1, m1 = step(ts, jax.random.key(1))
    _, m2 = step(ts, jax.random.key(1))
    _, m3 = step(ts, jax.random.key(2))
    assert np.isfinite(float(m1["loss"]))
    assert int(ts1.step) == 1
    # same key -> deterministic; different key -> different probe draw
    # AND different sample batch (both folds move)
    assert float(m1["loss"]) == float(m2["loss"])
    assert float(m1["loss"]) != float(m3["loss"])


def test_hutchinson_gspmd_mesh_matches_single_device(tmp_path):
    """Keyed operators under the GSPMD dp x tp mesh: the global-batch
    program binds the SAME per-step probe key as single-device, so the
    run must reproduce it (only XLA reduction order differs).  Also
    exercises the ndim=3 Monte-Carlo val quadrature under a mesh."""
    from neuralsvd_tpu.cli.pde import main
    from neuralsvd_tpu.utils.config import PDEConfig

    def run(mesh, sub):
        cfg = PDEConfig(
            log_dir=str(tmp_path / sub), mesh=mesh, seed=1,
            problem="sch", potential_type="harmonic_oscillator", ndim=3,
            neigs=2, parallel=True, operator_shift=8.0,
            laplacian_eps=-1.0, laplacian_probes=2, lim=5.0,
            mlp_hidden_dims="16,16", nonlinearity="softplus",
            apply_boundary=False, apply_exp_mask=True,
            exp_mask_init_scale=5.0, sampling_mode="gaussian",
            sampling_scale=1.0, val_mc_size=256,
            batch_size=64, num_iters=200, print_freq=100, eval_freq=200,
            optimizer="adam", lr=1e-3)
        return main(cfg)

    ts_single, ev_single, _ = run("", "single")
    ts_mesh, ev_mesh, _ = run("dp=4,tp=2", "dptp")
    for a, b in zip(jax.tree.leaves(ts_single.params),
                    jax.tree.leaves(ts_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ev_single[-1]),
                               np.asarray(ev_mesh[-1]), rtol=1e-3)


def test_hutchinson_cli_config_reaches_operator():
    """laplacian_probes threads cfg -> get_problem -> Hamiltonian."""
    from neuralsvd_tpu.operators.problems import get_problem

    op, _, _ = get_problem(problem="sch",
                           potential_type="harmonic_oscillator", ndim=2,
                           neigs=3, laplacian_eps=-1.0, laplacian_probes=2,
                           operator_shift=8.0)
    assert op.needs_key
    op2, _, _ = get_problem(problem="sch",
                            potential_type="harmonic_oscillator", ndim=2,
                            neigs=3, laplacian_eps=-1.0, operator_shift=8.0)
    assert not op2.needs_key
