"""CLI-level data-parallel wiring (VERDICT r1 item 3): the shipped entry
points must expose the device mesh, not just the library layer."""
import os

import jax
import numpy as np


def test_cli_pde_main_on_dp_mesh_matches_analytic(tmp_path):
    """python -m neuralsvd_tpu.cli.pde --mesh dp=8: full driver (sharded
    scan hot loop + eval + artifacts) converges to the analytic 1D
    oscillator spectrum on an 8-virtual-device CPU mesh."""
    from neuralsvd_tpu.cli.pde import main
    from neuralsvd_tpu.utils.config import PDEConfig

    cfg = PDEConfig(
        log_dir=str(tmp_path), mesh="dp=8", seed=1,
        problem="sch", potential_type="harmonic_oscillator", ndim=1, neigs=2,
        operator_shift=6.0, laplacian_eps=0.1, lim=4.0,
        mlp_hidden_dims="32,32", nonlinearity="softplus",
        apply_boundary=True, boundary_mode="dir_box_sqrt",
        sampling_mode="gaussian", sampling_scale=1.0,
        batch_size=256, num_iters=14000, print_freq=500, eval_freq=7000,
        optimizer="adam", lr=3e-3, use_lr_scheduler=True, ema_decay=0.995)
    ts, all_eigvals, _ = main(cfg)
    assert len(all_eigvals) == 2  # evals at 7000 and 14000
    learned = np.sort(np.asarray(all_eigvals[-1]))[::-1]
    # -H + 6 shift, E_n = 2n+1 (1D oscillator): top-2 = [5, 3]
    np.testing.assert_allclose(learned, [5.0, 3.0], atol=0.12)
    run_dirs = [r for r, _, files in os.walk(tmp_path)
                if "stats.npz" in files]
    assert run_dirs, "stats.npz artifact missing"


def test_cli_pde_dp_tp_mesh_matches_single_device(tmp_path):
    """--mesh dp=4,tp=2 (GSPMD, VERDICT r2 item 6): the full CLI driver
    with the mode axis tp-sharded and batch rows dp-sharded reproduces the
    single-device run bit-for-bit-ish (same global batch + key stream;
    only XLA reduction order differs)."""
    from neuralsvd_tpu.cli.pde import main
    from neuralsvd_tpu.utils.config import PDEConfig

    def run(mesh, sub):
        cfg = PDEConfig(
            log_dir=str(tmp_path / sub), mesh=mesh, seed=1,
            problem="sch", potential_type="harmonic_oscillator", ndim=1,
            neigs=4, parallel=True, operator_shift=10.0, laplacian_eps=0.1,
            lim=4.0, mlp_hidden_dims="16,16", nonlinearity="softplus",
            apply_boundary=True, boundary_mode="dir_box_sqrt",
            sampling_mode="gaussian", sampling_scale=1.0,
            batch_size=64, num_iters=400, print_freq=200, eval_freq=400,
            optimizer="adam", lr=1e-3)
        ts, all_eigvals, _ = main(cfg)
        return ts, all_eigvals

    ts_single, ev_single = run("", "single")
    ts_mesh, ev_mesh = run("dp=4,tp=2", "dptp")
    # tp really sharded the mode axis
    w0 = ts_mesh.params["base"]["ws"][0]
    assert "tp" in str(w0.sharding), f"mode axis not tp-sharded: {w0.sharding}"
    for a, b in zip(jax.tree.leaves(ts_single.params),
                    jax.tree.leaves(ts_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ev_single[-1]),
                               np.asarray(ev_mesh[-1]), rtol=1e-3)


def test_cli_sketchy_dp_mesh_matches_single_device(tmp_path):
    """run_training with --mesh dp=8 reproduces the single-device params
    (same loader seeds -> same batches; psum'd grads == global grads)."""
    from neuralsvd_tpu.cli.sketchy import get_args, run_training
    from tests.test_cdk_retrieval import _make_synth_loaders

    def run(mesh, sub):
        rng = np.random.default_rng(0)
        # per_cls=32 -> 192 samples = 3 exact 64-batches (dp divisibility)
        train, test, valid = _make_synth_loaders(rng, per_cls=32)
        args = get_args([
            "--log_dir", str(tmp_path / sub), "--num_epochs", "2",
            "--batch_size", "64", "--network_dims", "32,8", "--neigs", "8",
            "--optimizer", "adam", "--base_lr", "1e-3", "--mu", "4.0",
            "--n_retrievals", "10"] + (["--mesh", mesh] if mesh else []))
        params, _ = run_training(args, train, test, valid, input_dim=16)
        return params

    p_single = run("", "single")
    p_dp = run("dp=8", "dp")
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # GSPMD dp x tp (VERDICT r2 item 6): mode axis of the tower output
    # layers tp-sharded, same math as single device
    p_dptp = run("dp=4,tp=2", "dptp")
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dptp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
