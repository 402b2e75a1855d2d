"""--resume: the PDE CLI restarts from the latest ckpt_<it> and continues
the run exactly (VERDICT r4 item 1 — long CPU measurements must survive a
process death / round boundary; reference analog: utils.py's resume-killed
+ latest-checkpoint convention)."""
import os
import shutil

import jax
import numpy as np


def _cfg(tmp_path, **kw):
    from neuralsvd_tpu.utils.config import PDEConfig

    base = dict(
        log_dir=str(tmp_path), seed=1,
        problem="sch", potential_type="harmonic_oscillator", ndim=1,
        neigs=2, operator_shift=6.0, laplacian_eps=0.1, lim=4.0,
        mlp_hidden_dims="16,16", nonlinearity="softplus",
        apply_boundary=True, boundary_mode="dir_box_sqrt",
        sampling_mode="gaussian", sampling_scale=1.0,
        batch_size=64, num_iters=800, print_freq=200, eval_freq=400,
        optimizer="adam", lr=1e-3, use_lr_scheduler=True)
    base.update(kw)
    return PDEConfig(**base)


def test_cli_pde_resume_matches_straight_run(tmp_path):
    from neuralsvd_tpu.cli.pde import main

    # straight 800-iter run: checkpoints at the it=400 and it=800 evals
    ts_straight, ev_straight, _ = main(_cfg(tmp_path))
    run_dir = next(r for r, _, files in os.walk(tmp_path)
                   if "stats.npz" in files)
    assert os.path.isdir(os.path.join(run_dir, "ckpt_400"))

    # simulate a mid-run kill at it=400: drop everything after it and
    # re-run the SAME config with --resume — it must pick up ckpt_400,
    # run the remaining 400 iters on the same absolute-iter key stream
    # (optimizer schedule rides ts.step; EMA is in the checkpoint) and
    # land on the straight run's parameters
    shutil.rmtree(os.path.join(run_dir, "ckpt_800"))
    ts_resumed, ev_resumed, _ = main(_cfg(tmp_path, resume=True))

    np.testing.assert_allclose(np.asarray(ev_resumed[-1]),
                               np.asarray(ev_straight[-1]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ts_straight.params),
                    jax.tree.leaves(ts_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_cli_pde_resume_without_checkpoint_is_fresh_start(tmp_path):
    """--resume on a virgin log dir must behave like a normal run (no
    crash, trains from scratch)."""
    from neuralsvd_tpu.cli.pde import main

    ts, ev, _ = main(_cfg(tmp_path, num_iters=400, resume=True))
    assert len(ev) == 1
    assert np.isfinite(np.asarray(ev[-1])).all()


def test_cli_pde_resume_on_dp_mesh(tmp_path):
    """Resume must also hold under the sharded driver (--mesh dp=4):
    checkpoints are host arrays; the restored state re-enters the
    shard_map step and continues the same global key stream."""
    from neuralsvd_tpu.cli.pde import main

    cfg = dict(mesh="dp=4", batch_size=64, num_iters=800)
    ts_straight, ev_straight, _ = main(_cfg(tmp_path, **cfg))
    run_dir = next(r for r, _, files in os.walk(tmp_path)
                   if "stats.npz" in files)
    shutil.rmtree(os.path.join(run_dir, "ckpt_800"))
    ts_resumed, ev_resumed, _ = main(_cfg(tmp_path, resume=True, **cfg))

    np.testing.assert_allclose(np.asarray(ev_resumed[-1]),
                               np.asarray(ev_straight[-1]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ts_straight.params),
                    jax.tree.leaves(ts_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
