"""Spectrum estimation (importance reweighting, post-alignment),
checkpoint roundtrips, and the experiment store."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.methods.spectrum import (
    compute_spectrum_evd,
    compute_spectrum_svd,
    post_alignment,
)
from neuralsvd_tpu.training.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from neuralsvd_tpu.utils.store import (
    ExperimentLogReader,
    ExperimentLogWriter,
    RunReader,
    mark_done,
)


def test_spectrum_importance_reweighting_matches_target_measure(rng):
    """Accumulating with sqrt(w_train/w_val) reweighting over val batches
    equals the train-measure expectation E_train[phi phi^T]
    (reference: methods/spectrum.py:17-26,56-67)."""
    L, N = 3, 40000
    W = rng.normal(size=(2, L)).astype(np.float32)

    def f(x):
        return jnp.asarray(x) @ jnp.asarray(W)

    def operator(model, x, importance=None):
        fs = model(x)
        return 2.0 * fs, fs  # T = 2·I

    # val measure: uniform on [-2, 2]^2; train measure: N(0, 0.5^2 I)
    xs = rng.uniform(-2, 2, size=(N, 2)).astype(np.float32)

    def imp_train(x):
        return (jnp.exp(-0.5 * jnp.sum((x / 0.5) ** 2, -1, keepdims=True))
                / (0.5 ** 2 * 2 * np.pi))

    def imp_val(x):
        return jnp.full((x.shape[0], 1), 1.0 / 16.0)

    out = compute_spectrum_evd(
        f, (xs[i:i + 8192] for i in range(0, N, 8192)), operator,
        importance_train=imp_train, importance_val=imp_val)
    # direct Monte-Carlo under the TRAIN measure
    xt = (0.5 * rng.normal(size=(400000, 2))).astype(np.float32)
    ft = xt @ W
    cov_target = ft.T @ ft / len(ft)
    np.testing.assert_allclose(out["cov"], cov_target, rtol=0.08, atol=0.01)
    np.testing.assert_allclose(out["eigvals"], 2.0 * np.ones(L), rtol=1e-4)


def test_post_alignment_recovers_spectrum_from_mixed_modes(rng):
    """Whiten-then-diagonalize recovers the operator spectrum when the
    learned modes are an arbitrary invertible mixture of eigenfunctions."""
    L, N = 4, 100000
    lam = np.array([3.0, 2.0, 1.0, 0.5])
    # phi = psi @ A with psi orthonormal columns under the empirical measure
    psi = np.linalg.qr(rng.normal(size=(N, L)))[0] * np.sqrt(N)
    A = rng.normal(size=(L, L))
    phi = (psi @ A).astype(np.float32)
    Tphi = (psi * lam) @ A  # T psi_i = lam_i psi_i
    cov = phi.T @ phi / N
    quad = phi.T @ Tphi / N
    _, aligned, _ = post_alignment(phi, cov, quad)
    # post_alignment returns sqrt(|eigvals|) (reference convention for the
    # SVD use-case); square to compare against lam
    np.testing.assert_allclose(np.sort(aligned ** 2)[::-1], lam, rtol=5e-3)


def test_compute_spectrum_svd_orthogonality(rng):
    L, B = 3, 8192

    def apply_fn(x, y):
        return jnp.asarray(x)[:, :L], jnp.asarray(y)[:, :L]

    xs = rng.normal(size=(4 * B, L)).astype(np.float32)
    ys = rng.normal(size=(4 * B, L)).astype(np.float32)
    loader = ((xs[i:i + B], ys[i:i + B]) for i in range(0, len(xs), B))
    spectrum, orth_x, orth_y = compute_spectrum_svd(apply_fn, loader)
    np.testing.assert_allclose(orth_x, np.eye(L), atol=0.05)
    np.testing.assert_allclose(spectrum, np.ones(L), atol=0.05)


def test_checkpoint_roundtrip_and_latest(tmp_path, rng):
    state = {"params": {"w": rng.normal(size=(3, 3)).astype(np.float32)},
             "step": np.asarray(7)}
    for step in (100, 200):
        save_checkpoint(os.path.join(tmp_path, f"ckpt_{step}"), state)
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("ckpt_200")
    restored = load_checkpoint(latest)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])


def test_experiment_store_roundtrip(tmp_path, rng):
    run_dir = os.path.join(tmp_path, "runs", "exp1")
    w = ExperimentLogWriter(run_dir)
    w.save_args({"lr": 1e-3, "neigs": 4, "nested": {"step": 1}})
    w.init_data_dict("train", ["iter", "loss"])
    for i in range(5):
        w.append("train", {"iter": i, "loss": 1.0 / (i + 1)})
    w.save_checkpoint({"w": np.ones(3)}, step=50)
    w.close()

    r = RunReader(run_dir)
    assert r.args["lr"] == 1e-3
    rows = r.data("train")
    assert len(rows) == 5 and float(rows[-1]["loss"]) == 0.2
    assert r.latest_step() == 50

    reader = ExperimentLogReader(os.path.join(tmp_path, "runs"))
    runs = reader.runs()
    assert len(runs) == 1
    # not marked done -> resume_killed finds it
    assert len(reader.resume_killed()) == 1
    mark_done(run_dir)
    assert len(reader.resume_killed()) == 0


def test_spectrum_report_guard_modes_and_grouping(rng):
    """spectrum_report with guards: synthetic accumulators from an exact
    orthonormal basis with eigvals [10, 8, 8, 5, 3, 2] and top=4 grouping
    [1, 2, 1] must pool the degenerate pair, report guards [3, 2], and
    flag nothing."""
    from neuralsvd_tpu.methods.spectrum import spectrum_report

    eig = np.array([10.0, 8.0, 8.0, 5.0, 3.0, 2.0])
    # random rotation within the degenerate (8, 8) pair: pooling must be
    # invariant, per-mode quotients spread
    th = 0.7
    R = np.eye(6)
    R[1:3, 1:3] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    cov = R.T @ np.eye(6) @ R
    quad = R.T @ np.diag(eig) @ R
    gt = np.array([10.0, 8.0, 8.0, 5.0])
    rep = spectrum_report(cov, quad, gt, group_sizes=[1, 2, 1], top=4)
    assert rep["n_spurious"] == 0 and rep["report"] == ""
    np.testing.assert_allclose(rep["grouped"], gt, rtol=1e-10)
    np.testing.assert_allclose(rep["aligned"], gt, rtol=1e-8)
    np.testing.assert_allclose(rep["guards"], [3.0, 2.0], rtol=1e-10)
    assert rep["rel_grouped"].max() < 1e-9


def test_spectrum_report_flags_duplicates_and_refuses_pooling(rng):
    """A near-zero-norm duplicate of mode 0 (the L=36 collapse signature)
    must be diagnosed, counted in n_spurious, and its group must NOT be
    pooled (grouped falls back to raw quotients there)."""
    from neuralsvd_tpu.methods.spectrum import spectrum_report

    cov = np.eye(4)
    quad = np.diag([10.0, 4.0, 4.0, 9.9e-4])
    # mode 3: tiny-amplitude copy of mode 0 (corr ~ 1, norm ~ 0)
    cov[3, 3] = 1e-4
    cov[0, 3] = cov[3, 0] = 0.0099  # corr 0.99 with mode 0
    quad[3, 3] = 1e-3 * 10.0
    gt = np.array([10.0, 4.0, 4.0, 2.0])
    rep = spectrum_report(cov, quad, gt, group_sizes=[1, 2, 1], top=4)
    assert rep["n_spurious"] >= 1
    assert "DUPLICATE" in rep["report"] or "DEAD" in rep["report"]
    # the spurious mode's inflated quotient (100 = 1e-3·10 / 1e-4) must
    # stay visible in the metrics, not be laundered into a pooled group
    # trace: pooling is refused for any group containing it
    assert rep["rel"].max() > 5.0
    assert rep["rel_grouped"].max() > 1.0


def test_spectrum_report_nan_mode_never_enters_topk():
    """ADVICE r3 (medium): a dead mode with an exact 0/0 accumulator yields
    a NaN Rayleigh, which raw argsort places FIRST after the descending
    reversal — exiling a healthy mode to the guards and shifting every
    ground-truth comparison.  With cov=diag(1,1,1,0), quad=diag(5,3,2,0),
    top=3 the report must be [5, 3, 2], NOT [nan, 5, 3]."""
    from neuralsvd_tpu.methods.spectrum import spectrum_report

    cov = np.diag([1.0, 1.0, 1.0, 0.0])
    quad = np.diag([5.0, 3.0, 2.0, 0.0])
    gt = np.array([5.0, 3.0, 2.0])
    rep = spectrum_report(cov, quad, gt, group_sizes=[1, 1, 1], top=3)
    np.testing.assert_allclose(rep["rayleigh"], [5.0, 3.0, 2.0])
    assert rep["rel"].max() < 1e-12
    assert rep["n_spurious"] == 1  # the dead mode is still diagnosed
    # and it lands in the guards, where NaN is visible but harmless
    assert len(rep["guards"]) == 1 and not np.isfinite(rep["guards"][0])


def test_spectrum_report_unhealthy_fallback_when_too_few_healthy():
    """If fewer than ``top`` healthy modes exist, spurious modes fill the
    tail of the top-k (sanitized last), never displacing a healthy one."""
    from neuralsvd_tpu.methods.spectrum import spectrum_report

    cov = np.diag([1.0, 1.0, 0.0])
    quad = np.diag([5.0, 3.0, 0.0])
    gt = np.array([5.0, 3.0, 1.0])
    rep = spectrum_report(cov, quad, gt, group_sizes=[1, 1, 1], top=3)
    np.testing.assert_allclose(rep["rayleigh"][:2], [5.0, 3.0])
    assert np.isnan(rep["rayleigh"][2])
    assert rep["n_spurious"] == 1


def test_cusp_point_nonfinite_rows_zeroed_not_inf():
    """A |x|-cusped eigenfunction feature (exp masks / envelopes) has a
    non-finite exact Laplacian at its center; on a SMOOTH potential the
    singular-origin gate does not fire, and nan_to_num's default used to
    map inf to 3.4e38, silently poisoning the quad accumulator into inf
    (found via a harmonic-oscillator + exp-mask miniature, round 3).
    Those isolated quadrature points must be zeroed instead."""
    from neuralsvd_tpu.methods.spectrum import compute_spectrum_evd

    class CuspOperator:
        def __call__(self, f, x, importance=None):
            fs = f(x)
            r = jnp.linalg.norm(x, axis=1, keepdims=True)
            return fs / r, fs  # diverges (inf/nan) exactly at x == 0

    # grid containing the exact origin, like make_val_grid's arange
    xs = np.stack(np.meshgrid(np.arange(-1, 1, 0.5),
                              np.arange(-1, 1, 0.5)), -1).reshape(-1, 2)
    assert (np.abs(xs).sum(1) == 0).any()
    f = lambda x: jnp.stack([jnp.exp(-jnp.linalg.norm(x, axis=1)),
                             jnp.ones(x.shape[0])], 1)
    out = compute_spectrum_evd(f, [xs.astype(np.float32)], CuspOperator())
    assert np.isfinite(np.asarray(out["quad"])).all()
    assert np.isfinite(np.asarray(out["eigvals"])).all()
