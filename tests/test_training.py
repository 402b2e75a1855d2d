"""Training-layer tests: torch-RMSprop parity, EMA, samplers, and the full
jitted train step through train_operator."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.data.samplers import get_sampler, make_val_grid
from neuralsvd_tpu.methods.nestedlora import NestedLoRA
from neuralsvd_tpu.operators.base import KernelOperator
from neuralsvd_tpu.training.optimizers import (
    build_optimizer,
    cosine_annealing,
    torch_rmsprop,
    warmup_cosine_schedule,
)
from neuralsvd_tpu.training.train_operator import make_train_step, train_operator
from neuralsvd_tpu.training.train_state import ema_update, init_train_state


def test_torch_rmsprop_parity():
    """Trajectory parity with torch.optim.RMSprop (eps outside sqrt,
    eps=1e-10) on a quadratic — SURVEY §7 'RMSprop parity'."""
    import torch

    w0 = np.array([1.5, -2.0, 0.5], dtype=np.float32)
    target = np.array([0.0, 1.0, -1.0], dtype=np.float32)

    # torch reference trajectory
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt_t = torch.optim.RMSprop([wt], lr=1e-2, alpha=0.9, eps=1e-10,
                                momentum=0.3)
    torch_traj = []
    for _ in range(20):
        opt_t.zero_grad()
        loss = ((wt - torch.tensor(target)) ** 2).sum()
        loss.backward()
        opt_t.step()
        torch_traj.append(wt.detach().numpy().copy())

    # jax trajectory
    opt = torch_rmsprop(1e-2, alpha=0.9, eps=1e-10, momentum=0.3)
    w = jnp.asarray(w0)
    state = opt.init(w)
    jax_traj = []
    for _ in range(20):
        g = 2 * (w - jnp.asarray(target))
        updates, state = opt.update(g, state)
        w = w + updates[0] if isinstance(updates, tuple) else w + updates
        jax_traj.append(np.asarray(w))

    np.testing.assert_allclose(np.stack(jax_traj), np.stack(torch_traj),
                               rtol=1e-4, atol=1e-6)


def test_cosine_annealing_matches_torch_schedule():
    import torch

    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=0.1)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=50)
    torch_lrs = []
    for _ in range(50):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    ours = cosine_annealing(0.1, 50)
    jax_lrs = [float(ours(t)) for t in range(50)]
    np.testing.assert_allclose(jax_lrs, torch_lrs, rtol=1e-5)


def test_warmup_cosine_monotone_sections():
    s = warmup_cosine_schedule(base_lr=1.0, warmup_lr=0.0, final_lr=0.1,
                               warmup_steps=10, total_steps=100)
    vals = np.array([float(s(t)) for t in range(100)])
    assert np.all(np.diff(vals[:10]) > 0)          # warmup rises
    assert np.all(np.diff(vals[11:]) <= 1e-7)      # cosine decays
    assert abs(vals[-1] - 0.1) < 0.01


def test_ema_update():
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(out["w"], 0.1 * np.ones(3), rtol=1e-6)
    # torch_ema num_updates ramp: at step 0, d = min(0.9, 1/10) = 0.1
    out = ema_update(ema, params, decay=0.9, step=jnp.zeros((), jnp.int32))
    np.testing.assert_allclose(out["w"], 0.9 * np.ones(3), rtol=1e-6)
    # large step -> back to the nominal decay
    out = ema_update(ema, params, decay=0.9, step=jnp.asarray(10_000))
    np.testing.assert_allclose(out["w"], 0.1 * np.ones(3), rtol=1e-4)


def test_sampler_importance_densities():
    """Importance fns integrate the sampling density: MC self-consistency
    E_x[1/p(x)·1_{box}] ≈ vol(box)."""
    for mode in ("gaussian", "laplacian", "uniform"):
        sample, importance = get_sampler(mode, 4096, 1, 2, sampling_scale=2.0)
        x = sample(jax.random.key(0))
        p = np.asarray(importance(x)).ravel()
        assert p.shape == (4096,)
        assert np.all(p > 0)
        # normalization: E_p[1] = ∫p = 1, checked via E[p]/E[p] trivially;
        # instead check density at 0 matches closed form
        x0 = jnp.zeros((1, 2))
        p0 = float(importance(x0)[0, 0])
        if mode == "gaussian":
            expected = 1 / (2 * np.pi * 4.0)
        elif mode == "laplacian":
            expected = 1 / 16.0
        else:
            expected = 1 / 16.0
        np.testing.assert_allclose(p0, expected, rtol=1e-4)


def test_val_grid():
    val_data, batches, imp = make_val_grid(2, lim=1.0, val_eps=0.5,
                                           batch_size=7)
    assert val_data.shape == (16, 2)
    got = np.concatenate(list(batches()))
    np.testing.assert_allclose(got, val_data)
    assert float(imp(jnp.zeros((1, 2)))[0, 0]) == 0.25


def linear_apply(params, x):
    return x @ params["W"]


def test_train_operator_end_to_end_kernel(rng):
    """Full driver: jitted step + eval on a fixed RBF kernel operator.
    The top eigenfunctions of a smooth kernel emerge within a few hundred
    steps; we assert the loop runs, loss is finite and decreasing, and the
    spectrum eval returns sane shapes."""
    D, L = 2, 3
    landmarks = jnp.asarray(rng.normal(size=(64, D)).astype(np.float32))
    kernel = lambda a, b: jnp.exp(-jnp.sum((a[:, None] - b[None]) ** 2, -1))
    operator = KernelOperator(kernel, landmarks)

    W0 = 0.3 * rng.normal(size=(D, L)).astype(np.float32)
    params = {"W": jnp.asarray(W0)}
    method = NestedLoRA(linear_apply, neigs=L, sequential=True)
    sample, importance = get_sampler("gaussian", 64, 1, D, 1.0)
    optimizer = build_optimizer("rmsprop", 1e-2)

    val_data, val_batches, imp_val = make_val_grid(D, 1.0, 0.25, 32)
    losses = []

    class Writer:
        rows = []
        def writerow(self, r):
            losses.append(r["train_loss"])

    ts, all_eigvals, all_norms = train_operator(
        method, operator, sample, optimizer, params,
        num_iters=300, importance_train=None, importance_val=None,
        val_batches=val_batches, ema_decay=0.9, eval_freq=150, print_freq=50,
        log_writer=Writer(), monitor=True)

    assert len(all_eigvals) == 2
    assert all_eigvals[0].shape == (L,)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] + 0.05  # no blow-up
    # RBF kernel operator is PSD: Rayleigh quotients must be positive
    assert np.all(all_eigvals[-1] > 0)
    assert int(ts.step) == 300


def test_reject_spikes_zeroes_outlier_updates():
    """reject_spikes passes normal gradients, zeroes spikes, keeps the EMA
    uncontaminated, and counts rejections."""
    import optax
    from neuralsvd_tpu.training.optimizers import reject_spikes

    tx = reject_spikes(factor=10.0, decay=0.9, warmup=5)
    p = {"w": jnp.zeros(4)}
    state = tx.init(p)
    g_norm = {"w": jnp.ones(4)}          # gnorm = 2
    g_spike = {"w": 1e6 * jnp.ones(4)}

    for _ in range(8):  # past warmup, EMA ~ 2
        u, state = tx.update(g_norm, state)
    np.testing.assert_allclose(u["w"], g_norm["w"])
    ema_before = float(state.gnorm_ema)

    u, state = tx.update(g_spike, state)
    np.testing.assert_allclose(u["w"], 0.0)           # rejected
    assert float(state.gnorm_ema) == ema_before       # EMA untouched
    assert int(state.rejected) == 1

    u, state = tx.update(g_norm, state)               # normal flows again
    np.testing.assert_allclose(u["w"], g_norm["w"])

    # non-finite also rejected
    u, state = tx.update({"w": jnp.full(4, jnp.nan)}, state)
    np.testing.assert_allclose(u["w"], 0.0)
    assert int(state.rejected) == 2


def test_train_step_skips_nonfinite_batches(rng):
    """A NaN-producing batch leaves params/opt-state untouched and flags
    metrics['skipped'] (the AMP-GradScaler-skip equivalent)."""
    from neuralsvd_tpu.methods.nestedlora import NestedLoRA
    from neuralsvd_tpu.training.optimizers import torch_rmsprop
    from neuralsvd_tpu.training.train_operator import make_train_step
    from neuralsvd_tpu.training.train_state import init_train_state

    W = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))

    def apply_fn(p, x):
        return x @ p

    def operator(f, x, importance=None):
        fs = f(x)
        # NaN whenever the batch mean is positive -> some keys poison
        bad = jnp.mean(x) > 0
        return jnp.where(bad, jnp.nan, 1.0) * fs, fs

    method = NestedLoRA(apply_fn, neigs=3)
    opt = torch_rmsprop(1e-2)

    def sampler(key):
        return jax.random.normal(key, (16, 2))

    step = jax.jit(make_train_step(method, operator, opt, sampler))
    ts = init_train_state(W, opt, method)

    seen_skip = seen_ok = False
    for i in range(12):
        prev = ts.params
        ts, m = step(ts, jax.random.key(i))
        if bool(m["skipped"]):
            seen_skip = True
            np.testing.assert_array_equal(np.asarray(ts.params),
                                          np.asarray(prev))
        else:
            seen_ok = True
            assert np.abs(np.asarray(ts.params) - np.asarray(prev)).max() > 0
        assert bool(jnp.all(jnp.isfinite(ts.params)))
    assert seen_skip and seen_ok


def test_spectrum_eval_does_not_retrace_on_new_params():
    """Periodic evals pass params as traced args: the second eval with
    fresh params must hit the jit cache (VERDICT r1 weak item 3)."""
    from neuralsvd_tpu.methods.spectrum import compute_spectrum_evd

    traces = []

    def eval_apply(params, state, x):
        traces.append(1)
        return x * params["w"]

    def operator(f, x, importance=None):
        fs = f(x)
        return 2.0 * fs, fs

    def loader():
        return [np.ones((8, 3), np.float32) * (i + 1) for i in range(2)]

    p1 = {"w": jnp.asarray(1.5)}
    p2 = {"w": jnp.asarray(-0.5)}
    out1 = compute_spectrum_evd((eval_apply, p1, {}), loader(), operator)
    n_traces = len(traces)
    assert n_traces >= 1
    out2 = compute_spectrum_evd((eval_apply, p2, {}), loader(), operator)
    assert len(traces) == n_traces, "second eval retraced"
    np.testing.assert_allclose(out2["eigvals"], 2.0, rtol=1e-6)
    np.testing.assert_allclose(out1["norms"] / out2["norms"],
                               (1.5 / 0.5) ** 2, rtol=1e-5)


def test_train_operator_scan_path_matches_per_step():
    """The production scan hot loop consumes the same key stream as the
    per-step (monitor) path: identical final parameters."""
    import optax

    from neuralsvd_tpu.methods.nestedlora import NestedLoRA
    from neuralsvd_tpu.models import make_mlp_eigfuncs
    from neuralsvd_tpu.training.train_operator import train_operator

    init, apply = make_mlp_eigfuncs(input_dim=1, neigs=2,
                                    mlp_hidden_dims=[8],
                                    nonlinearity="softplus")
    params = init(jax.random.key(0))

    def operator(f, x, importance=None):
        fs = f(x)
        return jnp.exp(-x**2) * fs, fs

    def sampler(key):
        return jax.random.normal(key, (16, 1))

    def run(monitor):
        method = NestedLoRA(apply, neigs=2, sequential=True)
        ts, _, _ = train_operator(
            method, operator, sampler, optax.sgd(1e-2), params,
            num_iters=25, print_freq=10, eval_freq=1000, seed=3,
            monitor=monitor)
        return ts

    ts_scan = run(False)   # blocks of 10 + per-step remainder of 5
    ts_step = run(True)    # pure per-step
    assert int(ts_scan.step) == int(ts_step.step) == 25
    for a, b in zip(jax.tree.leaves(ts_scan.params),
                    jax.tree.leaves(ts_step.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_resumable_checkpoint_roundtrip(tmp_path, rng):
    """save_resumable/load_resumable (the unified harness checkpoint path,
    VERDICT r2 item 8): orbax roundtrip restores the full TrainState with
    exact values and structure, and the legacy round-2 pickle format is
    still readable."""
    import pickle

    from neuralsvd_tpu.models import make_wavefunctions
    from neuralsvd_tpu.training.checkpoint import (
        load_resumable,
        save_resumable,
    )

    init, apply = make_wavefunctions(
        ndim=1, neigs=3, mlp_hidden_dims=[8, 8], nonlinearity="softplus",
        parallel=True, apply_boundary=False)
    opt = torch_rmsprop(1e-3)
    method = NestedLoRA(apply, neigs=3, sequential=True)
    ts = init_train_state(init(jax.random.key(0)), opt, method)
    # make state non-trivial so restoration is observable
    ts = ts._replace(
        step=jnp.asarray(7, jnp.int32),
        ema_params=jax.tree.map(lambda p: p + 1.0, ts.params))

    path = str(tmp_path / "ckpt")
    save_resumable(path, ts, chunk=42)
    restored, chunk = load_resumable(path, init_train_state(
        init(jax.random.key(1)), opt, method))
    assert chunk == 42
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state structure survives (chained NamedTuples, not plain dicts)
    assert type(restored.opt_state[0]).__name__ == type(
        ts.opt_state[0]).__name__

    # legacy pickle file (round-2 NS_CKPT format) still loads
    legacy = str(tmp_path / "legacy.ckpt.pkl")
    with open(legacy, "wb") as fh:
        pickle.dump({"ts": jax.device_get(ts), "chunk": 5}, fh)
    restored2, chunk2 = load_resumable(legacy, ts)
    assert chunk2 == 5
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a re-save over the legacy file replaces it with the orbax dir
    save_resumable(legacy, ts, chunk=6)
    assert not os.path.isfile(legacy) and os.path.isdir(legacy)
    _, chunk3 = load_resumable(legacy, ts)
    assert chunk3 == 6


def test_load_resumable_missing_returns_none(tmp_path):
    from neuralsvd_tpu.training.checkpoint import load_resumable

    assert load_resumable(str(tmp_path / "nope"), None) is None


def test_per_mode_lr_scales_updates_not_grads():
    """per_mode_lr acts on final updates, so it is a true per-mode LR
    under Adam (gradient pre-scaling would be erased by the second-moment
    normalization); non-mode leaves pass through untouched."""
    import optax

    from neuralsvd_tpu.training.optimizers import per_mode_lr

    L = 4
    params = {"tower": jnp.ones((L, 3, 2)), "mask": jnp.ones((L,)),
              "shared": jnp.ones((7,))}
    grads = jax.tree.map(jnp.ones_like, params)
    scales = jnp.asarray([1.0, 1.0, 3.0, 0.5])

    base = optax.chain(optax.scale_by_adam(), optax.scale(-1e-2))
    boosted = optax.chain(base, per_mode_lr(scales, L))
    s0, s1 = base.init(params), boosted.init(params)
    u0, _ = base.update(grads, s0, params)
    u1, _ = boosted.update(grads, s1, params)
    np.testing.assert_allclose(np.asarray(u1["shared"]),
                               np.asarray(u0["shared"]))
    np.testing.assert_allclose(
        np.asarray(u1["tower"]),
        np.asarray(u0["tower"]) * np.asarray(scales)[:, None, None],
        rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u1["mask"]),
                               np.asarray(u0["mask"]) * np.asarray(scales),
                               rtol=1e-6)


def test_mode_axis_collision_guard():
    """ADVICE r3: a shared leaf whose leading dim happens to equal neigs
    (e.g. neigs=128 with a 128-row learnable feature map) would be
    silently scaled/permuted by the shape[0]==neigs heuristic.  The
    construction-time guard must name the offending leaf; an all-per-mode
    pytree (the ParallelMLP wavefunction contract) must pass."""
    import pytest

    from neuralsvd_tpu.training.optimizers import \
        assert_mode_axis_unambiguous

    L = 4
    clean = {"base": {"ws": [jnp.ones((L, 3, 2)), jnp.ones((L, 1, 3))],
                      "bs": [jnp.ones((L, 3, 1))]},
             "mask": {"scales": jnp.ones((L,))}}
    assert_mode_axis_unambiguous(clean, L)  # must not raise

    # a shared-leaf collision (shape (L, ...)) is undetectable at the leaf
    # level, so the guard enforces the stricter contract: NO shared leaves
    # at all.  Any leaf not leading with the mode axis is named + rejected.
    with pytest.raises(ValueError, match="feature_map"):
        assert_mode_axis_unambiguous(
            {**clean, "feature_map": jnp.ones((7, 2))}, L)
    with pytest.raises(ValueError, match="mode axis"):
        assert_mode_axis_unambiguous(
            {**clean, "feature_map": jnp.ones((2, L))}, L)
    with pytest.raises(ValueError):  # scalar leaf
        assert_mode_axis_unambiguous({**clean, "t": jnp.ones(())}, L)

    # the flagship wavefunction params must satisfy the contract
    from neuralsvd_tpu.models import make_wavefunctions
    init, _ = make_wavefunctions(
        ndim=2, neigs=L, mlp_hidden_dims=[8, 8], nonlinearity="softplus",
        parallel=True, use_fourier_feature=True, fourier_mapping_size=16,
        fourier_scale=0.1, apply_exp_mask=True, apply_boundary=False,
        boundary_mode="none")
    assert_mode_axis_unambiguous(init(jax.random.key(0)), L)
