"""Dead/duplicate-mode diagnosis (methods/spectrum.py mode_health) and
rescue surgery (training/rescue.py) — the L=36 collapse countermeasures.

The synthetic fixtures reproduce the round-2 H36 signature: a low-norm
mode parked on an occupied direction (|corr| ~ 1) and a near-zero-norm
dead mode (BASELINE.md "Hydrogen L=36").
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsvd_tpu.methods.spectrum import (
    format_mode_health,
    grouped_rayleigh,
    mode_health,
    post_alignment,
)
from neuralsvd_tpu.models import make_wavefunctions
from neuralsvd_tpu.training.optimizers import torch_rmsprop
from neuralsvd_tpu.training.rescue import (
    rescue_modes,
    rescue_plan,
    tree_permute_modes,
)
from neuralsvd_tpu.training.train_state import TrainState, init_train_state


def _synthetic_accumulators(rng, eigvals, dup_pairs=(), dead=(), n=20000):
    """cov/quad for modes f_i = a_i * (u_{e_i} + noise): orthonormal
    directions u scaled by sqrt(eigval) norms, with selected modes made
    duplicates (same direction, small amplitude) or dead (tiny norm)."""
    L = len(eigvals)
    basis = np.linalg.qr(rng.standard_normal((n, L + 4)))[0]
    f = np.zeros((n, L))
    lam = np.zeros(L)
    for i, ev in enumerate(eigvals):
        f[:, i] = np.sqrt(ev) * basis[:, i] * np.sqrt(n)
        lam[i] = ev
    for i, j, amp in dup_pairs:  # mode i := amp-scaled copy of mode j
        f[:, i] = amp * f[:, j]
        lam[i] = lam[j]
    for i in dead:
        f[:, i] = 1e-6 * basis[:, L + 1] * np.sqrt(n)
        lam[i] = 0.5
    cov = f.T @ f / n
    quad = cov * lam[None, :]  # T f_i = lam_i f_i exactly here
    return cov, quad


def test_mode_health_detects_duplicates_and_dead(rng):
    cov, quad = _synthetic_accumulators(
        rng, [100.0, 11.0, 11.0, 4.0, 4.0],
        dup_pairs=[(2, 0, 0.7)], dead=[4])
    h = mode_health(cov, quad)
    assert h["duplicate_of"][2] == 0
    assert h["dead"][4]
    assert not h["healthy"][2] and not h["healthy"][4]
    assert h["healthy"][[0, 1, 3]].all()
    report = format_mode_health(h)
    assert "DUPLICATE: mode 2 ~ mode 0" in report
    assert "DEAD: mode 4" in report


def test_mode_health_clean_spectrum(rng):
    cov, quad = _synthetic_accumulators(rng, [9.0, 7.0, 5.0, 3.0])
    h = mode_health(cov, quad)
    assert h["healthy"].all()
    assert format_mode_health(h) == ""


def test_grouped_rayleigh_refuses_collapsed_groups(rng):
    # True spectrum 100, 11x3: mode 1 is a duplicate of mode 0 whose
    # Rayleigh (100) positionally lands inside the 11-group. Without cov
    # the pooling would launder it; with cov the group is left unpooled.
    cov, quad = _synthetic_accumulators(
        rng, [100.0, 11.0, 11.0, 11.0], dup_pairs=[(3, 0, 0.5)])
    gsizes = [1, 3]
    pooled_blind = grouped_rayleigh(np.diag(quad), np.diag(cov), gsizes)
    pooled_aware = grouped_rayleigh(np.diag(quad), np.diag(cov), gsizes,
                                    cov=cov)
    gt = np.array([100.0, 11.0, 11.0, 11.0])
    # collapse-aware error must NOT be smaller than the blind pooling's
    err_blind = np.abs(pooled_blind - gt) / gt
    err_aware = np.abs(pooled_aware - gt) / gt
    assert err_aware.max() >= err_blind.max()
    assert err_aware.max() > 0.5  # the duplicate's 100 in an 11-slot shows


def test_grouped_rayleigh_healthy_path_unchanged(rng):
    cov, quad = _synthetic_accumulators(rng, [100.0, 11.0, 11.0, 11.0])
    gsizes = [1, 3]
    blind = grouped_rayleigh(np.diag(quad), np.diag(cov), gsizes)
    aware = grouped_rayleigh(np.diag(quad), np.diag(cov), gsizes, cov=cov)
    np.testing.assert_allclose(blind, aware)


def test_post_alignment_warns_on_singular_cov(rng):
    cov, quad = _synthetic_accumulators(
        rng, [100.0, 11.0, 11.0], dead=[2])
    eigfuncs = rng.standard_normal((64, 3))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, vals, _ = post_alignment(eigfuncs, cov, quad)
    assert any("near-singular" in str(x.message) for x in w)
    assert np.isfinite(vals).all()
    assert np.abs(vals).max() < 1e6  # floored, not -2.5e9 garbage


# ---------------------------------------------------------------------------
# rescue surgery on a real ParallelMLP TrainState
# ---------------------------------------------------------------------------

L = 4


@pytest.fixture(scope="module")
def wf():
    init, apply = make_wavefunctions(
        ndim=2, neigs=L, mlp_hidden_dims=[16, 16], nonlinearity="softplus",
        parallel=True, use_fourier_feature=True, fourier_mapping_size=32,
        fourier_scale=1.0, fourier_append_radial=True,
        apply_boundary=False, apply_exp_mask=True, exp_mask_init_scale=5.0)
    return init, apply


def _make_ts(init):
    opt = torch_rmsprop(1e-3)

    class _M:
        def init_state(self, params):
            return {}

    ts = init_train_state(init(jax.random.key(0)), opt, _M())
    # non-trivial opt moments / ema so permutation is observable
    nz = jax.tree.map(lambda p: jnp.abs(p) + 0.1, ts.params)
    opt_state = (type(ts.opt_state[0])(nu=nz, momentum=nz), ts.opt_state[1])
    return ts._replace(opt_state=opt_state)


def test_tree_permute_modes_roundtrip(wf):
    init, apply = wf
    ts = _make_ts(init)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 2)),
                    jnp.float32)
    out = apply(ts.params, x)
    perm = np.array([2, 0, 3, 1])
    p2 = tree_permute_modes(ts.params, perm)
    out2 = apply(p2, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out)[:, perm],
                               rtol=1e-6)
    # shared fourier feature map untouched
    b_old = ts.params["base"]["feature_map"]
    b_new = p2["base"]["feature_map"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 b_old, b_new)


def test_rescue_modes_surgery(wf):
    init, apply = wf
    ts = _make_ts(init)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 2)),
                    jnp.float32)
    out_before = np.asarray(apply(ts.params, x))

    # synthetic accumulators: mode 1 duplicates mode 0; healthy rayleigh
    # order is 0 (100) > 3 (11) > 2 (4)
    rng = np.random.default_rng(2)
    cov, quad = _synthetic_accumulators(
        rng, [100.0, 100.0, 4.0, 11.0], dup_pairs=[(1, 0, 0.4)])
    ts2, info = rescue_modes(ts, init, jax.random.key(9), cov, quad, L)
    assert info["n_spurious"] == 1
    np.testing.assert_array_equal(info["perm"], [0, 3, 2, 1])
    out_after = np.asarray(apply(ts2.params, x))
    # healthy modes carried over exactly, in rayleigh order
    np.testing.assert_allclose(out_after[:, :3], out_before[:, [0, 3, 2]],
                               rtol=1e-6)
    # tail slot re-initialized: equals a fresh init's mode-1-origin slice?
    # (fresh params spliced at tail positions) — output must differ from
    # every old mode
    for j in range(L):
        assert np.abs(out_after[:, 3] - out_before[:, j]).max() > 1e-6
    # ema tail equals params tail (fresh start), healthy ema permuted
    np.testing.assert_allclose(
        np.asarray(ts2.ema_params["base"]["ws"][0][3]),
        np.asarray(ts2.params["base"]["ws"][0][3]))
    # optimizer moments: tail zeroed, healthy slices permuted
    nu = ts2.opt_state[0].nu["base"]["ws"][0]
    assert float(jnp.abs(nu[3]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(nu[:3]),
        np.asarray(ts.opt_state[0].nu["base"]["ws"][0])[[0, 3, 2]])
    # per-mode exp-mask scales permuted too
    np.testing.assert_allclose(
        np.asarray(ts2.params["mask"]["scales"][:3]),
        np.asarray(ts.params["mask"]["scales"])[[0, 3, 2]])


def test_rescue_noop_when_healthy(wf):
    init, _ = wf
    ts = _make_ts(init)
    rng = np.random.default_rng(3)
    cov, quad = _synthetic_accumulators(rng, [100.0, 11.0, 4.0, 2.0])
    ts2, info = rescue_modes(ts, init, jax.random.key(9), cov, quad, L)
    assert info["n_spurious"] == 0
    assert ts2 is ts


def test_rescue_all_modes_spurious_no_crash(wf):
    """ADVICE r3: clone_healthy_tail=True with EVERY mode spurious
    (all-zero accumulators — a NaN-blown run) made n_src = 0 and crashed
    with ZeroDivisionError inside the rescue path.  Must fall back to the
    fresh-init splice and return a usable state."""
    init, apply = wf
    ts = _make_ts(init)
    cov = np.zeros((L, L))
    quad = np.zeros((L, L))
    ts2, info = rescue_modes(
        ts, init, jax.random.key(7), cov, quad, L,
        clone_healthy_tail=True,
        measure_norms=lambda p: np.ones(L),
        scale_fn=lambda p, idx, f: p)
    assert info["n_spurious"] == L
    # ADVICE r4 medium: the all-spurious path skips the amplitude rescale
    # but callers (validate_northstar's rescue print) read
    # info['amplitude_factors'] unconditionally whenever n_spurious > 0 —
    # the key must ALWAYS exist on that path
    assert len(np.asarray(info["amplitude_factors"])) == L
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 2)),
                    jnp.float32)
    out = np.asarray(apply(ts2.params, x))
    assert np.isfinite(out).all()
    # fresh-init fallback: optimizer moments zeroed on every slot
    nu = ts2.opt_state[0].nu["base"]["ws"][0]
    assert float(jnp.abs(nu).max()) == 0.0


def test_rescue_plan_orders_healthy_by_rayleigh():
    health = {
        "healthy": np.array([True, False, True, True]),
        "rayleigh": np.array([4.0, 50.0, 100.0, 11.0]),
        "norms": np.array([4.0, 0.5, 100.0, 11.0]),
    }
    perm, n_bad = rescue_plan(health)
    assert n_bad == 1
    np.testing.assert_array_equal(perm, [2, 3, 0, 1])


def test_train_operator_rescue_wiring_e2e(caplog):
    """e2e wiring: a mode initialized as a TINY copy of mode 0 (the L=36
    collapse signature — near-zero amplitude parked on an occupied
    direction, corr ~ 1) is diagnosed at the first eval, logged, exiled +
    re-initialized by the in-driver rescue, and the run still converges
    to the distinct oscillator modes.

    (Notes from writing this test: an *exact-copy* trap is NOT permanent —
    the sequential nesting masks give each mode a different objective, so
    identical params receive different gradients and separate; and a
    *tiny*-amplitude copy recovers within ~500 iters at this scale because
    RMSprop normalizes per-parameter steps.  A ZERO output layer however
    is a true fixed point: the loss cotangent w.r.t. mode outputs is
    proportional to Tf and lam*f, both zero, so every layer of the dead
    mode gets exactly zero gradient forever — rescue is the only way
    out.)"""
    import logging

    from neuralsvd_tpu.data.samplers import get_sampler
    from neuralsvd_tpu.methods.nestedlora import NestedLoRA
    from neuralsvd_tpu.operators.problems import get_problem
    from neuralsvd_tpu.training.optimizers import cosine_annealing
    from neuralsvd_tpu.training.train_operator import train_operator

    neigs, num_iters = 3, 12000
    operator, gt, _ = get_problem(
        problem="sch", potential_type="harmonic_oscillator", ndim=1,
        neigs=neigs, laplacian_eps=0.1, operator_shift=10.0)
    init, apply = make_wavefunctions(
        ndim=1, neigs=neigs, mlp_hidden_dims=[32, 32],
        nonlinearity="softplus", parallel=True, apply_boundary=True,
        boundary_mode="dir_box_sqrt", lim=4.0)
    params = init(jax.random.key(0))
    # L=36-style collapse state: mode 1 amplitude exactly zero (permanent
    # dead mode — see docstring)
    ws = params["base"]["ws"]
    params["base"]["ws"] = ws[:-1] + [ws[-1].at[1].set(0.0)]
    bs = params["base"]["bs"]
    params["base"]["bs"] = bs[:-1] + [bs[-1].at[1].set(0.0)]
    sampler, importance = get_sampler("gaussian", 256, 1, 1, 1.0)
    method = NestedLoRA(apply, neigs=neigs, sequential=True)
    opt = torch_rmsprop(cosine_annealing(1e-3, num_iters), alpha=0.999)

    with caplog.at_level(logging.WARNING,
                         logger="neuralsvd_tpu.training.train_operator"):
        ts, all_eigvals, _ = train_operator(
            method, operator, sampler, opt, params,
            num_iters=num_iters, importance_train=importance,
            val_batches=lambda: [jnp.linspace(-4, 4, 512).reshape(-1, 1)],
            ema_decay=0.995, eval_freq=3000, print_freq=2000, seed=3,
            rescue_init_fn=init)
    assert "DUPLICATE" in caplog.text or "DEAD" in caplog.text
    assert "rescue: exiled" in caplog.text
    ev = np.sort(np.asarray(all_eigvals[-1]))[::-1]
    gt_top = np.array([9.0, 7.0, 5.0])  # -H + 10 shift, E_n = 2n+1
    err = np.abs(ev - gt_top) / gt_top
    assert err.max() < 0.05, f"rescued run failed to converge: {ev}"


def test_rescue_amplitude_matching(wf):
    """Re-initialized tail modes are rescaled so their batch norm lands at
    amplitude_frac x the smallest healthy norm (rescue-cycling fix: an
    init-scale mode among 1e5-norm peers cannot grow under RMSprop)."""
    from neuralsvd_tpu.models.wavefunctions import scale_mode_amplitudes
    from neuralsvd_tpu.training.rescue import rescue_modes

    init, apply = wf
    ts = _make_ts(init)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((256, 2)),
                    jnp.float32)

    def measure_norms(params):
        f = apply(params, x)
        return np.asarray(jnp.mean(f * f, axis=0))

    rng = np.random.default_rng(6)
    cov, quad = _synthetic_accumulators(
        rng, [100.0, 100.0, 11.0, 4.0], dup_pairs=[(1, 0, 0.3)])
    ts2, info = rescue_modes(ts, init, jax.random.key(4), cov, quad, L,
                             measure_norms=measure_norms,
                             scale_fn=scale_mode_amplitudes)
    assert info["n_spurious"] == 1
    norms_after = measure_norms(ts2.params)
    healthy_floor = norms_after[:3].min()
    # tail mode landed at 0.5 x the smallest healthy norm (default frac)
    np.testing.assert_allclose(norms_after[3], 0.5 * healthy_floor,
                               rtol=1e-4)
    # ema tail mirrors the rescaled params tail
    np.testing.assert_allclose(
        np.asarray(ts2.ema_params["base"]["ws"][-1][3]),
        np.asarray(ts2.params["base"]["ws"][-1][3]))


def test_clone_perturb_rescue_and_grace(wf):
    """Clone-and-perturb re-init: tail slots become noisy copies of the
    smallest healthy modes (positive Rayleigh from step one); slots under
    grace are exempt from the duplicate criterion but not from death."""
    from neuralsvd_tpu.training.rescue import rescue_modes

    init, apply = wf
    ts = _make_ts(init)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((512, 2)),
                    jnp.float32)
    rng = np.random.default_rng(8)
    cov, quad = _synthetic_accumulators(
        rng, [100.0, 100.0, 11.0, 4.0], dup_pairs=[(1, 0, 0.4)])
    ts2, info = rescue_modes(ts, init, jax.random.key(5), cov, quad, L,
                             clone_healthy_tail=True)
    assert info["n_spurious"] == 1
    # healthy order after perm: [0 (100), 2 (11), 3 (4)]; source = slot 2
    # (smallest healthy) which holds ORIGINAL mode 3
    np.testing.assert_array_equal(info["clone_sources"], [2])
    out = np.asarray(apply(ts2.params, x))
    c = np.corrcoef(out[:, 3], out[:, 2])[0, 1]
    assert abs(c) > 0.5, f"clone not correlated with source: {c}"
    # perturbed, not identical
    assert np.abs(out[:, 3] - out[:, 2]).max() > 1e-6
    # clone inherits the source's optimizer moments (not zeroed)
    nu = ts2.opt_state[0].nu["base"]["ws"][0]
    np.testing.assert_array_equal(np.asarray(nu[3]), np.asarray(nu[2]))
    assert float(jnp.abs(nu[3]).max()) > 0.0

    # grace: same diagnosis, but slot 1 (the duplicate) is under grace
    ts3, info3 = rescue_modes(ts, init, jax.random.key(5), cov, quad, L,
                              clone_healthy_tail=True, grace_slots=[1])
    assert info3["n_spurious"] == 0
    # a DEAD slot under grace is still exiled
    cov_d, quad_d = _synthetic_accumulators(
        rng, [100.0, 11.0, 4.0, 2.0], dead=[3])
    ts4, info4 = rescue_modes(ts, init, jax.random.key(5), cov_d, quad_d,
                              L, clone_healthy_tail=True, grace_slots=[3])
    assert info4["n_spurious"] == 1


def test_rescue_with_chained_per_mode_lr_optimizer():
    """The L=36 gate config chains torch_rmsprop with per_mode_lr
    (NS_TAIL_LR); rescue's structural opt-state surgery (permute/clone/
    zero any leaf with a leading mode axis) must traverse the chained
    state and the rescued TrainState must still step."""
    import optax

    from neuralsvd_tpu.methods.nestedlora import NestedLoRA
    from neuralsvd_tpu.models import make_wavefunctions
    from neuralsvd_tpu.training.optimizers import per_mode_lr, torch_rmsprop
    from neuralsvd_tpu.training.train_state import init_train_state

    L = 6
    init, apply = make_wavefunctions(
        ndim=2, neigs=L, mlp_hidden_dims=[8, 8], nonlinearity="softplus",
        parallel=True, apply_boundary=False, apply_exp_mask=True,
        exp_mask_init_scale=5.0, lim=4.0)
    params = init(jax.random.key(0))
    method = NestedLoRA(apply, neigs=L, sequential=True)
    scales = np.where(np.arange(L) >= 4, 3.0, 1.0).astype(np.float32)
    opt = optax.chain(torch_rmsprop(1e-4, alpha=0.999),
                      per_mode_lr(scales, L))
    ts = init_train_state(params, opt, method)

    cov = np.eye(L)
    cov[5, 5] = 1e-8
    cov[0, 5] = cov[5, 0] = 9.9e-5  # tiny duplicate of mode 0
    quad = np.diag([10.0, 8.0, 6.0, 5.0, 4.0, 1e-7])
    new_ts, info = rescue_modes(ts, init, jax.random.key(1), cov, quad, L,
                                clone_healthy_tail=True)
    assert info["n_spurious"] >= 1

    x = jax.random.normal(jax.random.key(2), (16, 2))
    _, grads, _, _ = method.loss_and_grad(
        new_ts.params, new_ts.method_state, x,
        lambda f, xx, importance=None: (f(xx), f(xx)))
    updates, _ = opt.update(grads, new_ts.opt_state, new_ts.params)
    assert all(bool(jnp.isfinite(u).all()) for u in jax.tree.leaves(updates))
