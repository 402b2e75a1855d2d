"""North-star validation: 2D hydrogen top-16 eigenvalues on TPU.

Trains NestedLoRA on the negated 2D hydrogen Hamiltonian (operator_scale
100, analytic spectrum 100·Z²/(4(n+1/2)²) for n=0..3 with degeneracies
1/3/5/7 — ground_truths.Hydrogen2D) and reports per-mode relative errors
vs BASELINE.json's target (rel-err ≤ 1e-3).

Round-2 accuracy levers (all on by default, env-switchable for ablation):
- NS_MIX: multi-scale Gaussian-mixture sampling (default "0.5,2,6,16").
  A single scale-16 Gaussian puts ~0.2% of samples inside r<1 where the
  1s state lives — the ground state is starved of quadrature and gradient
  signal.  The mixture's exact density keeps conjugation unbiased.
- NS_ENV: hydrogenic envelope input features e^{-κ_n r}, κ_n = Z/(n+1/2)
  (default on) — the exact shell asymptotics as linearly-combinable inputs.
- Degeneracy-aware eval: within a degenerate group the learned modes are
  an arbitrary rotation of the true eigenspace; the pooled group estimate
  tr(quad_G)/tr(cov_G) is rotation-invariant (methods/spectrum.py
  grouped_rayleigh).  The 1s is a singleton group and gets no pooling.

Evaluation matches the training measure: Rayleigh quotients of the
importance-conjugated operator on a large held-out batch from the sampling
distribution equal the Lebesgue eigenvalues (diff_ops importance
conjugation).

Round-3 levers:
- NS_EVAL_TOP: guard modes — train NS_NEIGS modes, report the top
  NS_EVAL_TOP (which must close a shell).  Edge modes converge slowest;
  guards make every reported shell interior.
- NS_LR: cosine-annealing peak LR (default 1e-4, reference hydrogen.sh).
- NS_TAIL_LR / NS_TAIL_LR_START: per-mode LR boost for the truncation
  -edge towers (default off / mode 25 = the n=5 shell at L=36).  Safe
  under sequential nesting: prefix independence means earlier modes are
  provably untouched (tests/test_guard_invariance.py).

Round-4 levers:
- NS_METHOD: nestedlora (default) | spin | neuralef — the competing
  methods through the IDENTICAL sampler/model/eval harness (VERDICT r3
  item 5: the reference's multi-method hydrogen figure, README.md:36-42).
  SpIN carries an (L, L, P) Jacobian EMA, so NS_PARALLEL=0 + a smaller
  NS_FMAP is the practical budget scaling for it; rescue/tail-LR are
  NestedLoRA-only levers and are refused for other methods.
- NS_PARALLEL: per-mode towers (default 1).  NS_FMAP: Fourier mapping
  size (default 1024).

Usage: python scripts/validate_northstar.py [num_iters] [lap_eps]
(default 300000, 0.1; lap_eps <= 0 selects the exact Laplacian)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "float32")

from neuralsvd_tpu.data.samplers import get_sampler  # noqa: E402
from neuralsvd_tpu.methods.nestedlora import NestedLoRA  # noqa: E402
from neuralsvd_tpu.methods.spectrum import spectrum_report  # noqa: E402
from neuralsvd_tpu.models import make_wavefunctions  # noqa: E402
from neuralsvd_tpu.operators.ground_truths import (  # noqa: E402
    Hydrogen2D,
    Hydrogen3D,
)
from neuralsvd_tpu.operators.problems import get_problem  # noqa: E402
from neuralsvd_tpu.training.optimizers import (  # noqa: E402
    cosine_annealing,
    torch_rmsprop,
)
from neuralsvd_tpu.training.train_operator import (  # noqa: E402
    make_scanned_train_step,
)
from neuralsvd_tpu.training.train_state import init_train_state  # noqa: E402

NDIM = int(os.environ.get("NS_NDIM", "2"))  # 2 (north-star) or 3
NEIGS = int(os.environ.get("NS_NEIGS", "16"))  # 16 (north-star) or 36 (ref)
# Guard modes (the subspace-iteration trick): train NEIGS modes, report
# only the top NS_EVAL_TOP.  The modes at the truncation edge of the
# learned subspace converge slowest (L=36 n=5 shell tail, BASELINE.md);
# with g = NEIGS - EVAL_TOP sacrificial guards every *reported* shell is
# interior.  Guards still train, get rescued, and count toward
# n_spurious; they are excluded only from the accuracy metrics.
EVAL_TOP = int(os.environ.get("NS_EVAL_TOP", "0")) or NEIGS


def _shell_size(n):  # shell n = 0, 1, 2, …
    return 2 * n + 1 if NDIM == 2 else (n + 1) ** 2


_N_SHELLS = 1
while sum(_shell_size(n) for n in range(_N_SHELLS)) < NEIGS:
    _N_SHELLS += 1
# the REPORTED count must close a hydrogen shell (degeneracy-aware
# grouping); the TRAINED count may end mid-shell — guard modes inside a
# degenerate eigenspace span an arbitrary (harmless) sub-rotation of it
_shell_cum = [sum(_shell_size(k) for k in range(n + 1))
              for n in range(_N_SHELLS)]
assert EVAL_TOP in _shell_cum, (
    f"NS_EVAL_TOP={EVAL_TOP} (or NEIGS when unset) must close a hydrogen "
    f"shell ({'1, 4, 9, 16, 25, 36' if NDIM == 2 else '1, 5, 14, 30'}…)")
assert EVAL_TOP <= NEIGS
SEQUENTIAL = os.environ.get("NS_SEQ", "1") == "1"
METHOD = os.environ.get("NS_METHOD", "nestedlora")
PARALLEL = os.environ.get("NS_PARALLEL", "1") == "1"
FMAP = int(os.environ.get("NS_FMAP", "1024"))
BATCH = int(os.environ.get("NS_BATCH", "512"))
SCALE = 16.0     # widest gaussian scale (reference hydrogen.sh)
LAP_EPS = 0.1    # FD; f32-safe (see verify skill); <= 0 for exact autodiff
GRAD_CLIP = 0.0  # skip-only; clipping at the wrong scale destroys training
RADIAL = os.environ.get("NS_RADIAL", "1") == "1"  # r cusp feature (1s state)
_mix = os.environ.get("NS_MIX", "0.5,2,6,16")
MIX_SCALES = (None if _mix in ("0", "") else
              tuple(float(v) for v in _mix.split(",")))
_mixw = os.environ.get("NS_MIX_W", "")
MIX_WEIGHTS = (tuple(float(v) for v in _mixw.split(",")) if _mixw else None)
# hydrogenic radial decay rates per shell: psi_n ~ e^{-kappa_n r} with
# kappa_n = Z/(n+1/2) in 2D (ground_truths.Hydrogen2D) and Z/(2n) in 3D
# (Hydrogen3D's E(n) = -Z^2/(4 n^2) convention, a0 = 2/Z)
ENVELOPES = (tuple((1.0 / (n + 0.5) if NDIM == 2 else 1.0 / (2 * (n + 1)))
                   for n in range(_N_SHELLS))
             if os.environ.get("NS_ENV", "1") == "1" else ())
EXP_MASK = os.environ.get("NS_EXP_MASK", "0") == "1"  # learnable e^{-r/s_l}
_ems = os.environ.get("NS_EXP_MASK_SCALE", "5.0")
if _ems == "grouped":
    # physics-informed per-group init: 2D hydrogen psi_n ~ e^{-r/s_n} with
    # s_n = (n+1/2)/Z, degeneracy 2n+1 (ground_truths.Hydrogen2D)
    EXP_MASK_SCALE = [n + 0.5 for n in range(4) for _ in range(2 * n + 1)]
elif "," in _ems:
    EXP_MASK_SCALE = tuple(float(v) for v in _ems.split(","))  # lo,hi ladder
else:
    EXP_MASK_SCALE = float(_ems)
CHUNK = int(os.environ.get("NS_CHUNK", "1000"))
EVAL_ROUNDS = int(os.environ.get("NS_EVAL_ROUNDS", "64"))
LR = float(os.environ.get("NS_LR", "1e-4"))  # cosine peak (ref hydrogen.sh)
TAIL_LR = float(os.environ.get("NS_TAIL_LR", "1"))  # per-mode tail boost
TAIL_LR_START = int(os.environ.get("NS_TAIL_LR_START", "25"))  # n=5 shell
# Dead/duplicate-mode rescue (training/rescue.py): periodic diagnosis on
# the raw params; spurious modes are exiled to the tail slots and
# re-initialized while the cosine LR is still healthy.  The L=36 collapse
# (BASELINE.md) is a stable saddle — without this, 4 modes park on the
# 1s/n=1 directions and the n=5 shell stays 5 modes short.
BF16 = os.environ.get("NS_BF16", "0") == "1"  # bf16 tower einsums (exact
# -JVP path only: FD stencils cancel catastrophically in bf16; features,
# grams, Cholesky stay f32 — the CDK compute_dtype recipe, VERDICT r2 §7)
PREC = os.environ.get("NS_PREC", "")  # tower matmul precision tier
# ('high' = 3-pass bf16, f32 storage, error ~2^-21 — between NS_BF16's
# 1-pass bf16 storage and the ambient f32-HIGHEST 6-pass; BASELINE.md E6)
RESCUE = os.environ.get("NS_RESCUE", "0") == "1"
RESCUE_EVERY = int(os.environ.get("NS_RESCUE_EVERY", "50000"))
RESCUE_END_FRAC = float(os.environ.get("NS_RESCUE_END", "0.7"))
RESCUE_ROUNDS = int(os.environ.get("NS_RESCUE_ROUNDS", "8"))
# clone-and-perturb re-init (default): random re-inits have negative
# Rayleigh (continuum-dominated) and are squeezed to zero before finding
# the tiny-reward free directions; clones of the smallest healthy modes
# start positive and spectrally adjacent (training/rescue.py)
RESCUE_CLONE = os.environ.get("NS_RESCUE_CLONE", "1") == "1"
CKPT = os.environ.get("NS_CKPT", "")  # pickle path: save/resume TrainState
# (the axon tunnel can wedge mid-run — observed once at L=36 after 500k
# iters; with NS_CKPT a rerun resumes from the last saved chunk, schedule
# state included, instead of losing hours)


def _save_ckpt(ts, chunk_idx):
    # one checkpoint code path (training/checkpoint.py orbax; VERDICT r2
    # item 8 — the round-2 pickle is only still *read*, never written)
    from neuralsvd_tpu.training.checkpoint import save_resumable

    save_resumable(CKPT, ts, chunk_idx)


def _load_ckpt(template_ts):
    if not CKPT:
        return None
    from neuralsvd_tpu.training.checkpoint import load_resumable

    return load_resumable(CKPT, template_ts)


def make_sampling(batch):
    if MIX_SCALES is not None:
        return get_sampler("gaussian_mixture", batch, 1, NDIM, MIX_SCALES,
                           sampling_weights=MIX_WEIGHTS)
    return get_sampler("gaussian", batch, 1, NDIM, SCALE)


def build_model(lap_eps=LAP_EPS):
    """Problem + wavefunction model under the NS_* env configuration.

    Shared by main() and the eval-only tools (scripts/plot_hydrogen_modes.py)
    so a checkpoint is always reloaded into the exact architecture that
    trained it.  Returns (operator, gt, sampler, importance, init, apply).
    """
    operator, gt, _ = get_problem(
        problem="sch", potential_type="hydrogen", ndim=NDIM, neigs=NEIGS,
        laplacian_eps=lap_eps, operator_scale=100.0,
        laplacian_mode=os.environ.get("NS_LAP", "forward"))
    sampler, importance = make_sampling(BATCH)
    init, apply = make_wavefunctions(
        ndim=NDIM, neigs=NEIGS, mlp_hidden_dims=[128, 128, 128],
        nonlinearity="softplus", parallel=PARALLEL,
        use_fourier_feature=True,
        fourier_mapping_size=FMAP, fourier_scale=0.1,
        fourier_append_radial=RADIAL,
        fourier_append_envelopes=ENVELOPES,
        apply_boundary=False, apply_exp_mask=EXP_MASK,
        exp_mask_init_scale=EXP_MASK_SCALE,
        exp_mask_conjugate_importance=(
            importance if os.environ.get("NS_EXP_MASK_CONJ") == "1"
            else None),
        compute_dtype=(jnp.bfloat16 if BF16 else None),
        matmul_precision=(PREC or None))
    if BF16 and lap_eps > 0:
        raise SystemExit("NS_BF16=1 requires the exact Laplacian "
                         "(lap_eps <= 0): FD stencils are numerically "
                         "fatal in bf16")
    return operator, gt, sampler, importance, init, apply


def main(num_iters=300_000, lap_eps=LAP_EPS):
    operator, gt, sampler, importance, init, apply = build_model(lap_eps)
    params = init(jax.random.key(0))
    if METHOD == "nestedlora":
        method = NestedLoRA(apply, neigs=NEIGS, sequential=SEQUENTIAL)
    else:
        # competing methods through the identical harness (VERDICT r3
        # item 5); rescue/tail-LR are NestedLoRA-specific levers
        assert not RESCUE and TAIL_LR == 1.0, (
            "NS_RESCUE / NS_TAIL_LR are NestedLoRA-only levers")
        from neuralsvd_tpu.methods.factories import get_evd_method

        opts = {"spin": dict(decay=float(
                    os.environ.get("NS_SPIN_DECAY", "0.05"))),
                "neuralef": dict(unbiased=True,
                                 batchnorm_mode="unbiased")}[METHOD]
        method = get_evd_method(METHOD, apply, NEIGS, **opts)
    opt = torch_rmsprop(cosine_annealing(LR, num_iters), alpha=0.999)
    if TAIL_LR != 1.0:
        # per-mode LR on the slow truncation-edge towers — provably
        # cannot perturb earlier modes under sequential nesting
        # (tests/test_guard_invariance.py); miniature: 3x boost cut the
        # edge-mode rel-err 15x (BASELINE "Guard-mode mechanics")
        import optax

        from neuralsvd_tpu.training.optimizers import (
            assert_mode_axis_unambiguous, per_mode_lr)

        assert PARALLEL, "NS_TAIL_LR requires per-mode towers (NS_PARALLEL=1)"
        assert_mode_axis_unambiguous(params, NEIGS)
        scales = np.where(np.arange(NEIGS) >= TAIL_LR_START, TAIL_LR,
                          1.0).astype(np.float32)
        opt = optax.chain(opt, per_mode_lr(scales, NEIGS))
        print(f"tail LR boost {TAIL_LR}x from mode {TAIL_LR_START}",
              flush=True)

    step_fn = make_scanned_train_step(
        method, operator, opt, sampler, importance=importance,
        ema_decay=0.995, steps_per_call=CHUNK, grad_clip=GRAD_CLIP)
    ts = init_train_state(params, opt, method)
    run = jax.jit(step_fn)

    start_chunk = 0
    saved = _load_ckpt(ts)
    if saved is not None:
        ts, start_chunk = saved
        print(f"resumed from {CKPT} at chunk {start_chunk} "
              f"({start_chunk * CHUNK} iters)", flush=True)

    # eval accumulator (also used by the rescue diagnosis mid-training)
    eval_sampler, _ = make_sampling(8192)

    @jax.jit
    def accum(params, method_state, key):
        x = eval_sampler(key)
        # method-aware eval map: SpIN orthonormalizes via its stored
        # Cholesky, NeuralEF applies its batch-norm state; for NestedLoRA
        # this is plain apply (methods/*.py eval_apply contract)
        Tf, f = operator(lambda xx: method.eval_apply(params, method_state,
                                                      xx), x, importance)
        cov = jnp.einsum("bl,bm->lm", f, f)
        quad = jnp.einsum("bl,bm->lm", f, Tf)
        return cov, quad

    def accum_rounds(params, rounds, seed=3, method_state=None):
        if method_state is None:
            method_state = ts.method_state
        cov = quad = 0.0
        for r in range(rounds):
            c, q = accum(params, method_state,
                         jax.random.fold_in(jax.random.key(seed), r))
            cov, quad = cov + c, quad + q
        return np.asarray(cov), np.asarray(quad)

    grace_slots = []

    def maybe_rescue(ts, it_done):
        nonlocal grace_slots
        from neuralsvd_tpu.methods.spectrum import format_mode_health
        from neuralsvd_tpu.models.wavefunctions import scale_mode_amplitudes
        from neuralsvd_tpu.training.rescue import rescue_modes

        cov, quad = accum_rounds(ts.params, RESCUE_ROUNDS,
                                 seed=11 + it_done)

        def measure_norms(params):
            c, _ = accum_rounds(params, 2, seed=13 + it_done)
            return np.diag(c)

        ts, info = rescue_modes(
            ts, init, jax.random.fold_in(jax.random.key(7), it_done),
            cov, quad, NEIGS,
            measure_norms=measure_norms, scale_fn=scale_mode_amplitudes,
            clone_healthy_tail=RESCUE_CLONE, grace_slots=grace_slots)
        if info["n_spurious"]:
            grace_slots = list(info["tail_slots"])
            src = (f" cloned from {info['clone_sources']}"
                   if "clone_sources" in info else "")
            print(f"[rescue @ {it_done}] exiled + re-initialized "
                  f"{info['n_spurious']} modes{src} "
                  f"(amplitude factors "
                  f"{np.round(info['amplitude_factors'], 3)}):\n"
                  f"{format_mode_health(info['health'])}", flush=True)
        else:
            grace_slots = []
            print(f"[rescue @ {it_done}] all modes healthy", flush=True)
        return ts

    # eval under the sampling measure with conjugation (EMA params)
    gt_sorted = np.sort(np.asarray(gt))[::-1][:EVAL_TOP]
    gt_problem = Hydrogen2D() if NDIM == 2 else Hydrogen3D()
    cum = gt_problem.get_degeneracy(EVAL_TOP)  # cumulative group counts
    group_sizes = np.diff(np.concatenate([[0], cum]))
    assert group_sizes.sum() == EVAL_TOP

    def spectrum_of(params, tag):
        # one tested code path for the collapse-/degeneracy-/guard-aware
        # eval: methods/spectrum.py::spectrum_report
        cov, quad = accum_rounds(params, EVAL_ROUNDS, seed=3)
        rep = spectrum_report(cov, quad, gt_sorted, group_sizes,
                              top=EVAL_TOP)
        if rep["report"]:
            print(f"[{tag}] {rep['report']}")
        if EVAL_TOP < NEIGS:
            print(f"[{tag}] guards:  ", np.round(rep["guards"], 4))
        print(f"[{tag}] learned: ", np.round(rep["rayleigh"], 4))
        print(f"[{tag}] rel-err: ", np.round(rep["rel"], 5))
        print(f"[{tag}] grouped: ", np.round(rep["grouped"], 4))
        print(f"[{tag}] rel-grp: ", np.round(rep["rel_grouped"], 5))
        print(f"[{tag}] aligned: ", np.round(rep["aligned"], 4))
        print(f"[{tag}] rel-al:  ", np.round(rep["rel_aligned"], 5))
        print(f"[{tag}] max_off_corr {rep['max_off_corr']:.4f}")
        return (rep["rel"], rep["rel_grouped"], rep["rel_aligned"],
                rep["max_off_corr"], rep["health"])

    # Mid-run partial rows + early gate stop (round 5): the 800k flagship
    # runs are hours long and the host can restart mid-run losing every
    # uncommitted byte (observed 2026-08-19 06:14 — the round-4 queue's
    # gate attempt died at ~2.4h with nothing recoverable).  NS_EVAL_EVERY
    # emits a full EMA spectrum_report + a machine-parseable JSON line
    # every N iters, so the queue's log autocommit turns any truncated run
    # into a measured partial row; NS_GATE stops training as soon as the
    # grouped criterion is met (saving TPU-hours for the rest of the queue).
    EVAL_EVERY = int(os.environ.get("NS_EVAL_EVERY", "0"))
    GATE = float(os.environ.get("NS_GATE", "0"))
    assert EVAL_EVERY % CHUNK == 0, "NS_EVAL_EVERY must be a CHUNK multiple"

    t0 = time.time()
    trained_chunks = 0
    for i in range(start_chunk, num_iters // CHUNK):
        ts, m = run(ts, jax.random.fold_in(jax.random.key(2), i))
        it_done = (i + 1) * CHUNK
        trained_chunks = i + 1 - start_chunk
        if (RESCUE and it_done % RESCUE_EVERY == 0
                and it_done <= RESCUE_END_FRAC * num_iters
                and it_done < num_iters):
            ts = maybe_rescue(ts, it_done)
        if CKPT and (i + 1) % int(os.environ.get("NS_CKPT_EVERY", "25")) == 0:
            _save_ckpt(ts, i + 1)
        if (i + 1) % 50 == 0:
            print(f"iter {(i + 1) * CHUNK}: loss {float(m['loss'][-1]):.4f} "
                  f"gnorm_max {float(m['gnorm'].max()):.3g} "
                  f"med {float(jnp.median(m['gnorm'])):.3g} "
                  f"skips {int(m['skipped'].sum())} "
                  f"({((i + 1) - start_chunk) * CHUNK / (time.time() - t0):.0f}"
                  f" steps/s)", flush=True)
        if EVAL_EVERY and it_done % EVAL_EVERY == 0 and it_done < num_iters:
            p_rel, p_grp, _, p_off, p_health = spectrum_of(
                ts.ema_params, f"ema@{it_done}")
            print(json.dumps({
                "metric": (f"hydrogen{NDIM}d_L{EVAL_TOP}"
                           "_eigval_max_rel_err_grouped"
                           + ("" if METHOD == "nestedlora"
                              else f"_{METHOD}")),
                "value": float(p_grp.max()),
                "partial_at_iter": it_done,
                "max_off_diag_corr": float(p_off),
                "n_spurious_modes": int((~p_health["healthy"]).sum()),
            }), flush=True)
            if CKPT:
                _save_ckpt(ts, i + 1)
            if GATE and float(p_grp.max()) <= GATE:
                print(f"early stop: grouped {float(p_grp.max()):.4g} <= "
                      f"gate {GATE} at iter {it_done}", flush=True)
                num_iters = it_done  # final JSON reports the true budget
                break
    train_time = time.time() - t0

    print("analytic:", np.round(gt_sorted, 4))
    spectrum_of(ts.params, "raw")
    (rel, rel_grouped, rel_aligned, max_off,
     health) = spectrum_of(ts.ema_params, "ema")
    print(json.dumps({
        "metric": (f"hydrogen{NDIM}d_L{EVAL_TOP}_eigval_max_rel_err_grouped"
                   + ("" if METHOD == "nestedlora" else f"_{METHOD}")),
        "method": METHOD,
        "value": float(rel_grouped.max()),
        "max_rel_err_sorted": float(rel.max()),
        "median_rel_err": float(np.median(rel)),
        "max_rel_err_aligned": float(rel_aligned.max()),
        "max_off_diag_corr": max_off,
        "n_spurious_modes": int((~health["healthy"]).sum()),
        "num_iters": num_iters,
        # throughput counts only the steps THIS process trained (a resumed
        # run starts at start_chunk * CHUNK, not 0 — ADVICE r2); 0.0 for
        # eval-only invocations (ckpt resumed at/after num_iters)
        "train_steps_per_sec": round(
            max(trained_chunks, 0) * CHUNK / train_time, 1),
        "resumed_at_iter": start_chunk * CHUNK,
        "target": 1e-3,
        "config": {"mix": MIX_SCALES, "mix_weights": MIX_WEIGHTS,
                   "envelopes": ENVELOPES,
                   "radial": RADIAL, "exp_mask": EXP_MASK,
                   "batch": BATCH, "lap_eps": lap_eps,
                   "rescue": RESCUE, "bf16": BF16, "prec": PREC or None,
                   "neigs_trained": NEIGS, "eval_top": EVAL_TOP, "lr": LR,
                   "tail_lr": TAIL_LR, "tail_lr_start": TAIL_LR_START,
                   "parallel": PARALLEL, "fourier_mapping_size": FMAP},
    }))


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else LAP_EPS
    main(iters, eps)
