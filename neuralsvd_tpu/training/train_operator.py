"""Generic operator-EVD training: jitted step factory + host driver.

Reference: examples/operator/__init__.py:20-153 (train_operator).

TPU design:
- ONE jitted step fuses sampling (device PRNG), operator application,
  loss + custom-VJP backward, optimizer update, and parameter EMA — no
  host↔device transfer in the hot loop.
- Per-mode blow-up statistics (batch percentiles of local energies) are
  computed on-device and returned as a small (9, L) array consumed by the
  host-side EWM monitors only when monitoring is enabled.
- Under a device mesh the same step is wrapped in shard_map (see
  parallel/), with the method constructed with ``axis_name`` so Gram
  reductions psum over ICI.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralsvd_tpu.training.train_state import (
    TrainState,
    ema_update,
    init_train_state,
)

log = logging.getLogger(__name__)

_PERCENTILES = None  # set lazily: erf-spaced percentiles for EWM stats


def make_train_step(
    method,
    operator,
    optimizer: optax.GradientTransformation,
    sampler: Callable,
    importance: Optional[Callable] = None,
    ema_decay: float = 0.99,
    monitor: bool = False,
    grad_clip: float = 0.0,
    dp_axis: Optional[str] = None,
):
    """Build the fused train step: (TrainState, key) -> (TrainState, metrics).

    Non-finite losses/gradients skip the whole update (the TPU-native
    equivalent of the reference's AMP GradScaler inf/nan step skipping,
    SURVEY §5.3; metrics["skipped"] flags it).  ``grad_clip`` > 0 clips the
    global gradient norm — near-singular potentials (Coulomb −Z/r under
    Gaussian sampling) occasionally produce huge local energies whose
    gradient spikes destabilize long runs.

    ``dp_axis``: when set, the step is a per-device program for
    ``shard_map`` data parallelism (the method must be built with the same
    ``axis_name``): each device folds its axis index into the key and draws
    an independent local batch; param grads are psum-completed across
    devices BEFORE the finite/skip/clip logic so every replica takes the
    identical update (a per-device skip decision would silently de-sync
    replicas).
    """

    # stochastic operators (Hutchinson Laplacian) draw per-step probes:
    # bind a subkey into the operator closure so the method layer stays
    # key-free (probes independent of the sample draw via distinct fold)
    stochastic_op = getattr(operator, "needs_key", False)

    def step(ts: TrainState, key) -> tuple:
        if dp_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(dp_axis))
        x = sampler(key)
        x = x.reshape(x.shape[0], -1)
        op = operator
        if stochastic_op:
            op_key = jax.random.fold_in(key, 0x0BE5)
            op = lambda f, xv, importance=None: operator(
                f, xv, importance, key=op_key)
        loss, grads, aux, method_state = method.loss_and_grad(
            ts.params, ts.method_state, x, op, importance)
        if dp_axis is not None:
            # per-device grads are partial sums over local rows normalized
            # by the global batch (ops/nestedlora.py _axis_scale)
            grads = jax.lax.psum(grads, dp_axis)
            method_state = jax.lax.pmean(method_state, dp_axis)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        if grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        params = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                              new_params, ts.params)
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if hasattr(n, "ndim") else n,
            opt_state, ts.opt_state)
        ema_params = ema_update(ts.ema_params, params, ema_decay,
                                step=ts.step)
        metrics = {"loss": loss, "gnorm": gnorm,
                   "skipped": jnp.logical_not(finite)}
        if monitor:
            f, Tf = aux["f"], aux["Tf"]
            quadforms = f * Tf  # (B, L) local energies
            sqnorms = f * f
            metrics["quad_stats"] = _batch_stats(quadforms)
            metrics["sqnorm_stats"] = _batch_stats(sqnorms)
            if dp_axis is not None:  # mean of per-device percentile stats
                metrics["quad_stats"] = jax.lax.pmean(
                    metrics["quad_stats"], dp_axis)
                metrics["sqnorm_stats"] = jax.lax.pmean(
                    metrics["sqnorm_stats"], dp_axis)
        new_ts = TrainState(step=ts.step + 1, params=params,
                            opt_state=opt_state, ema_params=ema_params,
                            method_state=method_state)
        return new_ts, metrics

    return step


def make_scanned_train_step(method, operator, optimizer, sampler,
                            importance=None, ema_decay: float = 0.99,
                            steps_per_call: int = 100,
                            grad_clip: float = 0.0,
                            dp_axis: Optional[str] = None):
    """Device-resident multi-step: lax.scan over the fused train step.

    Amortizes host dispatch (critical on high-latency links) and lets XLA
    overlap steps.  Returns (TrainState, base_key[, start]) ->
    (TrainState, metrics) where each metric is a (steps_per_call,) trace;
    ``start`` offsets the PRNG fold index so consecutive blocks consume the
    same key stream as the per-step driver (fold_in(base_key, global_it)).
    """
    step = make_train_step(method, operator, optimizer, sampler,
                           importance=importance, ema_decay=ema_decay,
                           monitor=False, grad_clip=grad_clip,
                           dp_axis=dp_axis)

    def run(ts: TrainState, base_key, start=0):
        def body(carry, i):
            new_ts, metrics = step(carry, jax.random.fold_in(base_key,
                                                             start + i))
            return new_ts, metrics

        return jax.lax.scan(body, ts, jnp.arange(steps_per_call))

    return run  # -> (TrainState, {loss/gnorm/skipped: (steps_per_call,)})


def _erf_percentiles():
    import math
    global _PERCENTILES
    if _PERCENTILES is None:
        pts = [math.erf(x / math.sqrt(2)) for x in range(-3, 4)]
        _PERCENTILES = 100 * (1 + np.array(pts)) / 2
    return _PERCENTILES


def _batch_stats(values: jax.Array) -> jax.Array:
    """(B, L) -> (9, L): 7 erf-spaced percentiles + mean + mean (slow slot).

    Matches the statistics EWMMonitor.update consumes
    (reference: examples/operator/pde/ewm.py:88-95).
    """
    qs = jnp.asarray(_erf_percentiles(), jnp.float32)
    pct = jnp.percentile(values, qs, axis=0)  # (7, L)
    mean = jnp.mean(values, axis=0, keepdims=True)  # (1, L)
    return jnp.concatenate([pct, mean, mean], axis=0)  # (9, L)


def train_operator(
    method,
    operator,
    sampler: Callable,
    optimizer: optax.GradientTransformation,
    init_params,
    num_iters: int,
    importance_train: Optional[Callable] = None,
    importance_val: Optional[Callable] = None,
    val_batches: Optional[Callable] = None,
    ground_truth_spectrum=None,
    ema_decay: float = 0.99,
    eval_freq: int = 50_000,
    print_freq: int = 1_000,
    log_dir: Optional[str] = None,
    log_writer=None,
    seed: int = 42,
    monitor: bool = False,
    post_align: bool = False,
    normalize: Optional[bool] = None,
    checkpoint_fn: Optional[Callable] = None,
    spinx_refresh: Optional[Callable] = None,
    profile_dir: Optional[str] = None,
    profile_start: int = 100,
    profile_steps: int = 20,
    grad_clip: float = 0.0,
    mesh=None,
    dp_axis: str = "dp",
    rescue_init_fn: Optional[Callable] = None,
    rescue_until: float = 0.7,
    initial_ts=None,
    start_iter: int = 0,
):
    """Host driver: runs the jitted step, periodic EMA eval + checkpointing.

    Every eval logs a dead/duplicate-mode health report (mode_health —
    collapse-aware eval, VERDICT r2).  With ``rescue_init_fn`` (the
    model's param initializer) set, evals inside the first
    ``rescue_until`` fraction of training additionally *repair* a
    diagnosed collapse: spurious modes are exiled to tail slots and
    re-initialized from a fresh draw (training/rescue.py — the hydrogen
    L=36 countermeasure).

    ``mesh``: a jax.sharding.Mesh with a ``dp_axis`` axis enables explicit
    data-parallel training via shard_map (the method must be built with
    ``axis_name=dp_axis``; the sampler's batch is PER DEVICE, so the global
    batch is n_devices x sampler batch).

    With ``profile_dir`` set, a ``jax.profiler`` trace of
    ``profile_steps`` iterations starting at ``profile_start`` is written
    there (viewable in TensorBoard / Perfetto).  Per-step wall-clock
    (steps/sec since start) is logged in every print row.

    Returns (final TrainState, all_eigvals, all_norms).
    """
    from neuralsvd_tpu.methods.spectrum import compute_spectrum_evd
    from neuralsvd_tpu.training.ewm import EWMMonitor

    # resume: ``initial_ts``/``start_iter`` restart the loop mid-run; keys
    # fold in the ABSOLUTE iteration index, so the sample stream continues
    # exactly where the checkpointed run left off
    ts = (initial_ts if initial_ts is not None
          else init_train_state(init_params, optimizer, method))
    base_key = jax.random.key(seed)

    if normalize is None:
        normalize = method.name in ("nestedlora", "neuralsvd")

    monitors_quad = monitors_sqnorm = None
    if monitor:
        monitors_quad = [EWMMonitor() for _ in range(method.neigs)]
        monitors_sqnorm = [EWMMonitor() for _ in range(method.neigs)]

    # Production hot loop: lax.scan blocks of print_freq steps — device
    # -resident multi-step, one host dispatch + one metrics transfer per
    # block (the benched fast path, now the driver's path).  The per-step
    # path remains for monitor=True (EWM needs per-step (9, L) stats) and
    # for block remainders.
    use_scan = not monitor and num_iters >= print_freq > 1
    gspmd = (mesh is not None and "tp" in mesh.axis_names
             and mesh.shape["tp"] > 1)
    if gspmd:
        # dp x tp: GSPMD — jit the plain step with state shardings (mode
        # axis of ParallelMLP weights on tp, batch rows on dp via the
        # sharded sampler); XLA inserts the Gram collectives.  The method
        # must be built WITHOUT axis_name (global-array semantics).
        from neuralsvd_tpu.parallel.sharding import (
            make_sharded_train_step,
            shard_batch_sampler,
        )

        if getattr(method, "axis_name", None) is not None:
            raise ValueError("GSPMD (tp) path needs method.axis_name=None — "
                             "collectives are compiler-inserted, not "
                             "explicit pmeans")
        g_sampler = (shard_batch_sampler(sampler, mesh, dp_axis)
                     if dp_axis in mesh.axis_names else sampler)
        base = make_train_step(method, operator, optimizer, g_sampler,
                               importance=importance_train,
                               ema_decay=ema_decay, monitor=monitor,
                               grad_clip=grad_clip)
        step_fn, ts = make_sharded_train_step(base, mesh, ts)
        scan_fn = None
        if use_scan:
            base_scan = make_scanned_train_step(
                method, operator, optimizer, g_sampler,
                importance=importance_train, ema_decay=ema_decay,
                steps_per_call=print_freq, grad_clip=grad_clip)
            scan_fn, ts = make_sharded_train_step(base_scan, mesh, ts,
                                                  extra_args=1)
    elif mesh is not None:
        from neuralsvd_tpu.parallel.sharding import make_shard_map_train_step

        step_fn = make_shard_map_train_step(
            method, operator, optimizer, sampler, mesh,
            importance=importance_train, ema_decay=ema_decay,
            dp_axis=dp_axis, grad_clip=grad_clip, monitor=monitor)
        scan_fn = None
        if use_scan:
            scan_fn = make_shard_map_train_step(
                method, operator, optimizer, sampler, mesh,
                importance=importance_train, ema_decay=ema_decay,
                dp_axis=dp_axis, grad_clip=grad_clip,
                steps_per_call=print_freq)
    else:
        step_fn = jax.jit(make_train_step(
            method, operator, optimizer, sampler,
            importance=importance_train, ema_decay=ema_decay, monitor=monitor,
            grad_clip=grad_clip))
        scan_fn = None
        if use_scan:
            scan_fn = jax.jit(make_scanned_train_step(
                method, operator, optimizer, sampler,
                importance=importance_train, ema_decay=ema_decay,
                steps_per_call=print_freq, grad_clip=grad_clip))

    def run_eval(it_done, last_key):
        nonlocal ts
        outputs = compute_spectrum_evd(
            (method.eval_apply, ts.ema_params, ts.method_state),
            val_batches(), operator,
            importance_train=importance_train,
            importance_val=importance_val,
            post_align=post_align, normalize=normalize)
        all_eigvals.append(outputs["eigvals"])
        all_norms.append(outputs["norms"])
        log.info("it%d eigvals: %s", it_done, outputs["eigvals"])
        # collapse-aware health report (and optional repair) — undo the
        # normalize-step in-place cov rescaling first so norms are real
        from neuralsvd_tpu.methods.spectrum import (
            format_mode_health,
            mode_health,
        )

        norms = np.asarray(outputs["norms"])
        cov = np.asarray(outputs["cov"])
        if normalize:
            cov = cov * np.sqrt(np.outer(norms, norms))
        health = mode_health(cov, np.asarray(outputs["quad"]))
        report = format_mode_health(health)
        if report:
            log.warning("it%d mode health:\n%s", it_done, report)
        if (rescue_init_fn is not None and not health["healthy"].all()
                and it_done <= rescue_until * num_iters):
            from neuralsvd_tpu.training.rescue import rescue_modes

            def measure_norms(params):
                # batch norms on one val batch (relative measure only)
                x = jnp.asarray(next(iter(val_batches())))
                f = method.eval_apply(params, ts.method_state, x)
                return np.asarray(jnp.mean(f * f, axis=0))

            scale_fn = None
            if (isinstance(ts.params, dict)
                    and isinstance(ts.params.get("base"), dict)
                    and "ws" in ts.params["base"]):  # ParallelMLP family
                from neuralsvd_tpu.models.wavefunctions import (
                    scale_mode_amplitudes,
                )
                scale_fn = scale_mode_amplitudes
            ts, info = rescue_modes(
                ts, rescue_init_fn,
                jax.random.fold_in(jax.random.key(seed + 1), it_done),
                cov, np.asarray(outputs["quad"]), method.neigs,
                measure_norms=(measure_norms if scale_fn else None),
                scale_fn=scale_fn,
                clone_healthy_tail=(scale_fn is not None),
                grace_slots=rescue_grace)
            rescue_grace[:] = (list(info["tail_slots"])
                               if info["n_spurious"] else [])
            log.warning("it%d rescue: exiled + re-initialized %d modes",
                        it_done, info["n_spurious"])
        if checkpoint_fn is not None:
            checkpoint_fn(ts, it_done, outputs)
        if spinx_refresh is not None:
            ts = spinx_refresh(ts, last_key)

    all_eigvals, all_norms = [], []
    rescue_grace: list = []
    total_skips = 0
    start = time.time()
    it = start_iter
    profiling = False
    while it < num_iters:
        if profile_dir is not None and not profiling and it >= profile_start:
            jax.block_until_ready(ts.params)
            jax.profiler.start_trace(profile_dir)
            profiling = True
            profile_end = it + profile_steps
        n = print_freq - (it % print_freq)  # steps to the next boundary
        n = min(n, num_iters - it)
        if use_scan and n == print_freq:
            ts, metrics = scan_fn(ts, base_key, it)
            loss_v = float(metrics["loss"][-1])
            total_skips += int(np.asarray(metrics["skipped"]).sum())
            key = jax.random.fold_in(base_key, it + n - 1)
        else:
            for j in range(n):
                key = jax.random.fold_in(base_key, it + j)
                ts, metrics = step_fn(ts, key)
                if monitor:
                    qs = np.asarray(metrics["quad_stats"])
                    ns = np.asarray(metrics["sqnorm_stats"])
                    for i in range(method.neigs):
                        monitors_quad[i].update_stats(qs[:, i])
                        monitors_sqnorm[i].update_stats(ns[:, i])
            loss_v = float(metrics["loss"])
            total_skips += int(metrics["skipped"])
        it += n
        if profiling and it >= profile_end:
            jax.block_until_ready(ts.params)
            jax.profiler.stop_trace()
            profiling = False
            profile_dir = None
            log.info("profiler trace written")
        if it % print_freq == 0 or it == num_iters:
            elapsed = time.time() - start
            row = {"iter": it, "train_loss": loss_v,
                   "time": elapsed,
                   "steps_per_sec": (it - start_iter) / elapsed}
            if total_skips:
                row["skips"] = total_skips
            log.info("%s", row)
            if log_writer is not None:
                log_writer.writerow(
                    {k: row.get(k) for k in
                     ("iter", "train_loss", "time", "steps_per_sec")})
        if val_batches is not None and (it // eval_freq) > ((it - n) //
                                                           eval_freq):
            run_eval(it, key)
    if profiling:
        jax.profiler.stop_trace()  # loop ended inside the trace window
    return ts, all_eigvals, all_norms
