"""Optimizers with exact parity to the reference's torch semantics.

torch.optim.RMSprop places eps *outside* the sqrt:
    v <- alpha*v + (1-alpha)*g²;  update = g / (sqrt(v) + eps)
while optax's scale_by_rms defaults differ subtly (eps inside sqrt in some
versions), so we implement it directly (SURVEY §7 "RMSprop parity";
reference: examples/utils.py:48-72 with eps=1e-10).

Also provides the CDK-side optimizer factory (adam/adamw/sgd/LARS) and the
warmup+cosine LR schedule (reference: examples/cdk/optimizers.py:14-79).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TorchRMSpropState(NamedTuple):
    nu: optax.Updates
    momentum: optax.Updates


def torch_rmsprop(learning_rate, alpha: float = 0.999, eps: float = 1e-10,
                  momentum: float = 0.0) -> optax.GradientTransformation:
    """RMSprop matching torch.optim.RMSprop update order exactly."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return TorchRMSpropState(nu=zeros, momentum=zeros)

    def update(updates, state, params=None):
        del params
        nu = jax.tree.map(lambda v, g: alpha * v + (1 - alpha) * g * g,
                          state.nu, updates)
        scaled = jax.tree.map(lambda g, v: g / (jnp.sqrt(v) + eps),
                              updates, nu)
        if momentum > 0:
            buf = jax.tree.map(lambda b, s: momentum * b + s,
                               state.momentum, scaled)
            out = buf
        else:
            buf = state.momentum
            out = scaled
        return out, TorchRMSpropState(nu=nu, momentum=buf)

    tx = optax.GradientTransformation(init, update)
    return optax.chain(tx, _scale_by_schedule_or_const(learning_rate))


def _scale_by_schedule_or_const(learning_rate):
    if callable(learning_rate):
        return optax.scale_by_schedule(lambda step: -learning_rate(step))
    return optax.scale(-learning_rate)


def cosine_annealing(base_lr: float, num_iters: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR: lr(t) = eta_min + (lr0-eta_min)(1+cos(pi t/T))/2."""

    def schedule(step):
        t = jnp.minimum(step, num_iters)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t / num_iters))

    return schedule


def warmup_cosine_schedule(base_lr: float, warmup_lr: float, final_lr: float,
                           warmup_steps: int, total_steps: int):
    """Linear warmup then cosine decay (reference: cdk/optimizers.py:51-79)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * step / jnp.maximum(warmup_steps, 1)
        decay_steps = jnp.maximum(total_steps - warmup_steps, 1)
        t = (step - warmup_steps) / decay_steps
        cos = final_lr + 0.5 * (base_lr - final_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


class RejectSpikesState(NamedTuple):
    gnorm_ema: jnp.ndarray
    count: jnp.ndarray
    rejected: jnp.ndarray


def reject_spikes(factor: float = 25.0, decay: float = 0.99,
                  warmup: int = 100) -> optax.GradientTransformation:
    """Zero out gradient updates whose global norm spikes above
    ``factor`` x its running EMA.

    Failure-detection-that-acts: near-singular operators (Coulomb −Z/r
    under Gaussian sampling) produce rare huge-gradient batches that wreck
    long runs even when finite (the reference's EWM monitor only *reports*
    blow-ups, ewm.py:94-107; its AMP GradScaler skips only on fp16
    overflow).  Chain BEFORE the per-parameter normalizer (rmsprop/adam) so
    spikes neither take a huge step nor pollute the second-moment EMA.
    The first ``warmup`` steps always pass (EMA calibration); rejected
    steps do not update the EMA.  State counts rejections for logging.
    """

    def init(params):
        del params
        return RejectSpikesState(jnp.zeros(()), jnp.zeros((), jnp.int32),
                                 jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        del params
        gnorm = optax.global_norm(updates)
        in_warmup = state.count < warmup
        ok = in_warmup | (gnorm <= factor * state.gnorm_ema)
        ok = ok & jnp.isfinite(gnorm)
        ema = jnp.where(
            state.count == 0, gnorm,
            jnp.where(ok, decay * state.gnorm_ema + (1 - decay) * gnorm,
                      state.gnorm_ema))
        updates = jax.tree.map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        return updates, RejectSpikesState(
            ema, state.count + 1,
            state.rejected + jnp.where(ok, 0, 1).astype(jnp.int32))

    return optax.GradientTransformation(init, update)


def assert_mode_axis_unambiguous(params, neigs: int) -> None:
    """Refuse per-mode tree surgery when the mode-axis heuristic is unsafe.

    :func:`per_mode_lr` and the rescue tree ops (training/rescue.py)
    identify per-mode leaves purely by ``leaf.shape[0] == neigs``.  That is
    exact iff EVERY leaf in the pytree is a per-mode stack leading with the
    mode axis — the ParallelMLP wavefunction contract (ws/bs stacked
    ``(L, ...)``, mask scales ``(L,)``; the Fourier map is a fixed buffer,
    not a param).  A shared leaf whose leading dim merely *equals* neigs
    (e.g. neigs=128 with a learnable 128-row feature map) would be silently
    scaled/permuted as if it were per-mode (ADVICE r3).  Construction-time
    check: every param leaf must lead with the mode axis; anything else is
    named and rejected before it can corrupt a run.
    """
    from jax.tree_util import keystr, tree_flatten_with_path

    for path, leaf in tree_flatten_with_path(params)[0]:
        shape = getattr(leaf, "shape", ())
        if len(shape) < 1 or shape[0] != neigs:
            raise ValueError(
                f"per-mode tree surgery (tail_lr_boost / rescue) requires "
                f"every param leaf to lead with the mode axis (neigs="
                f"{neigs}); leaf {keystr(path)} has shape {shape}. Shared "
                f"leaves make the shape[0]==neigs heuristic ambiguous — "
                f"use per-mode towers (parallel=True) without shared "
                f"learnable features.")


def per_mode_lr(scales, neigs: int) -> optax.GradientTransformation:
    """Scale final UPDATES per eigenfunction tower (ParallelMLP leaves
    lead with the mode axis; (L,) leaves like exp-mask scales included).

    Appended AFTER the base optimizer so it acts as a per-mode learning
    rate for ANY optimizer (pre-scaling gradients would be a no-op under
    Adam/RMSprop normalization).  Motivated by the sequential-nesting
    prefix independence (BASELINE "Guard-mode mechanics",
    tests/test_guard_invariance.py): mode k's dynamics depend only on
    modes <= k, so boosting the slow truncation-edge towers cannot
    perturb converged earlier modes.  No reference counterpart.
    """
    scales = jnp.asarray(scales, jnp.float32)
    assert scales.shape == (neigs,)

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def f(u):
            if hasattr(u, "ndim") and u.ndim >= 1 and u.shape[0] == neigs:
                return u * scales.reshape((neigs,) + (1,) * (u.ndim - 1))
            return u

        return jax.tree.map(f, updates), state

    return optax.GradientTransformation(init, update)


def lars(learning_rate, weight_decay: float = 0.0, momentum: float = 0.9,
         trust_coefficient: float = 0.001):
    """Layer-wise adaptive rate scaling (reference: cdk/optimizers.py:92-213)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_trust_ratio(trust_coefficient=trust_coefficient),
        optax.trace(decay=momentum),
        _scale_by_schedule_or_const(learning_rate),
    )


def build_optimizer(name: str, learning_rate, momentum: float = 0.0,
                    weight_decay: float = 0.0, rmsprop_decay: float = 0.999,
                    adam_eps: float = 1e-7, lr_schedule=None,
                    spike_reject_factor: float = 0.0,
                    ) -> optax.GradientTransformation:
    """Factory mirroring examples/utils.py:48-72 and cdk/optimizers.py:14-44.

    ``spike_reject_factor`` > 0 prepends :func:`reject_spikes` (gradient
    -norm blow-up rejection) to the chosen optimizer.
    """
    base = _build_base(name, learning_rate, momentum, weight_decay,
                       rmsprop_decay, adam_eps, lr_schedule)
    if spike_reject_factor > 0:
        return optax.chain(reject_spikes(spike_reject_factor), base)
    return base


def _build_base(name, learning_rate, momentum, weight_decay, rmsprop_decay,
                adam_eps, lr_schedule) -> optax.GradientTransformation:
    lr = lr_schedule if lr_schedule is not None else learning_rate
    if name == "rmsprop":
        return torch_rmsprop(lr, alpha=rmsprop_decay, eps=1e-10,
                             momentum=momentum)
    if name == "adam":
        return optax.chain(
            optax.scale_by_adam(eps=adam_eps),
            _scale_by_schedule_or_const(lr),
        )
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(eps=adam_eps),
            optax.add_decayed_weights(weight_decay),
            _scale_by_schedule_or_const(lr),
        )
    if name == "sgd":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            parts.append(optax.trace(decay=momentum))
        parts.append(_scale_by_schedule_or_const(lr))
        return optax.chain(*parts)
    if name == "lars":
        return lars(lr, weight_decay=weight_decay, momentum=momentum)
    raise NotImplementedError(name)
