"""Dead/duplicate-mode rescue: eigval-sorted reordering + tail re-init.

Mechanism (hydrogen L=36 collapse, BASELINE.md / VERDICT r2): a
near-zero-amplitude mode parked on an already-occupied eigendirection is
loss-free under the norm-invariant NestedLoRA objective — its operator
reward and metric penalty both vanish with its norm, so the saddle traps
it (gradient is O(amplitude²)).  The escape is a host-side intervention
between jitted chunks:

1. diagnose dead/duplicate modes from the eval accumulators
   (methods/spectrum.py mode_health — the signals, cov-diag ≈ 0 and
   |corr| ≈ 1, are already computed);
2. permute modes so healthy ones sit first in Rayleigh-descending order —
   under sequential nesting mode i's objective deflates only against
   modes j < i, so spurious modes must be exiled to the TAIL where
   deflation against every healthy mode forces a fresh init onto the
   unoccupied directions (re-initializing in place would just re-collapse
   onto a direction owned by a later slot);
3. re-initialize the exiled tail slots from a fresh init(key) draw, reset
   their EMA to the fresh params and zero their optimizer moments (the
   same state a from-scratch mode starts with).

All per-mode state is recognized structurally: any pytree leaf whose
leading axis equals the mode count L (ParallelMLP (L, h, d) weights,
per-mode mask scales, their RMSprop moments and EMA copies).  Shared
leaves (Fourier feature maps, scalar schedule counts) pass through
untouched.  Reference-side counterpart: methods/nestedlora.py:195-209
registers eigval sort orders but has no restart mechanism — the collapse
this fixes is unaddressed upstream.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.methods.spectrum import mode_health
from neuralsvd_tpu.training.train_state import TrainState


def tree_permute_modes(tree, perm):
    """Permute axis 0 of every leaf whose leading dim == len(perm).

    Leaves without a mode axis (shared feature maps, scalars) are
    returned unchanged.  The caller guarantees no shared leaf aliases the
    mode count on its leading axis (true for every shipped model: hidden
    dims and Fourier mapping sizes are ≥ 128 ≫ L only when distinct —
    asserted at the call site via the model's known structure).
    """
    perm = jnp.asarray(np.asarray(perm))
    L = perm.shape[0]

    def _permute(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == L:
            return jnp.take(leaf, perm, axis=0)
        return leaf

    return jax.tree.map(_permute, tree)


def _tree_splice_tail(old_tree, fresh_tree, neigs: int, n_tail: int):
    """Replace the last ``n_tail`` mode slices of old with fresh ones."""

    def _splice(old, fresh):
        if hasattr(old, "ndim") and old.ndim >= 1 and old.shape[0] == neigs:
            return old.at[neigs - n_tail:].set(fresh[neigs - n_tail:])
        return old

    return jax.tree.map(_splice, old_tree, fresh_tree)


def _tree_clone_slots(tree, neigs: int, src_idx, dst_idx):
    """Copy mode slices src_idx -> dst_idx on every mode-stacked leaf."""
    src = jnp.asarray(np.asarray(src_idx))
    dst = jnp.asarray(np.asarray(dst_idx))

    def _copy(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == neigs:
            return leaf.at[dst].set(leaf[src])
        return leaf

    return jax.tree.map(_copy, tree)


def _tree_zero_tail(tree, neigs: int, n_tail: int):
    def _zero(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == neigs:
            return leaf.at[neigs - n_tail:].set(jnp.zeros_like(
                leaf[neigs - n_tail:]))
        return leaf

    return jax.tree.map(_zero, tree)


def rescue_plan(health):
    """Permutation placing healthy modes first (Rayleigh descending).

    Returns (perm, n_spurious); perm is None when every mode is healthy.
    Spurious modes (duplicates + dead) land in the tail slots, ordered by
    norm so repeat diagnoses are stable.
    """
    healthy = np.asarray(health["healthy"])
    if healthy.all():
        return None, 0
    rayleigh = np.asarray(health["rayleigh"])
    good = np.nonzero(healthy)[0]
    bad = np.nonzero(~healthy)[0]
    good = good[np.argsort(rayleigh[good])[::-1]]
    bad = bad[np.argsort(np.asarray(health["norms"])[bad])[::-1]]
    return np.concatenate([good, bad]), len(bad)


def clone_perturb_tail(params, neigs: int, src_idx, dst_idx, key,
                       noise: float = 0.25):
    """Write perturbed clones of healthy modes into the tail slots.

    For every mode-stacked leaf (leading dim == ``neigs``), slot
    ``dst_idx[k]`` becomes ``leaf[src_idx[k]] + noise * rms * eps``.
    Cloning a converged SMALL-eigenvalue mode gives the fresh slot a
    positive Rayleigh quotient from step one — a random re-init is
    dominated by high-frequency content whose Rayleigh under -H is
    *negative* (continuum), so the loss squeezes it to zero before it
    can find the tiny-reward free directions (observed: re-inits shrink
    1000x within 50k, log/r3/H36_rescue_800k.log).  Deflation against
    the clone's own source then strips the duplicated component, leaving
    smooth tangent-space noise concentrated near the adjacent (free)
    shells.
    """
    src = jnp.asarray(np.asarray(src_idx))
    dst = jnp.asarray(np.asarray(dst_idx))
    counter = [0]

    def f(leaf):
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == neigs):
            return leaf
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        s = leaf[src]
        if not jnp.issubdtype(s.dtype, jnp.floating):
            return leaf.at[dst].set(s)
        rms = jnp.sqrt(jnp.mean(s * s, axis=tuple(range(1, s.ndim)),
                                keepdims=True) + 1e-30)
        eps = jax.random.normal(k, s.shape, s.dtype)
        return leaf.at[dst].set(s + noise * rms * eps)

    return jax.tree.map(f, params)


def rescue_modes(ts: TrainState, init_fn: Callable, key, cov, quad,
                 neigs: int, corr_thresh: float = 0.5,
                 dead_rel: float = 1e-3,
                 measure_norms: Callable = None,
                 scale_fn: Callable = None,
                 amplitude_frac: float = 0.5,
                 clone_healthy_tail: bool = False,
                 clone_noise: float = 0.25,
                 grace_slots=None):
    """Diagnose and repair a collapsed TrainState.

    Returns (new_ts, info).  info["n_spurious"] == 0 means no-op (the
    state object is returned unchanged).  ``init_fn(key)`` must be the
    model's param initializer (fresh tail draws come from it).

    Amplitude matching (both hooks required): after splicing,
    ``measure_norms(params) -> (L,)`` batch norms are taken and each
    fresh tail mode is rescaled via
    ``scale_fn(params, tail_idx, factors)`` so its norm lands at
    ``amplitude_frac`` x the smallest healthy norm.  Without this, a
    fresh init-scale mode (~1e0) among converged peers (~1e5) has its
    RMSprop moments saturated by the deflation gradients and re-collapses
    within the next window — observed as rescue *cycling* in the first
    L=36 rescue run (log/r3/H36_rescue_800k.log @50k/@100k).
    """
    health = mode_health(cov, quad, corr_thresh=corr_thresh,
                         dead_rel=dead_rel)
    if grace_slots is not None and len(grace_slots):
        # one-event grace: slots rescued at the PREVIOUS event are exempt
        # from the duplicate criterion (a separating clone still shows
        # corr > thresh with its source) but not from being dead
        g = np.asarray(grace_slots, dtype=np.int64)
        keep = (health["duplicate_of"][g] >= 0) & ~health["dead"][g]
        health = dict(health)
        health["duplicate_of"] = health["duplicate_of"].copy()
        health["duplicate_of"][g[keep]] = -1
        health["healthy"] = (health["duplicate_of"] < 0) & ~health["dead"]
    perm, n_bad = rescue_plan(health)
    info = {"health": health, "n_spurious": n_bad}
    if n_bad == 0:
        return ts, info
    params = tree_permute_modes(ts.params, perm)
    ema = tree_permute_modes(ts.ema_params, perm)
    opt_state = tree_permute_modes(ts.opt_state, perm)
    tail_idx = np.arange(neigs - n_bad, neigs)
    # clone rescue needs at least one healthy source; with EVERY mode
    # diagnosed spurious (a NaN-blown run) n_src would be 0 and the slot
    # cycling below divides by it (ADVICE r3) — fall back to fresh inits
    clone_healthy_tail = clone_healthy_tail and n_bad < neigs
    if clone_healthy_tail:
        # clone the K smallest-eigenvalue healthy modes (spectrally
        # adjacent to the free directions), cycled over the tail slots
        n_src = min(max(n_bad, 2), neigs - n_bad, 4)
        srcs = np.array([neigs - n_bad - 1 - (k % n_src)
                         for k in range(n_bad)])
        params = clone_perturb_tail(params, neigs, srcs, tail_idx, key,
                                    noise=clone_noise)
        # clones inherit the SOURCE's optimizer moments: zeroed RMSprop
        # nu makes the first updates ~sign-steps (1/sqrt((1-a)) regime),
        # injecting high-frequency drift into a late-LR run; the source's
        # per-param scales are the right starting point for a nearby mode
        opt_state = _tree_clone_slots(opt_state, neigs, srcs, tail_idx)
        info["clone_sources"] = srcs
    else:
        fresh = init_fn(key)
        params = _tree_splice_tail(params, fresh, neigs, n_bad)
        opt_state = _tree_zero_tail(opt_state, neigs, n_bad)
    if measure_norms is not None and scale_fn is not None and n_bad < neigs:
        norms_now = np.asarray(measure_norms(params))
        if clone_healthy_tail:
            # per-slot target: a fraction of the clone SOURCE's norm (the
            # clone starts at ~source amplitude; a modest shrink softens
            # the initial duplicate penalty on the source)
            target = amplitude_frac * np.maximum(
                norms_now[info["clone_sources"]], 1e-30)
        else:
            target = amplitude_frac * max(
                float(norms_now[:neigs - n_bad].min()), 1e-30)
        fresh_norms = np.maximum(norms_now[tail_idx], 1e-30)
        factors = np.sqrt(target / fresh_norms)
        params = scale_fn(params, tail_idx, factors)
        info["amplitude_factors"] = factors
    # amplitude_factors must exist whenever n_spurious > 0: the
    # all-spurious path above skips the rescale block, and callers print
    # the key unconditionally (ADVICE r4 medium — KeyError crashed the
    # NaN-blown rescue the n_bad<neigs gate was added to survive)
    info.setdefault("amplitude_factors", np.ones(n_bad))
    # tail EMA := the (possibly rescaled) fresh params; healthy EMA kept
    ema = _tree_splice_tail(ema, params, neigs, n_bad)
    info["perm"] = perm
    info["tail_slots"] = tail_idx
    return TrainState(step=ts.step, params=params, opt_state=opt_state,
                      ema_params=ema, method_state=ts.method_state), info
