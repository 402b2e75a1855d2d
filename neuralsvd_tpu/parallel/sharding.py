"""Device-mesh parallelism for spectral learning.

Two complementary paths (SURVEY §2.7, §5.8):

1. **GSPMD (default)** — ``make_sharded_train_step``: jit the full train
   step with sharding annotations.  Batch axis → 'dp'; the mode axis L of
   ParallelMLP weights → 'tp'.  XLA inserts the (tiny) collectives — the
   (L, L) Gram all-reduces ride ICI.  This is the scaling-book recipe:
   pick a mesh, annotate shardings, let the compiler place collectives.

2. **shard_map (explicit)** — ``make_shard_map_train_step``: per-device
   program with explicit ``lax.pmean`` Gram reductions via the losses'
   ``axis_name`` support.  Used where collective placement must be exact
   (and by the DP-parity tests).

Half-batch independence under DP: each device splits its *local* batch into
f1/f2, and the pmean of local Grams equals the Gram over the union of local
halves — unions of independent halves stay independent (SURVEY §5.8).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("dp", "tp"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over available devices.

    Default shape puts as much as possible on 'dp' and 2 on 'tp' when the
    device count is even and > 2.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif n % 2 == 0 and n > 2:
            shape = (n // 2, 2)
        else:
            shape = (n, 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, tuple(axes))


def mode_sharded_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """Sharding pytree: ParallelMLP mode-stacked weights (L, h, d) sharded on
    the leading L axis over ``tp_axis``; everything else replicated.

    Heuristic: rank-3 leaves are mode-stacked (ParallelMLP layout); all other
    leaves replicate.  Exponential-mask scales (L,) also shard on modes.
    """
    def spec_for(leaf):
        if leaf.ndim == 3:
            return NamedSharding(mesh, P(tp_axis, None, None))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def state_shardings(ts, mesh: Mesh, tp_axis: str = "tp"):
    """Sharding pytree for a full TrainState.

    Rank-3 leaves — ParallelMLP mode-stacked weights (L, h, d) and their
    optimizer/EMA moments, which share the shape — shard on the leading mode
    axis over ``tp_axis``; everything else (scalars, shared-trunk weights,
    method state) replicates.
    """
    def leaf_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 3:
            return NamedSharding(mesh, P(tp_axis, None, None))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_spec, ts)


def make_sharded_train_step(step_fn, mesh: Mesh, ts, tp_axis: str = "tp"):
    """GSPMD path: jit ``step_fn(train_state, key)`` with real annotations.

    Mode-stacked (rank-3) leaves are placed tp-sharded, the rest replicated;
    in/out shardings pin the layout so XLA inserts the collectives (the
    (L, L) Gram all-reduces and any mode-axis all-gathers) rather than
    resharding.  Batch tensors are created inside the step from the PRNG
    key, so XLA lays them out freely (typically dp-sharded by the Gram
    contractions); for *explicit* per-device batches use
    :func:`make_shard_map_train_step`.

    Returns (jitted_step, sharded_train_state).
    """
    shardings = state_shardings(ts, mesh, tp_axis)
    ts = jax.device_put(ts, shardings)
    jitted = jax.jit(step_fn,
                     in_shardings=(shardings, NamedSharding(mesh, P())),
                     out_shardings=(shardings, None))
    return jitted, ts


def shard_batch_sampler(sampler, mesh: Mesh, dp_axis: str = "dp"):
    """Pin the sampled batch's rows to ``dp_axis`` under GSPMD jit.

    The GSPMD path creates batches inside the step from the PRNG key;
    without a constraint XLA is free to replicate them, silently turning
    data parallelism into pure overhead.  Wrap the sampler with this before
    building a step for :func:`make_sharded_train_step`.
    """
    sharding = NamedSharding(mesh, P(dp_axis))

    def sharded(key):
        return jax.lax.with_sharding_constraint(sampler(key), sharding)

    return sharded


def make_shard_map_train_step(method, operator, optimizer, sampler,
                              mesh: Mesh, importance=None,
                              ema_decay: float = 0.99,
                              dp_axis: str = "dp",
                              grad_clip: float = 0.0,
                              monitor: bool = False,
                              steps_per_call: Optional[int] = None):
    """Explicit DP: per-device sampling + psum'd grads via shard_map.

    Wraps the full-featured fused step (``make_train_step(dp_axis=...)``:
    finite-skip, clip, EMA, monitor stats) in shard_map over ``dp_axis``.
    The method must be constructed with ``axis_name=dp_axis`` so the loss
    Grams pmean inside the custom VJP; the step psums param grads (partial
    sums over local rows with global-batch normalization) before the skip
    logic, keeping replicas in lockstep.  Params and optimizer state are
    replicated; each device draws an independent local batch of the
    sampler's size by folding its axis index into the key (global batch =
    n_devices x sampler batch).

    ``steps_per_call=None`` -> jitted (ts, key) -> (ts, metrics);
    ``steps_per_call=k`` -> device-resident scan, jitted
    (ts, base_key, start) -> (ts, metric traces of length k).
    """
    from neuralsvd_tpu.training.train_operator import (
        make_scanned_train_step,
        make_train_step,
    )

    if getattr(method, "axis_name", None) != dp_axis:
        raise ValueError(
            f"method.axis_name={getattr(method, 'axis_name', None)!r} "
            f"must equal dp_axis={dp_axis!r} for shard_map DP training")

    if steps_per_call is None:
        fn = make_train_step(method, operator, optimizer, sampler,
                             importance=importance, ema_decay=ema_decay,
                             monitor=monitor, grad_clip=grad_clip,
                             dp_axis=dp_axis)
        in_specs = (P(), P())
    else:
        fn = make_scanned_train_step(method, operator, optimizer, sampler,
                                     importance=importance,
                                     ema_decay=ema_decay,
                                     steps_per_call=steps_per_call,
                                     grad_clip=grad_clip, dp_axis=dp_axis)
        in_specs = (P(), P(), P())
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=(P(), P()), check_vma=False)
    return jax.jit(mapped)


def make_shard_map_cdk_step(method, optimizer, mesh: Mesh,
                            grad_clip: float = 0.0, dp_axis: str = "dp"):
    """Explicit DP for the CDK (paired-sample) path.

    The (x, y) pair batch is sharded over ``dp_axis`` with pairing preserved
    per device (x and y share the batch sharding); the method must be built
    with ``axis_name=dp_axis`` so the loss's marginal Grams and operator
    term pmean inside the custom VJP (ops/nestedlora.py CDK loss).  Non
    -finite updates are skipped and counted, mirroring
    cli/sketchy.make_cdk_train_step — same signature, drop-in replacement:

        step(params, opt_state, method_state, x, y, skip_count)
          -> (params, opt_state, method_state, loss, aux, skip_count)

    aux's per-sample diagnostics (f, g) come back as the concatenation of
    per-device shards (global batch order).  The O(B²) density-ratio
    diagnostics are dropped from the hot step (XLA DCEs the (B, B) gram);
    use cli.sketchy.make_density_ratio_fn for the periodic histogram.
    """
    import jax.numpy as jnp
    import optax

    if getattr(method, "axis_name", None) != dp_axis:
        raise ValueError(
            f"method.axis_name={getattr(method, 'axis_name', None)!r} "
            f"must equal dp_axis={dp_axis!r} for sharded CDK training")

    def per_device_step(params, opt_state, method_state, x, y, skip_count):
        loss, grads, aux, method_state = method.loss_and_grad(
            params, method_state, x, y)
        aux = {k: v for k, v in aux.items() if not k.startswith("rs_")}
        # The CDK VJP normalizes per-row cotangents by the GLOBAL batch;
        # each device's param gradient sums only its local pairs — psum
        # completes the global sum (pmean would scale by 1/n_devices).
        grads = jax.lax.psum(grads, dp_axis)
        if grad_clip > 0:  # clip the GLOBAL gradient, as single-device does
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda old, new: jnp.where(finite, new, old),
                              params, new_params)
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(finite, new, old)
            if hasattr(old, "shape") else new,
            opt_state, new_opt_state)
        skip_count = skip_count + jnp.where(finite, 0, 1)
        aux = dict(aux)
        aux["loss_operator"] = jax.lax.pmean(aux["loss_operator"], dp_axis)
        aux["loss_metric"] = jax.lax.pmean(aux["loss_metric"], dp_axis)
        return (params, opt_state, method_state,
                jax.lax.pmean(loss, dp_axis), aux, skip_count)

    rep = P()
    dp = P(dp_axis)
    aux_specs = dict(f=dp, g=dp, loss_operator=rep, loss_metric=rep)
    mapped = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(rep, rep, rep, dp, dp, rep),
        out_specs=(rep, rep, rep, rep, aux_specs, rep),
        check_vma=False,
    )
    return jax.jit(mapped)
