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


def parse_mesh_spec(spec: str, n_avail: int):
    """Parse a CLI mesh spec: 'dp' | 'dp=4' | 'dp=4,tp=2' -> (axes, shape).

    One axis may omit its size and absorbs the remaining devices
    ('dp,tp=2' on 8 devices -> dp=4).  Size-1 axes are dropped (a tp=1
    'tensor' axis is no axis).  Raises on over-subscription, on more than
    one unsized axis, and on unknown axis names (dp/tp only — the shipped
    step shardings know those two; SURVEY §2.7).
    """
    axes, sizes = [], []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            name, n = part.split("=", 1)
            n = int(n)
        else:
            name, n = part, -1
        name = name.strip()
        if name not in ("dp", "tp"):
            raise ValueError(f"unknown mesh axis {name!r} (use dp/tp)")
        if name in axes:
            raise ValueError(f"duplicate mesh axis {name!r}")
        axes.append(name)
        sizes.append(n)
    if not axes:
        raise ValueError(f"empty mesh spec {spec!r}")
    if sizes.count(-1) > 1:
        raise ValueError(f"more than one unsized axis in {spec!r}")
    fixed = int(np.prod([s for s in sizes if s > 0])) if any(
        s > 0 for s in sizes) else 1
    if -1 in sizes:
        if n_avail % fixed:
            raise ValueError(
                f"{n_avail} devices not divisible by fixed axes ({fixed})")
        sizes[sizes.index(-1)] = n_avail // fixed
    total = int(np.prod(sizes))
    if total > n_avail:
        raise ValueError(f"mesh {spec!r} needs {total} devices, "
                         f"only {n_avail} available")
    keep = [(a, s) for a, s in zip(axes, sizes) if s > 1]
    if not keep:  # all axes trivial: single-device '1x1 mesh'
        keep = [(axes[0], 1)]
    return tuple(a for a, _ in keep), tuple(s for _, s in keep)


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


def make_sharded_train_step(step_fn, mesh: Mesh, ts, tp_axis: str = "tp",
                            extra_args: int = 0):
    """GSPMD path: jit ``step_fn(train_state, key)`` with real annotations.

    Mode-stacked (rank-3) leaves are placed tp-sharded, the rest replicated;
    in/out shardings pin the layout so XLA inserts the collectives (the
    (L, L) Gram all-reduces and any mode-axis all-gathers) rather than
    resharding.  Batch tensors are created inside the step from the PRNG
    key, so XLA lays them out freely (typically dp-sharded by the Gram
    contractions); for *explicit* per-device batches use
    :func:`make_shard_map_train_step`.

    ``extra_args``: number of replicated trailing arguments after the key
    (e.g. the scan-start offset of make_scanned_train_step).

    Returns (jitted_step, sharded_train_state).
    """
    shardings = state_shardings(ts, mesh, tp_axis)
    ts = jax.device_put(ts, shardings)
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(step_fn,
                     in_shardings=(shardings, rep) + (rep,) * extra_args,
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


def cdk_mode_shardings(params, mesh: Mesh, tp_axis: str = "tp"):
    """Sharding pytree for two-tower CDK params: the FINAL layer of each
    tower carries the mode axis L (its output dim) and shards over
    ``tp_axis`` — w (d, L) -> P(None, tp), b (L,) -> P(tp); everything
    else (hidden layers, heads) replicates and XLA propagates internal
    layouts.  At the paper shape (L=512) this is the axis that matters
    for memory/collectives (SURVEY §2.7).
    """
    rep = NamedSharding(mesh, P())

    def shard_tower(tower):
        out = jax.tree.map(lambda _: rep, tower)
        last = {k: (NamedSharding(mesh, P(None, tp_axis)) if k == "w"
                    else NamedSharding(mesh, P(tp_axis)) if k == "b"
                    else rep)
                for k in tower["layers"][-1]}
        return {**out, "layers": out["layers"][:-1] + [last]}

    return {k: (shard_tower(v) if isinstance(v, dict) and "layers" in v
                else jax.tree.map(lambda _: rep, v))
            for k, v in params.items()}


def _shardings_like(tree, params, param_shardings, mesh: Mesh):
    """Shard a params-mirroring tree (opt moments) by leaf-shape match.

    Optimizer states replicate the param pytree per moment but under
    different container types; the mode-sharded leaves are recovered by
    their (unique at shipped shapes) array shapes.  Non-matching leaves
    (step counts, scalars) replicate.
    """
    rep = NamedSharding(mesh, P())
    by_shape = {}
    for leaf, sh in zip(jax.tree.leaves(params),
                        jax.tree.leaves(param_shardings)):
        by_shape.setdefault(leaf.shape, sh)

    def spec(leaf):
        if hasattr(leaf, "shape"):
            return by_shape.get(leaf.shape, rep)
        return rep

    return jax.tree.map(spec, tree)


def make_gspmd_cdk_step(step_fn, mesh: Mesh, params, opt_state,
                        tp_axis: str = "tp", dp_axis: str = "dp"):
    """GSPMD dp x tp for the CDK path: jit the plain (unjitted) CDK step
    with mode-axis tower shardings and dp-sharded pair batches.

    ``step_fn(params, opt_state, method_state, x, y, skip_count)`` is the
    raw step from cli.sketchy.make_cdk_train_step(jit=False); the method
    must be built WITHOUT axis_name (global-array semantics — XLA inserts
    the Gram collectives).  Returns (jitted_step, params, opt_state) with
    the state device_put to its shardings.
    """
    pshard = cdk_mode_shardings(params, mesh, tp_axis)
    oshard = _shardings_like(opt_state, params, pshard, mesh)
    params = jax.device_put(params, pshard)
    opt_state = jax.device_put(opt_state, oshard)
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(dp_axis)) if dp_axis in mesh.axis_names \
        else rep
    jitted = jax.jit(
        step_fn,
        in_shardings=(pshard, oshard, None, dp, dp, rep),
        out_shardings=(pshard, oshard, None, None, None, None))
    return jitted, params, opt_state


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
