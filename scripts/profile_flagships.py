"""Flagship performance characterization (VERDICT r1 item 8).

For the two flagship workloads — hydrogen-2D L=16 (north-star) and Sketchy
CDK L=512 — measures the full fused train step and its components, derives
achieved FLOP/s from XLA's cost analysis, and writes a step-time breakdown
plus a jax.profiler trace per flagship.

Measurement notes (this host):
- The axon TPU tunnel adds ~30-50 ms per dispatch, so every timing loops
  the workload INSIDE one jitted computation.
- Stateful train steps loop through their NATURAL carry (params/opt-state
  threading) — the true sequential dependence, nothing can be hoisted.
- Stateless components loop with a carry that (a) perturbs the first float
  input by a negligible runtime-dependent amount and (b) consumes a cheap
  reduction of EVERY float output leaf — without (b) XLA dead-code
  -eliminates whatever doesn't feed the carry (e.g. the whole backward of
  a loss_and_grad row).
- XLA's cost analysis counts a scan body ONCE regardless of trip count, so
  per-step FLOPs always come from lowering the SINGLE-call version.

Usage: python scripts/profile_flagships.py [outdir]  (runs on the default
device; on this host that is the single v5e chip).
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

OUT = sys.argv[1] if len(sys.argv) > 1 else "log/r2/profile"


def _consume(out):
    """Cheap scalar that depends on every float leaf (DCE guard)."""
    tot = jnp.float32(0.0)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            tot = tot + jnp.sum(leaf).astype(jnp.float32)
    return tot * jnp.float32(1e-30)


def single_call_flops(fn, *args):
    return float(jax.jit(fn).lower(*args).compile()
                 .cost_analysis().get("flops", float("nan")))


def _wall(run, args, n=3):
    jax.block_until_ready(run(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed_component(fn, *args, n=3, iters=20):
    """Seconds per call of a STATELESS component, looped in one dispatch.

    The carry perturbs the first float leaf of the first argument and
    consumes all output leaves; see module docstring.
    """
    flops = single_call_flops(fn, *args)

    def scanned(*a):
        leaf0 = None
        for leaf in jax.tree.leaves(a[0]):
            if (hasattr(leaf, "dtype")
                    and jnp.issubdtype(leaf.dtype, jnp.floating)):
                leaf0 = leaf
                break

        def body(c, _):
            done = [False]

            def rep(x):
                if (not done[0] and hasattr(x, "dtype")
                        and x.shape == leaf0.shape and x.dtype == leaf0.dtype):
                    done[0] = True
                    return x + c.astype(x.dtype)
                return x

            out = fn(jax.tree.map(rep, a[0]), *a[1:])
            return _consume(out), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    warm = jax.jit(scanned)  # cold-autotune guard: compile twice
    jax.block_until_ready(warm(*args))
    run = jax.jit(lambda *a: scanned(*a))
    return _wall(run, args, n) / iters, flops


def report(name, seconds, flops, extra=None):
    row = {"component": name, "ms": round(1e3 * seconds, 3),
           "gflops": round(flops / 1e9, 2),
           "achieved_tflops": round(flops / seconds / 1e12, 2)}
    row.update(extra or {})
    print(json.dumps(row), flush=True)
    return row


def profile_hydrogen(trace_dir):
    from neuralsvd_tpu.methods.nestedlora import NestedLoRA
    from neuralsvd_tpu.models import make_wavefunctions
    from neuralsvd_tpu.operators.problems import get_problem
    from neuralsvd_tpu.training.optimizers import torch_rmsprop
    from neuralsvd_tpu.training.train_operator import (
        make_scanned_train_step, make_train_step)
    from neuralsvd_tpu.training.train_state import init_train_state

    # NSP_* overrides exist for the CPU smoke test only (the shipped
    # numbers always use the flagship shapes)
    NEIGS = int(os.environ.get("NSP_NEIGS", "16"))
    BATCH = int(os.environ.get("NSP_BATCH", "512"))
    init, apply = make_wavefunctions(
        ndim=2, neigs=NEIGS, mlp_hidden_dims=[128, 128, 128],
        nonlinearity="softplus", parallel=True, use_fourier_feature=True,
        fourier_mapping_size=int(os.environ.get("NSP_FMAP", "1024")),
        fourier_scale=0.1,
        fourier_append_radial=True,
        fourier_append_envelopes=tuple(1 / (n + 0.5) for n in range(4)),
        apply_boundary=False)
    params = init(jax.random.key(0))
    operator, _, _ = get_problem(
        problem="sch", potential_type="hydrogen", ndim=2, neigs=NEIGS,
        laplacian_eps=0.1, operator_scale=100.0)
    method = NestedLoRA(apply, neigs=NEIGS, sequential=True)
    opt = torch_rmsprop(1e-4, alpha=0.999)

    def sampler(key):
        return 16.0 * jax.random.normal(key, (BATCH, 2))

    x = sampler(jax.random.key(1))
    rows = []
    rows.append(report("hydrogen/model_fwd_2D+1_probes",
                       *timed_component(
                           lambda p: apply(p, jnp.tile(x, (5, 1))), params)))
    rows.append(report("hydrogen/operator_fd",
                       *timed_component(lambda p: operator(
                           lambda xx: apply(p, xx), x, None), params)))
    rows.append(report(
        "hydrogen/loss_and_grad",
        *timed_component(
            lambda p: method.loss_and_grad(p, {}, x, operator, None)[:2],
            params)))
    # production hot loop: the scanned step threads its own state — time one
    # 500-step dispatch (tunnel overhead amortized to <0.1 ms/step)
    step = make_train_step(method, operator, opt, sampler, ema_decay=0.995)
    step_flops = single_call_flops(step,
                                   init_train_state(params, opt, method),
                                   jax.random.key(2))
    K = int(os.environ.get("NSP_K", "500"))
    scan = make_scanned_train_step(method, operator, opt, sampler,
                                   ema_decay=0.995, steps_per_call=K)
    ts0 = init_train_state(params, opt, method)
    warm = jax.jit(scan)
    jax.block_until_ready(warm(ts0, jax.random.key(2))[1])
    run = jax.jit(lambda ts, k: scan(ts, k))
    t = _wall(run, (ts0, jax.random.key(3)), n=3) / K
    rows.append(report("hydrogen/production_scan_step", t, step_flops,
                       {"steps_per_sec": round(1 / t, 1)}))
    # profiler trace of the scanned hot loop
    jax.profiler.start_trace(os.path.join(trace_dir, "hydrogen"))
    jax.block_until_ready(run(ts0, jax.random.key(4)))
    jax.profiler.stop_trace()

    # the GATE-PASSING step (VERDICT r4 item 3): exact forward-Laplacian
    # engine instead of the FD-0.1 stencil — the accuracy results
    # (hydrogen E4 7.6e-4, the L=36 flagship) all train THIS step, so the
    # MFU table must characterize it too
    operator_x, _, _ = get_problem(
        problem="sch", potential_type="hydrogen", ndim=2, neigs=NEIGS,
        laplacian_eps=-1.0, laplacian_mode="forward", operator_scale=100.0)
    step_x = make_train_step(method, operator_x, opt, sampler,
                             ema_decay=0.995)
    step_x_flops = single_call_flops(
        step_x, init_train_state(params, opt, method), jax.random.key(2))
    scan_x = make_scanned_train_step(method, operator_x, opt, sampler,
                                     ema_decay=0.995, steps_per_call=K)
    warm_x = jax.jit(scan_x)
    jax.block_until_ready(warm_x(ts0, jax.random.key(2))[1])
    run_x = jax.jit(lambda ts, k: scan_x(ts, k))
    t_x = _wall(run_x, (ts0, jax.random.key(3)), n=3) / K
    rows.append(report("hydrogen/production_scan_step_exact_forward", t_x,
                       step_x_flops, {"steps_per_sec": round(1 / t_x, 1)}))
    jax.profiler.start_trace(os.path.join(trace_dir, "hydrogen_exact"))
    jax.block_until_ready(run_x(ts0, jax.random.key(4)))
    jax.profiler.stop_trace()
    return rows


def profile_cdk(trace_dir):
    import optax

    from neuralsvd_tpu.cli.sketchy import make_cdk_train_step
    from neuralsvd_tpu.methods.nestedlora import NestedLoRAForCDK
    from neuralsvd_tpu.models.two_tower import make_hetero_network

    L, B, D = 512, 4096, 512
    init, apply, _ = make_hetero_network(
        input_dim=D, network_dims=[8192, L], nonlinearity="lrelu0.2",
        mu=16.0)
    init16, apply16, _ = make_hetero_network(
        input_dim=D, network_dims=[8192, L], nonlinearity="lrelu0.2",
        mu=16.0, compute_dtype=jnp.bfloat16)
    params = init(jax.random.key(0))
    opt = optax.sgd(5e-3)
    opt_state = opt.init(params)
    x = jax.random.normal(jax.random.key(1), (B, D))
    y = jax.random.normal(jax.random.key(2), (B, D))
    skips = jnp.zeros((), jnp.int32)

    rows = []
    method = NestedLoRAForCDK(apply, neigs=L)
    rows.append(report("cdk/towers_fwd", *timed_component(
        lambda p: apply(p, x, y), params)))
    rows.append(report("cdk/loss_and_grad", *timed_component(
        lambda p: method.loss_and_grad(p, {}, x, y)[:2], params)))

    def timed_full_step(m, label):
        """Natural-carry loop over the REAL train step (fresh pairs per
        iteration, like training; params/opt-state thread through)."""
        step = make_cdk_train_step(m, opt)
        flops = single_call_flops(step, params, opt_state, {}, x, y, skips)

        def scanned(params, opt_state, skips, base_key):
            def body(carry, i):
                p, o, s = carry
                kx, ky = jax.random.split(jax.random.fold_in(base_key, i))
                xi = jax.random.normal(kx, (B, D))
                yi = xi + 0.5 * jax.random.normal(ky, (B, D))
                p, o, _, loss, _, s = step(p, o, {}, xi, yi, s)
                return (p, o, s), loss

            (p, o, s), losses = jax.lax.scan(
                body, (params, opt_state, skips), jnp.arange(20))
            return losses[-1]

        warm = jax.jit(scanned)
        args = (params, opt_state, skips, jax.random.key(7))
        jax.block_until_ready(warm(*args))
        run = jax.jit(lambda *a: scanned(*a))
        t = _wall(run, args, n=3) / 20
        return report(label, t, flops, {"steps_per_sec": round(1 / t, 1)})

    rows.append(timed_full_step(method, "cdk/full_step"))
    rows.append(timed_full_step(
        NestedLoRAForCDK(apply, neigs=L, use_pallas=True),
        "cdk/full_step_pallas_loss"))
    rows.append(timed_full_step(
        NestedLoRAForCDK(apply16, neigs=L), "cdk/full_step_bf16_towers"))

    # the retired alternative: step that also materializes the (B, B)
    # density-ratio gram (what every step paid before the DCE change)
    def step_with_rs(params, opt_state, x, y):
        loss, grads, aux, _ = method.loss_and_grad(params, {}, x, y)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state,
                aux["rs_joint"], aux["rs_indep"])

    flops = single_call_flops(step_with_rs, params, opt_state, x, y)

    def scanned_rs(params, opt_state, base_key):
        def body(carry, i):
            p, o = carry
            kx, ky = jax.random.split(jax.random.fold_in(base_key, i))
            xi = jax.random.normal(kx, (B, D))
            yi = xi + 0.5 * jax.random.normal(ky, (B, D))
            p, o, rj, ri = step_with_rs(p, o, xi, yi)
            return (p, o), jnp.sum(rj) + jnp.sum(ri)

        _, out = jax.lax.scan(body, (params, opt_state), jnp.arange(20))
        return out[-1]

    warm = jax.jit(scanned_rs)
    args = (params, opt_state, jax.random.key(8))
    jax.block_until_ready(warm(*args))
    run = jax.jit(lambda *a: scanned_rs(*a))
    t = _wall(run, args, n=3) / 20
    rows.append(report("cdk/full_step_with_rs_gram", t, flops,
                       {"steps_per_sec": round(1 / t, 1)}))

    step = make_cdk_train_step(method, opt)
    run = jax.jit(step)
    args = (params, opt_state, {}, x, y, skips)
    jax.block_until_ready(run(*args)[0])
    jax.profiler.start_trace(os.path.join(trace_dir, "cdk"))
    for _ in range(5):
        out = run(*args)
    jax.block_until_ready(out[0])
    jax.profiler.stop_trace()
    return rows


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rows = profile_hydrogen(OUT) + profile_cdk(OUT)
    with open(os.path.join(OUT, "breakdown.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("traces + breakdown written to", OUT)
