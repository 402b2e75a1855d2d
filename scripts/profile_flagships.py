"""Flagship performance characterization (VERDICT r1 item 8).

For the two flagship workloads — hydrogen-2D L=16 (north-star) and Sketchy
CDK L=512 — measures the full fused train step and its components
separately (model forward, operator application, loss+grad), derives
achieved FLOP/s from XLA's cost analysis, and writes a step-time breakdown
plus a jax.profiler trace per flagship.

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


def timed(fn, *args, n=20, double_compile=True):
    """Median wall time of jitted fn; compiles twice (cold-autotune guard)
    and returns (seconds, flops_from_cost_analysis)."""
    if double_compile:
        warm = jax.jit(fn)
        jax.block_until_ready(warm(*args))
    run = jax.jit(lambda *a: fn(*a))
    compiled = run.lower(*args).compile()
    flops = compiled.cost_analysis().get("flops", float("nan"))
    jax.block_until_ready(run(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(flops)


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

    NEIGS, BATCH = 16, 512
    init, apply = make_wavefunctions(
        ndim=2, neigs=NEIGS, mlp_hidden_dims=[128, 128, 128],
        nonlinearity="softplus", parallel=True, use_fourier_feature=True,
        fourier_mapping_size=1024, fourier_scale=0.1,
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
                       *timed(lambda p: apply(p, jnp.tile(x, (5, 1))),
                              params)))
    rows.append(report("hydrogen/operator_fd",
                       *timed(lambda p: operator(
                           lambda xx: apply(p, xx), x, None)[0], params)))
    rows.append(report(
        "hydrogen/loss_and_grad",
        *timed(lambda p: method.loss_and_grad(p, {}, x, operator, None)[:2],
               params)))
    step = make_train_step(method, operator, opt, sampler, ema_decay=0.995)
    ts = init_train_state(params, opt, method)
    t, fl = timed(step, ts, jax.random.key(2))
    rows.append(report("hydrogen/full_step_per_dispatch", t, fl))
    scan = make_scanned_train_step(method, operator, opt, sampler,
                                   ema_decay=0.995, steps_per_call=100)
    t, fl = timed(scan, ts, jax.random.key(2), n=5)
    rows.append(report("hydrogen/scan100_per_step", t / 100, fl / 100,
                       {"steps_per_sec": round(100 / t, 1)}))
    # profiler trace of the scanned hot loop
    run = jax.jit(scan)
    jax.block_until_ready(run(ts, jax.random.key(3)))
    jax.profiler.start_trace(os.path.join(trace_dir, "hydrogen"))
    jax.block_until_ready(run(ts, jax.random.key(4)))
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
    params = init(jax.random.key(0))
    method = NestedLoRAForCDK(apply, neigs=L)
    opt = optax.sgd(5e-3)
    opt_state = opt.init(params)
    x = jax.random.normal(jax.random.key(1), (B, D))
    y = jax.random.normal(jax.random.key(2), (B, D))
    skips = jnp.zeros((), jnp.int32)

    rows = []
    rows.append(report("cdk/towers_fwd", *timed(
        lambda p: apply(p, x, y), params)))
    rows.append(report("cdk/loss_and_grad", *timed(
        lambda p: method.loss_and_grad(p, {}, x, y)[:2], params)))
    step = make_cdk_train_step(method, opt)
    t, fl = timed(step, params, opt_state, {}, x, y, skips)
    rows.append(report("cdk/full_step", t, fl,
                       {"steps_per_sec": round(1 / t, 1)}))

    # the retired alternative: step that also materializes the (B,B)
    # density-ratio gram (what every step paid before the DCE change)
    def step_with_rs(params, opt_state, x, y):
        loss, grads, aux, _ = method.loss_and_grad(params, {}, x, y)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state,
                aux["rs_joint"], aux["rs_indep"])

    t, fl = timed(step_with_rs, params, opt_state, x, y)
    rows.append(report("cdk/full_step_with_rs_gram", t, fl,
                       {"steps_per_sec": round(1 / t, 1)}))

    # perf-lever variants at the same shape (VERDICT r1 item 7):
    # fused Pallas CDK loss inside the full step, and bf16 towers
    method_pl = NestedLoRAForCDK(apply, neigs=L, use_pallas=True)
    step_pl = make_cdk_train_step(method_pl, opt)
    t, fl = timed(step_pl, params, opt_state, {}, x, y, skips)
    rows.append(report("cdk/full_step_pallas_loss", t, fl,
                       {"steps_per_sec": round(1 / t, 1)}))

    init16, apply16, _ = make_hetero_network(
        input_dim=D, network_dims=[8192, L], nonlinearity="lrelu0.2",
        mu=16.0, compute_dtype=jnp.bfloat16)
    method16 = NestedLoRAForCDK(apply16, neigs=L)
    step16 = make_cdk_train_step(method16, opt)
    t, fl = timed(step16, params, opt_state, {}, x, y, skips)
    rows.append(report("cdk/full_step_bf16_towers", t, fl,
                       {"steps_per_sec": round(1 / t, 1)}))

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
