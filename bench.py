"""Benchmark: hydrogen-2D NestedLoRA training throughput — E4 recipe.

Measures steps/sec of the fused jitted train step for THE CONFIG THAT
PASSES THE NORTH-STAR ACCURACY GATE (BASELINE.md round-2 E4: per-mode
ParallelMLP 128^3, gaussian-mixture sampling {0.5,2,6,16} with importance
conjugation, hydrogenic envelope + radial features, exact fwd-over-fwd JVP
Laplacian, sequential nesting, torch-parity RMSprop, EMA).  VERDICT r2
item 3: the headline throughput and the headline accuracy must come from
the same model.

``vs_baseline`` compares against a PyTorch re-implementation of the
reference's training step on this host's CPU with the SAME per-mode
architecture and math: parallel (L, h, d) einsum towers (reference
examples/models/mlp.py:167-221), the reference's exact-Laplacian autograd
loop (per-mode gradient + divergence, examples/operator/pde/diff_ops.py:
54-91), NestedLoRA custom-backward semantics, RMSprop.  The reference
repo itself publishes no throughput numbers (BASELINE.md).

The old shared-trunk FD-0.1 configuration (round-1/2 headline) is
reported as a secondary field for continuity.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "float32")

NEIGS = 16
BATCH = 512
NDIM = 2
HIDDEN = [128, 128, 128]
FOURIER = 1024          # E4 recipe (validate_northstar.py)
MIX_SCALES = (0.5, 2.0, 6.0, 16.0)
ENVELOPES = tuple(1.0 / (n + 0.5) for n in range(4))  # kappa_n = Z/(n+1/2)
TIMED_STEPS = 100


def _bench_scanned(step_fn, ts):
    """Compile twice (cold-autotune guard), then best-of-3 timed chunks."""
    key = jax.random.key(1)
    warm = jax.jit(step_fn)
    jax.block_until_ready(warm(ts, key)[1])
    run = jax.jit(lambda ts, key: step_fn(ts, key))  # fresh cache entry
    ts, metrics = run(ts, key)  # compile (good binary) + warmup chunk
    jax.block_until_ready(metrics)
    best = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        ts, metrics = run(ts, jax.random.key(2 + i))
        jax.block_until_ready(metrics)
        best = max(best, TIMED_STEPS / (time.perf_counter() - t0))
    assert np.isfinite(float(metrics["loss"][-1]))
    return best


def bench_jax_e4(laplacian_mode="forward"):
    """The gate-passing config (E4): ParallelMLP + mixture + exact
    Laplacian ("forward" = fused forward-Laplacian engine, "jvp" = the
    round-2 vmapped nested-JVP path)."""
    from neuralsvd_tpu.data.samplers import get_sampler
    from neuralsvd_tpu.methods.nestedlora import NestedLoRA
    from neuralsvd_tpu.models import make_wavefunctions
    from neuralsvd_tpu.operators.problems import get_problem
    from neuralsvd_tpu.training.optimizers import torch_rmsprop
    from neuralsvd_tpu.training.train_operator import make_scanned_train_step
    from neuralsvd_tpu.training.train_state import init_train_state

    init, apply = make_wavefunctions(
        ndim=NDIM, neigs=NEIGS, mlp_hidden_dims=HIDDEN,
        nonlinearity="softplus", parallel=True,
        use_fourier_feature=True, fourier_mapping_size=FOURIER,
        fourier_scale=0.1, fourier_append_radial=True,
        fourier_append_envelopes=ENVELOPES, apply_boundary=False)
    params = init(jax.random.key(0))
    operator, _, _ = get_problem(
        problem="sch", potential_type="hydrogen", ndim=NDIM, neigs=NEIGS,
        laplacian_eps=-1.0, laplacian_mode=laplacian_mode,
        operator_scale=100.0)
    sampler, importance = get_sampler("gaussian_mixture", BATCH, 1, NDIM,
                                      MIX_SCALES)
    method = NestedLoRA(apply, neigs=NEIGS, sequential=True)
    optimizer = torch_rmsprop(1e-4, alpha=0.999)
    step_fn = make_scanned_train_step(
        method, operator, optimizer, sampler, importance=importance,
        ema_decay=0.995, steps_per_call=TIMED_STEPS)
    ts = init_train_state(params, optimizer, method)
    return _bench_scanned(step_fn, ts)


def bench_jax_shared_fd():
    """Secondary row: the round-1/2 shared-trunk FD-0.1 config."""
    from neuralsvd_tpu.methods.nestedlora import NestedLoRA
    from neuralsvd_tpu.models import make_wavefunctions
    from neuralsvd_tpu.operators.problems import get_problem
    from neuralsvd_tpu.training.optimizers import torch_rmsprop
    from neuralsvd_tpu.training.train_operator import make_scanned_train_step
    from neuralsvd_tpu.training.train_state import init_train_state

    init, apply = make_wavefunctions(
        ndim=NDIM, neigs=NEIGS, mlp_hidden_dims=HIDDEN,
        nonlinearity="softplus", use_fourier_feature=True,
        fourier_mapping_size=256, fourier_scale=0.1,
        apply_boundary=True, boundary_mode="dir_box_sqrt", lim=32.0)
    params = init(jax.random.key(0))
    operator, _, _ = get_problem(
        problem="sch", potential_type="hydrogen", ndim=NDIM, neigs=NEIGS,
        laplacian_eps=0.1, operator_scale=100.0, operator_shift=0.0)
    method = NestedLoRA(apply, neigs=NEIGS, sequential=False, step=1)
    optimizer = torch_rmsprop(1e-4, alpha=0.999)

    def sampler(key):
        return 16.0 * jax.random.normal(key, (BATCH, NDIM))

    step_fn = make_scanned_train_step(
        method, operator, optimizer, sampler, ema_decay=0.995,
        steps_per_call=TIMED_STEPS)
    ts = init_train_state(params, optimizer, method)
    return _bench_scanned(step_fn, ts)


def bench_torch_reference_proxy_e4(max_seconds=240.0, max_steps=4):
    """Reference-style torch step matched to the E4 config: per-mode
    (L, h, d) einsum towers, mixture sampling with importance conjugation,
    envelope/radial features, exact-Laplacian autograd loop (per-mode
    gradient + divergence — diff_ops.py:54-91), NestedLoRA custom-backward
    semantics, RMSprop.  Run on this host's CPU."""
    try:
        import torch
    except ImportError:
        return None
    torch.manual_seed(0)

    L, B, D = NEIGS, BATCH, NDIM
    fourier_B = 2 * np.pi * 0.1 * torch.randn(D, FOURIER)
    feat_dim = 2 * FOURIER + 1 + len(ENVELOPES)

    dims = [feat_dim] + HIDDEN + [1]
    ws = [torch.nn.Parameter(
        np.sqrt(2.0 / dims[i]) * torch.randn(L, dims[i + 1], dims[i]))
        for i in range(len(dims) - 1)]
    bs = [torch.nn.Parameter(torch.zeros(L, dims[i + 1], 1))
          for i in range(len(dims) - 1)]

    def model(x):
        proj = x @ fourier_B
        r = x.norm(dim=1, keepdim=True)
        env = torch.cat([torch.exp(-k * r) for k in ENVELOPES], dim=1)
        feats = torch.cat([torch.sin(proj), torch.cos(proj), r, env], dim=1)
        h = torch.einsum("lhd,bd->lhb", ws[0], feats) + bs[0]
        h = torch.nn.functional.softplus(h)
        for i in range(1, len(ws)):
            h = torch.einsum("lhp,lpb->lhb", ws[i], h) + bs[i]
            if i < len(ws) - 1:
                h = torch.nn.functional.softplus(h)
        return h[:, 0, :].t()  # (B, L)

    scales = torch.tensor(MIX_SCALES)

    def sample():
        comp = torch.randint(len(MIX_SCALES), (B,))
        return torch.randn(B, D) * scales[comp][:, None]

    def log_w(x):  # mixture density (importance conjugation)
        r2 = (x ** 2).sum(1, keepdim=True)
        comps = torch.exp(-r2 / (2 * scales[None, :] ** 2)) / (
            2 * np.pi * scales[None, :] ** 2)
        return torch.log(comps.mean(1, keepdim=True) + 1e-300)

    vmask = torch.ones(L)
    mmask = torch.triu(torch.ones(L, L))  # sequential nesting
    params = ws + bs
    opt = torch.optim.RMSprop(params, lr=1e-4, alpha=0.999, eps=1e-10)

    def train_step():
        x = sample()
        sqrt_w = torch.exp(0.5 * log_w(x))
        xg = x.clone().requires_grad_(True)
        fs = model(xg)
        # reference exact laplacian: per-mode gradient + divergence loop
        laps = []
        for l in range(L):
            g = torch.autograd.grad(fs[:, l].sum(), xg, create_graph=True)[0]
            div = 0.0
            for i in range(D):
                div = div + torch.autograd.grad(
                    g[:, i].sum(), xg, create_graph=True)[0][:, i:i + 1]
            laps.append(div)
        lap = torch.cat(laps, dim=1)
        V = -(1.0 / x.norm(dim=1, p=2)).reshape(-1, 1)
        Tf = (lap - V * fs) * 100.0  # -(H f), conjugated measure folded in
        fs_v = fs
        f1, f2 = torch.chunk(fs_v, 2)
        lam1 = (f1.T @ f1 / f1.shape[0]).detach()
        lam2 = (f2.T @ f2 / f2.shape[0]).detach()
        op_surrogate = -4.0 * torch.einsum(
            "l,bl,bl->", vmask, fs_v, Tf.detach()) / fs_v.shape[0]
        met_surrogate = (
            2.0 * torch.einsum("lm,lm,bl,bm->", mmask, lam2, f1, f1.detach())
            / f1.shape[0]
            + 2.0 * torch.einsum("lm,lm,bl,bm->", mmask, lam1, f2,
                                 f2.detach()) / f2.shape[0])
        loss = op_surrogate + met_surrogate
        opt.zero_grad()
        loss.backward()
        opt.step()
        del sqrt_w  # conjugation cost is in log_w above (parity with jax)

    train_step()  # warmup
    n = 0
    t0 = time.perf_counter()
    while True:
        train_step()
        n += 1
        dt = time.perf_counter() - t0
        if n >= max_steps or dt > max_seconds:
            break
    return n / dt


def _run_inner():
    value = bench_jax_e4()
    shared = bench_jax_shared_fd()
    ref = bench_torch_reference_proxy_e4()
    vs = (value / ref) if ref else None
    print(json.dumps({
        "metric": "hydrogen2d_L16_bs512_E4_parallelmlp_train_steps_per_sec",
        "value": round(value, 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 3) if vs else None,
        "secondary_sharedtrunk_fd_steps_per_sec": round(shared, 3),
        "baseline_basis": "reference-style torch step on this host's CPU, "
                          "SAME per-mode architecture and exact-Laplacian "
                          "math as the gate-passing E4 recipe; the "
                          "reference publishes no throughput numbers",
    }))


def _run_with_retries():
    """Fresh-process retries around the live bench.

    The axon tunnel can drop mid-run and the in-process PJRT client does
    not recover (CLAUDE.md tunnel-hard-drop pattern), so each attempt is a
    subprocess.  If every attempt fails (relay down at driver time), emit
    the last recorded TPU measurement CLEARLY MARKED as cached rather than
    no JSON at all."""
    import os
    import socket
    import subprocess
    import sys

    def relay_up():
        try:
            with socket.create_connection(("127.0.0.1", 8103), timeout=3):
                return True
        except OSError:
            return False

    err = "relay 127.0.0.1:8103 unreachable"
    env = dict(os.environ, NS_BENCH_INNER="1")
    for attempt in range(3):
        waited = 0
        while not relay_up() and waited < 600:  # first wait bounded 10 min
            time.sleep(60)
            waited += 60
        if not relay_up():
            break  # relay down: retries would fail identically
        try:
            proc = subprocess.run([sys.executable, __file__], env=env,
                                  capture_output=True, text=True,
                                  timeout=3600)
            lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")]
            if proc.returncode == 0 and lines:
                print(lines[-1])
                return
            err = (proc.stderr or proc.stdout)[-500:]
        except subprocess.TimeoutExpired:
            err = "inner bench timed out (3600s)"
    print(json.dumps(_cached_result(err)))


# Newest-first: r4's log holds the round-5 live measurement (391 steps/s,
# 2026-08-19); r3's the 2026-08-17 one.  Only live records are cacheable
# (a `_cached` metric in a log is itself a fallback, never re-cached).
_CACHE_LOGS = ("log/r4/bench_sanity.log", "log/r3/bench_sanity.log")


def _cached_result(err):
    """Last recorded live TPU measurement, parsed from the bench logs at
    runtime — NEVER a hard-coded constant (ADVICE r3: a literal silently
    goes stale when the config changes, and a consumer parsing only
    metric/value gets a fabricated number).  The metric is renamed with a
    `_cached` suffix so no consumer can mistake it for a live run; if the
    logs are absent or unparsable this fails loudly with value=None."""
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    cached = cache_log = None
    for log in _CACHE_LOGS:
        try:
            with open(os.path.join(here, log)) as f:
                for ln in f:
                    if ln.startswith("{") and '"metric"' in ln:
                        try:
                            rec = json.loads(ln)
                        except ValueError:  # truncated/corrupt (ADVICE r4):
                            continue        # still yield value=None record
                        if (rec.get("unit") == "steps/sec"
                                and "_cached" not in rec.get("metric", "")):
                            cached = rec  # LAST recorded measurement
                            cache_log = log
        except OSError:
            pass
        if cached is not None:
            break
    if cached is None:
        return {
            "metric": "hydrogen2d_L16_bs512_E4_parallelmlp_"
                      "train_steps_per_sec_cached",
            "value": None, "unit": "steps/sec", "vs_baseline": None,
            "live_run_error": err,
            "cache_error": f"no cached measurement found in {_CACHE_LOGS}",
        }
    return {
        "metric": cached["metric"] + "_cached",
        "value": cached["value"],
        "unit": cached["unit"],
        "vs_baseline": cached.get("vs_baseline"),
        "cached_from": f"{cache_log} (1x v5e) — LIVE RUN "
                       "FAILED, value is the last recorded TPU measurement "
                       "of the same config",
        "live_run_error": err,
    }


if __name__ == "__main__":
    import os

    if os.environ.get("NS_BENCH_INNER"):
        _run_inner()
    else:
        _run_with_retries()
