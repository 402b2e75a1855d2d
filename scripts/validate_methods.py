"""Cross-method validation: 1D harmonic oscillator, top-3 eigenvalues.

Runs NestedLoRA, SpIN, SpINx and NeuralEF through the same operator/model
stack (shifted spectrum: analytic top-3 = [9, 7, 5]) and reports per-mode
Rayleigh rel-errs.  CPU-runnable (~2 min per method at default steps).

Usage: [JAX_PLATFORMS=cpu] python scripts/validate_methods.py [steps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "float32")

from neuralsvd_tpu.methods.factories import get_evd_method  # noqa: E402
from neuralsvd_tpu.models import make_wavefunctions  # noqa: E402
from neuralsvd_tpu.operators.problems import get_problem  # noqa: E402
from neuralsvd_tpu.training.optimizers import build_optimizer, cosine_annealing  # noqa: E402
from neuralsvd_tpu.training.train_operator import make_train_step  # noqa: E402
from neuralsvd_tpu.training.train_state import init_train_state  # noqa: E402

L, B, SCALE = 3, 256, 1.5


def importance(x):
    return (jnp.exp(-0.5 * jnp.sum((x / SCALE) ** 2, -1, keepdims=True))
            / (SCALE * np.sqrt(2 * np.pi)))


def run(method_name: str, steps: int, lr: float, opt_name: str = "adam"):
    operator, gt, _ = get_problem(
        problem="sch", potential_type="harmonic_oscillator", ndim=1,
        neigs=L, laplacian_eps=0.1, operator_shift=10.0)
    init, apply = make_wavefunctions(
        ndim=1, neigs=L, mlp_hidden_dims=[64, 64], nonlinearity="softplus",
        use_fourier_feature=False, apply_boundary=True,
        boundary_mode="dir_box_sqrt", lim=4.0)
    params = init(jax.random.key(0))
    opts = {"neuralsvd": dict(sequential=True),
            "neuralef": dict(unbiased=True, batchnorm_mode="unbiased"),
            "spin": dict(decay=0.05), "spinx": dict(decay=0.05)}[method_name]
    method = get_evd_method(method_name, apply, L, **opts)
    optimizer = build_optimizer(opt_name, cosine_annealing(lr, steps))

    def sampler(key):
        return jax.random.normal(key, (B, 1)) * SCALE

    step = jax.jit(make_train_step(method, operator, optimizer, sampler,
                                   importance=importance, ema_decay=0.995))
    ts = init_train_state(params, optimizer, method)
    key = jax.random.key(1)
    refresh = method.refresh_weights if hasattr(
        method, "refresh_weights") else None
    for i in range(steps):
        ts, m = step(ts, jax.random.fold_in(key, i))
        if refresh is not None and (i + 1) % 2000 == 0:
            # SpINx NTK loss-weight refresh (reference refreshes at eval
            # intervals, examples/operator/__init__.py:146-152)
            x = sampler(jax.random.fold_in(jax.random.key(7), i))
            ts = ts._replace(method_state=refresh(
                ts.params, ts.method_state, x, operator, importance))

    eval_f = method.eval_fn(ts.ema_params, ts.method_state)
    cov = quad = 0.0
    for i in range(16):
        x = jax.random.normal(jax.random.fold_in(jax.random.key(9), i),
                              (8192, 1)) * SCALE
        Tf, f = operator(eval_f, x, importance)
        cov = cov + np.asarray(jnp.einsum("bl,bm->lm", f, f))
        quad = quad + np.asarray(jnp.einsum("bl,bm->lm", f, Tf))
    ray = np.sort(np.diag(quad) / np.diag(cov))[::-1]
    gts = np.sort(np.asarray(gt))[::-1]
    rel = np.abs(ray - gts) / np.abs(gts)
    return ray, gts, rel


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    results = {}
    for name, lr in [("neuralsvd", 2e-3), ("neuralef", 2e-3),
                     ("spinx", 1e-3), ("spin", 1e-3)]:
        ray, gts, rel = run(name, steps, lr)
        results[name] = {"learned": np.round(ray, 4).tolist(),
                         "max_rel_err": float(rel.max())}
        print(f"{name:10s} learned {np.round(ray, 4)} (analytic {gts}) "
              f"max rel-err {rel.max():.2e}", flush=True)
    print(json.dumps(results))
