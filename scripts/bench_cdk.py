"""CDK (Sketchy-config) training throughput on the default device.

Paper config: two-tower MLP 8192->512, L=512 modes, batch 4096, SGD+momentum,
NestedLoRA-CDK loss with constant first mode.  Synthetic 512-d features
stand in for the precomputed VGG features (identical compute).  Prints one
JSON line with steps/sec.

Usage: python scripts/bench_cdk.py
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

from neuralsvd_tpu.methods.nestedlora import NestedLoRAForCDK  # noqa: E402
from neuralsvd_tpu.models import make_hetero_network  # noqa: E402
from neuralsvd_tpu.training.optimizers import build_optimizer  # noqa: E402

L, B, DIM = 512, 4096, 512
STEPS = 50
# perf knobs (VERDICT r1 item 7 — pallas win-or-retire at the CDK shape —
# and the bf16 mixed-precision tower path):
#   CDK_DTYPE=bf16   tower matmuls in bfloat16 (f32 grams/master weights)
#   CDK_PALLAS=1     fused Pallas CDK loss kernels instead of XLA einsums
DTYPE = jnp.bfloat16 if os.environ.get("CDK_DTYPE") == "bf16" else None
USE_PALLAS = os.environ.get("CDK_PALLAS", "0") == "1"


def main():
    init, apply, _ = make_hetero_network(
        input_dim=DIM, network_dims=[8192, L], nonlinearity="lrelu0.2",
        mu=16.0, regularize_mode="l2_ball", compute_dtype=DTYPE)
    params = init(jax.random.key(0))
    method = NestedLoRAForCDK(apply, neigs=L, set_first_mode_const=True,
                              use_pallas=USE_PALLAS)
    opt = build_optimizer("sgd", 5e-3, momentum=0.9)
    opt_state = opt.init(params)
    mstate = method.init_state(params)

    def chunk(params, opt_state, mstate, base_key):
        import optax

        def body(carry, i):
            params, opt_state, mstate = carry
            key = jax.random.fold_in(base_key, i)
            kx, ky = jax.random.split(key)
            x = jax.random.normal(kx, (B, DIM))
            y = x + 0.5 * jax.random.normal(ky, (B, DIM))  # correlated pairs
            loss, grads, aux, mstate = method.loss_and_grad(
                params, mstate, x, y)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, mstate), loss

        return jax.lax.scan(body, (params, opt_state, mstate),
                            jnp.arange(STEPS))

    warm = jax.jit(chunk)
    out = warm(params, opt_state, mstate, jax.random.key(1))
    jax.block_until_ready(out[1])
    run = jax.jit(lambda p, o, m, k: chunk(p, o, m, k))
    (params, opt_state, mstate), losses = run(params, opt_state, mstate,
                                              jax.random.key(2))
    jax.block_until_ready(losses)
    best = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        (params, opt_state, mstate), losses = run(
            params, opt_state, mstate, jax.random.key(3 + i))
        jax.block_until_ready(losses)
        best = max(best, STEPS / (time.perf_counter() - t0))
    assert np.isfinite(float(losses[-1]))
    print(json.dumps({
        "metric": "cdk_L512_bs4096_train_steps_per_sec",
        "value": round(best, 2),
        "unit": "steps/sec",
        "compute_dtype": "bf16" if DTYPE is not None else "f32",
        "use_pallas": USE_PALLAS,
    }))


if __name__ == "__main__":
    main()
