"""Benchmark: Pallas fused masked-gram loss vs the XLA einsum path on TPU.

Times value_and_grad of the NestedLoRA EVD loss (forward + backward) across
the workload's shape range (PDE: L≈16-64, B≈512; CDK: L≈512, B≈4096).

Result summary (v5e): standalone (this harness) Pallas wins 1.2-1.9x for
L >= 32.  Inside the full jitted train step XLA wins (332 vs 235 steps/s at
L=64, B=2048, 256^3 MLP): it fuses the loss contractions into the model
backward, which the pallas_call boundary prevents.  Hence use_pallas="auto"
resolves to the XLA path (SURVEY §7: "Pallas must beat XLA to ship" — it
doesn't e2e); the kernels stay available as a measured option.

Usage: python scripts/bench_pallas.py  (runs on the default JAX device)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "float32")

from neuralsvd_tpu.ops import (  # noqa: E402
    joint_nesting_masks,
    nestedlora_evd_loss,
    step_weights,
)
from neuralsvd_tpu.ops.pallas_gram import nestedlora_evd_loss_pallas  # noqa: E402

SHAPES = [(512, 16), (512, 64), (2048, 128), (4096, 256), (4096, 512),
          (8192, 512)]
REPS = 50


def timed(fn, *args):
    fn(*args)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e6  # us/call


def main():
    print(f"device: {jax.devices()[0].device_kind}, reps={REPS}")
    print(f"{'B':>6} {'L':>4} {'xla us':>10} {'pallas us':>10} {'speedup':>8}")
    for B, L in SHAPES:
        key = jax.random.key(0)
        f = jax.random.normal(key, (B, L), jnp.float32)
        Tf = jax.random.normal(key, (B, L), jnp.float32)
        f1, f2 = jnp.split(f, 2)
        vmask, mmask = joint_nesting_masks(step_weights(L))
        vmask, mmask = jnp.asarray(vmask), jnp.asarray(mmask)

        xla = jax.jit(jax.value_and_grad(
            lambda f, Tf, f1, f2: nestedlora_evd_loss(
                None, f, Tf, f1, f2, vmask, mmask),
            argnums=(0, 2, 3)))
        pallas = jax.jit(jax.value_and_grad(
            lambda f, Tf, f1, f2: nestedlora_evd_loss_pallas(
                f, Tf, f1, f2, vmask, mmask),
            argnums=(0, 2, 3)))

        # parity check before timing
        lx, gx = xla(f, Tf, f1, f2)
        lp, gp = pallas(f, Tf, f1, f2)
        np.testing.assert_allclose(lp, lx, rtol=1e-4)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)

        t_x = timed(xla, f, Tf, f1, f2)
        t_p = timed(pallas, f, Tf, f1, f2)
        print(f"{B:>6} {L:>4} {t_x:>10.1f} {t_p:>10.1f} {t_x / t_p:>8.2f}x")


if __name__ == "__main__":
    main()
