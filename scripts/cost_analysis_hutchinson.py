"""XLA FLOP cost analysis: exact forward-Laplacian vs Hutchinson probes.

Device-independent evidence for the 10D A/B (chain12): the fused engine
costs ~(D+2) tower passes; k Rademacher probes cost ~(k+2).  Usage:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/cost_analysis_hutchinson.py [D] [B]

Measured at D=10, B=512, MLP 128^3, L=3 (2026-08-17):
    exact_forward 1.415e9 flops/step
    hutch4        7.073e8  (2.00x fewer; theory (10+2)/(4+2) = 2.0)
    hutch2        4.700e8  (3.01x fewer; theory (10+2)/(2+2) = 3.0)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_default_matmul_precision", "float32")

from neuralsvd_tpu.data.samplers import get_sampler
from neuralsvd_tpu.methods.factories import get_evd_method
from neuralsvd_tpu.models import make_wavefunctions
from neuralsvd_tpu.operators.problems import get_problem
from neuralsvd_tpu.training.optimizers import build_optimizer
from neuralsvd_tpu.training.train_operator import make_train_step
from neuralsvd_tpu.training.train_state import init_train_state


def main(D=10, B=512, L=3):
    init, apply = make_wavefunctions(
        ndim=D, neigs=L, mlp_hidden_dims=[128, 128, 128],
        nonlinearity="softplus", parallel=False, use_fourier_feature=False,
        apply_boundary=False, apply_exp_mask=True, exp_mask_init_scale=8.0,
        lim=8.0)
    params = init(jax.random.key(0))
    sample, imp = get_sampler("gaussian", B, 1, D, 1.0)
    method = get_evd_method("neuralsvd", apply, L, sequential=True, step=1)
    opt = build_optimizer("adam", 1e-3)

    base = None
    for probes, tag in [(0, "exact_forward"), (4, "hutch4"), (2, "hutch2")]:
        op, _, _ = get_problem(
            problem="sch", potential_type="harmonic_oscillator", ndim=D,
            neigs=L, laplacian_eps=-1.0, laplacian_probes=probes,
            operator_shift=16.0)
        step = make_train_step(method, op, opt, sample, importance=imp)
        ts = init_train_state(params, opt, method)
        cost = jax.jit(step).lower(ts, jax.random.key(1)).compile(
            ).cost_analysis()
        flops = cost["flops"]
        base = base or flops
        print(f"{tag:14s} flops/step = {flops:.3e}  ({base / flops:.2f}x)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
