"""Method layer: spectral-learning algorithms behind one uniform interface.

Every method exposes:

    method.init_state(params) -> state          (pytree; EMA buffers etc.)
    method.loss_and_grad(params, state, x, operator, importance)
        -> (loss, grads, aux, new_state)        (pure; jit/shard_map-safe)
    method.eval_fn(params, state) -> callable x -> (B, L)
        (orthonormalized outputs where applicable, e.g. SpIN's Cholesky solve)

Mutable reference-state (EMA covariances, Jacobian averages, batch-L2 norms)
becomes explicit state threaded through the jitted train step — the JAX
equivalent of the reference's nn.Parameter(requires_grad=False) buffers.
"""
from neuralsvd_tpu.methods.nestedlora import NestedLoRA, NestedLoRAForCDK
from neuralsvd_tpu.methods.neuralef import NeuralEigenfunctions
from neuralsvd_tpu.methods.spin import SpIN
from neuralsvd_tpu.methods.spinx import SpINx
from neuralsvd_tpu.methods.nystrom import Nystrom, run_nystrom
from neuralsvd_tpu.methods.factories import get_evd_method, get_cdk_method

__all__ = [
    "NestedLoRA",
    "NestedLoRAForCDK",
    "NeuralEigenfunctions",
    "SpIN",
    "SpINx",
    "Nystrom",
    "run_nystrom",
    "get_evd_method",
    "get_cdk_method",
]
