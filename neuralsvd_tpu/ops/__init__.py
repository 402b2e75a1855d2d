from neuralsvd_tpu.ops.masks import (
    joint_nesting_masks,
    sequential_nesting_masks,
    step_weights,
)
from neuralsvd_tpu.ops.forward_laplacian import (
    forward_laplacian,
    hutchinson_laplacian,
)
from neuralsvd_tpu.ops.gram import compute_lambda, compute_loss_metric, off_diagonal
from neuralsvd_tpu.ops.nestedlora import (
    nestedlora_evd_loss,
    nestedlora_svd_loss,
    nestedlora_cdk_loss,
)

__all__ = [
    "joint_nesting_masks",
    "sequential_nesting_masks",
    "step_weights",
    "compute_lambda",
    "compute_loss_metric",
    "off_diagonal",
    "forward_laplacian",
    "hutchinson_laplacian",
    "nestedlora_evd_loss",
    "nestedlora_svd_loss",
    "nestedlora_cdk_loss",
]
