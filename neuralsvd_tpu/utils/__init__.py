from neuralsvd_tpu.utils.logging import CSVLogger
from neuralsvd_tpu.utils.linalg import subspace_distance, procrustes, rotate

__all__ = ["CSVLogger", "subspace_distance", "procrustes", "rotate"]
