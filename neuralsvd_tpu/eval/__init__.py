from neuralsvd_tpu.eval.retrieval import (
    Retrieval,
    precision_at_k,
    average_precisions,
    top_k_retrievals,
)

__all__ = ["Retrieval", "precision_at_k", "average_precisions",
           "top_k_retrievals"]
