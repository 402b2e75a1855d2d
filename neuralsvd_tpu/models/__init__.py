from neuralsvd_tpu.models.mlp import (
    get_activation,
    make_mlp,
    make_parallel_mlp,
    make_mlp_eigfuncs,
)
from neuralsvd_tpu.models.fourier import make_fourier_features
from neuralsvd_tpu.models.wavefunctions import make_wavefunctions
from neuralsvd_tpu.models.two_tower import make_hetero_network, normalize_embedding

__all__ = [
    "get_activation",
    "make_mlp",
    "make_parallel_mlp",
    "make_mlp_eigfuncs",
    "make_fourier_features",
    "make_wavefunctions",
    "make_hetero_network",
    "normalize_embedding",
]
