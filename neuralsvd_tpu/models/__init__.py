from neuralsvd_tpu.models.fourier import make_fourier_features
from neuralsvd_tpu.models.mlp import (
    get_activation,
    make_mlp,
    make_mlp_eigfuncs,
    make_parallel_mlp,
)
from neuralsvd_tpu.models.resnet import make_cifar_resnet, make_resnet
from neuralsvd_tpu.models.two_tower import (
    make_hetero_network,
    make_siam_network,
    normalize_embedding,
)
from neuralsvd_tpu.models.wavefunctions import make_wavefunctions

__all__ = [
    "get_activation",
    "make_mlp",
    "make_parallel_mlp",
    "make_mlp_eigfuncs",
    "make_fourier_features",
    "make_wavefunctions",
    "make_hetero_network",
    "make_siam_network",
    "normalize_embedding",
    "make_resnet",
    "make_cifar_resnet",
]
