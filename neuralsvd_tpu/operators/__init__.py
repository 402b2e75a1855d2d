"""Operator layer: the "problem" plugged into any method.

Protocol (reference: examples/__init__.py:1-9): an operator is a callable

    operator(f, x, importance=None) -> (Tf, f(x))

where ``f`` is a plain function ``x -> (B, L)`` (typically the model's apply
with params bound).  Methods consume operators through this protocol only,
so methods x operators x models compose freely.
"""
from neuralsvd_tpu.operators.base import OperatorWrapper, MatrixOperator, KernelOperator
from neuralsvd_tpu.operators.diff_ops import batched_fd_laplacian, exact_laplacian
from neuralsvd_tpu.operators.schrodinger import NegativeHamiltonian
from neuralsvd_tpu.operators.fokker_planck import NegativeLinearFokkerPlanck

__all__ = [
    "OperatorWrapper",
    "MatrixOperator",
    "KernelOperator",
    "batched_fd_laplacian",
    "exact_laplacian",
    "NegativeHamiltonian",
    "NegativeLinearFokkerPlanck",
]
