"""NestedLoRA (NeuralSVD) method wrappers.

Reference: methods/nestedlora.py:167-267 (NestedLoRA) and :335-378
(NestedLoRAForCDK).  The loss kernels live in ops/nestedlora.py; this layer
handles mask construction, the half-batch split, the kernel-operator path,
and optional eigval-sorted output ordering.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.ops.masks import (
    joint_nesting_masks,
    sequential_nesting_masks,
    step_weights,
)
from neuralsvd_tpu.ops.nestedlora import nestedlora_cdk_loss, nestedlora_evd_loss
from neuralsvd_tpu.ops.pallas_gram import (
    nestedlora_cdk_loss_pallas,
    nestedlora_evd_loss_pallas,
)


def _build_masks(neigs: int, step: int, sequential: bool,
                 set_first_mode_const: bool = False):
    if sequential:
        return sequential_nesting_masks(neigs, set_first_mode_const)
    return joint_nesting_masks(step_weights(neigs, step), set_first_mode_const)


def _resolve_use_pallas(use_pallas, neigs: int, axis_name) -> bool:
    """Decide whether the fused Pallas EVD kernels are used.

    Measured on v5e (scripts/bench_pallas.py): standalone, the Pallas
    kernels beat the XLA einsum path 1.2-1.9x for L >= 32 (dispatch
    -amortized).  *Inside the full jitted train step*, however, XLA fuses
    the loss contractions into the model backward and wins (e.g. 332 vs
    235 steps/s at L=64, B=2048, 256^3 MLP) — the pallas_call boundary
    blocks that fusion.  So "auto" resolves to False; the kernels remain a
    measured option for standalone/loss-dominated uses.  The Pallas path
    covers the single-device, scalar-output (B, L) case; under shard_map DP
    (axis_name set) the XLA path keeps the Gram pmean inside the custom VJP.
    """
    if isinstance(use_pallas, str):
        use_pallas = {"auto": "auto", "true": True, "false": False,
                      "1": True, "0": False}[use_pallas.lower()]
    if use_pallas == "auto":
        return False
    if use_pallas and axis_name is not None:
        raise ValueError("use_pallas=True is incompatible with axis_name "
                         "(shard_map DP); use the XLA path or GSPMD sharding")
    return bool(use_pallas)


class NestedLoRA:
    """NeuralSVD via nested low-rank approximation (EVD paths).

    ``sort_indices`` (set after an eval registered eigenvalues) reorders the
    model outputs during training so nesting weights track the spectrum
    order (reference: methods/nestedlora.py:195-209).
    """

    name = "nestedlora"

    def __init__(self, apply_fn: Callable, neigs: int, step: int = 1,
                 sequential: bool = False, sort: bool = False,
                 axis_name: Optional[str] = None, use_pallas="auto"):
        self.apply_fn = apply_fn
        self.neigs = neigs
        self.sort = sort
        self.axis_name = axis_name
        self.use_pallas = _resolve_use_pallas(use_pallas, neigs, axis_name)
        vmask, mmask = _build_masks(neigs, step, sequential)
        self.vector_mask = jnp.asarray(vmask)
        self.matrix_mask = jnp.asarray(mmask)
        self.sort_indices: Optional[np.ndarray] = None
        self.eigvals: Optional[np.ndarray] = None

    def _evd_loss(self, fs, Tf, f1, f2):
        if self.use_pallas and fs.ndim == 2:
            return nestedlora_evd_loss_pallas(fs, Tf, f1, f2,
                                              self.vector_mask,
                                              self.matrix_mask)
        return nestedlora_evd_loss(self.axis_name, fs, Tf, f1, f2,
                                   self.vector_mask, self.matrix_mask)

    # -- stateless: eigval registration is host-side (between jit steps) ----
    def register_eigvals(self, eigvals):
        self.eigvals = np.asarray(eigvals)
        self.sort_indices = np.argsort(self.eigvals)[::-1].copy()

    def reset_eigvals(self):
        self.eigvals = None
        self.sort_indices = None

    def init_state(self, params):
        return {}

    def _model(self, params):
        if self.sort_indices is not None:
            idx = jnp.asarray(self.sort_indices)
            return lambda x: self.apply_fn(params, x)[:, idx]
        return lambda x: self.apply_fn(params, x)

    def eval_apply(self, params, state, x):
        """Stable eval entry (params traced under jit — no per-eval retrace)."""
        return self.apply_fn(params, x)

    def eval_fn(self, params, state):
        return lambda x: self.eval_apply(params, state, x)

    # -- operator path (reference :254-267) ---------------------------------
    def loss_and_grad(self, params, state, x, operator, importance=None):
        def loss_fn(p):
            f = self._model(p)
            Tf, fs = operator(f, x, importance)
            f1, f2 = jnp.split(fs, 2)
            loss = self._evd_loss(fs, Tf, f1, f2)
            return loss, (fs, Tf)

        (loss, (fs, Tf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, dict(f=fs, Tf=Tf, eigvals=None), state

    # -- kernel path (reference :230-252) -----------------------------------
    def loss_and_grad_kernel(self, params, state, x, get_approx_kernel_op,
                             importance=None, split_batch: bool = False):
        def loss_fn(p):
            f = self._model(p)
            if split_batch:
                x1, x2 = jnp.split(x, 2)
                Kf1, f1 = get_approx_kernel_op(x2)(f, x1, importance)
                f2 = f(x2)
                loss = self._evd_loss(f1, Kf1, f1, f2)
                return loss, (f1, Kf1)
            Kf, fs = get_approx_kernel_op(x)(f, x, importance)
            f1, f2 = jnp.split(fs, 2)
            loss = self._evd_loss(fs, Kf, f1, f2)
            return loss, (fs, Kf)

        (loss, (fs, Kf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, dict(f=fs, Tf=Kf, eigvals=None), state


class NestedLoRAForCDK:
    """NestedLoRA for the canonical dependence kernel from paired samples.

    ``apply_fn(params, x, y) -> (f, g)`` is a two-tower model.
    Reference: methods/nestedlora.py:335-378.
    """

    name = "nestedlora"

    def __init__(self, apply_fn: Callable, neigs: int, step: int = 1,
                 sequential: bool = False, set_first_mode_const: bool = True,
                 axis_name: Optional[str] = None, use_pallas="auto"):
        self.apply_fn = apply_fn
        self.neigs = neigs
        self.set_first_mode_const = set_first_mode_const
        self.axis_name = axis_name
        self.use_pallas = _resolve_use_pallas(use_pallas, neigs, axis_name)
        vmask, mmask = _build_masks(neigs, step, sequential, set_first_mode_const)
        self.vector_mask = jnp.asarray(vmask)
        self.matrix_mask = jnp.asarray(mmask)

    def init_state(self, params):
        return {}

    def _cdk_loss(self, fx, gy, batch_weights):
        if self.use_pallas:
            return nestedlora_cdk_loss_pallas(self.set_first_mode_const,
                                              fx, gy, self.vector_mask,
                                              self.matrix_mask, batch_weights)
        return nestedlora_cdk_loss(self.axis_name, self.set_first_mode_const,
                                   fx, gy, self.vector_mask,
                                   self.matrix_mask, batch_weights)

    def loss_and_grad(self, params, state, x, y, batch_weights=None):
        def loss_fn(p):
            fx, gy = self.apply_fn(p, x, y)
            out = self._cdk_loss(fx, gy, batch_weights)
            loss, loss_op, loss_met, rs_joint, rs_indep = out
            return loss, (fx, gy, loss_op, loss_met, rs_joint, rs_indep)

        (loss, aux_t), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        fx, gy, loss_op, loss_met, rs_joint, rs_indep = aux_t
        aux = dict(f=fx, g=gy, loss_operator=loss_op, loss_metric=loss_met,
                   rs_joint=rs_joint, rs_indep=rs_indep)
        return loss, grads, aux, state
