"""Method factories (reference: methods/general.py, methods/cdk.py)."""
from __future__ import annotations

from typing import Callable, Optional

from neuralsvd_tpu.methods.nestedlora import NestedLoRA, NestedLoRAForCDK
from neuralsvd_tpu.methods.neuralef import NeuralEigenfunctions
from neuralsvd_tpu.methods.spin import SpIN
from neuralsvd_tpu.methods.spinx import SpINx


def get_evd_method(method_name: str, apply_fn: Callable, neigs: int,
                   axis_name: Optional[str] = None, sort: bool = False,
                   **opts):
    """name -> method instance.  Per-method options mirror the reference's
    namespaced flags (--neuralsvd.step, --spin.decay, ...)."""
    if method_name in ("neuralsvd", "nestedlora"):
        return NestedLoRA(
            apply_fn, neigs,
            step=opts.get("step", 1),
            sequential=opts.get("sequential", False),
            sort=sort, axis_name=axis_name,
            use_pallas=opts.get("use_pallas", "auto"))
    if method_name == "neuralef":
        return NeuralEigenfunctions(
            apply_fn, neigs,
            batchnorm_mode=opts.get("batchnorm_mode", "unbiased"),
            unbiased=opts.get("unbiased", False),
            include_diag=opts.get("include_diag", False),
            sort=sort, axis_name=axis_name)
    if method_name == "spin":
        return SpIN(apply_fn, neigs, decay=opts.get("decay", 0.01),
                    axis_name=axis_name)
    if method_name == "spinx":
        return SpINx(apply_fn, neigs, decay=opts.get("decay", 0.01),
                     axis_name=axis_name)
    raise NotImplementedError(method_name)


def get_cdk_method(method_name: str, apply_fn: Callable, neigs: int,
                   axis_name: Optional[str] = None, **opts):
    if method_name in ("neuralsvd", "nestedlora"):
        return NestedLoRAForCDK(
            apply_fn, neigs,
            step=opts.get("step", 1),
            sequential=opts.get("sequential", False),
            set_first_mode_const=opts.get("set_first_mode_const", True),
            axis_name=axis_name,
            use_pallas=opts.get("use_pallas", "auto"))
    raise NotImplementedError(method_name)
