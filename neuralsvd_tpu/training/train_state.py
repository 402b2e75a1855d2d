"""Training state: params, optimizer state, parameter EMA, method state.

All mutable training-time state is one explicit pytree threaded through the
jitted step (the JAX equivalent of torch_ema + the reference's buffer
mutation; reference: examples/operator/__init__.py:36,73).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class TrainState(NamedTuple):
    step: jax.Array          # scalar int32
    params: Any
    opt_state: Any
    ema_params: Any
    method_state: Any


def ema_update(ema_params, params, decay: float, step=None):
    """EMA with torch_ema semantics: ema <- d*ema + (1-d)*param.

    With ``step`` given, applies torch_ema's num_updates ramp
    d = min(decay, (1+t)/(10+t)) — early iterates enter the average fast,
    matching the reference's ExponentialMovingAverage default
    (use_num_updates=True; examples/operator/__init__.py:36).
    """
    if step is not None:
        t = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        decay = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
    return jax.tree.map(lambda e, p: decay * e + (1 - decay) * p,
                        ema_params, params)


def init_train_state(params, optimizer, method, rng=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=params,
        method_state=method.init_state(params),
    )
