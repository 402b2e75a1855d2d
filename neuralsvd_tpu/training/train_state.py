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


def ema_update(ema_params, params, decay: float):
    """EMA with torch_ema semantics: ema <- decay*ema + (1-decay)*param."""
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
