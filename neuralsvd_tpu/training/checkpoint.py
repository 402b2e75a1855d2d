"""Checkpoint/resume for TrainState pytrees via Orbax.

Reference behavior: periodic full-state saves + resumable latest checkpoint
(examples/operator/__init__.py:139-145, main_sketchy.py:288-295).  Here the
whole TrainState (params, optimizer state, EMA params, method state, step)
round-trips through orbax's PyTree checkpointing.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any):
    """Save a pytree state to ``path`` (created/overwritten)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None):
    """Restore a pytree; ``target`` (a template pytree) restores concrete
    dtypes/shardings when provided."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


def latest_checkpoint(log_dir: str, prefix: str = "ckpt_") -> Optional[str]:
    """Find the highest-step checkpoint dir named ``{prefix}{step}``."""
    if not os.path.isdir(log_dir):
        return None
    steps = []
    for name in os.listdir(log_dir):
        if name.startswith(prefix):
            try:
                steps.append((int(name[len(prefix):]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(log_dir, max(steps)[1])
