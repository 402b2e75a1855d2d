"""Probes over frozen pretrained embeddings.

Reference: examples/models/builder.py:55-106 (LinearProbe): one classifier
head per view of a frozen encoder — 'rep' (backbone representation),
'emb' (projected embedding), and 'trunc(k)' (first/last |k| embedding
coordinates) — optionally MLP heads, optional eigenvalue-sqrt
normalization and spectrum-sorted embedding order.

Functional design: the pretrained encoder is a callable baked into the
probe's apply (its outputs are stop_gradient'ed, the JAX analog of the
reference's ``freeze_model=True``/``.detach()``); only head params train.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.models.mlp import make_mlp


def make_multihead_probe(
    embed_fn: Callable,
    rep_dim: int,
    emb_dim: int,
    num_classes: int,
    trunc_dims: Sequence[int] = (),
    hidden_dims: Optional[Sequence[int]] = None,
    sort: bool = False,
):
    """Returns (init, apply, register_spectrum).

    ``embed_fn(x) -> (rep, emb)`` is the frozen encoder.  ``trunc_dims``
    entries k > 0 take the first k embedding coords, k < 0 the last |k|
    (reference: builder.py:100-104).  ``register_spectrum(eigvals)``
    returns a spectrum record to pass to apply for normalize/sort
    (reference: builder.py:84-88 registers eigvals[1:], dropping the
    constant mode).
    """
    trunc_dims = tuple(trunc_dims) if trunc_dims else (emb_dim,)
    head_specs = {"rep": rep_dim, "emb": emb_dim}
    for dim in trunc_dims:
        head_specs[f"trunc({dim})"] = abs(int(dim))

    builders = {}
    for name, in_dim in head_specs.items():
        sizes = ([in_dim, num_classes] if not hidden_dims
                 else [in_dim] + list(hidden_dims) + [num_classes])
        builders[name] = make_mlp(sizes, nonlinearity="relu", bias=True)

    def init(key):
        keys = jax.random.split(key, len(builders))
        return {name: b[0](k)
                for (name, b), k in zip(builders.items(), keys)}

    def register_spectrum(spectrum):
        spectrum = np.asarray(spectrum)[1:]  # drop the constant mode
        return {"spectrum": jnp.asarray(spectrum, jnp.float32),
                "sort_indices": np.argsort(spectrum)[::-1].copy()}

    def apply(params, x, spectrum_record=None, normalize=False):
        rep, emb = embed_fn(x)
        rep = jax.lax.stop_gradient(rep)
        emb = jax.lax.stop_gradient(emb)
        if normalize:
            emb = emb / jnp.sqrt(spectrum_record["spectrum"])[None, :]
        if sort and spectrum_record is not None:
            emb = emb[..., spectrum_record["sort_indices"]]
        logits = {"rep": builders["rep"][1](params["rep"], rep),
                  "emb": builders["emb"][1](params["emb"], emb)}
        for dim in trunc_dims:
            sliced = emb[:, :dim] if dim > 0 else emb[:, dim:]
            name = f"trunc({dim})"
            logits[name] = builders[name][1](params[name], sliced)
        return logits

    return init, apply, register_spectrum
