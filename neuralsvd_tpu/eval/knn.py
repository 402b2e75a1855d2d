"""Weighted kNN monitor for representation quality.

Reference: tools/knn_monitor.py (InstDisc-style cosine-weighted kNN used by
the SSL tooling).  Device-native: feature bank matmul + lax.top_k.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_predict_batch(feats, bank, bank_labels, k: int, num_classes: int,
                       temperature: float):
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    sims = feats @ bank.T  # (B, N)
    sim_k, idx_k = jax.lax.top_k(sims, k)
    labels_k = bank_labels[idx_k]  # (B, k)
    weights = jnp.exp(sim_k / temperature)
    one_hot = jax.nn.one_hot(labels_k, num_classes)  # (B, k, C)
    scores = jnp.einsum("bk,bkc->bc", weights, one_hot)
    return jnp.argmax(scores, axis=1)


def knn_predict(features, bank_features, bank_labels, num_classes: int,
                k: int = 200, temperature: float = 0.1, batch: int = 4096):
    """Predict labels for ``features`` against a labeled feature bank."""
    bank = np.asarray(bank_features, np.float32)
    bank = bank / np.maximum(np.linalg.norm(bank, axis=1, keepdims=True),
                             1e-12)
    bank = jnp.asarray(bank)
    labels = jnp.asarray(np.asarray(bank_labels, np.int32))
    preds = []
    for i in range(0, len(features), batch):
        preds.append(np.asarray(_knn_predict_batch(
            jnp.asarray(features[i:i + batch], jnp.float32), bank, labels,
            k, num_classes, temperature)))
    return np.concatenate(preds)


def knn_monitor(embed_fn, bank_data, bank_labels, test_data, test_labels,
                num_classes: int, k: int = 200, temperature: float = 0.1,
                batch: int = 1024):
    """Embed both sets with ``embed_fn`` and return kNN top-1 accuracy."""
    def embed(data):
        out = []
        for i in range(0, len(data), batch):
            out.append(np.asarray(embed_fn(jnp.asarray(data[i:i + batch]))))
        return np.concatenate(out)

    bank = embed(bank_data)
    test = embed(test_data)
    preds = knn_predict(test, bank, bank_labels, num_classes, k, temperature)
    return float((preds == np.asarray(test_labels)).mean())
