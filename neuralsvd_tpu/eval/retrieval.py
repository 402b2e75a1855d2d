"""Cross-domain retrieval evaluation (Sketchy CDK benchmark).

TPU-native replacement for the reference's faiss/sklearn kNN
(examples/cdk/sketchy/retrieve.py:94-124): brute-force scores on device and
``jax.lax.top_k`` over inner products (or negative squared distances).  The
gallery is ~10⁴–10⁵ items so one (Q, N) matmul per query-batch is MXU food;
faiss adds nothing on TPU.

P@K and the three mAP conventions follow retrieve.py:163-201 exactly.
"""
from __future__ import annotations

from collections import Counter
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("k", "metric"))
def _topk_scores(queries, gallery, k: int, metric: str):
    if metric == "inner_product":
        scores = jnp.einsum("qd,nd->qn", queries, gallery, precision=_HI)
    elif metric == "euclidean":
        sq = (jnp.sum(queries ** 2, -1)[:, None]
              - 2 * jnp.einsum("qd,nd->qn", queries, gallery, precision=_HI)
              + jnp.sum(gallery ** 2, -1)[None, :])
        scores = -sq
    else:
        raise NotImplementedError(metric)
    _, idx = jax.lax.top_k(scores, k)
    return idx


def top_k_retrievals(zxs, zys, K: Optional[int] = None,
                     metric: str = "inner_product", batch: int = 2048):
    """(Q, N)-ranked retrieval indices via on-device top-k."""
    zxs = np.asarray(zxs, np.float32)
    zys = np.asarray(zys, np.float32)
    K = K or zys.shape[0]
    gallery = jnp.asarray(zys)
    out = []
    for i in range(0, len(zxs), batch):
        q = jnp.asarray(zxs[i:i + batch])
        out.append(np.asarray(_topk_scores(q, gallery, K, metric)))
    return np.concatenate(out, axis=0)


def get_retrievals(zxs, zys, xclss, yclss, K=None, metric="inner_product"):
    idx = top_k_retrievals(zxs, zys, K, metric)
    relevances = (np.asarray(yclss)[idx] == np.asarray(xclss)[:, None])
    return relevances, idx


def precision_at_k(relevances: np.ndarray) -> np.ndarray:
    """(n_queries, K) -> (n_queries,) P@K (reference: retrieve.py:163-167)."""
    return relevances.mean(axis=1)


def average_precisions(relevances: np.ndarray, n_relevant_items, ver: int = 1):
    """AP per query; ver 1/2/3 follow retrieve.py:169-201."""
    relevances = np.asarray(relevances)
    precs = relevances.cumsum(axis=1) / np.arange(
        1, relevances.shape[1] + 1)[None, :]
    if ver == 1:
        # optimistic interpolation (running max from the right)
        max_precs = np.maximum.accumulate(precs[:, ::-1], axis=1)[:, ::-1]
        counts = relevances.sum(axis=1)
        sums = (max_precs * relevances).sum(axis=1)
        return np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
    if ver == 2:
        K = relevances.shape[1]
        return ((precs * relevances).sum(-1)
                / np.minimum(K, np.asarray(n_relevant_items)))
    if ver == 3:
        gt_cnts = relevances.sum(axis=-1)
        return np.where(gt_cnts > 0,
                        (precs * relevances).sum(axis=1)
                        / np.maximum(gt_cnts, 1), 0.0)
    raise NotImplementedError(f"ap_ver={ver}")


class Retrieval:
    """Embed test sketches/photos with the trained towers and score P@K/mAP.

    ``test_loader`` must expose sketch_features/photo_features and
    sketch_classes/photo_classes (SketchyVGGDataLoader or ArrayPairLoader).
    Reference: examples/cdk/sketchy/retrieve.py:17-91.
    """

    def __init__(self, test_loader, n_retrievals: int = 100,
                 metric: str = "inner_product", batch_size: int = 4096):
        self.loader = test_loader
        self.n_retrievals = n_retrievals
        self.metric = metric
        self.batch_size = batch_size
        counts = Counter(test_loader.sketch_classes.tolist())
        self.n_classes_items = np.array(
            [counts[c] for c in test_loader.sketch_classes.tolist()])

    def _embed(self, fn: Callable, feats: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(feats), self.batch_size):
            out.append(np.asarray(fn(jnp.asarray(
                feats[i:i + self.batch_size], dtype=jnp.float32))))
        return np.concatenate(out, axis=0)

    def evaluate(self, model_x: Callable, model_y: Callable,
                 ap_ver: int = 1, return_map_all: bool = False, tag: str = "",
                 trunc_dim: Optional[int] = None,
                 perm: Optional[np.ndarray] = None):
        """Returns (precision_Ks, average_precisions_per_query).

        ``trunc_dim`` keeps only the first d embedding dims (signed: negative
        d keeps the LAST |d| dims); ``perm`` applies a column permutation
        first (the random-permutation control of the truncation sweep,
        reference: main_sketchy.py:325-358).
        """
        zxs = self._embed(model_x, self.loader.sketch_features)
        zys = self._embed(model_y, self.loader.photo_features)
        if perm is not None:
            zxs, zys = zxs[:, perm], zys[:, perm]
        if trunc_dim is not None:
            if trunc_dim >= 0:
                zxs, zys = zxs[:, :trunc_dim], zys[:, :trunc_dim]
            else:
                zxs, zys = zxs[:, trunc_dim:], zys[:, trunc_dim:]
        rel_K, idx_K = get_retrievals(zxs, zys, self.loader.sketch_classes,
                                      self.loader.photo_classes,
                                      K=self.n_retrievals, metric=self.metric)
        p_at_k = precision_at_k(rel_K)
        aps = np.zeros(1)
        if return_map_all:
            rel_all, _ = get_retrievals(zxs, zys, self.loader.sketch_classes,
                                        self.loader.photo_classes,
                                        metric=self.metric)
            aps = average_precisions(rel_all, self.n_classes_items, ver=ap_ver)
        self._last_retrievals = (rel_K, idx_K)
        return p_at_k, aps

    def save_retrievals(self, log_dir: str, n_queries: int = 20,
                        n_per_query: int = 20, tag: str = ""):
        """Dump the top retrieved items per query for inspection.

        The reference renders image grids (retrieve.py:126-161); here the
        pipeline runs on precomputed features, so the equivalent artifact is
        an npz with query paths/classes, the retrieved gallery paths/classes
        and the relevance matrix — enough to rebuild the grids offline.
        Call after :meth:`evaluate`.
        """
        import os

        rel_K, idx_K = self._last_retrievals
        sel = np.arange(min(n_queries, idx_K.shape[0]))
        k = min(n_per_query, idx_K.shape[1])
        payload = {
            "relevances": rel_K[sel, :k],
            "retrieved_classes": np.asarray(
                self.loader.photo_classes)[idx_K[sel, :k]],
            "query_classes": np.asarray(self.loader.sketch_classes)[sel],
        }
        if hasattr(self.loader, "photo_paths"):
            payload["retrieved_paths"] = np.asarray(
                self.loader.photo_paths)[idx_K[sel, :k]]
            payload["query_paths"] = np.asarray(
                self.loader.sketch_paths)[sel]
        os.makedirs(log_dir, exist_ok=True)
        out = os.path.join(log_dir, f"retrievals{tag}.npz")
        np.savez_compressed(out, **payload)
        return out
