"""Retrieval-eval throughput at Sketchy-Extended scale (synthetic vectors).

The reference's retrieval step is faiss-CPU brute force + sklearn metrics
(examples/cdk/sketchy/retrieve.py:94-124); here it is one (Q, N) MXU matmul
+ lax.top_k per query batch (eval/retrieval.py).  This bench times the
full eval — embeddings -> top-K -> P@K + mAP@all — at the paper's scale
(~75k sketch queries x ~73k photo gallery, 512-d embeddings, 104 classes)
against a torch-CPU topk proxy of the reference pipeline.

Usage: python scripts/bench_retrieval.py [Q] [N]  (prints one JSON line)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_default_matmul_precision", "float32")

from neuralsvd_tpu.eval.retrieval import (  # noqa: E402
    average_precisions,
    get_retrievals,
    precision_at_k,
)

Q, N, DIM, K, CLASSES = 75_471, 73_002, 512, 200, 104


def synth(q, n):
    rng = np.random.default_rng(0)
    # class-clustered embeddings so rankings are non-trivial
    centers = rng.normal(size=(CLASSES, DIM)).astype(np.float32)
    xcls = rng.integers(0, CLASSES, q)
    ycls = rng.integers(0, CLASSES, n)
    # noise comparable to center separation so rankings interleave and the
    # mAP conventions are exercised away from the trivial 1.0
    # signal gap between same/diff-class inner products is ~D vs noise std
    # ~sqrt(D)(1+sigma^2): sigma=4 puts separation at ~1.5 std so rankings
    # interleave and the mAP conventions are exercised away from 1.0
    zx = centers[xcls] + 4.0 * rng.normal(size=(q, DIM)).astype(np.float32)
    zy = centers[ycls] + 4.0 * rng.normal(size=(n, DIM)).astype(np.float32)
    return zx, zy, xcls, ycls


def run_jax(zx, zy, xcls, ycls):
    t0 = time.time()
    rel, _ = get_retrievals(zx, zy, xcls, ycls, K=K)
    p_at_k = float(precision_at_k(rel).mean())
    n_rel = np.bincount(ycls, minlength=CLASSES)[xcls]
    maps = {f"ap_ver{v}": float(average_precisions(rel, n_rel, ver=v).mean())
            for v in (1, 2, 3)}
    return time.time() - t0, p_at_k, maps


def run_torch_proxy(zx, zy, xcls, ycls, batch=2048):
    """Reference-style CPU pipeline: torch matmul + topk (faiss proxy)."""
    import torch

    t0 = time.time()
    g = torch.from_numpy(zy)
    rels = []
    for i in range(0, len(zx), batch):
        s = torch.from_numpy(zx[i:i + batch]) @ g.T
        idx = torch.topk(s, K, dim=1).indices.numpy()
        rels.append(ycls[idx] == xcls[i:i + batch, None])
    rel = np.concatenate(rels, 0)
    p_at_k = float(precision_at_k(rel).mean())
    return time.time() - t0, p_at_k


def main(q=Q, n=N):
    zx, zy, xcls, ycls = synth(q, n)
    # warm the jit/top_k compile on a tiny slice, then time the real pass
    run_jax(zx[:256], zy[:4096], xcls[:256], ycls[:4096])
    t_jax, p_jax, maps = run_jax(zx, zy, xcls, ycls)
    t_torch, p_torch = run_torch_proxy(zx, zy, xcls, ycls)
    assert abs(p_jax - p_torch) < 1e-3, (p_jax, p_torch)
    print(json.dumps({
        "metric": "retrieval_eval_seconds",
        "value": round(t_jax, 2), "unit": f"s for {q}x{n} K={K}",
        "p_at_200": round(p_jax, 4), "maps": maps,
        "torch_cpu_seconds": round(t_torch, 2),
        "vs_baseline": round(t_torch / t_jax, 1),
        "device": str(jax.devices()[0]).split(":")[0],
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
