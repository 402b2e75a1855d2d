"""Fused Pallas kernels for the NestedLoRA masked-Gram loss.

The XLA path (ops/nestedlora.py) lowers the loss to separate gram matmuls,
mask products and reductions; these kernels fuse each phase into a single
VMEM-resident pass:

- ``masked_gram_pair``: one sweep over the two half-batches computes BOTH
  grams Λ1 = f1ᵀf1/B1, Λ2 = f2ᵀf2/B2 (f1/f2 tiles stream HBM→VMEM once)
  and the masked metric loss Σ M⊙Λ1⊙Λ2 — the gram contraction feeds the
  MXU while the mask product/reduction runs on the VPU in the same kernel.
- ``weighted_dot``: the operator term Σ_b Σ_l w_l f[b,l]·Tf[b,l] as a
  single streaming VPU reduction.
- ``metric_grads``: the backward's two masked matmuls
  g1 = s1·f1·(M⊙Λ2), g2 = s2·f2·(M⊙Λ1) fused in one kernel (the masked
  coefficient matrices are formed once in VMEM and fed to the MXU).

``nestedlora_evd_loss_pallas`` packages them behind the same custom-VJP
contract as the XLA version; select with ``use_pallas=True``.  Both paths
ship — the bench (scripts/bench_pallas.py) decides which is faster per
shape (SURVEY §7: "Pallas must beat XLA to ship").

Mode counts L are zero-padded to the 128-lane boundary; batch is tiled at
512 rows (f32 sublane-aligned).  Correctness is tested against the XLA path
in interpret mode on CPU and compiled on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralsvd_tpu.ops.gram import off_diagonal

LANE = 128
TILE_B = 512


def _pad_modes(x, L_pad):
    L = x.shape[-1]
    if L == L_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, L_pad - L)])


def _pad_batch(x, B_pad):
    B = x.shape[0]
    if B == B_pad:
        return x
    return jnp.pad(x, [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1))


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# fused pair-gram + masked metric loss
# ---------------------------------------------------------------------------

def _masked_gram_kernel(f1_ref, f2_ref, mmask_ref, loss_ref, lam1_ref,
                        lam2_ref, acc1, acc2):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    f1 = f1_ref[:]
    f2 = f2_ref[:]
    acc1[:] += jax.lax.dot_general(
        f1, f1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc2[:] += jax.lax.dot_general(
        f2, f2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == n - 1)
    def _():
        lam1_ref[:] = acc1[:]
        lam2_ref[:] = acc2[:]
        loss_ref[0, 0] = jnp.sum(mmask_ref[:] * acc1[:] * acc2[:])


def masked_gram_pair(f1: jax.Array, f2: jax.Array, mmask: jax.Array):
    """(metric_loss, lam1, lam2) — normalized by the true batch sizes."""
    B1, L = f1.shape
    B2 = f2.shape[0]
    assert B1 == B2, "half-batches must match for the fused pair kernel"
    L_pad = _round_up(L, LANE)
    B_pad = _round_up(B1, TILE_B)
    f1p = _pad_batch(_pad_modes(f1, L_pad), B_pad)
    f2p = _pad_batch(_pad_modes(f2, L_pad), B_pad)
    # fold the 1/B normalization into the mask for the fused loss;
    # grams are rescaled on return
    mmask_p = _pad_modes(_pad_modes(mmask, L_pad).T, L_pad).T / (B1 * B2)

    grid = B_pad // TILE_B
    loss, lam1, lam2 = pl.pallas_call(
        _masked_gram_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L_pad, L_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L_pad, L_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L_pad, L_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((L_pad, L_pad), jnp.float32),
            jax.ShapeDtypeStruct((L_pad, L_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L_pad, L_pad), jnp.float32),
            pltpu.VMEM((L_pad, L_pad), jnp.float32),
        ],
    )(f1p, f2p, mmask_p)
    return (loss[0, 0], lam1[:L, :L] / B1, lam2[:L, :L] / B2)


# ---------------------------------------------------------------------------
# operator term: streaming weighted dot
# ---------------------------------------------------------------------------

def _weighted_dot_kernel(f_ref, tf_ref, w_ref, out_ref, acc):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc[0, 0] = 0.0

    acc[0, 0] += jnp.sum(w_ref[:] * f_ref[:] * tf_ref[:])

    @pl.when(i == n - 1)
    def _():
        out_ref[0, 0] = acc[0, 0]


def weighted_dot(f: jax.Array, Tf: jax.Array, vmask: jax.Array):
    """Σ_b Σ_l w_l f[b,l] Tf[b,l]  (un-normalized)."""
    B, L = f.shape
    L_pad = _round_up(L, LANE)
    B_pad = _round_up(B, TILE_B)
    fp = _pad_batch(_pad_modes(f, L_pad), B_pad)
    tfp = _pad_batch(_pad_modes(Tf, L_pad), B_pad)
    wp = _pad_modes(vmask[None, :], L_pad)  # (1, L_pad)

    out = pl.pallas_call(
        _weighted_dot_kernel,
        grid=(B_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(fp, tfp, wp)
    return out[0, 0]


# ---------------------------------------------------------------------------
# fused backward: both metric gradients
# ---------------------------------------------------------------------------

def _metric_grads_kernel(f1_ref, f2_ref, c1_ref, c2_ref, g1_ref, g2_ref):
    # coefficient matrices are precomputed (M⊙Λ) with scaling folded in
    g1_ref[:] = jax.lax.dot_general(
        f1_ref[:], c1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g2_ref[:] = jax.lax.dot_general(
        f2_ref[:], c2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def metric_grads(f1, f2, lam1, lam2, mmask, scale1: float, scale2: float):
    """g1[b,m] = scale1 Σ_l f1[b,l] (M⊙Λ2)[l,m];  g2 symmetric."""
    B, L = f1.shape
    L_pad = _round_up(L, LANE)
    B_pad = _round_up(B, TILE_B)
    f1p = _pad_batch(_pad_modes(f1, L_pad), B_pad)
    f2p = _pad_batch(_pad_modes(f2, L_pad), B_pad)

    def pad_sq(m):
        return _pad_modes(_pad_modes(m, L_pad).T, L_pad).T

    c1 = pad_sq(mmask * lam2) * scale1
    c2 = pad_sq(mmask * lam1) * scale2

    g1, g2 = pl.pallas_call(
        _metric_grads_kernel,
        grid=(B_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L_pad, L_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L_pad, L_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, L_pad), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, L_pad), jnp.float32),
        ],
    )(f1p, f2p, c1, c2)
    return g1[:B, :L], g2[:B, :L]


# ---------------------------------------------------------------------------
# packaged loss with the same custom-VJP contract as the XLA path
# ---------------------------------------------------------------------------

@jax.custom_vjp
def nestedlora_evd_loss_pallas(f, Tf, f1, f2, vector_mask, matrix_mask):
    loss, _ = _pl_fwd(f, Tf, f1, f2, vector_mask, matrix_mask)
    return loss


def _pl_fwd(f, Tf, f1, f2, vector_mask, matrix_mask):
    metric_loss, lam1, lam2 = masked_gram_pair(f1, f2, matrix_mask)
    op = weighted_dot(f, Tf, vector_mask)
    loss = -2.0 * op / f.shape[0] + metric_loss
    return loss, (f, Tf, f1, f2, lam1, lam2, vector_mask, matrix_mask)


def _pl_bwd(res, g):
    f, Tf, f1, f2, lam1, lam2, vector_mask, matrix_mask = res
    operator_f = (-4.0 / f.shape[0]) * (vector_mask[None, :] * Tf)
    g1, g2 = metric_grads(f1, f2, lam1, lam2, matrix_mask,
                          2.0 / f1.shape[0], 2.0 / f2.shape[0])
    return (g * operator_f, jnp.zeros_like(Tf), g * g1, g * g2,
            jnp.zeros_like(vector_mask), jnp.zeros_like(matrix_mask))


nestedlora_evd_loss_pallas.defvjp(_pl_fwd, _pl_bwd)


# ---------------------------------------------------------------------------
# CDK loss on the same fused kernels
# ---------------------------------------------------------------------------
# The CDK objective has the identical kernel structure (reference:
# methods/nestedlora.py:270-332): the metric term is the masked pair-gram of
# (f, g) instead of the two half-batches, the operator term is the paired
# weighted dot f(x)·g(y), and the backward's metric gradients are the same
# two masked matmuls.  Packaged behind the same contract as the XLA
# ``nestedlora_cdk_loss`` (ops/nestedlora.py:156-235), including const-mode
# padding/stripping and the diagnostics-only density-ratio outputs (computed
# with plain jnp so XLA can DCE them out of the hot step when unused).

def _cdk_pad_const(f):
    return jnp.concatenate([jnp.ones((f.shape[0], 1), f.dtype), f], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def nestedlora_cdk_loss_pallas(set_first_mode_const, f, g, vector_mask,
                               matrix_mask, batch_weights):
    out, _ = _pl_cdk_fwd(set_first_mode_const, f, g, vector_mask,
                         matrix_mask, batch_weights)
    return out


def _pl_cdk_fwd(set_first_mode_const, f, g, vector_mask, matrix_mask,
                batch_weights):
    if set_first_mode_const:
        f = _cdk_pad_const(f)
        g = _cdk_pad_const(g)
    if batch_weights is not None:
        f = f * batch_weights
        g = g * batch_weights
    B = f.shape[0]
    loss_metric, lam_f, lam_g = masked_gram_pair(f, g, matrix_mask)
    loss_operator = -2.0 * weighted_dot(f, g, vector_mask) / B
    loss = loss_operator + loss_metric
    gram = jnp.einsum("bl,cl->bc", f, g,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    rs_joint = jnp.diagonal(gram)
    rs_indep = off_diagonal(gram)
    out = (loss, loss_operator, loss_metric, rs_joint, rs_indep)
    return out, (f, g, lam_f, lam_g, vector_mask, matrix_mask, batch_weights)


def _pl_cdk_bwd(set_first_mode_const, res, cts):
    f, g, lam_f, lam_g, vector_mask, matrix_mask, batch_weights = res
    gout = cts[0]  # only the scalar loss carries gradient (reference)
    B = f.shape[0]
    # metric grads: grad_f = (2/B)·f @ (M⊙Λg), grad_g = (2/B)·g @ (M⊙Λf)
    metric_f, metric_g = metric_grads(f, g, lam_f, lam_g, matrix_mask,
                                      2.0 / B, 2.0 / B)
    grad_f = metric_f + (-2.0 / B) * (vector_mask[None, :] * g)
    grad_g = metric_g + (-2.0 / B) * (vector_mask[None, :] * f)
    if set_first_mode_const:
        grad_f = grad_f[:, 1:]
        grad_g = grad_g[:, 1:]
    zeros_w = None if batch_weights is None else jnp.zeros_like(batch_weights)
    return (gout * grad_f, gout * grad_g, jnp.zeros_like(vector_mask),
            jnp.zeros_like(matrix_mask), zeros_w)


nestedlora_cdk_loss_pallas.defvjp(_pl_cdk_fwd, _pl_cdk_bwd)
