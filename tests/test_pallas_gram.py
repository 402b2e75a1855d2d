"""Pallas fused-kernel parity vs the XLA loss path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from neuralsvd_tpu.ops import (
    joint_nesting_masks,
    nestedlora_evd_loss,
    step_weights,
)
from neuralsvd_tpu.ops.pallas_gram import (
    masked_gram_pair,
    metric_grads,
    nestedlora_evd_loss_pallas,
    weighted_dot,
)


@pytest.fixture
def data(rng):
    B, L = 96, 5  # unaligned on purpose: exercises lane/batch padding
    f = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    Tf = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    f1, f2 = jnp.split(f, 2)
    vmask, mmask = joint_nesting_masks(step_weights(L))
    return f, Tf, f1, f2, jnp.asarray(vmask), jnp.asarray(mmask)


def test_masked_gram_pair_matches_xla(data):
    f, Tf, f1, f2, vmask, mmask = data
    with pltpu.force_tpu_interpret_mode():
        loss, lam1, lam2 = masked_gram_pair(f1, f2, mmask)
    exp_lam1 = np.asarray(f1).T @ np.asarray(f1) / f1.shape[0]
    exp_lam2 = np.asarray(f2).T @ np.asarray(f2) / f2.shape[0]
    np.testing.assert_allclose(lam1, exp_lam1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(lam2, exp_lam2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        loss, (np.asarray(mmask) * exp_lam1 * exp_lam2).sum(),
        rtol=1e-5)


def test_weighted_dot_matches_xla(data):
    f, Tf, f1, f2, vmask, mmask = data
    with pltpu.force_tpu_interpret_mode():
        out = weighted_dot(f, Tf, vmask)
    exp = np.einsum("l,bl,bl->", vmask, f, Tf)
    np.testing.assert_allclose(out, exp, rtol=1e-5)


def test_metric_grads_match_xla(data):
    f, Tf, f1, f2, vmask, mmask = data
    lam1 = f1.T @ f1 / f1.shape[0]
    lam2 = f2.T @ f2 / f2.shape[0]
    with pltpu.force_tpu_interpret_mode():
        g1, g2 = metric_grads(f1, f2, lam1, lam2, mmask,
                              2.0 / f1.shape[0], 2.0 / f2.shape[0])
    e1 = (2 / f1.shape[0]) * np.einsum("lm,lm,bl->bm", mmask, lam2, f1)
    e2 = (2 / f2.shape[0]) * np.einsum("lm,lm,bl->bm", mmask, lam1, f2)
    np.testing.assert_allclose(g1, e1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g2, e2, rtol=1e-4, atol=1e-5)


def test_full_loss_and_grads_match_xla_path(data):
    f, Tf, f1, f2, vmask, mmask = data

    def xla_loss(f, Tf, f1, f2):
        return nestedlora_evd_loss(None, f, Tf, f1, f2, vmask, mmask)

    def pl_loss(f, Tf, f1, f2):
        return nestedlora_evd_loss_pallas(f, Tf, f1, f2, vmask, mmask)

    with pltpu.force_tpu_interpret_mode():
        lp = pl_loss(f, Tf, f1, f2)
        gp = jax.grad(pl_loss, argnums=(0, 2, 3))(f, Tf, f1, f2)
    lx = xla_loss(f, Tf, f1, f2)
    gx = jax.grad(xla_loss, argnums=(0, 2, 3))(f, Tf, f1, f2)
    np.testing.assert_allclose(lp, lx, rtol=1e-5)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_method_use_pallas_matches_xla_path(rng):
    """NestedLoRA(use_pallas=True) end-to-end loss/grads == XLA method."""
    from neuralsvd_tpu.methods.nestedlora import NestedLoRA

    B, D, L = 64, 3, 4
    W = jnp.asarray(rng.normal(size=(D, L)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    K = rng.normal(size=(B, B)).astype(np.float32)
    K = jnp.asarray((K + K.T) / 2)

    def apply_fn(params, xx):
        return xx @ params

    def operator(f, xx, importance=None):
        fs = f(xx)
        return K @ fs / xx.shape[0], fs

    m_xla = NestedLoRA(apply_fn, L, use_pallas=False)
    m_pl = NestedLoRA(apply_fn, L, use_pallas=True)
    lx, gx, _, _ = m_xla.loss_and_grad(W, {}, x, operator)
    with pltpu.force_tpu_interpret_mode():
        lp, gp, _, _ = m_pl.loss_and_grad(W, {}, x, operator)
    np.testing.assert_allclose(lp, lx, rtol=1e-5)
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-6)


def test_resolve_use_pallas_strings():
    from neuralsvd_tpu.methods.nestedlora import _resolve_use_pallas

    assert _resolve_use_pallas("false", 512, None) is False
    assert _resolve_use_pallas("true", 4, None) is True
    assert _resolve_use_pallas(False, 512, None) is False
    # auto on CPU test platform -> False regardless of L
    assert _resolve_use_pallas("auto", 512, None) is False
    with pytest.raises(ValueError):
        _resolve_use_pallas(True, 512, "dp")


def test_cdk_pallas_matches_xla_path(rng):
    """Pallas CDK loss: all five outputs and both grads == XLA path,
    with const-mode padding and batch weights exercised."""
    from neuralsvd_tpu.ops.nestedlora import nestedlora_cdk_loss
    from neuralsvd_tpu.ops.pallas_gram import nestedlora_cdk_loss_pallas

    B, L = 96, 5
    f = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    for const in (True, False):
        vmask, mmask = joint_nesting_masks(step_weights(L), const)
        vmask, mmask = jnp.asarray(vmask), jnp.asarray(mmask)
        for bw in (None,
                   jnp.asarray(rng.uniform(0.5, 1.5, size=(B, 1))
                               .astype(np.float32))):
            out_x = nestedlora_cdk_loss(None, const, f, g, vmask, mmask, bw)
            with pltpu.force_tpu_interpret_mode():
                out_p = nestedlora_cdk_loss_pallas(const, f, g, vmask,
                                                   mmask, bw)
            for a, b in zip(out_p, out_x):
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

            def lx(f, g):
                return nestedlora_cdk_loss(None, const, f, g, vmask,
                                           mmask, bw)[0]

            def lp(f, g):
                return nestedlora_cdk_loss_pallas(const, f, g, vmask,
                                                  mmask, bw)[0]

            gx = jax.grad(lx, argnums=(0, 1))(f, g)
            with pltpu.force_tpu_interpret_mode():
                gp = jax.grad(lp, argnums=(0, 1))(f, g)
            for a, b in zip(gp, gx):
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_cdk_method_use_pallas_matches_xla(rng):
    from neuralsvd_tpu.methods.nestedlora import NestedLoRAForCDK

    B, D, L = 64, 6, 4
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    params = {"wx": jnp.asarray(rng.normal(size=(D, L)).astype(np.float32)),
              "wy": jnp.asarray(rng.normal(size=(D, L)).astype(np.float32))}

    def apply_fn(p, x, y):
        return x @ p["wx"], y @ p["wy"]

    m_xla = NestedLoRAForCDK(apply_fn, L, use_pallas=False)
    m_pl = NestedLoRAForCDK(apply_fn, L, use_pallas=True)
    lx, gx, ax, _ = m_xla.loss_and_grad(params, {}, x, y)
    with pltpu.force_tpu_interpret_mode():
        lp, gp, ap, _ = m_pl.loss_and_grad(params, {}, x, y)
    np.testing.assert_allclose(lp, lx, rtol=1e-5)
    for k in gx:
        np.testing.assert_allclose(gp[k], gx[k], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ap["rs_joint"], ax["rs_joint"], rtol=1e-5)
