"""Forward-Laplacian engine vs the nested-JVP oracle and closed forms.

The interpreter must agree with diff_ops.exact_laplacian (vmapped
JVP-over-JVP — itself gradient-tested) to float32 roundoff on every
model configuration the frameworks ships, compose with jit/grad (it runs
inside the training step), and fall back exactly on primitives without
specialized rules (reduce_prod from the box boundary mask).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsvd_tpu.models.wavefunctions import make_wavefunctions
from neuralsvd_tpu.operators.diff_ops import exact_laplacian
from neuralsvd_tpu.ops.forward_laplacian import forward_laplacian

jax.config.update("jax_default_matmul_precision", "float32")


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))


def test_gaussian_closed_form(rng):
    """f(x) = exp(-|x|^2/2): ∇f = -x f, ∇²f = (|x|^2 - D) f."""
    x = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    f = lambda xx: jnp.exp(-0.5 * jnp.sum(xx ** 2, -1, keepdims=True))
    lap, grad, fs = forward_laplacian(f, x, return_grad=True)
    r2 = jnp.sum(x ** 2, -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(fs), np.exp(-0.5 * np.asarray(r2)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lap), np.asarray((r2 - 3) * fs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad),
                               np.asarray(-x[:, None, :] * fs[..., None]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kw", [
    dict(ndim=2, parallel=True, fourier_append_radial=True,
         fourier_append_envelopes=(2.0, 0.667, 0.4), apply_boundary=False),
    dict(ndim=2, parallel=True, apply_boundary=True,
         boundary_mode="dir_box_sqrt", lim=4.0),
    dict(ndim=2, parallel=True, apply_exp_mask=True,
         exp_mask_init_scale=5.0, apply_boundary=False),
    dict(ndim=3, parallel=False, apply_boundary=False),
    dict(ndim=2, parallel=False, apply_boundary=True,
         boundary_mode="dir_box_exp", lim=4.0),
    dict(ndim=2, parallel=False, fourier_deterministic=True,
         apply_boundary=False),
], ids=["hydrogen-features", "box-sqrt-mask", "exp-mask", "3d-shared",
        "box-exp-mask", "deterministic-fourier"])
def test_matches_nested_jvp_on_wavefunctions(rng, kw):
    init, apply = make_wavefunctions(
        neigs=6, mlp_hidden_dims=[16, 16], nonlinearity="softplus",
        use_fourier_feature=True, fourier_mapping_size=8,
        fourier_scale=1.0, **kw)
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(8, kw["ndim"])).astype(np.float32))
    f = lambda xx: apply(params, xx)
    l1, g1, v1 = exact_laplacian(f, x, return_grad=True)
    l2, g2, v2 = forward_laplacian(f, x, return_grad=True)
    assert _rel(v1, v2) < 3e-6
    assert _rel(g1, g2) < 3e-5
    assert _rel(l1, l2) < 3e-5


def test_jit_and_grad_through_with_importance(rng):
    """The engine runs inside the jitted train step and under jax.grad,
    wrapped by the sqrt-importance conjugation (operators/diff_ops.py)."""
    init, apply = make_wavefunctions(
        ndim=2, neigs=4, mlp_hidden_dims=[16, 16], nonlinearity="softplus",
        parallel=True, use_fourier_feature=True, fourier_mapping_size=8,
        fourier_scale=1.0, apply_boundary=False)
    params = init(jax.random.key(1))
    x = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))
    imp = lambda xx: (jnp.exp(-0.5 * jnp.sum(xx ** 2, -1, keepdims=True))
                      / (2 * np.pi))

    def loss(p, lapfn):
        g = lambda xx: jnp.sqrt(imp(xx)) * apply(p, xx)
        lap, _, fs = lapfn(g, x)
        return jnp.sum(lap * fs)

    l_ref = jax.jit(lambda p: loss(p, exact_laplacian))(params)
    l_new = jax.jit(lambda p: loss(p, forward_laplacian))(params)
    np.testing.assert_allclose(float(l_ref), float(l_new), rtol=1e-6)

    g_ref = jax.grad(lambda p: loss(p, exact_laplacian))(params)
    g_new = jax.grad(lambda p: loss(p, forward_laplacian))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new)):
        assert _rel(a, b) < 1e-5


def test_fallback_rule_reduce_prod(rng):
    """reduce_prod has no specialized rule — exercises _fallback_rule
    (exact local nested JVP) mixed into surrounding specialized rules."""
    x = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))
    f = lambda xx: (jnp.prod(16.0 - xx ** 2, axis=-1, keepdims=True)
                    * jnp.sin(xx[:, :1]))
    l1, g1, v1 = exact_laplacian(f, x, return_grad=True)
    l2, g2, v2 = forward_laplacian(f, x, return_grad=True)
    assert _rel(v1, v2) < 1e-6
    assert _rel(g1, g2) < 1e-5
    assert _rel(l1, l2) < 1e-5


def test_piecewise_clip_matches_jvp(rng):
    """clip/max/min/where: a.e. derivatives must match the nested-JVP
    convention (channels follow the branch the value takes)."""
    x = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32))
    f = lambda xx: jnp.where(
        xx[:, :1] > 0.0,
        jnp.clip(xx ** 2, 0.05, 2.0).sum(-1, keepdims=True),
        jnp.abs(xx[:, 1:]) * xx[:, :1])
    l1, g1, v1 = exact_laplacian(f, x, return_grad=True)
    l2, g2, v2 = forward_laplacian(f, x, return_grad=True)
    assert _rel(v1, v2) < 1e-6
    assert _rel(g1, g2) < 1e-5
    assert _rel(l1, l2) < 1e-5


def test_forward_engine_under_mesh(rng):
    """The default exact path must compose with GSPMD (sharded batch)
    and shard_map — multichip training runs the operator inside both."""
    from functools import partial

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neuralsvd_tpu.operators.problems import get_problem

    init, apply = make_wavefunctions(
        ndim=2, neigs=8, mlp_hidden_dims=[16, 16], nonlinearity="softplus",
        parallel=True, use_fourier_feature=True, fourier_mapping_size=8,
        fourier_scale=0.5, apply_boundary=False)
    params = init(jax.random.key(0))
    operator, _, _ = get_problem(
        problem="sch", potential_type="hydrogen", ndim=2, neigs=8,
        laplacian_eps=-1.0, laplacian_mode="forward", operator_scale=100.0)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32)),
        NamedSharding(mesh, P("dp", None)))

    Tf, f = jax.jit(lambda p, x: operator(lambda xx: apply(p, xx), x))(
        params, x)

    sm = partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("dp", None)),
                 out_specs=(P("dp", None), P("dp", None)))
    Tf2, f2 = jax.jit(sm(
        lambda p, xx: operator(lambda z: apply(p, z), xx)))(params, x)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(Tf), np.asarray(Tf2), rtol=2e-4,
                               atol=1e-3)


def test_hutchinson_laplacian(rng):
    """Rademacher-probe stochastic Laplacian: exact for any probe count
    on a diagonal-Hessian function (r_i^2 = 1 kills the variance), and
    a few-percent estimate of the gaussian closed form at k=64."""
    from neuralsvd_tpu.ops.forward_laplacian import hutchinson_laplacian

    # f = |x|^2: H = 2I, r^T H r = 2D for EVERY rademacher draw
    x = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    f = lambda xx: jnp.sum(xx ** 2, -1, keepdims=True)
    lap, fs = hutchinson_laplacian(f, x, jax.random.key(0), num_probes=1)
    np.testing.assert_allclose(np.asarray(lap), 10.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fs),
                               np.asarray(jnp.sum(x ** 2, -1)[:, None]),
                               rtol=1e-6)

    # gaussian: noisy but converging estimate of (|x|^2 - D) f
    x = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    g = lambda xx: jnp.exp(-0.5 * jnp.sum(xx ** 2, -1, keepdims=True))
    est, fs = hutchinson_laplacian(g, x, jax.random.key(1), num_probes=256)
    r2 = jnp.sum(x ** 2, -1, keepdims=True)
    truth = np.asarray((r2 - 3) * fs)
    err = np.abs(np.asarray(est) - truth).mean() / np.abs(truth).mean()
    assert err < 0.15, err
