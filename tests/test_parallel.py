"""Device-mesh parallelism: GSPMD train-step helper + mesh/sharding utils."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from neuralsvd_tpu.methods.nestedlora import NestedLoRA
from neuralsvd_tpu.models import make_parallel_mlp
from neuralsvd_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    mode_sharded_params,
    state_shardings,
)
from neuralsvd_tpu.training.optimizers import torch_rmsprop
from neuralsvd_tpu.training.train_operator import make_train_step
from neuralsvd_tpu.training.train_state import init_train_state


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2) and mesh.axis_names == ("dp", "tp")
    mesh1 = make_mesh(8, axes=("dp",))
    assert mesh1.devices.shape == (8,)


def test_mode_sharded_params_specs():
    mesh = make_mesh(8)
    params = {"ws": [jnp.zeros((8, 4, 4)), jnp.zeros((8, 4, 2))],
              "b": jnp.zeros((4,))}
    shardings = mode_sharded_params(params, mesh)
    assert shardings["ws"][0].spec == P("tp", None, None)
    assert shardings["b"].spec == P()


def test_gspmd_sharded_train_step_runs_and_matches_replicated(rng):
    """make_sharded_train_step executes on a dp x tp mesh with tp-sharded
    ParallelMLP weights and reproduces the unsharded step exactly."""
    L, ndim, batch = 8, 2, 32
    init, apply = make_parallel_mlp(input_dim=ndim, mlp_hidden_dims=[8, 8],
                                    num_copies=L, nonlinearity="softplus")
    params = init(jax.random.key(0))
    K = rng.normal(size=(batch, batch)).astype(np.float32)
    K = jnp.asarray((K + K.T) / 2)

    def operator(f, x, importance=None):
        fs = f(x)
        return K @ fs / batch, fs

    method = NestedLoRA(apply, neigs=L, sequential=True)
    opt = torch_rmsprop(1e-3)

    def sampler(key):
        return jax.random.normal(key, (batch, ndim))

    step = make_train_step(method, operator, opt, sampler, ema_decay=0.9)
    ts0 = init_train_state(params, opt, method)

    mesh = make_mesh(8)
    jitted, ts_sharded = make_sharded_train_step(step, mesh, ts0)
    new_sharded, m_sharded = jitted(ts_sharded, jax.random.key(1))
    # weights stay tp-sharded through the step
    w0 = new_sharded.params["ws"][0]
    assert w0.sharding.spec[0] == "tp"

    new_plain, m_plain = jax.jit(step)(ts0, jax.random.key(1))
    np.testing.assert_allclose(float(m_sharded["loss"]),
                               float(m_plain["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_sharded.params),
                    jax.tree.leaves(new_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_state_shardings_cover_optimizer_moments():
    L = 8
    init, _ = make_parallel_mlp(input_dim=2, mlp_hidden_dims=[8],
                                num_copies=L, nonlinearity="relu")
    params = init(jax.random.key(0))
    opt = torch_rmsprop(1e-3)

    class M:
        def init_state(self, p):
            return {}

    ts = init_train_state(params, opt, M())
    mesh = make_mesh(8)
    shardings = state_shardings(ts, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)
             if hasattr(s, "spec")]
    assert P("tp", None, None) in specs  # rank-3 moments sharded too


def test_shard_map_cdk_step_matches_single_device(rng):
    """DP CDK step on an 8-device dp mesh reproduces the single-device step:
    pmean of per-shard marginal Grams equals the global Gram, and pairing is
    preserved because x and y share the batch sharding."""
    import optax

    from neuralsvd_tpu.cli.sketchy import make_cdk_train_step
    from neuralsvd_tpu.methods.nestedlora import NestedLoRAForCDK
    from neuralsvd_tpu.models.two_tower import make_hetero_network
    from neuralsvd_tpu.parallel.sharding import make_shard_map_cdk_step

    L, dim, B = 4, 6, 64
    init, apply, _ = make_hetero_network(
        input_dim=dim, network_dims=[16, L], nonlinearity="lrelu0.2",
        mu=16.0, regularize_mode="l2_ball")
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(B, dim)).astype(np.float32))
    y = x + 0.1 * jnp.asarray(rng.normal(size=(B, dim)).astype(np.float32))
    opt = optax.sgd(1e-2)

    def run(step, method):
        p, s = params, opt.init(params)
        skips = jnp.zeros((), jnp.int32)
        for _ in range(3):
            p, s, _, loss, aux, skips = step(p, s, {}, x, y, skips)
        return p, loss, aux

    plain = make_cdk_train_step(
        NestedLoRAForCDK(apply, neigs=L), opt, grad_clip=0.0)
    mesh = make_mesh(8, axes=("dp",), shape=(8,))
    sharded = make_shard_map_cdk_step(
        NestedLoRAForCDK(apply, neigs=L, axis_name="dp"), opt, mesh)

    p_plain, loss_plain, aux_plain = run(plain, None)
    p_dp, loss_dp, aux_dp = run(sharded, None)
    np.testing.assert_allclose(float(loss_dp), float(loss_plain),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # per-sample diagnostics come back in global batch order
    np.testing.assert_allclose(np.asarray(aux_dp["f"]),
                               np.asarray(aux_plain["f"]),
                               rtol=1e-4, atol=1e-5)
    # the O(B^2) density-ratio gram is excluded from the hot step
    assert "rs_joint" not in aux_dp and "rs_joint" not in aux_plain


def test_shard_map_cdk_step_requires_axis_name():
    import optax

    from neuralsvd_tpu.methods.nestedlora import NestedLoRAForCDK
    from neuralsvd_tpu.models.two_tower import make_hetero_network
    from neuralsvd_tpu.parallel.sharding import make_shard_map_cdk_step

    _, apply, _ = make_hetero_network(input_dim=4, network_dims=[8, 2],
                                      nonlinearity="lrelu0.2")
    mesh = make_mesh(8, axes=("dp",), shape=(8,))
    with pytest.raises(ValueError, match="axis_name"):
        make_shard_map_cdk_step(NestedLoRAForCDK(apply, neigs=2),
                                optax.sgd(1e-2), mesh)


def test_shard_map_train_step_matches_single_device():
    """Full EVD DP step via shard_map == single-device step over the union
    of per-device batches (psum-completed gradients; regression for the
    pmean 1/n gradient-scale bug).

    Union ordering: each device splits its LOCAL batch into metric halves
    f1/f2, so the equivalent single-device batch concatenates all local
    first halves, then all local second halves.
    """
    from neuralsvd_tpu.parallel import make_shard_map_train_step

    L, ndim, B_loc, n_dev = 4, 2, 16, 8
    init, apply = make_parallel_mlp(input_dim=ndim, mlp_hidden_dims=[8],
                                    num_copies=L, nonlinearity="softplus")
    params = init(jax.random.key(0))

    def operator(f, x, importance=None):
        fs = f(x)
        # cheap self-adjoint operator: multiply by a fixed radial weight
        w = jnp.exp(-jnp.sum(x**2, -1, keepdims=True))
        return w * fs, fs

    opt = torch_rmsprop(1e-3)

    def sampler(key):
        return jax.random.normal(key, (B_loc, ndim))

    mesh = make_mesh(n_dev, axes=("dp",), shape=(n_dev,))
    method_dp = NestedLoRA(apply, neigs=L, sequential=True, axis_name="dp")
    step_dp = make_shard_map_train_step(method_dp, operator, opt, sampler,
                                        mesh=mesh, ema_decay=0.9)
    ts0 = init_train_state(params, opt, method_dp)
    key = jax.random.key(7)
    ts_dp, m_dp = step_dp(ts0, key)
    loss_dp = m_dp["loss"]

    # reconstruct the global batch in half-consistent order
    locals_ = [sampler(jax.random.fold_in(key, d)) for d in range(n_dev)]
    h = B_loc // 2
    X = jnp.concatenate([x[:h] for x in locals_] +
                        [x[h:] for x in locals_], axis=0)

    method_1 = NestedLoRA(apply, neigs=L, sequential=True)
    step_1 = make_train_step(method_1, operator, opt,
                             sampler=lambda k: X, ema_decay=0.9)
    ts_1, m_1 = jax.jit(step_1)(ts0, key)

    np.testing.assert_allclose(float(loss_dp), float(m_1["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ts_dp.params), jax.tree.leaves(ts_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_shard_batch_sampler_pins_dp_rows():
    from neuralsvd_tpu.parallel import shard_batch_sampler

    mesh = make_mesh(8, axes=("dp", "tp"), shape=(4, 2))
    sampler = shard_batch_sampler(
        lambda key: jax.random.normal(key, (32, 3)), mesh)
    out = jax.jit(sampler)(jax.random.key(0))
    assert out.sharding.spec[0] == "dp", out.sharding


def test_parse_mesh_spec_grammar():
    from neuralsvd_tpu.parallel.sharding import parse_mesh_spec

    assert parse_mesh_spec("dp", 8) == (("dp",), (8,))
    assert parse_mesh_spec("dp=4", 8) == (("dp",), (4,))
    assert parse_mesh_spec("dp=4,tp=2", 8) == (("dp", "tp"), (4, 2))
    assert parse_mesh_spec("dp,tp=2", 8) == (("dp", "tp"), (4, 2))
    assert parse_mesh_spec("tp=2", 8) == (("tp",), (2,))
    # size-1 axes dropped; fully trivial spec degenerates to 1 device
    assert parse_mesh_spec("dp=4,tp=1", 8) == (("dp",), (4,))
    assert parse_mesh_spec("dp=1", 8) == (("dp",), (1,))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_mesh_spec("dp=16", 8)  # oversubscribed
    with _pytest.raises(ValueError):
        parse_mesh_spec("dp,tp", 8)  # two unsized axes
    with _pytest.raises(ValueError):
        parse_mesh_spec("pp=2", 8)  # unknown axis
    with _pytest.raises(ValueError):
        parse_mesh_spec("dp=3,tp", 8)  # 8 not divisible by 3
