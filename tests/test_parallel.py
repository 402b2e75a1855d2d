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
