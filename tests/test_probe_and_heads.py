"""Vestigial-parity zoo (VERDICT r1 item 9): multi-head linear probe,
pretrained checkpoint loader, HeteroNetwork online classify heads."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_multihead_probe_trains_heads_only(rng):
    from neuralsvd_tpu.models.probe import make_multihead_probe

    D, R, E, C = 6, 10, 8, 3
    W_rep = jnp.asarray(rng.normal(size=(D, R)).astype(np.float32))
    W_emb = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32))

    def embed(x):
        return x @ W_rep, x @ W_emb

    init, apply, register = make_multihead_probe(
        embed, rep_dim=R, emb_dim=E, num_classes=C, trunc_dims=(4, -4))
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(16, D)).astype(np.float32))
    logits = apply(params, x)
    assert set(logits) == {"rep", "emb", "trunc(4)", "trunc(-4)"}
    assert all(v.shape == (16, C) for v in logits.values())
    # trunc slicing: first-k vs last-k coords
    spec = register(np.arange(E + 1, 0, -1.0))
    out_norm = apply(params, x, spectrum_record=spec, normalize=True)
    assert np.isfinite(np.asarray(out_norm["emb"])).all()

    # gradient flows ONLY into heads (encoder frozen via stop_gradient)
    def loss(p):
        lg = apply(p, x)
        return sum(jnp.sum(v ** 2) for v in lg.values())

    g = jax.grad(loss)(params)
    assert all(np.any(np.asarray(leaf)) for leaf in jax.tree.leaves(g))


def test_multihead_probe_mlp_heads(rng):
    from neuralsvd_tpu.models.probe import make_multihead_probe

    def embed(x):
        return x, x[:, :4]

    init, apply, _ = make_multihead_probe(
        embed, rep_dim=6, emb_dim=4, num_classes=2, hidden_dims=[16])
    params = init(jax.random.key(1))
    out = apply(params, jnp.ones((3, 6)))
    assert out["rep"].shape == (3, 2) and out["emb"].shape == (3, 2)


def test_load_pretrained_unwraps_trainstate(tmp_path, rng):
    from neuralsvd_tpu.training.checkpoint import (load_pretrained,
                                                   save_checkpoint)

    params = {"w": np.float32(rng.normal(size=(4, 2))),
              "b": np.zeros((2,), np.float32)}
    wrapped = {"step": 7, "params": params,
               "opt_state": [np.zeros(3, np.float32)],
               "ema_params": jax.tree.map(lambda a: a * 0.5, params)}
    save_checkpoint(str(tmp_path / "ckpt"), wrapped)
    template = jax.tree.map(jnp.asarray, params)
    restored = load_pretrained(str(tmp_path / "ckpt"), template)
    np.testing.assert_allclose(np.asarray(restored["w"]), params["w"])

    with pytest.raises(KeyError):
        load_pretrained(str(tmp_path / "ckpt"), {"nonexistent": jnp.ones(3)})


def test_hetero_online_heads_detach(rng):
    from neuralsvd_tpu.models.two_tower import make_hetero_network

    init, apply, apply_single = make_hetero_network(
        input_dim=5, network_dims=[8, 4], num_classes=3, mu=4.0)
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32))
    emb, logits = apply_single(params, x, "x", classify=True)
    assert emb.shape == (6, 4) and logits.shape == (6, 3)

    # classifier loss must NOT backprop into the tower (reference detaches)
    def head_loss(p):
        _, lg = apply_single(p, x, "x", classify=True)
        return jnp.sum(lg ** 2)

    g = jax.grad(head_loss)(params)
    assert all(not np.any(np.asarray(l)) for l in jax.tree.leaves(g["x"]))
    assert any(np.any(np.asarray(l)) for l in jax.tree.leaves(g["head_x"]))
    # towers without heads still work
    init2, apply2, s2 = make_hetero_network(input_dim=5, network_dims=[8, 4])
    p2 = init2(jax.random.key(1))
    with pytest.raises(ValueError, match="online heads"):
        s2(p2, x, "x", classify=True)
