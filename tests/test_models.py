"""Model zoo: ParallelMLP parity (incl. multidim outputs), activations,
Fourier features, boundary masks, wavefunction assembly, two-tower nets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsvd_tpu.models import make_wavefunctions
from neuralsvd_tpu.models.fourier import make_fourier_features
from neuralsvd_tpu.models.mlp import (
    get_activation,
    make_mlp,
    make_parallel_mlp,
    parse_dims,
)
from neuralsvd_tpu.models.two_tower import make_hetero_network, normalize_embedding
from neuralsvd_tpu.models.wavefunctions import dirichlet_box_mask


def test_parallel_mlp_equals_independent_mlps(rng):
    """The batched-einsum ParallelMLP computes exactly L independent MLPs
    (reference semantics: examples/models/mlp.py:167-221)."""
    L, D, B = 3, 4, 16
    init, apply = make_parallel_mlp(D, [8, 8], num_copies=L,
                                    nonlinearity="tanh", bias=True)
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    out = apply(params, x)
    assert out.shape == (B, L)
    for l in range(L):
        h = x
        for i, (w, b) in enumerate(zip(params["ws"], params["bs"])):
            h = h @ np.asarray(w[l]).T + np.asarray(b[l])[:, 0]
            if i < len(params["ws"]) - 1:
                h = np.tanh(h)
        np.testing.assert_allclose(out[:, l], h[:, 0], rtol=1e-5, atol=1e-6)


def test_parallel_mlp_multidim_outputs(rng):
    """output_dim > 1 gives (B, L, O) — the reference's MultidimParallelMLP
    capability (examples/models/mlp.py:224-297) in the same function."""
    init, apply = make_parallel_mlp(3, [8], num_copies=4, output_dim=5,
                                    nonlinearity="relu")
    params = init(jax.random.key(0))
    out = apply(params, jnp.ones((7, 3)))
    assert out.shape == (7, 4, 5)


def test_parallel_mlp_debug_init_deterministic():
    init, _ = make_parallel_mlp(2, [4], num_copies=3, debug=True)
    p1, p2 = init(jax.random.key(0)), init(jax.random.key(99))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)
        assert float(jnp.unique(a)[0]) == pytest.approx(0.1)


@pytest.mark.parametrize("name", ["relu", "lrelu0.2", "elu", "elu0.5", "tanh",
                                  "erf", "softplus", "sin_and_cos", "siren"])
def test_activations_finite(name):
    act = get_activation(name)
    x = jnp.linspace(-3, 3, 32).reshape(4, 8)
    assert bool(jnp.all(jnp.isfinite(act(x))))


def test_fourier_features_shapes_and_determinism():
    init, apply = make_fourier_features(input_dim=2, mapping_size=16,
                                        scale=0.5, deterministic=False,
                                        append_raw=True, seed=3)
    p = init(jax.random.key(3))
    x = jnp.ones((5, 2))
    out = apply(p, x)
    assert out.shape == (5, apply.feature_dim)
    assert apply.feature_dim == 2 * 16 + 2  # sin+cos + raw append
    init2, apply2 = make_fourier_features(input_dim=2, mapping_size=16,
                                          scale=0.5, deterministic=False,
                                          append_raw=True, seed=3)
    np.testing.assert_array_equal(out, apply2(init2(jax.random.key(3)), x))


def test_dirichlet_box_mask_vanishes_on_boundary():
    lim = 2.0
    inside = jnp.asarray([[0.0, 0.0]])
    edge = jnp.asarray([[lim, 0.0], [0.0, -lim]])
    for mode in ("dir_box_sqrt", "dir_box_exp"):
        m_in = np.asarray(dirichlet_box_mask(inside, lim, mode)).ravel()
        m_edge = np.asarray(dirichlet_box_mask(edge, lim, mode)).ravel()
        assert m_in[0] > 0
        np.testing.assert_allclose(m_edge, 0.0, atol=1e-6)


def test_wavefunctions_apply_boundary():
    init, apply = make_wavefunctions(ndim=2, neigs=3, mlp_hidden_dims=[8],
                                     nonlinearity="softplus",
                                     use_fourier_feature=False,
                                     apply_boundary=True,
                                     boundary_mode="dir_box_sqrt", lim=1.0)
    params = init(jax.random.key(0))
    on_edge = apply(params, jnp.asarray([[1.0, 0.3]]))
    np.testing.assert_allclose(np.asarray(on_edge), 0.0, atol=1e-6)


@pytest.mark.parametrize("mode", ["l2_ball", "l2_sphere", "clip", "tanh"])
def test_normalize_embedding_modes(rng, mode):
    z = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)) * 5
    r = 2.0
    out = np.asarray(normalize_embedding(z, r, mode))
    norms = np.linalg.norm(out, axis=1)
    if mode == "l2_sphere":
        np.testing.assert_allclose(norms, r, rtol=1e-5)
    elif mode == "l2_ball":
        assert (norms <= r * (1 + 1e-5)).all()
    else:  # clip/tanh: elementwise bounded by r
        assert (np.abs(out) <= r).all()


def test_hetero_network_two_towers_independent(rng):
    init, apply, apply_single = make_hetero_network(
        input_dim=8, network_dims=[16, 4], nonlinearity="relu",
        mu=4.0, regularize_mode="l2_ball")
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    fx, gy = apply(params, x, y)
    assert fx.shape == gy.shape == (6, 4)
    # towers have separate weights: swapping inputs changes outputs
    fx2, gy2 = apply(params, y, x)
    assert np.abs(np.asarray(fx) - np.asarray(gy2)).max() > 1e-6


def test_hetero_network_bf16_compute_dtype(rng):
    """Mixed-precision towers: bf16 matmuls, f32 master weights/outputs/
    grads, results close to the f32 path (TPU AMP analog)."""
    init, apply, _ = make_hetero_network(
        input_dim=8, network_dims=[16, 4], nonlinearity="lrelu0.2",
        mu=4.0, regularize_mode="l2_ball")
    init16, apply16, _ = make_hetero_network(
        input_dim=8, network_dims=[16, 4], nonlinearity="lrelu0.2",
        mu=4.0, regularize_mode="l2_ball", compute_dtype=jnp.bfloat16)
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    fx32, _ = apply(params, x, y)
    fx16, gy16 = apply16(params, x, y)
    assert fx16.dtype == gy16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fx16), np.asarray(fx32),
                               rtol=0.1, atol=0.05)

    def loss16(p):
        fx, gy = apply16(p, x, y)
        return jnp.sum(fx * gy)

    grads = jax.grad(loss16)(params)
    for leaf in jax.tree.leaves(grads):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()


def test_parallel_mlp_bf16_compute_dtype(rng):
    """bf16 eigenfunction towers (VERDICT r2 item 7): f32 master weights,
    features and outputs; the einsum chain in bf16; exact-JVP Laplacian
    (fwd-over-fwd) stays finite and close to f32."""
    from neuralsvd_tpu.models import make_wavefunctions

    kw = dict(ndim=2, neigs=4, mlp_hidden_dims=[32, 32],
              nonlinearity="softplus", parallel=True,
              use_fourier_feature=True, fourier_mapping_size=64,
              fourier_scale=0.5, apply_boundary=False)
    init, apply = make_wavefunctions(**kw)
    _, apply16 = make_wavefunctions(**kw, compute_dtype=jnp.bfloat16)
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
    f32 = apply(params, x)
    f16 = apply16(params, x)
    assert f16.dtype == jnp.float32
    scale = np.abs(np.asarray(f32)).max()
    np.testing.assert_allclose(np.asarray(f16), np.asarray(f32),
                               atol=0.05 * scale, rtol=0.1)

    # fwd-over-fwd JVP (the exact-Laplacian path) through the bf16 tower
    def f_of_x(xx):
        return apply16(params, xx)

    v = jnp.zeros_like(x).at[:, 0].set(1.0)
    _, d1 = jax.jvp(f_of_x, (x,), (v,))
    _, d2 = jax.jvp(lambda xx: jax.jvp(f_of_x, (xx,), (v,))[1], (x,), (v,))
    assert np.isfinite(np.asarray(d1)).all()
    assert np.isfinite(np.asarray(d2)).all()


def test_parallel_mlp_matmul_precision_tiers(rng):
    """matmul_precision threads a per-einsum MXU tier through the towers
    (f32 storage; 'high' = 3-pass bf16 on TPU).  On CPU all tiers compute
    in f32, so outputs must match HIGHEST bit-for-bit — this guards the
    plumbing, the TPU win is measured in BASELINE.md E6."""
    from neuralsvd_tpu.models import make_wavefunctions
    from neuralsvd_tpu.models.mlp import resolve_matmul_precision

    assert resolve_matmul_precision(None) is None
    assert resolve_matmul_precision("high") == jax.lax.Precision.HIGH
    assert resolve_matmul_precision("highest") == jax.lax.Precision.HIGHEST
    assert resolve_matmul_precision("default") == jax.lax.Precision.DEFAULT

    for parallel in (True, False):  # ParallelMLP einsums AND shared-trunk
        kw = dict(ndim=2, neigs=4, mlp_hidden_dims=[32, 32],
                  nonlinearity="softplus", parallel=parallel,
                  use_fourier_feature=True, fourier_mapping_size=64,
                  fourier_scale=0.5, apply_boundary=False)
        init, apply = make_wavefunctions(**kw)
        _, apply_hi = make_wavefunctions(**kw, matmul_precision="high")
        params = init(jax.random.key(0))
        x = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(apply_hi(params, x)),
                                      np.asarray(apply(params, x)))


def test_parallel_mlp_split_precision(rng):
    """Split spec 'highest@k,high': first k towers at HIGHEST, rest at
    HIGH, concatenated along the mode axis.  On CPU every tier computes
    in f32, so the split output (and its grads) must equal the unsplit
    network bit-for-bit; shared-trunk MLPs must reject split specs."""
    import pytest

    from neuralsvd_tpu.models import make_wavefunctions
    from neuralsvd_tpu.models.mlp import resolve_matmul_precision

    spec = resolve_matmul_precision("highest@1,high")
    assert spec == ("split", jax.lax.Precision.HIGHEST, 1,
                    jax.lax.Precision.HIGH)

    kw = dict(ndim=2, neigs=5, mlp_hidden_dims=[32, 32],
              nonlinearity="softplus", parallel=True,
              use_fourier_feature=True, fourier_mapping_size=64,
              fourier_scale=0.5, apply_boundary=False)
    init, apply = make_wavefunctions(**kw)
    _, apply_split = make_wavefunctions(**kw, matmul_precision="highest@2,high")
    # degenerate splits clamp to a single tier instead of a 0-size einsum
    _, apply_all_head = make_wavefunctions(**kw,
                                           matmul_precision="highest@5,high")
    params = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(apply_split(params, x)),
                                  np.asarray(apply(params, x)))
    np.testing.assert_array_equal(np.asarray(apply_all_head(params, x)),
                                  np.asarray(apply(params, x)))

    g_ref = jax.grad(lambda p: jnp.sum(apply(p, x) ** 2))(params)
    g_split = jax.grad(lambda p: jnp.sum(apply_split(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_split)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="ParallelMLP"):
        make_wavefunctions(**{**kw, "parallel": False},
                           matmul_precision="highest@1,high")


def test_parse_dims():
    assert parse_dims("128,128,64") == [128, 128, 64]
    assert parse_dims("32") == [32]


def test_resnet_families_forward(rng):
    from neuralsvd_tpu.models import make_cifar_resnet, make_resnet

    init, apply = make_cifar_resnet(depth=20, num_outputs=10)
    params, state = init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    out, new_state = apply(params, state, x, train=True)
    assert out.shape == (2, 10)
    out_eval, _ = apply(params, new_state, x, train=False)
    assert out_eval.shape == (2, 10) and bool(jnp.all(jnp.isfinite(out_eval)))

    init2, apply2 = make_resnet(depth_blocks=(1, 1), width=16, num_outputs=4)
    p2, s2 = init2(jax.random.key(1))
    out2, _ = apply2(p2, s2, x, train=False)
    assert out2.shape == (2, 4)


def test_siam_network_state_and_modes(rng):
    from neuralsvd_tpu.models import make_siam_network

    init, init_state, apply = make_siam_network(
        input_dim=8, backbone_dims=[16, 8], projector_dims=[4],
        mu=4.0, batch_l2norm=True)
    params = init(jax.random.key(0))
    state = init_state()
    z1 = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    r1, e1, r2, e2, state = apply(params, state, z1, z2, train=True)
    assert e1.shape == (32, 4) and bool(state["initialized"])
    # eval path uses the stored norms
    _, e1_eval, state2 = apply(params, state, z1, train=False)
    assert e1_eval.shape == (32, 4)
    np.testing.assert_array_equal(np.asarray(state2["l2norm"]),
                                  np.asarray(state["l2norm"]))


def test_exponential_mask_conjugation_aware(rng):
    """With conjugate_importance=w, the physical envelope √w·mask equals
    e^{-r/s} up to the w(0) normalization — the MLP-side mask compensates
    the 1/√w growth of the conjugated target functions."""
    from neuralsvd_tpu.models.wavefunctions import make_exponential_mask

    sigma = 4.0

    def w(x):
        return jnp.exp(-0.5 * jnp.sum((x / sigma) ** 2, -1, keepdims=True))

    init, apply = make_exponential_mask(2, init_scale=[1.0, 3.0],
                                        conjugate_importance=w)
    params = init(jax.random.key(0))
    np.testing.assert_allclose(np.asarray(params["scales"]), [1.0, 3.0])
    x = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32)) * 3
    mask = np.asarray(apply(params, x))
    r = np.linalg.norm(np.asarray(x), axis=1, keepdims=True)
    physical = np.sqrt(np.asarray(w(x))) * mask  # √w·f-envelope
    expected = np.exp(-r / np.array([1.0, 3.0])[None, :])
    np.testing.assert_allclose(physical, expected, rtol=1e-4)
