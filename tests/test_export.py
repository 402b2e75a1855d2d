"""Serving export roundtrip: StableHLO artifact with symbolic batch."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.models import make_wavefunctions
from neuralsvd_tpu.utils.export import (
    export_evaluator,
    load_evaluator,
    load_evaluator_file,
    save_evaluator,
)


def test_export_roundtrip_polymorphic_batch(tmp_path):
    init, apply = make_wavefunctions(
        ndim=2, neigs=4, mlp_hidden_dims=[16, 16], nonlinearity="softplus",
        parallel=True, use_fourier_feature=True, fourier_mapping_size=8,
        fourier_scale=0.5, apply_boundary=True,
        boundary_mode="dir_box_sqrt", lim=4.0)
    params = init(jax.random.key(0))

    blob = export_evaluator(apply, params, input_dim=2)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_evaluator(blob)

    rng = np.random.default_rng(0)
    for B in (3, 17):  # symbolic batch: one artifact, any batch size
        x = jnp.asarray(rng.uniform(-3, 3, (B, 2)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(fn(x)),
                                   np.asarray(apply(params, x)),
                                   rtol=1e-6, atol=1e-7)

    p = tmp_path / "psi.stablehlo"
    save_evaluator(str(p), apply, params, input_dim=2)
    fn2 = load_evaluator_file(str(p))
    x = jnp.asarray(rng.uniform(-3, 3, (5, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fn2(x)),
                               np.asarray(apply(params, x)), rtol=1e-6,
                               atol=1e-7)


def test_export_cdk_tower():
    """The retrieval serving surface: a two-tower embedder exports and
    reproduces embeddings for the lax.top_k retrieval path."""
    from neuralsvd_tpu.models.two_tower import make_hetero_network

    init, apply, _ = make_hetero_network(
        input_dim=8, network_dims=[16, 4], nonlinearity="lrelu0.2",
        mu=16.0, regularize_mode="l2_ball")
    params = init(jax.random.key(1))

    def embed_x(p, x):
        f, _ = apply(p, x, x)
        return f

    fn = load_evaluator(export_evaluator(embed_x, params, input_dim=8))
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(6, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fn(x)),
                               np.asarray(embed_x(params, x)), rtol=1e-6,
                               atol=1e-7)
