"""Round-2 accuracy levers: mixture sampler, envelope features, grouped
Rayleigh estimates."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.data.samplers import get_sampler
from neuralsvd_tpu.methods.spectrum import grouped_rayleigh
from neuralsvd_tpu.models.fourier import make_fourier_features


def test_gaussian_mixture_density_normalizes_and_matches_samples():
    scales = (0.5, 2.0, 6.0, 16.0)
    sample, importance = get_sampler("gaussian_mixture", 100_000, 1, 2, scales)
    # density integrates to ~1 over a grid covering the widest component
    xs = np.arange(-96, 96, 0.25, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
    total = 0.0
    for i in range(0, len(grid), 200_000):
        total += float(jnp.sum(importance(jnp.asarray(grid[i:i + 200_000]))))
    total *= 0.25 ** 2
    np.testing.assert_allclose(total, 1.0, rtol=2e-3)
    # empirical core mass matches the density's prediction (the whole point:
    # ~25% of samples land near the 1s core instead of ~0.2%)
    x = np.asarray(sample(jax.random.key(0)))
    frac_core = np.mean(np.linalg.norm(x, axis=1) < 1.0)
    # analytic: mean over components of P(r < 1) = 1 - exp(-1/(2 s^2))
    pred = np.mean([1 - np.exp(-1 / (2 * s**2)) for s in scales])
    np.testing.assert_allclose(frac_core, pred, rtol=0.05)
    assert frac_core > 0.2  # vs ~0.002 for a single scale-16 gaussian


def test_gaussian_mixture_density_pointwise():
    scales = (1.0, 4.0)
    _, importance = get_sampler("gaussian_mixture", 8, 1, 2, scales)
    pts = np.array([[0.0, 0.0], [1.0, -2.0], [8.0, 3.0]], np.float32)
    got = np.asarray(importance(jnp.asarray(pts))).ravel()
    r2 = (pts ** 2).sum(1)
    want = np.mean([np.exp(-r2 / (2 * s**2)) / (2 * np.pi * s**2)
                    for s in scales], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_mixture_nonuniform_weights():
    """Weighted mixture: density matches the weighted formula pointwise and
    the sampler's component frequencies follow the weights."""
    scales = (0.5, 2.0, 6.0, 16.0)
    weights = (0.4, 0.3, 0.2, 0.1)
    sample, importance = get_sampler("gaussian_mixture", 200_000, 1, 2,
                                     scales, sampling_weights=weights)
    pts = np.array([[0.0, 0.0], [1.0, -2.0], [8.0, 3.0]], np.float32)
    got = np.asarray(importance(jnp.asarray(pts))).ravel()
    r2 = (pts ** 2).sum(1)
    want = sum(w * np.exp(-r2 / (2 * s**2)) / (2 * np.pi * s**2)
               for w, s in zip(weights, scales))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # empirical core mass reflects the overweighted tight component
    x = np.asarray(sample(jax.random.key(0)))
    frac_core = np.mean(np.linalg.norm(x, axis=1) < 1.0)
    pred = sum(w * (1 - np.exp(-1 / (2 * s**2)))
               for w, s in zip(weights, scales))
    np.testing.assert_allclose(frac_core, pred, rtol=0.05)
    assert frac_core > 0.35  # vs ~0.26 under uniform weights


def test_envelope_features_appended():
    kappas = (2.0, 2.0 / 3.0)
    init, apply = make_fourier_features(
        input_dim=2, mapping_size=8, scale=0.1,
        append_radial=True, append_envelopes=kappas)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 2)), jnp.float32)
    feats = apply({}, x)
    assert feats.shape[1] == apply.feature_dim == 16 + 1 + 2
    r = np.linalg.norm(np.asarray(x), axis=1)
    np.testing.assert_allclose(np.asarray(feats[:, -2]), np.exp(-2.0 * r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feats[:, -1]),
                               np.exp(-(2.0 / 3.0) * r), rtol=1e-5, atol=1e-6)


def test_grouped_rayleigh_rotation_invariant():
    # true spectrum [3, 1, 1]; learned degenerate pair is rotated, giving
    # spread individual quotients but an invariant group trace ratio
    rng = np.random.default_rng(1)
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    lam = np.diag([1.0, 1.0])
    # contaminate the pair with a bit of an eigval-5 direction
    eps = np.array([0.1, -0.05])
    quad_pair = np.diag(R @ lam @ R.T) + 5.0 * eps**2
    cov_pair = np.ones(2) + eps**2
    quad = np.concatenate([[3.0], quad_pair])
    cov = np.concatenate([[1.0], cov_pair])
    out = grouped_rayleigh(quad, cov, [1, 2])
    np.testing.assert_allclose(out[0], 3.0, rtol=1e-12)
    # pooled: (tr quad_pair)/(tr cov_pair) — identical for both modes
    pooled = quad_pair.sum() / cov_pair.sum()
    np.testing.assert_allclose(out[1:], pooled)
    # pooling cancels the rotation spread: closer to 1 than the worst mode
    indiv = quad_pair / cov_pair
    assert abs(pooled - 1.0) <= np.abs(indiv - 1.0).max() + 1e-12


def test_grouped_rayleigh_orders_by_individual_quotients():
    quad = np.array([1.0, 9.0, 8.8])   # modes out of order
    cov = np.ones(3)
    out = grouped_rayleigh(quad, cov, [2, 1])
    np.testing.assert_allclose(out, [8.9, 8.9, 1.0])
