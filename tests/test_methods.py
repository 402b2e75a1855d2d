"""Method-layer tests: SpIN dual-channel gradient vs an independent numpy
oracle, NeuralEF backward formulas, SpINx NTK weights, spectrum estimators."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.methods.neuralef import NeuralEigenfunctions, neuralef_loss
from neuralsvd_tpu.methods.spin import SpIN, spin_grad_matrices, spin_step
from neuralsvd_tpu.methods.spinx import SpINx
from neuralsvd_tpu.methods.nestedlora import NestedLoRA
from neuralsvd_tpu.methods.spectrum import compute_spectrum_evd
from neuralsvd_tpu.operators.base import MatrixOperator


def linear_apply(params, x):
    return x @ params["W"]


def test_spin_grad_matches_numpy_oracle(rng):
    """Full SpIN step (pi channel through vjp + sigma channel through
    EMA'd Jacobians) against closed-form numpy for a linear model and a
    matrix operator (see methods/spin.py docstring for the derivation)."""
    B, D, L = 12, 5, 3
    decay = 0.3
    X = rng.normal(size=(B, D)).astype(np.float32)
    A = rng.normal(size=(B, B)).astype(np.float32)
    A = (A + A.T) / 2
    W = rng.normal(size=(D, L)).astype(np.float32)
    params = {"W": jnp.asarray(W)}

    spin = SpIN(linear_apply, neigs=L, decay=decay)
    state = spin.init_state(params)
    operator = MatrixOperator(A)
    loss, grads, aux, new_state = spin.loss_and_grad(
        params, state, jnp.asarray(X), operator)

    # ---- numpy oracle -----------------------------------------------------
    phi = X @ W
    Tphi = A @ phi
    sigma = phi.T @ phi / B
    pi = phi.T @ Tphi / B
    sigma_avg = decay * sigma  # EMA from zeros
    chol = np.linalg.cholesky(sigma_avg + 1e-3 * np.eye(L))
    chol_inv = np.linalg.inv(chol)
    Lam = chol_inv @ pi @ chol_inv.T
    exp_loss = np.trace(Lam)
    dchol_inv = np.diag(np.diag(chol_inv))
    gsigma = chol_inv.T @ np.triu(Lam @ dchol_inv)
    gpi = -chol_inv.T @ dchol_inv
    # pi channel (reference Covariance backward: y@g/B, x@g/B)
    d_phi = Tphi @ gpi / B
    d_Tphi = phi @ gpi / B
    grad_pi = X.T @ (d_phi + A.T @ d_Tphi)
    # sigma channel: j_avg = decay * j_new; contraction collapses to
    # decay * 2/B * X.T @ phi @ gsigma for a linear model
    grad_sigma = decay * (2.0 / B) * X.T @ phi @ gsigma
    exp_grad = grad_pi + grad_sigma

    np.testing.assert_allclose(loss, exp_loss, rtol=1e-4)
    np.testing.assert_allclose(grads["W"], exp_grad, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(new_state["sigma_avg"], sigma_avg,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(aux["eigvals"], np.diag(Lam), rtol=1e-4)
    # chol state stored for eval-time orthonormalization
    np.testing.assert_allclose(new_state["chol"], chol, rtol=1e-4, atol=1e-6)


def test_spin_eval_fn_orthonormalizes(rng):
    B, D, L = 400, 4, 3
    X = rng.normal(size=(B, D)).astype(np.float32)
    W = rng.normal(size=(D, L)).astype(np.float32)
    params = {"W": jnp.asarray(W)}
    spin = SpIN(linear_apply, neigs=L, decay=1.0)  # no memory: exact sigma
    state = spin.init_state(params)
    operator = MatrixOperator(np.eye(B, dtype=np.float32))
    _, _, _, state = spin.loss_and_grad(params, state, jnp.asarray(X), operator)
    f = spin.eval_fn(params, state)
    out = np.asarray(f(jnp.asarray(X)))
    cov = out.T @ out / B
    # jitter 1e-3 limits exactness; orthonormal to that tolerance
    np.testing.assert_allclose(cov, np.eye(L), atol=5e-2)


def test_neuralef_backward_formulas(rng):
    B, L = 16, 4
    phi = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    Tphi = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    p1, p2 = phi[:8], phi[8:]
    T1, T2 = Tphi[:8], Tphi[8:]

    def loss(phi, Tphi, p1, T1, p2, T2):
        return neuralef_loss(None, True, 1, phi, Tphi, p1, T1, p2, T2)

    g = jax.grad(loss, argnums=(0, 1, 2, 4))(phi, Tphi, p1, T1, p2, T2)
    # variance channel: 4 * (-Tphi/B)
    np.testing.assert_allclose(g[0], -4 * Tphi / B, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g[1], np.zeros_like(Tphi))
    # align channel: 2 * Tphi1 @ triu(gram(phi1), 1) / B1
    gram1 = p1.T @ p1 / p1.shape[0]
    align1 = T1 @ np.triu(gram1, 1) / p1.shape[0]
    np.testing.assert_allclose(g[2], 2 * align1, rtol=1e-4, atol=1e-5)


def test_neuralef_batchnorm_state(rng):
    B, D, L = 32, 3, 4
    X = rng.normal(size=(B, D)).astype(np.float32)
    W = rng.normal(size=(D, L)).astype(np.float32)
    params = {"W": jnp.asarray(W)}
    nef = NeuralEigenfunctions(linear_apply, neigs=L, batchnorm_mode="unbiased",
                               unbiased=True)
    state = nef.init_state(params)
    operator = MatrixOperator(np.eye(B, dtype=np.float32))
    loss, grads, aux, state = nef.loss_and_grad(params, state, jnp.asarray(X),
                                                operator)
    assert bool(state["initialized"])
    # first update: state norm == batch norm of raw output
    out = X @ W
    bn = np.linalg.norm(out, axis=0, keepdims=True) / np.sqrt(B)
    np.testing.assert_allclose(state["norm_unbiased"], bn, rtol=1e-5)
    # eval_fn divides by the stored norm
    f = nef.eval_fn(params, state)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(X))), out / bn,
                               rtol=1e-5)
    assert np.isfinite(float(loss))


def test_spinx_runs_and_refreshes_weights(rng):
    B, D, L = 16, 4, 3
    X = rng.normal(size=(B, D)).astype(np.float32)
    W = 0.5 * rng.normal(size=(D, L)).astype(np.float32)
    params = {"W": jnp.asarray(W)}
    spinx = SpINx(linear_apply, neigs=L, decay=0.5)
    state = spinx.init_state(params)
    A = rng.normal(size=(B, B)).astype(np.float32)
    A = (A + A.T) / 2
    operator = MatrixOperator(A)
    loss, grads, aux, state = spinx.loss_and_grad(params, state,
                                                  jnp.asarray(X), operator)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grads["W"])))
    state = spinx.refresh_weights(params, state, jnp.asarray(X), operator)
    w = np.asarray(state["weights"])
    assert w.shape == (L + 1,)
    assert np.all(w > 0) and np.all(np.isfinite(w))


def test_compute_spectrum_evd_identity_operator(rng):
    """With T = I the Rayleigh quotients are exactly 1."""
    D, L = 3, 4
    W = rng.normal(size=(D, L)).astype(np.float32)
    f = lambda x: x @ jnp.asarray(W)

    class IdOp:
        def __call__(self, f, x, importance=None):
            fs = f(x)
            return fs, fs

    batches = [rng.normal(size=(16, D)).astype(np.float32) for _ in range(3)]
    out = compute_spectrum_evd(f, batches, IdOp())
    np.testing.assert_allclose(out["eigvals"], np.ones(L), rtol=1e-5)
    assert out["eigfuncs"].shape == (48, L)


def test_nestedlora_kernel_path_split_batch(rng):
    """Kernel EVD path with split_batch exercises the landmark closure."""
    from neuralsvd_tpu.operators.base import KernelOperator

    B, D, L = 16, 3, 2
    X = rng.normal(size=(B, D)).astype(np.float32)
    W = rng.normal(size=(D, L)).astype(np.float32)
    params = {"W": jnp.asarray(W)}
    nl = NestedLoRA(linear_apply, neigs=L, sequential=True)
    state = nl.init_state(params)
    kernel = lambda a, b: jnp.exp(-jnp.sum((a[:, None] - b[None]) ** 2, -1))
    get_op = lambda landmarks: KernelOperator(kernel, landmarks)
    for split in (False, True):
        loss, grads, aux, _ = nl.loss_and_grad_kernel(
            params, state, jnp.asarray(X), get_op, split_batch=split)
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.asarray(grads["W"])))


def test_neuralef_register_norm_exact_calibration(rng):
    """register_norm sets the normalizer to the exact full-data L2 norms
    (reference: BatchL2NormalizedFunctions.register_norm, utils.py:70-86)."""
    from neuralsvd_tpu.methods.neuralef import NeuralEigenfunctions

    L, D, N = 4, 3, 1000
    W = jnp.asarray(rng.normal(size=(D, L)).astype(np.float32))
    data = rng.normal(size=(N, D)).astype(np.float32)

    m = NeuralEigenfunctions(lambda p, x: x @ p, L)
    state = m.init_state(W)
    state = m.register_norm(W, state, data, batch_size=128)
    expected = np.sqrt(np.mean((data @ np.asarray(W)) ** 2, axis=0))
    np.testing.assert_allclose(np.asarray(state["norm_biased"])[0], expected,
                               rtol=1e-5)
    # eval_fn uses the calibrated norms: unit mean-square output
    out = m.eval_fn(W, state)(jnp.asarray(data))
    np.testing.assert_allclose(np.mean(np.asarray(out) ** 2, axis=0),
                               np.ones(L), rtol=1e-5)


def test_nystrom_recovers_kernel_spectrum(rng, tmp_path):
    """Nystrom on an exactly low-rank kernel recovers eigvals and the
    out-of-sample extension reproduces orthonormal eigenfunctions
    (reference: methods/nystrom.py)."""
    from neuralsvd_tpu.methods.nystrom import Nystrom, run_nystrom

    n, L = 3000, 3
    lam = np.array([2.0, 1.0, 0.5])
    # feature-map kernel k(x, y) = sum_i lam_i phi_i(x) phi_i(y) with
    # phi_i = sqrt(2)*sin(i pi x) orthonormal on [0, 1]
    def feats(x):
        return jnp.sqrt(2.0) * jnp.sin(
            jnp.pi * jnp.arange(1, L + 1) * jnp.asarray(x).reshape(-1, 1))

    def kernel(x, y):
        return (feats(x) * lam) @ feats(y).T

    xs = rng.uniform(0, 1, size=n).astype(np.float32)
    ny = Nystrom(kernel, xs, dim=L)
    np.testing.assert_allclose(np.asarray(ny.eigvals), lam, rtol=0.15)

    xval = np.linspace(0, 1, 1000).astype(np.float32)
    eigvals, eigfuncs, t = run_nystrom(kernel, L, xs, xval,
                                       log_dir=str(tmp_path))
    # out-of-sample eigenfunctions are orthonormal under uniform measure
    G = eigfuncs.T @ eigfuncs / len(xval)
    np.testing.assert_allclose(G, np.eye(L), atol=0.1)
    import os
    assert os.path.exists(os.path.join(tmp_path, "eigvals.npz"))


def test_spin_training_converges_to_top_eigenpairs(rng):
    """SpIN end-to-end on a finite symmetric operator: the dual-channel
    gradient (pi-vjp + EMA'd Jacobian sigma-channel) drives the model to the
    top-L eigenspace, and eval_fn's Cholesky orthonormalization yields
    Rayleigh quotients matching the top eigenvalues (SURVEY §7 hard part)."""
    import optax

    from neuralsvd_tpu.methods.spin import SpIN

    N, L, B = 32, 2, 64
    Q, _ = np.linalg.qr(rng.normal(size=(N, N)))
    lam = np.array([3.0, 2.0] + [0.1] * (N - 2))
    M = ((Q * lam) @ Q.T).astype(np.float32)
    Mj = jnp.asarray(M)

    def apply_fn(F, x):  # x: one-hot state indicators (B, N)
        return x @ F

    def operator(f, x, importance=None):
        return f(x @ Mj.T), f(x)

    method = SpIN(apply_fn, L, decay=0.05)
    F = jnp.asarray(0.1 * rng.normal(size=(N, L)).astype(np.float32))
    state = method.init_state(F)
    opt = optax.adam(1e-2)
    opt_state = opt.init(F)

    @jax.jit
    def step(F, state, opt_state, key):
        idx = jax.random.randint(key, (B,), 0, N)
        x = jax.nn.one_hot(idx, N)
        loss, grads, aux, state = method.loss_and_grad(F, state, x, operator)
        updates, opt_state = opt.update(grads, opt_state, F)
        return optax.apply_updates(F, updates), state, opt_state, loss

    key = jax.random.key(0)
    for _ in range(3000):
        key, sub = jax.random.split(key)
        F, state, opt_state, loss = step(F, state, opt_state, sub)

    phi = np.asarray(method.eval_fn(F, state)(jnp.eye(N)))
    cov = phi.T @ phi / N
    quad = phi.T @ (M @ phi) / N
    rayleigh = np.sort(np.diag(quad) / np.diag(cov))[::-1]
    np.testing.assert_allclose(rayleigh, lam[:L], rtol=0.05)
