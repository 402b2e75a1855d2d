"""Gradient-correctness tests for the NestedLoRA custom-VJP losses.

The backward passes are *intended estimators*, not gradients of the printed
scalar (see ops/nestedlora.py docstring), so tests target the gradients:
1. exact match against independent numpy implementations of the reference
   backward formulas (reference: methods/nestedlora.py:96-111,144-164,308-332);
2. for a self-adjoint (symmetric-kernel) operator, the custom gradient equals
   jax.grad of the naive objective where Tf is recomputed inside;
3. data-parallel shard_map evaluation matches single-device exactly;
4. minimizing the loss on a finite symmetric operator recovers its top-L
   spectrum (the analytic oracle strategy of SURVEY §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from neuralsvd_tpu.ops import (
    joint_nesting_masks,
    nestedlora_cdk_loss,
    nestedlora_evd_loss,
    nestedlora_svd_loss,
    sequential_nesting_masks,
    step_weights,
)


def make_inputs(rng, B=32, L=5, O=None):
    shape = (B, L) if O is None else (B, L, O)
    f = rng.normal(size=shape).astype(np.float32)
    Tf = rng.normal(size=shape).astype(np.float32)
    f1 = rng.normal(size=(B // 2,) + shape[1:]).astype(np.float32)
    f2 = rng.normal(size=(B // 2,) + shape[1:]).astype(np.float32)
    vmask, mmask = joint_nesting_masks(step_weights(L))
    return f, Tf, f1, f2, vmask, mmask


def np_evd_grads(f, Tf, f1, f2, vmask, mmask):
    """Reference backward formulas in numpy (methods/nestedlora.py:96-111).

    numpy einsum cannot contract ellipsis dims absent from the output (torch
    and JAX can), so flatten trailing dims to an explicit 'o' axis.
    """
    r3 = lambda x: x.reshape(x.shape[0], x.shape[1], -1)
    lam_f1 = np.einsum("blo,bmo->lm", r3(f1), r3(f1)) / f1.shape[0]
    lam_f2 = np.einsum("blo,bmo->lm", r3(f2), r3(f2)) / f2.shape[0]
    gf = -(4 / f.shape[0]) * np.einsum("l,blo->blo", vmask, r3(Tf)).reshape(f.shape)
    g1 = (2 / f1.shape[0]) * np.einsum(
        "lm,lm,blo->bmo", mmask, lam_f2, r3(f1)).reshape(f1.shape)
    g2 = (2 / f2.shape[0]) * np.einsum(
        "lm,lm,blo->bmo", mmask, lam_f1, r3(f2)).reshape(f2.shape)
    return gf, g1, g2


@pytest.mark.parametrize("O", [None, 3])
def test_evd_grads_match_reference_formulas(rng, O):
    f, Tf, f1, f2, vmask, mmask = make_inputs(rng, O=O)

    def loss(f, Tf, f1, f2):
        return nestedlora_evd_loss(None, f, Tf, f1, f2, vmask, mmask)

    gf, gTf, g1, g2 = jax.grad(loss, argnums=(0, 1, 2, 3))(f, Tf, f1, f2)
    egf, eg1, eg2 = np_evd_grads(f, Tf, f1, f2, vmask, mmask)
    np.testing.assert_allclose(gf, egf, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gTf, np.zeros_like(Tf))  # no grad through Tf
    np.testing.assert_allclose(g1, eg1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g2, eg2, rtol=1e-5, atol=1e-6)


def test_evd_loss_value(rng):
    f, Tf, f1, f2, vmask, mmask = make_inputs(rng)
    loss = nestedlora_evd_loss(None, f, Tf, f1, f2, vmask, mmask)
    lam1 = np.einsum("bl,bm->lm", f1, f1) / f1.shape[0]
    lam2 = np.einsum("bl,bm->lm", f2, f2) / f2.shape[0]
    expected = (-2 * np.einsum("l,bl,bl->", vmask, f, Tf) / f.shape[0]
                + (mmask * lam1 * lam2).sum())
    np.testing.assert_allclose(loss, expected, rtol=1e-5)


def test_evd_custom_grad_equals_naive_grad_for_symmetric_operator(rng):
    """For Tf = K f / B with symmetric K, the rerouted -4/B·w⊙Tf gradient
    equals jax.grad of the naive objective with Tf recomputed inside.

    Holds only for *joint* nesting (symmetric matrix mask); the sequential
    triu mask deliberately implements masked stop-gradients and differs from
    naive autodiff — that path is covered by the formula test above."""
    B, L, D = 16, 3, 4
    X = rng.normal(size=(B, D)).astype(np.float32)
    K = rng.normal(size=(B, B)).astype(np.float32)
    K = (K + K.T) / 2
    W = rng.normal(size=(D, L)).astype(np.float32)
    vmask, mmask = joint_nesting_masks(step_weights(L))

    def features(W):
        return X @ W  # (B, L)

    def custom_loss(W):
        F = features(W)
        TF = K @ F / B
        f1, f2 = jnp.split(F, 2)
        return nestedlora_evd_loss(None, F, TF, f1, f2, vmask, mmask)

    def naive_loss(W):
        F = features(W)
        TF = K @ F / B
        op = -2 * jnp.einsum("l,bl,bl->", vmask, F, TF) / B
        f1, f2 = jnp.split(F, 2)
        lam1 = f1.T @ f1 / f1.shape[0]
        lam2 = f2.T @ f2 / f2.shape[0]
        return op + jnp.sum(mmask * lam1 * lam2)

    g_custom = jax.grad(custom_loss)(W)
    g_naive = jax.grad(naive_loss)(W)
    np.testing.assert_allclose(g_custom, g_naive, rtol=1e-4, atol=1e-5)


def test_svd_grads_match_reference_formulas(rng):
    B, L = 24, 4
    f = rng.normal(size=(B, L)).astype(np.float32)
    Tg = rng.normal(size=(B, L)).astype(np.float32)
    g = rng.normal(size=(B, L)).astype(np.float32)
    Tadjf = rng.normal(size=(B, L)).astype(np.float32)
    vmask, mmask = sequential_nesting_masks(L)

    def loss(f, Tg, g, Tadjf):
        return nestedlora_svd_loss(None, f, Tg, g, Tadjf, vmask, mmask)

    gf, gTg, gg, gTa = jax.grad(loss, argnums=(0, 1, 2, 3))(f, Tg, g, Tadjf)
    lam_f = np.einsum("bl,bm->lm", f, f) / B
    lam_g = np.einsum("bl,bm->lm", g, g) / B
    exp_gf = (-(2 / B) * np.einsum("l,bl->bl", vmask, Tg)
              + (2 / B) * np.einsum("bi,il,il->bl", f, mmask, lam_g))
    exp_gg = (-(2 / B) * np.einsum("l,bl->bl", vmask, Tadjf)
              + (2 / B) * np.einsum("bi,il,il->bl", g, mmask, lam_f))
    np.testing.assert_allclose(gf, exp_gf, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gg, exp_gg, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gTg, np.zeros_like(Tg))
    np.testing.assert_allclose(gTa, np.zeros_like(Tadjf))


def test_cdk_loss_and_grads(rng):
    B, L = 16, 4
    f = rng.normal(size=(B, L)).astype(np.float32)
    g = rng.normal(size=(B, L)).astype(np.float32)
    vmask, mmask = joint_nesting_masks(step_weights(L), set_first_mode_const=True)

    def loss(f, g):
        out = nestedlora_cdk_loss(None, True, f, g, vmask, mmask, None)
        return out[0]

    # With the constant mode padded, the CDK backward is the true gradient of
    # the naive objective (treating the cross-lam as independent), so compare
    # against jax.grad of the naive computation.
    def naive(f, g):
        ones = jnp.ones((B, 1))
        fp = jnp.concatenate([ones, f], axis=1)
        gp = jnp.concatenate([ones, g], axis=1)
        op = -2 * jnp.einsum("l,bl,bl->", vmask, fp, gp) / B
        lam_f = fp.T @ fp / B
        lam_g = gp.T @ gp / B
        return op + jnp.sum(mmask * lam_f * lam_g)

    gf, gg = jax.grad(loss, argnums=(0, 1))(f, g)
    ngf, ngg = jax.grad(naive, argnums=(0, 1))(f, g)
    np.testing.assert_allclose(gf, ngf, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gg, ngg, rtol=1e-4, atol=1e-5)

    # diagnostics outputs
    out = nestedlora_cdk_loss(None, True, f, g, vmask, mmask, None)
    loss_v, loss_op, loss_met, rs_joint, rs_indep = out
    assert rs_joint.shape == (B,)
    assert rs_indep.shape == (B * (B - 1),)
    np.testing.assert_allclose(loss_v, loss_op + loss_met, rtol=1e-5)


def test_evd_dp_shard_map_matches_single_device(rng):
    """Data-parallel (pmean-reduced) loss and grads == single-device."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("dp",))
    f, Tf, f1, f2, vmask, mmask = make_inputs(rng, B=64, L=4)

    def single(f, Tf, f1, f2):
        return nestedlora_evd_loss(None, f, Tf, f1, f2, vmask, mmask)

    sharded = shard_map(
        lambda f, Tf, f1, f2: nestedlora_evd_loss("dp", f, Tf, f1, f2, vmask, mmask),
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P(),
    )

    np.testing.assert_allclose(
        single(f, Tf, f1, f2), sharded(f, Tf, f1, f2), rtol=1e-5)
    g_single = jax.grad(lambda *a: single(*a), argnums=(0, 2, 3))(f, Tf, f1, f2)
    g_shard = jax.grad(lambda *a: sharded(*a), argnums=(0, 2, 3))(f, Tf, f1, f2)
    for a, b in zip(g_single, g_shard):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_evd_training_recovers_spectrum_of_finite_operator(rng):
    """Direct-parameterization training on a symmetric kernel operator:
    the learned modes' norms and Rayleigh quotients must match the operator
    spectrum, and the modes must be orthogonal (SURVEY §4 oracle test).

    The metric half-batches f1/f2 MUST be fresh iid draws each step (with-
    replacement index batches here).  Splitting a *fixed* grid in halves —
    even with a per-step permutation — makes lam1/lam2 negatively correlated
    (lam1+lam2 is pinned to the full-grid gram), so E[lam1⊙lam2] =
    lam² − Var(lam1): the optimizer can then lower the penalty unboundedly
    by concentrating mass on few points, and training blows up.  This is a
    property of the estimator (reference chunks *fresh* batches,
    methods/nestedlora.py:263), not an implementation bug — see git history.
    """
    import optax

    N, L, Bh, STEPS = 64, 4, 128, 4000
    Q, _ = np.linalg.qr(rng.normal(size=(N, N)))
    target_eigvals = np.array([2.0, 1.5, 1.0, 0.6] + [0.1] * (N - 4))
    M = (Q * target_eigvals) @ Q.T  # symmetric operator matrix, eigvals known
    M = M.astype(np.float32)
    vmask, mmask = sequential_nesting_masks(L)

    F0 = 0.1 * rng.normal(size=(N, L)).astype(np.float32)
    opt = optax.adam(optax.cosine_decay_schedule(5e-2, STEPS))

    @jax.jit
    def step(F, opt_state, key):
        def loss_fn(F):
            TF = M @ F  # exact operator application on the grid
            k1, k2 = jax.random.split(key)
            i1 = jax.random.randint(k1, (Bh,), 0, N)
            i2 = jax.random.randint(k2, (Bh,), 0, N)
            return nestedlora_evd_loss(None, F, TF, F[i1], F[i2],
                                       vmask, mmask)

        loss, grads = jax.value_and_grad(loss_fn)(F)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(F, updates), opt_state, loss

    F, opt_state = F0, opt.init(F0)
    key = jax.random.key(0)
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        F, opt_state, loss = step(F, opt_state, sub)

    F = np.asarray(F)
    cov = F.T @ F / N
    quad = F.T @ (M @ F) / N
    rayleigh = np.diag(quad) / np.diag(cov)
    # operator eigvals under the empirical measure: M's eigvals directly
    np.testing.assert_allclose(sorted(rayleigh, reverse=True),
                               target_eigvals[:L], rtol=1e-2)
    # norm-based estimator (NestedLoRA property): diag(cov) ≈ eigvals
    np.testing.assert_allclose(sorted(np.diag(cov), reverse=True),
                               target_eigvals[:L], rtol=5e-2)
    # orthogonality
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 5e-2


def test_svd_training_recovers_matrix_svd(rng):
    """Direct-parameterization training with the SVD loss on a fixed matrix
    recovers its top singular values and subspaces (the paper's analytical
    -matrix experiments; subspace check via utils.linalg)."""
    import optax

    from neuralsvd_tpu.utils.linalg import subspace_distance

    M, N, L, Bh, STEPS = 48, 40, 3, 96, 4000
    A = rng.normal(size=(M, N)).astype(np.float32) / np.sqrt(M * N)
    U, S, Vt = np.linalg.svd(A)
    # lift the top singular values above the bulk
    S[:L] = np.array([1.5, 1.0, 0.7])
    A = (U[:, :min(M, N)] * S) @ Vt[:min(M, N)]
    A = A.astype(np.float32)
    Aj = jnp.asarray(A)
    vmask, mmask = sequential_nesting_masks(L)

    # f: M-dim left functions, g: N-dim right functions (one value per state,
    # uniform measures; operator T g = A g with measure-consistent scaling)
    F0 = 0.1 * rng.normal(size=(M, L)).astype(np.float32)
    G0 = 0.1 * rng.normal(size=(N, L)).astype(np.float32)
    opt = optax.adam(optax.cosine_decay_schedule(5e-2, STEPS))

    @jax.jit
    def step(FG, opt_state, key):
        def loss_fn(FG):
            F, G = FG
            # kernel k = sqrt(MN)·A under the empirical measures:
            # (Tg)_i = E_j[k_ij g_j] = sqrt(M/N)·(A g)_i, and the operator's
            # singular values then equal A's matrix singular values
            Tg = jnp.sqrt(M / N) * (Aj @ G)
            Tadjf = jnp.sqrt(N / M) * (Aj.T @ F)
            k1, k2 = jax.random.split(key)
            i = jax.random.randint(k1, (Bh,), 0, M)
            j = jax.random.randint(k2, (Bh,), 0, N)
            return nestedlora_svd_loss(None, F[i], Tg[i], G[j], Tadjf[j],
                                       jnp.asarray(vmask), jnp.asarray(mmask))

        loss, grads = jax.value_and_grad(loss_fn)(FG)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(FG, updates), opt_state, loss

    FG, opt_state = (jnp.asarray(F0), jnp.asarray(G0)), opt.init((F0, G0))
    key = jax.random.key(0)
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        FG, opt_state, loss = step(FG, opt_state, sub)

    F, G = map(np.asarray, FG)
    # generalized singular values: s_l = E_i[f_l (Tg)_l] / (|f_l| |g_l|)
    cross = np.sqrt(M / N) * np.einsum("ml,ml->l", F, A @ G) / M
    fn = np.sqrt(np.einsum("ml,ml->l", F, F) / M)
    gn = np.sqrt(np.einsum("nl,nl->l", G, G) / N)
    singvals = np.sort(cross / (fn * gn))[::-1]
    np.testing.assert_allclose(singvals, S[:L], rtol=2e-2)
    # subspace recovery (scaled singular vectors: u_l = U[:, l]·sqrt(M))
    assert subspace_distance(F, U[:, :L]) < 0.05
    assert subspace_distance(G, Vt[:L].T) < 0.05
