import numpy as np

from neuralsvd_tpu.ops.masks import (
    joint_nesting_masks,
    sequential_nesting_masks,
    step_weights,
)


def brute_force_joint_loss(weights, op_terms, metric_terms):
    """Sum of per-prefix LoRA losses, prefix p weighted by weights[p-1].

    Per-prefix loss for prefix length p:
      -2 Σ_{l<p+1} op_terms[l] + Σ_{l,m<p+1} metric_terms[l,m]
    """
    L = len(weights)
    total = 0.0
    for p in range(1, L + 1):
        w = weights[p - 1]
        total += w * (-2 * op_terms[:p].sum() + metric_terms[:p, :p].sum())
    return total


def masked_loss(vmask, mmask, op_terms, metric_terms):
    return -2 * (vmask * op_terms).sum() + (mmask * metric_terms).sum()


def test_joint_masks_equal_brute_force_prefix_sum(rng):
    L = 7
    weights = rng.random(L)
    weights /= weights.sum()
    op_terms = rng.normal(size=L)
    metric_terms = rng.normal(size=(L, L))
    vmask, mmask = joint_nesting_masks(weights)
    np.testing.assert_allclose(
        masked_loss(vmask, mmask, op_terms, metric_terms),
        brute_force_joint_loss(weights, op_terms, metric_terms),
        rtol=1e-6,
    )


def test_joint_masks_shapes_and_values():
    w = np.array([0.25, 0.25, 0.5])
    vmask, mmask = joint_nesting_masks(w)
    np.testing.assert_allclose(vmask, [1.0, 0.75, 0.5])
    np.testing.assert_allclose(mmask, np.minimum.outer(vmask, vmask))


def test_joint_masks_const_first_mode():
    w = np.array([0.5, 0.5])
    vmask, mmask = joint_nesting_masks(w, set_first_mode_const=True)
    assert vmask.shape == (3,)
    np.testing.assert_allclose(vmask, [1.0, 1.0, 0.5])
    assert mmask.shape == (3, 3)


def test_sequential_masks():
    vmask, mmask = sequential_nesting_masks(4)
    np.testing.assert_allclose(vmask, np.ones(4))
    np.testing.assert_allclose(mmask, np.triu(np.ones((4, 4))))
    vmask, mmask = sequential_nesting_masks(4, set_first_mode_const=True)
    assert vmask.shape == (5,)


def test_step_weights():
    w = step_weights(6, step=2)
    # prefixes end at 2, 4, 6
    np.testing.assert_allclose(w, np.array([0, 1, 0, 1, 0, 1]) / 3)
    w = step_weights(5, step=2)
    # prefixes end at 2, 4, 5
    np.testing.assert_allclose(w, np.array([0, 1, 0, 1, 1]) / 3)
    w = step_weights(4, step=1)
    np.testing.assert_allclose(w, np.full(4, 0.25))
