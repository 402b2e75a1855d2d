"""Sequential-nesting prefix independence (the guard-mode invariant).

Measured round-3 fact (BASELINE "Guard-mode mechanics"): under sequential
nesting with per-mode ParallelMLP towers, mode k's training dynamics
depend only on modes <= k — training L+G modes leaves the first L towers
BIT-IDENTICAL to training L modes with the same seeds.  This pins the
whole chain at once: per-mode init key splitting, the sequential masks'
stop-gradient structure (ops/masks.py), the custom-vjp routing, and the
train step's per-mode optimizer updates.  A regression here means guard
modes (NS_EVAL_TOP) silently change the flagship's reported physics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralsvd_tpu.methods.nestedlora import NestedLoRA
from neuralsvd_tpu.models import make_wavefunctions
from neuralsvd_tpu.operators.problems import get_problem
from neuralsvd_tpu.training.train_operator import make_train_step
from neuralsvd_tpu.training.train_state import init_train_state


def _train(neigs, steps=8):
    init, apply = make_wavefunctions(
        ndim=2, neigs=neigs, mlp_hidden_dims=[8, 8],
        nonlinearity="softplus", parallel=True, apply_boundary=False,
        apply_exp_mask=True, exp_mask_init_scale=5.0, lim=4.0)
    params = init(jax.random.key(0))
    op, _, _ = get_problem(problem="sch",
                           potential_type="harmonic_oscillator", ndim=2,
                           neigs=neigs, laplacian_eps=-1.0,
                           operator_shift=12.0)
    method = NestedLoRA(apply, neigs=neigs, sequential=True)
    optimizer = optax.adam(1e-3)
    sampler = lambda key: 2.0 * jax.random.normal(
        jax.random.fold_in(key, 3), (32, 2))
    step = jax.jit(make_train_step(method, op, optimizer, sampler))
    ts = init_train_state(params, optimizer, method)
    for i in range(steps):
        ts, _ = step(ts, jax.random.key(100 + i))
    return ts.params


def test_sequential_guard_modes_leave_prefix_towers_bit_identical():
    pa = _train(neigs=4)
    pb = _train(neigs=7)  # 3 guard modes

    def mode_slices(p):
        # ParallelMLP weights lead with the mode axis (L, ...); per-mode
        # exp-mask scales are (L,)-shaped leaves
        return [np.asarray(w)[:4] for w in jax.tree.leaves(p)
                if hasattr(w, "shape") and w.shape and w.shape[0] in (4, 7)]

    sa, sb = mode_slices(pa), mode_slices(pb)
    assert sa and len(sa) == len(sb)
    for a, b in zip(sa, sb):
        np.testing.assert_array_equal(a, b)


def test_joint_nesting_guard_modes_do_change_prefix():
    """Control: under JOINT nesting every prefix loss feeds every mode,
    so guards MUST perturb the first-L towers — if this ever passes as
    equal, the joint masks have degenerated into sequential ones."""

    def train(neigs):
        init, apply = make_wavefunctions(
            ndim=2, neigs=neigs, mlp_hidden_dims=[8, 8],
            nonlinearity="softplus", parallel=True, apply_boundary=False,
            apply_exp_mask=True, exp_mask_init_scale=5.0, lim=4.0)
        params = init(jax.random.key(0))
        op, _, _ = get_problem(problem="sch",
                               potential_type="harmonic_oscillator",
                               ndim=2, neigs=neigs, laplacian_eps=-1.0,
                               operator_shift=12.0)
        method = NestedLoRA(apply, neigs=neigs, sequential=False, step=1)
        optimizer = optax.adam(1e-3)
        sampler = lambda key: 2.0 * jax.random.normal(
            jax.random.fold_in(key, 3), (32, 2))
        step = jax.jit(make_train_step(method, op, optimizer, sampler))
        ts = init_train_state(params, optimizer, method)
        for i in range(8):
            ts, _ = step(ts, jax.random.key(100 + i))
        return ts.params

    pa, pb = train(4), train(7)
    leaves_a = [np.asarray(w) for w in jax.tree.leaves(pa)
                if hasattr(w, "shape") and w.shape and w.shape[0] == 4]
    leaves_b = [np.asarray(w)[:4] for w in jax.tree.leaves(pb)
                if hasattr(w, "shape") and w.shape and w.shape[0] == 7]
    diff = max(np.abs(a - b).max() for a, b in zip(leaves_a, leaves_b))
    assert diff > 0, "joint nesting became prefix-independent"
