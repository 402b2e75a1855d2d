"""Fokker–Planck measured-path tests (VERDICT r3 item 7).

The FD diagonalization in scripts/validate_fokker_planck.py is the ground
truth generator for the only problem family the reference ships without a
known spectrum (examples/operator/pde/problems.py:114 knows lambda_0 = 0
only).  Lock its invariants + one micro end-to-end train."""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from validate_fokker_planck import (  # noqa: E402
    fd_fp_spectrum_1d,
    fd_fp_spectrum_2d,
    fd_fp_spectrum_2d_rich,
)


def test_fd_spectrum_1d_invariants():
    ev = fd_fp_spectrum_1d(n=1024, k=7)
    # stationary Gibbs density: lambda_0 = 0 exactly (up to FD error)
    assert abs(ev[0]) < 1e-5
    # rest of the spectrum strictly negative, sorted descending
    assert (ev[1:] < -0.5).all()
    assert (np.diff(ev) <= 1e-9).all()
    # V(x) = sin(cos x) is even around x=0: non-ground eigvals pair up
    np.testing.assert_allclose(ev[1], ev[2], rtol=1e-5)
    np.testing.assert_allclose(ev[3], ev[4], rtol=1e-5)
    # grid convergence: n=1024 vs n=2048 agree to ~h^2
    ev2 = fd_fp_spectrum_1d(n=2048, k=7)
    np.testing.assert_allclose(ev, ev2, atol=5e-4)


def test_fd_spectrum_2d_richardson():
    ev48 = fd_fp_spectrum_2d(n=48, k=6)
    rich = fd_fp_spectrum_2d_rich(k=6)
    # extrapolation moves the ground state closer to its exact value 0
    assert abs(rich[0]) < abs(ev48[0])
    assert abs(rich[0]) < 2e-4
    # the symmetric pair (cs = (1, 1) swaps x<->y) stays a pair
    np.testing.assert_allclose(rich[1], rich[2], rtol=1e-4)


def test_fp_micro_train_ground_state():
    """500 iterations must already pin the Gibbs ground state (the
    reference's only known truth) to ~1e-3 of the shift scale."""
    from validate_fokker_planck import train_fp

    gt = fd_fp_spectrum_1d(n=1024, k=5)
    gt[0] = 0.0
    shift = float(np.ceil(-gt[4] + 1.0))
    rep = train_fp(1, 5, 500, shift, [1, 2, 2], gt + shift, seed=1)
    lam0 = rep["rayleigh"][0] - shift
    assert abs(lam0) / shift < 5e-3, rep["rayleigh"]
    assert np.isfinite(rep["rayleigh"]).all()


def test_fp_micro_train_levers_path():
    """NS_FP_LEVERS wiring (tail-LR chain + rescue hook) trains and
    evaluates; at 1500 iters the rescue fires at 300-interval boundaries
    only when iters//5 >= chunk, so here it exercises the per-mode LR
    chain + the no-rescue guard without a full rescue cycle."""
    from validate_fokker_planck import train_fp

    gt = fd_fp_spectrum_1d(n=1024, k=5)
    gt[0] = 0.0
    shift = float(np.ceil(-gt[4] + 1.0))
    rep = train_fp(1, 6, 500, shift, [1, 2, 2], gt + shift, seed=1,
                   levers=True)
    lam0 = rep["rayleigh"][0] - shift
    assert abs(lam0) / shift < 5e-3, rep["rayleigh"]
    assert np.isfinite(rep["rayleigh"]).all()
