"""Analytic-oracle self-consistency: hyperspherical harmonics + spectra."""
import numpy as np
import pytest

from neuralsvd_tpu.operators.ground_truths import (
    HarmonicOscillator,
    Hydrogen2D,
    Hydrogen3D,
    InfiniteWell2D,
    cartesian_to_polar,
    cartesian_to_spherical,
    real_sph_harm,
    real_sph_harm_3d,
    sph_harm,
)


def s2_grid(n_th=80, n_phi=160):
    th = np.linspace(0, np.pi, n_th + 1)[:-1] + np.pi / (2 * n_th)
    phi = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    TH, PHI = np.meshgrid(th, phi, indexing="ij")
    w = np.sin(TH) * (np.pi / n_th) * (2 * np.pi / n_phi)
    return TH.ravel(), PHI.ravel(), w.ravel()


@pytest.mark.parametrize("m,l", [(0, 0), (0, 1), (1, 1), (-1, 2), (2, 3)])
def test_real_sph_harm_matches_3d_special_case(m, l):
    """For D=3 the hyperspherical real harmonics agree with the classical
    real Y_lm up to the sin/cos labeling of the ±m pair (the two conventions
    assign opposite trig factors to positive first-order); compare against
    the best-matching member of the ±m pair, up to sign."""
    th, phi, w = s2_grid(40, 80)
    ours = real_sph_harm(np.array([m, l]), np.stack([phi, th]))
    candidates = [real_sph_harm_3d(mm, l, th, phi) for mm in {m, -m}]
    overlaps = [abs(np.sum(w * ours * c)) for c in candidates]
    best = candidates[int(np.argmax(overlaps))]
    sign = np.sign(np.sum(w * ours * best)) or 1.0
    np.testing.assert_allclose(ours, sign * best, rtol=1e-6, atol=1e-8)


def test_sph_harm_orthonormal_on_s2():
    th, phi, w = s2_grid()
    ells_list = [(0, 0), (0, 1), (1, 1), (-1, 1), (0, 2), (2, 2)]
    ys = [real_sph_harm(np.array(e), np.stack([phi, th])) for e in ells_list]
    G = np.array([[np.sum(w * yi * yj) for yj in ys] for yi in ys])
    np.testing.assert_allclose(G, np.eye(len(ys)), atol=5e-3)


def test_sph_harm_orthonormal_on_s3():
    """D=4: measure dθ₁·sinθ₂dθ₂·sin²θ₃dθ₃ over (azimuth, polar, polar)."""
    n1, n2, n3 = 24, 24, 24
    t1 = np.linspace(0, 2 * np.pi, n1, endpoint=False)
    t2 = np.linspace(0, np.pi, n2 + 1)[:-1] + np.pi / (2 * n2)
    t3 = np.linspace(0, np.pi, n3 + 1)[:-1] + np.pi / (2 * n3)
    T1, T2, T3 = np.meshgrid(t1, t2, t3, indexing="ij")
    w = (np.sin(T2) * np.sin(T3) ** 2
         * (2 * np.pi / n1) * (np.pi / n2) * (np.pi / n3)).ravel()
    ths = np.stack([T1.ravel(), T2.ravel(), T3.ravel()])
    ells_list = [(0, 0, 0), (0, 0, 1), (0, 1, 1), (1, 1, 1), (0, 1, 2)]
    ys = [sph_harm(np.array(e), ths) for e in ells_list]
    G = np.array([[np.sum(w * yi * np.conj(yj)).real for yj in ys]
                  for yi in ys])
    np.testing.assert_allclose(G, np.eye(len(ys)), atol=5e-3)


def test_hydrogen2d_spectrum_and_degeneracy():
    h = Hydrogen2D(charge=1.0)
    e = h.get_eigvals(9)
    np.testing.assert_allclose(e[:1], [-1.0])          # n=0: -1/(4·(1/2)²)
    np.testing.assert_allclose(e[1:4], [-1 / 9] * 3)   # n=1 triple
    np.testing.assert_allclose(e[4:9], [-1 / 25] * 5)  # n=2 quintuple
    np.testing.assert_allclose(h.get_degeneracy(9), [1, 4, 9])


def test_hydrogen3d_spectrum():
    h = Hydrogen3D(charge=1.0)
    e = h.get_eigvals(5)
    np.testing.assert_allclose(e, [-0.25] + [-1 / 16] * 4)


def test_oscillator_spectrum_2d():
    osc = HarmonicOscillator(k=1.0, ndim=2)
    np.testing.assert_allclose(osc.get_eigvals(6), [2, 4, 4, 6, 6, 6])


def test_infinite_well_eigfuncs_orthonormal():
    well = InfiniteWell2D(L=1.0)
    x = np.linspace(0, 1, 400, endpoint=False) + 1 / 800
    X, Y = np.meshgrid(x, x, indexing="ij")
    w = (1 / 400) ** 2
    fs = [well.eigfunc(nx, ny, X, Y).ravel()
          for nx, ny in [(1, 1), (1, 2), (2, 1), (2, 2)]]
    G = np.array([[np.sum(fi * fj) * w for fj in fs] for fi in fs])
    np.testing.assert_allclose(G, np.eye(4), atol=1e-3)


def test_oscillator_eigfunc_satisfies_schrodinger_eq():
    """-f'' + x²f = E f pointwise for the 1D Hermite functions."""
    osc = HarmonicOscillator(k=1.0, ndim=2)
    x = np.linspace(-3, 3, 2001)
    dx = x[1] - x[0]
    for n in (0, 1, 3):
        f = osc._eigfunc_1d(n, x)
        lap = (f[2:] + f[:-2] - 2 * f[1:-1]) / dx ** 2
        lhs = -lap + x[1:-1] ** 2 * f[1:-1]
        np.testing.assert_allclose(lhs, (2 * n + 1) * f[1:-1], atol=1e-3)


def test_coordinate_transforms_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.normal(size=(2, 100))
    r, th = cartesian_to_polar(*xy)
    np.testing.assert_allclose(r * np.cos(th), xy[0], atol=1e-12)
    np.testing.assert_allclose(r * np.sin(th), xy[1], atol=1e-12)
    xyz = rng.normal(size=(3, 100))
    r, th, phi = cartesian_to_spherical(*xyz)
    np.testing.assert_allclose(r * np.sin(th) * np.cos(phi), xyz[0], atol=1e-12)
    np.testing.assert_allclose(r * np.sin(th) * np.sin(phi), xyz[1], atol=1e-12)
    np.testing.assert_allclose(r * np.cos(th), xyz[2], atol=1e-12)


def test_cosine2d_guard_modes_truncate_literature_table():
    """neigs > 25 (guard modes) must not crash the cosine-2D registry.

    Han-Lu-Zhou publish 25 eigenvalues; the guard-mode protocol trains
    extra sacrificial modes and reports the eigval-sorted top 25, so the
    registry truncates the plot-only ground truth instead of asserting
    (regression: r5 follow-up queue step died on `assert neigs <= 25`).
    """
    from neuralsvd_tpu.operators.problems import get_problem
    op, gt, _ = get_problem(problem="sch", potential_type="cosine",
                            ndim=2, neigs=27, laplacian_eps=-1.0)
    assert gt.shape == (25,)
    op25, gt25, _ = get_problem(problem="sch", potential_type="cosine",
                                ndim=2, neigs=25, laplacian_eps=-1.0)
    np.testing.assert_array_equal(gt, gt25)
