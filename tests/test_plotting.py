"""Plot artifact smoke tests: every plotting entry point writes its file."""
import os

import numpy as np

from neuralsvd_tpu.utils.plotting import (
    Plotter,
    plot_1d_eigfuncs,
    plot_2d_eigfuncs,
    plot_and_save_spectrum,
    plot_hist_ratios,
    term_plot_spectrum,
)


def test_spectrum_plot_artifacts(tmp_path, rng):
    L = 4
    cov = np.eye(L) + 0.01 * rng.normal(size=(L, L))
    spectrum = {"RQ": np.array([4.0, 3.0, 2.0, 1.0]),
                "Norms^2": np.array([4.1, 2.9, 2.1, 0.9])}
    plot_and_save_spectrum(spectrum, cov,
                           ground_truth_spectrum=np.array([4, 3, 2, 1.0]),
                           log_dir=str(tmp_path), tag="t0")
    files = os.listdir(tmp_path)
    assert any(f.endswith(".png") for f in files), files


def test_eigfunc_plots(tmp_path, rng):
    x = np.linspace(-1, 1, 64).reshape(-1, 1)
    fs = np.stack([np.sin(np.pi * k * x[:, 0]) for k in (1, 2)], axis=1)
    plot_1d_eigfuncs(x, fs, str(tmp_path), tag="a")
    grid = rng.normal(size=(64 * 64, 3)).astype(np.float32)
    plot_2d_eigfuncs(grid, str(tmp_path), tag="b")
    # signed-field mode: symmetric per-panel scale + λ titles (figure tool path)
    path = plot_2d_eigfuncs(grid, str(tmp_path), tag="c", symmetric=True,
                            titles=[f"λ={v}" for v in (3, 2, 1)],
                            suptitle="smoke")
    assert os.path.exists(path)
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) >= 3


def test_ratio_histogram(tmp_path, rng):
    plot_hist_ratios(rng.normal(size=200) + 2, rng.normal(size=2000),
                     str(tmp_path), tag="r")
    assert any("ratio" in f for f in os.listdir(tmp_path))


def test_term_plot_does_not_crash():
    out = term_plot_spectrum({"RQ": np.array([3.0, 2.0, 1.0]),
                              "analytic": np.array([3.1, 2.1, 0.9])})
    assert out is None or isinstance(out, str)


def test_plotter_accumulates(tmp_path):
    p = Plotter()
    for i in range(5):
        p.update(i, loss=1.0 / (i + 1), lr=1e-3 * (5 - i))
    out = p.save(os.path.join(tmp_path, "curves.png"))
    assert os.path.exists(out)


def test_term_plot_spectrum_nonfinite():
    """NaN/Inf eigenvalues (under-trained or collapsed modes) must clip
    to the plot edges, not crash the training log mid-run."""
    import numpy as np

    from neuralsvd_tpu.utils.plotting import term_plot_spectrum

    out = term_plot_spectrum({"eigs": np.array([1.0, np.nan, 3.0, -np.inf]),
                              "allbad": np.array([np.nan, np.inf])})
    assert "eigs" in out and "*" in out
    assert "non-finite" in out
