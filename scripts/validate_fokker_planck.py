"""Fokker–Planck measured validation (VERDICT r3 item 7) — CPU-runnable.

The reference only knows the ground state of its FP problems: lambda_0 = 0,
the Gibbs stationary density (examples/operator/pde/problems.py:114,
ground_truth_spectrum = [0, 0, ...]).  Here we go further: on the periodic
domain [-pi, pi]^d the linear FP operator

    L f = lap f + grad V . grad f + f lap V,     V(x) = sin(sum_i c_i cos x_i)

is exactly diagonalizable by finite differences (1D dense, 2D dense on a
coarser grid — L is non-self-adjoint in L^2(dx) but similar to a
self-adjoint operator in L^2(e^{V} dx), so its spectrum is real with
lambda_0 = 0 and lambda_k < 0).  That turns the never-measured problem type
into a multi-eigenvalue validation.

Trains NeuralSVD through the shipped CLI config (reference FP protocol:
deterministic Fourier features, uniform sampling, exact Laplacian) and
reports per-mode Rayleigh rel-errs vs the FD spectrum plus orthogonality.

Usage: [JAX_PLATFORMS=cpu] python scripts/validate_fokker_planck.py
           [iters_1d] [iters_2d]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.environ.get("NS_FP_OUT", "log/r4/fp")


def fd_fp_spectrum_1d(cs=(1.0,), n=2048, k=6):
    """Top-k eigenvalues of L on [-pi, pi) by dense periodic FD."""
    h = 2 * np.pi / n
    x = -np.pi + h * np.arange(n)
    V = np.sin(np.sum([c * np.cos(x) for c in cs], axis=0))
    # spectral-accurate potential derivatives (analytic): V = sin(c cos x)
    c = cs[0]
    Vp = np.cos(c * np.cos(x)) * (-c * np.sin(x))
    Vpp = (-np.sin(c * np.cos(x)) * (c * np.sin(x)) ** 2
           + np.cos(c * np.cos(x)) * (-c * np.cos(x)))
    del V
    D1 = (np.diag(np.ones(n - 1), 1) - np.diag(np.ones(n - 1), -1)) / (2 * h)
    D1[0, -1], D1[-1, 0] = -1 / (2 * h), 1 / (2 * h)
    D2 = (np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
          - 2 * np.eye(n)) / h**2
    D2[0, -1] = D2[-1, 0] = 1 / h**2
    Lmat = D2 + np.diag(Vp) @ D1 + np.diag(Vpp)
    ev = np.linalg.eigvals(Lmat)
    ev = np.sort(ev.real)[::-1]
    return ev[:k]


def fd_fp_spectrum_2d(cs=(1.0, 1.0), n=48, k=6):
    """Top-k eigenvalues of the 2D L by sparse periodic FD (n^2 grid)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    h = 2 * np.pi / n
    x = -np.pi + h * np.arange(n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    cx, cy = cs
    s = cx * np.cos(X) + cy * np.cos(Y)
    # V = sin(s); dV/dx = cos(s)(-cx sin X); lap V = -sin(s)((cx sinX)^2 +
    # (cy sinY)^2) - cos(s)(cx cosX + cy cosY)
    Vx = np.cos(s) * (-cx * np.sin(X))
    Vy = np.cos(s) * (-cy * np.sin(Y))
    lapV = (-np.sin(s) * ((cx * np.sin(X)) ** 2 + (cy * np.sin(Y)) ** 2)
            - np.cos(s) * (cx * np.cos(X) + cy * np.cos(Y)))

    e = np.ones(n)
    d1 = sp.diags([-e[:-1], e[:-1]], [-1, 1], (n, n), format="lil") / (2 * h)
    d1[0, -1], d1[-1, 0] = -1 / (2 * h), 1 / (2 * h)
    d2 = sp.diags([e[:-1], -2 * e, e[:-1]], [-1, 0, 1], (n, n),
                  format="lil") / h**2
    d2[0, -1] = d2[-1, 0] = 1 / h**2
    eye = sp.identity(n)
    D1x = sp.kron(d1.tocsr(), eye)
    D1y = sp.kron(eye, d1.tocsr())
    Lap = sp.kron(d2.tocsr(), eye) + sp.kron(eye, d2.tocsr())
    Lmat = (Lap + sp.diags(Vx.ravel()) @ D1x + sp.diags(Vy.ravel()) @ D1y
            + sp.diags(lapV.ravel()))
    # spectrum <= 0: top-k = closest to +1 shift, use shift-invert at 1.0
    ev = spla.eigs(Lmat.tocsc(), k=k, sigma=1.0, which="LM",
                   return_eigenvectors=False)
    return np.sort(ev.real)[::-1]


def train_fp(ndim, neigs, iters, shift, seed=0):
    """Reference FP protocol through the shipped CLI (cli/pde.py main)."""
    from neuralsvd_tpu.cli.pde import main
    from neuralsvd_tpu.utils.config import PDEConfig

    cfg = PDEConfig(
        log_dir=os.path.join(OUT, f"fp{ndim}d"), overwrite=True, seed=seed,
        problem="fp", ndim=ndim, neigs=neigs,
        operator_scale=1.0, operator_shift=shift, laplacian_eps=-1.0,
        lim=float(np.pi),
        mlp_hidden_dims="64,64,64", nonlinearity="softplus", parallel=True,
        use_fourier_feature=True, fourier_deterministic=True,
        fourier_mapping_size=16 * ndim, fourier_scale=1.0,
        apply_boundary=False,
        sampling_mode="uniform", sampling_scale=float(np.pi),
        batch_size=512, val_mc_size=16384,
        optimizer="adam", lr=1e-3, use_lr_scheduler=True,
        num_iters=iters, print_freq=max(iters // 10, 1), eval_freq=iters,
        loss=None)
    ts, all_eigvals, report = main(cfg)
    return ts, all_eigvals, report


def main():
    iters1 = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    iters2 = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    os.makedirs(OUT, exist_ok=True)
    results = {}
    for ndim, iters, fd in ((1, iters1, fd_fp_spectrum_1d),
                            (2, iters2, fd_fp_spectrum_2d)):
        gt = fd(k=6)
        assert abs(gt[0]) < 1e-6, f"FD ground state must be 0, got {gt[0]}"
        shift = float(np.ceil(-gt[5] + 1.0))  # make top-6 positive
        neigs = 6
        ts, all_eigvals, report = train_fp(ndim, neigs, iters, shift)
        learned = np.sort(np.asarray(all_eigvals[-1]))[::-1][:neigs]
        target = gt + shift
        rel = np.abs(learned - target) / np.maximum(np.abs(target), 1e-12)
        lam0 = learned[0] - shift  # reference's only known truth: 0
        results[f"fp{ndim}d"] = {
            "fd_eigvals": [round(float(v), 6) for v in gt],
            "learned_minus_shift": [round(float(v) - shift, 6)
                                    for v in learned],
            "rel_err_vs_fd": [round(float(v), 6) for v in rel],
            "lambda0_abs_err": round(float(abs(lam0)), 8),
            "max_off_corr": report.get("max_off_corr"),
            "iters": iters, "shift": shift,
        }
        print(f"[fp{ndim}d] fd:      {np.round(gt, 5)}")
        print(f"[fp{ndim}d] learned: {np.round(learned - shift, 5)}")
        print(f"[fp{ndim}d] rel:     {np.round(rel, 6)}", flush=True)
    print(json.dumps({
        "metric": "fokker_planck_sin_of_cos_max_rel_err_vs_fd",
        "value": max(max(r["rel_err_vs_fd"]) for r in results.values()),
        "unit": "rel_err",
        "detail": results,
    }))


if __name__ == "__main__":
    main()
