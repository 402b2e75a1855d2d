"""Render the reference's headline figure from a trained checkpoint.

The reference repo's flagship artifact is a grid of all learned hydrogen
eigenfunctions (`figs/hydrogen_all.png`, README.md:45, produced by
examples/operator/pde/main.py's eval plotting).  This tool reproduces it
from a `validate_northstar.py` checkpoint (NS_CKPT, orbax resumable
format): it rebuilds the exact architecture from the same NS_* env vars,
loads the EMA params, sorts modes by their learned Rayleigh quotient, and
plots the physical wavefunctions psi = sqrt(w) * f (the model learns the
importance-conjugated eigenfunctions f; diff_ops conjugates the operator
by sqrt(w), so the Lebesgue eigenfunction is recovered by multiplying the
sampling-density square root back in).

Usage:
  NS_NEIGS=36 NS_MIX=... python scripts/plot_hydrogen_modes.py CKPT OUT_DIR \
      [lap_eps] [lim] [grid]

CPU-friendly: evaluation only, no training.  Run with
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
to keep the TPU claim free for training processes.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "float32")

import validate_northstar as ns  # noqa: E402  (reads NS_* env at import)

from neuralsvd_tpu.methods.nestedlora import NestedLoRA  # noqa: E402
from neuralsvd_tpu.training.checkpoint import load_resumable  # noqa: E402
from neuralsvd_tpu.training.optimizers import (  # noqa: E402
    cosine_annealing,
    torch_rmsprop,
)
from neuralsvd_tpu.training.train_state import init_train_state  # noqa: E402
from neuralsvd_tpu.utils.plotting import plot_2d_eigfuncs  # noqa: E402


def main(ckpt, out_dir, lap_eps=-1.0, lim=None, grid=192, eval_rounds=16):
    assert ns.NDIM in (2, 3), "figure tool renders 2D fields (3D: z=0 slice)"
    operator, gt, _, importance, init, apply = ns.build_model(lap_eps)
    params = init(jax.random.key(0))
    # mirror validate_northstar.main()'s method/opt construction exactly —
    # the restore template's pytree structure must match the checkpoint's
    # (multi-method state, per-mode tail-LR optimizer chain)
    if ns.METHOD == "nestedlora":
        method = NestedLoRA(apply, neigs=ns.NEIGS, sequential=ns.SEQUENTIAL)
    else:
        from neuralsvd_tpu.methods.factories import get_evd_method

        opts = {"spin": dict(decay=float(
                    os.environ.get("NS_SPIN_DECAY", "0.05"))),
                "neuralef": dict(unbiased=True,
                                 batchnorm_mode="unbiased")}[ns.METHOD]
        method = get_evd_method(ns.METHOD, apply, ns.NEIGS, **opts)
    # any horizon works for the template: the schedule count's *structure*
    # is what load_resumable needs; values are overwritten by the restore
    opt = torch_rmsprop(cosine_annealing(1e-4, 1), alpha=0.999)
    if ns.TAIL_LR != 1.0:
        import optax

        from neuralsvd_tpu.training.optimizers import per_mode_lr

        scales = np.where(np.arange(ns.NEIGS) >= ns.TAIL_LR_START,
                          ns.TAIL_LR, 1.0).astype(np.float32)
        opt = optax.chain(opt, per_mode_lr(scales, ns.NEIGS))
    ts = init_train_state(params, opt, method)
    loaded = load_resumable(ckpt, ts)
    assert loaded is not None, f"no checkpoint at {ckpt}"
    ts, chunk = loaded
    print(f"loaded {ckpt} at chunk {chunk} ({chunk * ns.CHUNK} iters)")

    # learned spectrum (EMA params) on the training measure -> mode order
    eval_sampler, _ = ns.make_sampling(8192)

    @jax.jit
    def accum(params, key):
        x = eval_sampler(key)
        Tf, f = operator(lambda xx: apply(params, xx), x, importance)
        return (jnp.einsum("bl,bm->lm", f, f),
                jnp.einsum("bl,bm->lm", f, Tf))

    cov = quad = 0.0
    for r in range(eval_rounds):
        c, q = accum(ts.ema_params, jax.random.fold_in(jax.random.key(3), r))
        cov, quad = cov + c, quad + q
    rayleigh = np.asarray(jnp.diag(quad) / jnp.diag(cov))
    # guard modes (NS_EVAL_TOP < NS_NEIGS) train but are excluded from
    # the reported figure, same as the accuracy metrics
    order = np.argsort(rayleigh)[::-1][:ns.EVAL_TOP]
    gt_sorted = np.sort(np.asarray(gt))[::-1][:ns.EVAL_TOP]

    # physical wavefunctions on a uniform grid: psi = sqrt(w) * f
    if lim is None:
        # hydrogenic extent: the outermost shell n peaks near
        # r ~ (n+1/2)^2 (2D) / n^2 (3D) Bohr-like radii; 1.7x frames the
        # full node structure
        n_top = ns._N_SHELLS - 1
        lim = 1.7 * ((n_top + 0.5) ** 2 if ns.NDIM == 2
                     else max(ns._N_SHELLS, 1) ** 2)
    xs = np.linspace(-lim, lim, grid, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs)
    cols = [X.ravel(), Y.ravel()]
    if ns.NDIM == 3:  # z=0 equatorial slice
        cols.append(np.zeros_like(cols[0]))
    pts = jnp.asarray(np.stack(cols, axis=1))
    f_eval = jax.jit(lambda p, x: apply(p, x) * jnp.sqrt(importance(x)))
    psi = np.asarray(f_eval(ts.ema_params, pts))[:, order]
    psi = psi / np.maximum(np.abs(psi).max(axis=0, keepdims=True), 1e-30)

    titles = [f"λ={rayleigh[m]:.2f} ({g:.2f})"
              for m, g in zip(order, gt_sorted)]
    stem = os.path.basename(ckpt.rstrip("/")).split(".")[0]
    tag = f"{stem}_L{ns.EVAL_TOP}_chunk{chunk}"
    path = plot_2d_eigfuncs(
        psi, out_dir, tag=tag, max_modes=ns.EVAL_TOP, titles=titles,
        symmetric=True,
        suptitle=(f"hydrogen {ns.NDIM}D top-{ns.EVAL_TOP} learned "
                  f"eigenfunctions ψ=√w·f"
                  + (", z=0 slice" if ns.NDIM == 3 else "")
                  + f", box ±{lim:.0f} (λ learned vs analytic)"))
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2],
         lap_eps=float(sys.argv[3]) if len(sys.argv) > 3 else -1.0,
         lim=float(sys.argv[4]) if len(sys.argv) > 4 else None,
         grid=int(sys.argv[5]) if len(sys.argv) > 5 else 192)
