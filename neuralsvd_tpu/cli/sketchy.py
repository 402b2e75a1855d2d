"""Sketchy CDK training: python -m neuralsvd_tpu.cli.sketchy [flags].

Two-tower training on precomputed VGG features with the NestedLoRA CDK
loss, per-epoch retrieval eval (P@K / mAP) on test+valid, best-checkpoint
by valid P@K, resumable per-epoch checkpoints, spectrum/orthogonality
check, density-ratio histograms, and the final truncated-dimension sweep
with a random-permutation control.

Reference: examples/cdk/sketchy/main_sketchy.py.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralsvd_tpu.data.sketchy import SketchyVGGDataLoader
from neuralsvd_tpu.eval.retrieval import Retrieval
from neuralsvd_tpu.methods.factories import get_cdk_method
from neuralsvd_tpu.methods.spectrum import compute_spectrum_svd
from neuralsvd_tpu.models.mlp import parse_dims
from neuralsvd_tpu.models.two_tower import make_hetero_network
from neuralsvd_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from neuralsvd_tpu.training.optimizers import (
    build_optimizer,
    warmup_cosine_schedule,
)
from neuralsvd_tpu.utils.logging import CSVLogger
from neuralsvd_tpu.utils.plotting import plot_and_save_spectrum, plot_hist_ratios

log = logging.getLogger("neuralsvd_tpu.sketchy")


def get_args(argv=None):
    p = argparse.ArgumentParser("Sketchy CDK retrieval")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_dir", type=str, default="./log/sketchy")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--root_dir", type=str, default="~")
    p.add_argument("--sketchy_split", type=str, default="1")
    p.add_argument("--metric", type=str, default="inner_product",
                   choices=["euclidean", "inner_product"])
    p.add_argument("--n_retrievals", type=int, default=100)
    p.add_argument("--n_retrievals_to_save", type=int, default=0)
    p.add_argument("--ap_ver", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--trunc_dims", nargs="*", type=int, default=[])
    p.add_argument("--randperm", action="store_true")
    p.add_argument("--return_map_all", action="store_true")
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--resume", action="store_true")
    # optimizer
    p.add_argument("--optimizer", default="sgd",
                   choices=["adam", "adamw", "sgd", "lars"])
    p.add_argument("--momentum", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--base_lr", type=float, default=5e-3)
    p.add_argument("--final_lr", type=float, default=0.0)
    p.add_argument("--warmup_lr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=int, default=0)
    p.add_argument("--use_lr_scheduler", action="store_true")
    p.add_argument("--grad_clip", type=float, default=0.0)
    # model
    p.add_argument("--network_dims", type=str, default="8192,512")
    p.add_argument("--activation", type=str, default="lrelu0.2")
    p.add_argument("--mu", type=float, default=16.0)
    p.add_argument("--regularize_mode", type=str, default="l2_ball",
                   choices=["l2_ball", "l2_sphere", "clip", "tanh"])
    # TPU AMP analog: bf16 tower matmuls, f32 master weights/Grams
    # (reference uses CUDA AMP autocast, main_sketchy.py:194-207)
    p.add_argument("--compute_dtype", type=str, default="f32",
                   choices=["f32", "bf16"])
    # loss
    p.add_argument("--neigs", type=int, default=512)
    p.add_argument("--loss", dest="loss_name", default="neuralsvd")
    p.add_argument("--neuralsvd.step", dest="nsvd_step", type=int, default=1)
    p.add_argument("--neuralsvd.sequential", dest="nsvd_sequential",
                   action="store_true")
    p.add_argument("--neuralsvd.set_first_mode_const", dest="nsvd_const",
                   type=lambda v: str(v).lower() in ("1", "true"),
                   default=True)
    p.add_argument("--use_pallas", type=str, default="auto",
                   choices=["auto", "true", "false"])
    # parallelism: "" single device; "dp"/"dp=N" shard_map data-parallel;
    # "dp=N,tp=M" GSPMD with the mode axis (tower output L) tp-sharded
    p.add_argument("--mesh", type=str, default="")
    return p.parse_args(argv)


def make_cdk_train_step(method, optimizer, grad_clip: float = 0.0,
                        jit: bool = True):
    """Jitted CDK step with nan/inf grad skipping (reference:
    main_sketchy.py:194-207 counts AMP skips; here any non-finite update is
    dropped and counted).

    The density-ratio diagnostics rs_joint/rs_indep are dropped from the
    returned aux: they require the full (B, B) f(x)ᵀg(y) gram (~16x the
    rest of the loss's FLOPs at B=2048, 67 MB at the paper's B=4096) but
    feed only a once-per-epoch histogram — excluding them from the jitted
    outputs lets XLA dead-code-eliminate the gram from the hot step
    entirely.  Use :func:`make_density_ratio_fn` for the periodic
    diagnostic."""

    def step(params, opt_state, method_state, x, y, skip_count):
        loss, grads, aux, method_state = method.loss_and_grad(
            params, method_state, x, y)
        aux = {k: v for k, v in aux.items() if not k.startswith("rs_")}
        if grad_clip > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda old, new: jnp.where(finite, new, old),
                              params, new_params)
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(finite, new, old)
            if hasattr(old, "shape") else new,
            opt_state, new_opt_state)
        skip_count = skip_count + jnp.where(finite, 0, 1)
        return params, opt_state, method_state, loss, aux, skip_count

    return jax.jit(step) if jit else step


def make_density_ratio_fn(apply_fn, set_first_mode_const: bool):
    """Once-per-epoch density-ratio diagnostic: (params, x, y) ->
    (rs_joint, rs_indep), the diagonal / off-diagonal of the (B, B)
    f(x)ᵀg(y) gram (reference: methods/nestedlora.py:303-306)."""
    from neuralsvd_tpu.ops.gram import off_diagonal

    @jax.jit
    def rs(params, x, y):
        fx, gy = apply_fn(params, x, y)
        if set_first_mode_const:
            ones = jnp.ones((fx.shape[0], 1), fx.dtype)
            fx = jnp.concatenate([ones, fx], axis=1)
            gy = jnp.concatenate([ones, gy], axis=1)
        gram = jnp.einsum("bl,cl->bc", fx, gy)
        return jnp.diagonal(gram), off_diagonal(gram)

    return rs


def main(args):
    jax.config.update("jax_default_matmul_precision", "float32")
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.log_dir, exist_ok=True)

    train_loader = SketchyVGGDataLoader(args.batch_size, root_path=args.root_dir,
                                        split=args.sketchy_split,
                                        train_or_test="train", seed=args.seed)
    test_loader = SketchyVGGDataLoader(args.batch_size, root_path=args.root_dir,
                                       split=args.sketchy_split,
                                       train_or_test="test")
    valid_loader = SketchyVGGDataLoader(args.batch_size, root_path=args.root_dir,
                                        split=args.sketchy_split,
                                        train_or_test="valid")
    run_training(args, train_loader, test_loader, valid_loader,
                 input_dim=train_loader.sketch_features.shape[1])


def run_training(args, train_loader, test_loader, valid_loader, input_dim):
    """Shared driver (also used by tests with synthetic loaders)."""
    net_dims = parse_dims(args.network_dims)
    init, apply, apply_single = make_hetero_network(
        input_dim=input_dim, network_dims=net_dims,
        nonlinearity=args.activation, mu=args.mu,
        regularize_mode=args.regularize_mode,
        compute_dtype=(jnp.bfloat16
                       if getattr(args, "compute_dtype", "f32") == "bf16"
                       else None))
    params = init(jax.random.key(args.seed))

    mesh = None
    gspmd = False
    dp_size = 1
    if getattr(args, "mesh", ""):
        import numpy as _np

        from neuralsvd_tpu.parallel import make_mesh
        from neuralsvd_tpu.parallel.sharding import parse_mesh_spec

        axes, shape = parse_mesh_spec(args.mesh, len(jax.devices()))
        sizes = dict(zip(axes, shape))
        gspmd = sizes.get("tp", 1) > 1  # tp present -> GSPMD dp x tp
        dp_size = sizes.get("dp", 1)
        if args.batch_size % dp_size:
            raise ValueError(f"batch_size {args.batch_size} must divide by "
                             f"dp={dp_size} for dp sharding")
        if gspmd and args.neigs % sizes["tp"]:
            raise ValueError(f"neigs {args.neigs} must divide by "
                             f"tp={sizes['tp']} (mode-axis sharding)")
        mesh = make_mesh(int(_np.prod(shape)), axes=axes, shape=shape)
        log.info("mesh %s (%s)", dict(sizes),
                 "GSPMD" if gspmd else "shard_map dp")

    method = get_cdk_method(args.loss_name, apply, args.neigs,
                            step=args.nsvd_step,
                            sequential=args.nsvd_sequential,
                            set_first_mode_const=args.nsvd_const,
                            axis_name=("dp" if (mesh is not None
                                                and not gspmd) else None),
                            use_pallas=getattr(args, "use_pallas", "auto"))
    method_state = method.init_state(params)

    steps_per_epoch = train_loader.max_steps
    lr_schedule = None
    if args.use_lr_scheduler:
        lr_schedule = warmup_cosine_schedule(
            args.base_lr, args.warmup_lr, args.final_lr,
            args.warmup_epochs * steps_per_epoch,
            args.num_epochs * steps_per_epoch)
    optimizer = build_optimizer(args.optimizer, args.base_lr,
                                momentum=args.momentum,
                                weight_decay=args.weight_decay,
                                lr_schedule=lr_schedule)
    opt_state = optimizer.init(params)
    if mesh is not None and gspmd:
        from neuralsvd_tpu.parallel.sharding import make_gspmd_cdk_step

        raw = make_cdk_train_step(method, optimizer, args.grad_clip,
                                  jit=False)
        step_fn, params, opt_state = make_gspmd_cdk_step(
            raw, mesh, params, opt_state)
    elif mesh is not None:
        from neuralsvd_tpu.parallel.sharding import make_shard_map_cdk_step

        step_fn = make_shard_map_cdk_step(method, optimizer, mesh,
                                          grad_clip=args.grad_clip)
    else:
        step_fn = make_cdk_train_step(method, optimizer, args.grad_clip)
    rs_fn = make_density_ratio_fn(apply, args.nsvd_const)

    retrieval_test = Retrieval(test_loader, n_retrievals=args.n_retrievals,
                               metric=args.metric,
                               batch_size=args.batch_size)
    retrieval_valid = Retrieval(valid_loader, n_retrievals=args.n_retrievals,
                                metric=args.metric,
                                batch_size=args.batch_size)
    logger = CSVLogger(args.log_dir,
                       ["epoch", "loss", "test_P@K", "test_mAP@all",
                        "valid_P@K", "valid_mAP@all", "skips"])

    skip_count = jnp.zeros((), jnp.int32)
    best_valid_pk = -1.0
    best_params = params
    start_epoch = 0

    ckpt_path = os.path.join(args.log_dir, "ckpt")
    if args.resume and os.path.exists(ckpt_path):
        restored = load_checkpoint(ckpt_path)
        params = jax.tree.map(jnp.asarray, restored["params"])
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state),
            [jnp.asarray(x) for x in jax.tree.leaves(restored["opt_state"])])
        start_epoch = int(restored["epoch"])
        best_valid_pk = float(restored.get("best_valid_pk", -1.0))
        log.info("resumed from epoch %d", start_epoch)

    for epoch in range(start_epoch, args.num_epochs):
        if args.eval_only:
            break
        losses = []
        last_batch = None
        for x, y, cls in train_loader:
            if mesh is not None and x.shape[0] % dp_size:
                # dp shards need even division; drop the ragged tail of a
                # short final batch (the real Sketchy loader always fills
                # to batch_size — this only triggers on custom loaders)
                m = (x.shape[0] // dp_size) * dp_size
                if m == 0:
                    continue
                x, y = x[:m], y[:m]
            params, opt_state, method_state, loss, aux, skip_count = step_fn(
                params, opt_state, method_state, jnp.asarray(x),
                jnp.asarray(y), skip_count)
            losses.append(float(loss))
            last_batch = (x, y)

        model_x = lambda v: apply_single(params, v, "x")
        model_y = lambda v: apply_single(params, v, "y")
        test_pk, test_ap = retrieval_test.evaluate(
            model_x, model_y, ap_ver=args.ap_ver,
            return_map_all=args.return_map_all, tag=f"test_e{epoch}")
        valid_pk, valid_ap = retrieval_valid.evaluate(
            model_x, model_y, ap_ver=args.ap_ver,
            return_map_all=args.return_map_all, tag=f"valid_e{epoch}")
        row = {"epoch": epoch, "loss": float(np.mean(losses)),
               "test_P@K": float(test_pk.mean()),
               "test_mAP@all": float(test_ap.mean()),
               "valid_P@K": float(valid_pk.mean()),
               "valid_mAP@all": float(valid_ap.mean()),
               "skips": int(skip_count)}
        log.info("%s", row)
        logger.writerow(row)

        if row["valid_P@K"] > best_valid_pk:
            best_valid_pk = row["valid_P@K"]
            best_params = params
            save_checkpoint(os.path.join(args.log_dir, "best"),
                            jax.tree.map(np.asarray, params))
        save_checkpoint(ckpt_path, {
            "params": jax.tree.map(np.asarray, params),
            # leaves as a LIST: an int-keyed dict would restore in
            # lexicographic key order and scramble the leaf sequence
            "opt_state": [np.asarray(x) for x in jax.tree.leaves(opt_state)],
            "epoch": epoch + 1,
            "best_valid_pk": best_valid_pk,
        })
        if last_batch is not None:
            rs_joint, rs_indep = rs_fn(params, jnp.asarray(last_batch[0]),
                                       jnp.asarray(last_batch[1]))
            plot_hist_ratios(np.asarray(rs_joint), np.asarray(rs_indep),
                             args.log_dir, tag=f"e{epoch}")

    # final: spectrum/orthogonality + truncation sweep on best params
    params = best_params
    model_x = lambda v: apply_single(params, v, "x")
    model_y = lambda v: apply_single(params, v, "y")
    pair_apply = lambda x, y: (model_x(x), model_y(y))
    spectrum, orth_x, orth_y = compute_spectrum_svd(
        pair_apply, iter(test_loader), sort=False,
        set_first_mode_const=args.nsvd_const)
    plot_and_save_spectrum({"singvals": spectrum}, orth_x, orth_y,
                           log_dir=args.log_dir, tag="final")

    if args.n_retrievals_to_save > 0:
        retrieval_test.evaluate(model_x, model_y, ap_ver=args.ap_ver)
        retrieval_test.save_retrievals(args.log_dir,
                                       n_queries=args.n_retrievals_to_save,
                                       tag="_best")

    trunc_results = {}
    perm = None
    if args.randperm:
        perm = np.random.default_rng(args.seed).permutation(args.neigs)
    for dim in args.trunc_dims:
        pk, ap = retrieval_test.evaluate(
            model_x, model_y, ap_ver=args.ap_ver,
            return_map_all=args.return_map_all, trunc_dim=dim, perm=perm,
            tag=f"trunc{dim}")
        trunc_results[dim] = {"P@K": float(pk.mean()),
                              "mAP@all": float(ap.mean())}
        log.info("trunc %d: %s", dim, trunc_results[dim])

    np.savez(os.path.join(args.log_dir, "best_stats.npz"),
             spectrum=spectrum, orth_x=orth_x, orth_y=orth_y,
             trunc_results=json.dumps(trunc_results))
    return params, trunc_results


if __name__ == "__main__":
    main(get_args())
