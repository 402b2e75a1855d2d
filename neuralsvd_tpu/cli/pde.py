"""PDE solver entry point: python -m neuralsvd_tpu.cli.pde [flags].

Reference: examples/operator/pde/main_pde.py.  Wires problem registry,
wavefunction model, device-native samplers, method factory and the jitted
training driver; saves per-eval spectra to stats.npz and checkpoints.
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np

from neuralsvd_tpu.data.samplers import get_sampler, make_val_grid
from neuralsvd_tpu.methods.factories import get_evd_method
from neuralsvd_tpu.models import make_wavefunctions
from neuralsvd_tpu.models.mlp import parse_dims
from neuralsvd_tpu.operators.problems import get_problem
from neuralsvd_tpu.training.checkpoint import save_checkpoint
from neuralsvd_tpu.training.optimizers import build_optimizer, cosine_annealing
from neuralsvd_tpu.training.train_operator import train_operator
from neuralsvd_tpu.utils.config import PDEConfig, parse_pde_config, run_name
from neuralsvd_tpu.utils.logging import CSVLogger
from neuralsvd_tpu.utils.plotting import (
    plot_1d_eigfuncs,
    plot_2d_eigfuncs,
    plot_and_save_spectrum,
)

log = logging.getLogger("neuralsvd_tpu.pde")


def main(cfg: PDEConfig):
    jax.config.update("jax_default_matmul_precision", "float32")
    logging.basicConfig(level=logging.INFO)

    log_dir = os.path.join(cfg.log_dir, run_name(cfg))
    if os.path.exists(log_dir) and not (cfg.overwrite or cfg.resume):
        raise ValueError(f"{log_dir} exists and --overwrite not set")
    os.makedirs(log_dir, exist_ok=True)
    log.info("log dir: %s", log_dir)

    mesh = None
    gspmd = False
    dp_size = 1
    if cfg.mesh:
        from neuralsvd_tpu.parallel import make_mesh
        from neuralsvd_tpu.parallel.sharding import parse_mesh_spec

        axes, shape = parse_mesh_spec(cfg.mesh, len(jax.devices()))
        sizes = dict(zip(axes, shape))
        dp_size = sizes.get("dp", 1)
        n_dev = int(np.prod(shape))
        mesh = make_mesh(n_dev, axes=axes, shape=shape)
        # tp present -> GSPMD (compiler-inserted collectives, global
        # batch); pure dp -> shard_map (explicit pmeans, per-device batch)
        gspmd = sizes.get("tp", 1) > 1
        sampler_div = 1 if gspmd else dp_size
        if cfg.batch_size % (2 * dp_size):
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide by 2*dp="
                f"{2 * dp_size} (even per-device metric half-batches)")
        log.info("mesh %s over %d devices (%s; sampler batch %d)",
                 dict(sizes), n_dev, "GSPMD" if gspmd else "shard_map dp",
                 cfg.batch_size // sampler_div)

    operator, ground_truth_spectrum, n_particles = get_problem(
        problem=cfg.problem, potential_type=cfg.potential_type,
        ndim=cfg.ndim, neigs=cfg.neigs, lim=cfg.lim, charge=cfg.charge,
        hydrogen_mol_ion_R=cfg.hydrogen_mol_ion_R, mol_name=cfg.mol_name,
        laplacian_eps=cfg.laplacian_eps, laplacian_mode=cfg.laplacian_mode,
        laplacian_probes=cfg.laplacian_probes,
        operator_scale=cfg.operator_scale,
        operator_shift=cfg.operator_shift, scale_operator=cfg.scale_operator)

    init, apply = make_wavefunctions(
        ndim=cfg.ndim, neigs=cfg.neigs,
        mlp_hidden_dims=parse_dims(cfg.mlp_hidden_dims),
        nonlinearity=cfg.nonlinearity, n_particles=n_particles,
        parallel=cfg.parallel,
        use_fourier_feature=cfg.use_fourier_feature,
        fourier_mapping_size=cfg.fourier_mapping_size,
        fourier_scale=cfg.fourier_scale,
        fourier_deterministic=cfg.fourier_deterministic,
        fourier_append_raw=cfg.fourier_append_raw,
        fourier_append_radial=cfg.fourier_append_radial,
        fourier_append_envelopes=tuple(
            float(v) for v in cfg.fourier_append_envelopes.split(",") if v),
        fourier_seed=cfg.seed,
        apply_boundary=cfg.apply_boundary, boundary_mode=cfg.boundary_mode,
        lim=cfg.lim, apply_exp_mask=cfg.apply_exp_mask,
        exp_mask_init_scale=cfg.exp_mask_init_scale,
        hard_mul_const=cfg.hard_mul_const,
        matmul_precision=cfg.matmul_precision or None)
    params = init(jax.random.key(cfg.seed))

    scale = cfg.sampling_scale
    weights = None
    if cfg.sampling_mode == "gaussian_mixture":
        scale = tuple(float(v) for v in cfg.sampling_scales.split(",") if v)
        if getattr(cfg, "sampling_weights", ""):
            weights = tuple(float(v) for v in cfg.sampling_weights.split(",")
                            if v)
    # shard_map dp: each device draws its own batch — keep the configured
    # batch_size GLOBAL by sampling batch_size // dp per device.  GSPMD:
    # the sampler draws the global batch (rows pinned to dp inside
    # train_operator via shard_batch_sampler).
    sample, importance_train = get_sampler(
        cfg.sampling_mode, cfg.batch_size // (1 if gspmd else dp_size),
        n_particles, cfg.ndim, scale, sampling_weights=weights)

    val_batches = importance_val = None
    val_data = None
    if cfg.ndim in (1, 2) and n_particles == 1:
        val_data, val_batches, importance_val = make_val_grid(
            cfg.ndim, cfg.lim, cfg.val_eps, cfg.batch_size)
    elif cfg.val_mc_size > 0:
        # meshgrid quadrature explodes past 2D; importance-weighted MC
        # val set from the training density (fixed across evals)
        from neuralsvd_tpu.data.samplers import make_val_mc

        val_data, val_batches, importance_val = make_val_mc(
            cfg.sampling_mode, cfg.val_mc_size, n_particles, cfg.ndim,
            scale, cfg.batch_size, seed=cfg.seed + 777,
            sampling_weights=weights)

    method_opts = {
        "neuralsvd": vars(cfg.loss.neuralsvd),
        "nestedlora": vars(cfg.loss.neuralsvd),
        "neuralef": vars(cfg.loss.neuralef),
        "spin": vars(cfg.loss.spin),
        "spinx": vars(cfg.loss.spin),
    }[cfg.loss.name]
    method = get_evd_method(
        cfg.loss.name, apply, cfg.neigs, sort=cfg.sort,
        # shard_map needs explicit pmeans; GSPMD must stay axis-free
        axis_name=("dp" if (mesh is not None and not gspmd) else None),
        **method_opts)

    lr_schedule = (cosine_annealing(cfg.lr, cfg.num_iters)
                   if cfg.use_lr_scheduler else None)
    optimizer = build_optimizer(
        cfg.optimizer, cfg.lr, momentum=cfg.momentum,
        rmsprop_decay=cfg.rmsprop_decay, adam_eps=cfg.adam_eps,
        lr_schedule=lr_schedule,
        spike_reject_factor=cfg.spike_reject_factor)
    if cfg.tail_lr_boost != 1.0:
        # per-mode LR on the slow truncation-edge towers; safe under
        # sequential nesting (prefix independence — BASELINE
        # "Guard-mode mechanics", tests/test_guard_invariance.py)
        if not cfg.parallel:
            # per_mode_lr matches leaves structurally by leading mode
            # axis; a shared trunk has no such leaves, and a hidden
            # width == neigs would collide with the heuristic
            raise ValueError("--tail_lr_boost requires --parallel true "
                             "(per-mode towers)")
        import optax

        from neuralsvd_tpu.training.optimizers import (
            assert_mode_axis_unambiguous, per_mode_lr)

        # shape-collision guard (ADVICE r3): the leading-axis==neigs
        # heuristic is only exact when EVERY leaf is a per-mode stack
        assert_mode_axis_unambiguous(params, cfg.neigs)
        scales = np.where(np.arange(cfg.neigs) >= cfg.tail_lr_start,
                          cfg.tail_lr_boost, 1.0).astype(np.float32)
        optimizer = optax.chain(optimizer, per_mode_lr(scales, cfg.neigs))
        log.info("tail LR boost %.2fx from mode %d", cfg.tail_lr_boost,
                 cfg.tail_lr_start)

    logger = CSVLogger(log_dir, ["iter", "train_loss", "time",
                                 "steps_per_sec"])

    def checkpoint_fn(ts, it, outputs):
        normalize = method.name in ("nestedlora", "neuralsvd")
        plot_and_save_spectrum(
            {"RQ": outputs["eigvals"],
             "Norms^2": outputs["norms"] if normalize else None},
            outputs["cov"], ground_truth_spectrum=ground_truth_spectrum,
            log_dir=log_dir, tag=f"it{it}")
        if cfg.ndim == 1 and val_data is not None:
            plot_1d_eigfuncs(val_data, outputs["eigfuncs"], log_dir,
                             tag=f"it{it}")
        if cfg.ndim == 2 and val_data is not None:
            plot_2d_eigfuncs(outputs["eigfuncs"], log_dir, tag=f"it{it}")
        save_checkpoint(os.path.join(log_dir, f"ckpt_{it}"),
                        jax.tree.map(np.asarray, ts._asdict()))

    spinx_refresh = None
    if cfg.loss.name == "spinx":
        def spinx_refresh(ts, key):
            x = sample(key)
            x = x.reshape(x.shape[0], -1)
            new_state = method.refresh_weights(
                ts.params, ts.method_state, x, operator, importance_train)
            return ts._replace(method_state=new_state)

    if cfg.rescue:
        # rescue surgery uses the same leading-axis==neigs leaf heuristic
        from neuralsvd_tpu.training.optimizers import \
            assert_mode_axis_unambiguous
        assert_mode_axis_unambiguous(params, cfg.neigs)

    # --resume: restart from the latest ckpt_<it> saved by checkpoint_fn
    # (reference: utils.py's resume-killed/latest-checkpoint convention);
    # the key stream folds in absolute iters so sampling continues exactly
    initial_ts, start_iter = None, 0
    if cfg.resume and os.path.isdir(log_dir):
        import re

        from neuralsvd_tpu.training.checkpoint import load_checkpoint
        from neuralsvd_tpu.training.train_state import (TrainState,
                                                        init_train_state)
        cks = [(int(m.group(1)), d) for d in os.listdir(log_dir)
               if (m := re.fullmatch(r"ckpt_(\d+)", d))]
        if cks:
            start_iter, latest = max(cks)
            template = init_train_state(params, optimizer,
                                        method)._asdict()
            restored = load_checkpoint(os.path.join(log_dir, latest),
                                       template)
            initial_ts = TrainState(**restored)
            log.info("resuming from %s at iter %d", latest, start_iter)

    ts, all_eigvals, all_norms = train_operator(
        method, operator, sample, optimizer, params,
        num_iters=cfg.num_iters,
        importance_train=importance_train, importance_val=importance_val,
        val_batches=val_batches,
        ground_truth_spectrum=ground_truth_spectrum,
        ema_decay=cfg.ema_decay, eval_freq=cfg.eval_freq,
        print_freq=cfg.print_freq, log_dir=log_dir, log_writer=logger,
        seed=cfg.seed, monitor=cfg.print_local_energies,
        post_align=cfg.post_align, checkpoint_fn=checkpoint_fn,
        spinx_refresh=spinx_refresh,
        profile_dir=(os.path.join(log_dir, "profile") if cfg.profile
                     else None),
        profile_start=cfg.profile_start, profile_steps=cfg.profile_steps,
        grad_clip=cfg.grad_clip, mesh=mesh,
        rescue_init_fn=(init if cfg.rescue else None),
        rescue_until=cfg.rescue_until,
        initial_ts=initial_ts, start_iter=start_iter)

    np.savez(os.path.join(log_dir, "stats.npz"),
             all_eigvals=np.asarray(all_eigvals),
             all_norms=np.asarray(all_norms))
    log.info("done; stats saved to %s", log_dir)
    return ts, all_eigvals, all_norms


if __name__ == "__main__":
    main(parse_pde_config())
