"""Config system: dataclasses + namespaced per-method flags.

Mirrors the reference's configargparse layout (examples/opts.py): shared
flag groups plus method-namespaced options like ``--neuralsvd.step`` /
``--spin.decay`` / ``--neuralef.batchnorm_mode`` collected into a nested
``loss`` config (reference parse_loss_configs, opts.py:123-137).
"""
from __future__ import annotations

import argparse
from dataclasses import dataclass, field, fields
from typing import List, Optional


@dataclass
class NeuralSVDOpts:
    step: int = 1
    sequential: bool = False
    set_first_mode_const: bool = True
    use_pallas: str = "auto"  # auto | true | false (fused TPU loss kernels;
    # auto=false: XLA fuses the loss into the model bwd and wins e2e)


@dataclass
class NeuralEFOpts:
    batchnorm_mode: str = "unbiased"  # biased | unbiased | none
    unbiased: bool = False
    include_diag: bool = False


@dataclass
class SpINOpts:
    decay: float = 0.01


@dataclass
class LossConfig:
    name: str = "neuralsvd"
    neuralsvd: NeuralSVDOpts = field(default_factory=NeuralSVDOpts)
    neuralef: NeuralEFOpts = field(default_factory=NeuralEFOpts)
    spin: SpINOpts = field(default_factory=SpINOpts)


@dataclass
class PDEConfig:
    # base
    seed: int = 42
    log_dir: str = "./log"
    overwrite: bool = False
    # resume from the latest ckpt_<it> in the run's log dir (reference:
    # utils.py resume_killed / latest checkpoint convention); safe no-op
    # when no checkpoint exists yet
    resume: bool = False
    print_freq: int = 1000
    eval_freq: int = 50000
    print_local_energies: bool = False
    # optimization
    num_iters: int = 100000
    optimizer: str = "rmsprop"
    batch_size: int = 128
    lr: float = 1e-4
    rmsprop_decay: float = 0.999
    momentum: float = 0.0
    adam_eps: float = 1e-7
    use_lr_scheduler: bool = False
    ema_decay: float = 0.99
    grad_clip: float = 0.0
    # per-mode LR boost for the slow truncation-edge towers (sequential
    # nesting: provably cannot perturb earlier modes — see
    # tests/test_guard_invariance.py); 1.0 = off
    tail_lr_boost: float = 1.0
    tail_lr_start: int = 0
    spike_reject_factor: float = 0.0  # >0: reject gnorm > k x EMA steps
    # problem
    problem: str = "sch"          # sch | fp
    ndim: int = 2
    lim: float = 16.0
    potential_type: str = "hydrogen"
    mol_name: Optional[str] = None
    charge: float = 1.0
    hydrogen_mol_ion_R: float = 1.0
    laplacian_eps: float = 0.1
    # exact-Laplacian implementation when laplacian_eps <= 0:
    # "forward" = fused forward-Laplacian engine, "jvp" = nested JVP
    laplacian_mode: str = "forward"
    # > 0 (with laplacian_eps <= 0): unbiased Hutchinson Laplacian with
    # this many Rademacher probes in TRAINING (eval stays exact) —
    # decouples Laplacian cost from D for high-D/QC problems
    laplacian_probes: int = 0
    hard_mul_const: float = 1.0
    operator_scale: float = 1.0
    operator_shift: float = 0.0
    scale_operator: float = 1.0
    # model
    neigs: int = 16
    mlp_hidden_dims: str = "128,128,128"
    nonlinearity: str = "softplus"
    parallel: bool = False
    weight_normalization: bool = False
    use_fourier_feature: bool = False
    fourier_mapping_size: int = 256
    fourier_scale: float = 1.0
    fourier_deterministic: bool = False
    fourier_append_raw: bool = False
    fourier_append_radial: bool = False  # per-particle ‖x‖ cusp features
    fourier_append_envelopes: str = ""   # comma κ list: e^{-κ‖x‖} features
    apply_boundary: bool = True
    boundary_mode: str = "dir_box_sqrt"
    apply_exp_mask: bool = False
    exp_mask_init_scale: float = 1000.0
    matmul_precision: str = ""  # ""(ambient) | default | high | highest:
    # per-einsum MXU tier for the eigenfunction-tower matmuls (f32 storage;
    # Gram/Cholesky stay HIGHEST regardless — ops/gram.py)
    # sampling / validation
    sampling_mode: str = "gaussian"  # gaussian | laplacian | uniform |
    # gaussian_mixture (multi-scale; set sampling_scales)
    sampling_scale: float = 16.0
    sampling_scales: str = ""  # comma list for gaussian_mixture
    sampling_weights: str = ""  # optional comma list of mixture weights
    val_eps: float = 0.1
    # ndim > 2 / multi-particle: size of the Monte-Carlo val set drawn
    # from the training density (0 disables eval there; grid is used
    # for ndim <= 2 single-particle as before)
    val_mc_size: int = 8192
    # parallelism: "" = single device; "dp" = all local devices on a data
    # -parallel mesh axis; "dp=N" = N devices.  batch_size stays the GLOBAL
    # batch (split across devices; must divide by 2*n_devices to keep the
    # metric half-batches even).
    mesh: str = ""
    # misc
    sort: bool = False
    post_align: bool = False
    # dead/duplicate-mode rescue at eval points (training/rescue.py):
    # exile spurious modes to tail slots and re-init them (L=36 fix)
    rescue: bool = False
    rescue_until: float = 0.7  # fraction of num_iters with rescue active
    # profiling (jax.profiler trace of a step window; SURVEY §5.1)
    profile: bool = False
    profile_start: int = 100
    profile_steps: int = 20
    loss: LossConfig = field(default_factory=LossConfig)


def _add_dataclass_args(parser: argparse.ArgumentParser, dc, prefix=""):
    for f in fields(dc):
        if f.name == "loss":
            continue
        name = f"--{prefix}{f.name}"
        default = getattr(dc, f.name)
        if f.type in ("bool", bool) or isinstance(default, bool):
            parser.add_argument(name, type=_strtobool, default=default)
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)


def _strtobool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "y", "t")


def parse_pde_config(argv=None) -> PDEConfig:
    cfg = PDEConfig()
    parser = argparse.ArgumentParser("neuralsvd_tpu PDE solver")
    _add_dataclass_args(parser, cfg)
    parser.add_argument("--loss", type=str, default="neuralsvd",
                        dest="loss_name",
                        choices=["neuralsvd", "nestedlora", "neuralef",
                                 "spin", "spinx"])
    # namespaced method flags (reference: --neuralsvd.step etc.)
    for group_name, group in (("neuralsvd", NeuralSVDOpts()),
                              ("neuralef", NeuralEFOpts()),
                              ("spin", SpINOpts())):
        _add_dataclass_args(parser, group, prefix=f"{group_name}.")
    ns = parser.parse_args(argv)
    for f in fields(cfg):
        if f.name == "loss":
            continue
        setattr(cfg, f.name, getattr(ns, f.name))
    if cfg.lim == "pi":
        import numpy as np
        cfg.lim = float(np.pi)
    cfg.loss = LossConfig(
        name=ns.loss_name,
        neuralsvd=NeuralSVDOpts(**{f.name: getattr(ns, f"neuralsvd.{f.name}")
                                   for f in fields(NeuralSVDOpts)}),
        neuralef=NeuralEFOpts(**{f.name: getattr(ns, f"neuralef.{f.name}")
                                 for f in fields(NeuralEFOpts)}),
        spin=SpINOpts(**{f.name: getattr(ns, f"spin.{f.name}")
                         for f in fields(SpINOpts)}),
    )
    return cfg


def loss_descriptor(cfg: PDEConfig) -> str:
    """Run-name fragment encoding the method config
    (reference: examples/utils.py:11-37)."""
    name = cfg.loss.name
    if name in ("neuralsvd", "nestedlora"):
        o = cfg.loss.neuralsvd
        return (f"{name}{'_seq' if o.sequential else '_jnt'}"
                f"{'_sort' if cfg.sort else ''}"
                f"{f'_step{o.step}' if (o.step > 1 and not o.sequential) else ''}")
    if name == "neuralef":
        o = cfg.loss.neuralef
        base = "muEG" if o.unbiased else "alphaEG"
        return f"{base}_diag{int(o.include_diag)}bn{o.batchnorm_mode}"
    if name in ("spin", "spinx"):
        return f"{name}_decay{cfg.loss.spin.decay}"
    return name


def run_name(cfg: PDEConfig) -> str:
    """Log-dir name encoding the salient hparams (reference:
    main_pde.py:138-171, abbreviated)."""
    problem = (f"sch_{cfg.potential_type}_ndim{cfg.ndim}"
               if cfg.problem == "sch" else f"fp_ndim{cfg.ndim}")
    return (
        f"{problem}_ss{cfg.operator_scale},{cfg.operator_shift}/"
        f"{loss_descriptor(cfg)}_neigs{cfg.neigs}_{cfg.nonlinearity}"
        f"_p{int(cfg.parallel)}_bdd{int(cfg.apply_boundary)}"
        f"_lap{cfg.laplacian_eps}"
        f"{('_hutch' + str(cfg.laplacian_probes)) if cfg.laplacian_probes else ''}"
        f"_fourier{int(cfg.use_fourier_feature)}"
        f"_{cfg.sampling_mode},scale{cfg.sampling_scales or cfg.sampling_scale}"
        f"{('_mesh' + cfg.mesh) if cfg.mesh else ''}"
        f"_bs{cfg.batch_size}_niters{cfg.num_iters}"
        f"_{cfg.optimizer}_lr{cfg.lr}_ema{cfg.ema_decay}_seed{cfg.seed}"
    )
