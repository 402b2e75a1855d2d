"""Config system: namespaced per-method flags, run-name encoding."""
import numpy as np

from neuralsvd_tpu.utils.config import (
    loss_descriptor,
    parse_pde_config,
    run_name,
)


def test_namespaced_method_flags_parse():
    cfg = parse_pde_config([
        "--loss", "neuralef", "--neuralsvd.step", "2",
        "--neuralsvd.sequential", "true", "--neuralef.unbiased", "true",
        "--neuralef.batchnorm_mode", "biased", "--spin.decay", "0.5",
        "--neigs", "7", "--lim", "3.5",
    ])
    assert cfg.loss.name == "neuralef"
    assert cfg.loss.neuralsvd.step == 2 and cfg.loss.neuralsvd.sequential
    assert cfg.loss.neuralef.unbiased
    assert cfg.loss.neuralef.batchnorm_mode == "biased"
    assert cfg.loss.spin.decay == 0.5
    assert cfg.neigs == 7 and cfg.lim == 3.5


def test_run_name_encodes_hparams():
    cfg = parse_pde_config(["--potential_type", "hydrogen", "--ndim", "2",
                            "--neigs", "36", "--operator_scale", "100",
                            "--batch_size", "512", "--seed", "3"])
    name = run_name(cfg)
    for frag in ("hydrogen", "ndim2", "ss100.0", "neigs36", "bs512", "seed3"):
        assert frag in name, (frag, name)


def test_loss_descriptor_variants():
    cfg = parse_pde_config(["--loss", "neuralsvd",
                            "--neuralsvd.sequential", "true"])
    assert "seq" in loss_descriptor(cfg)
    cfg = parse_pde_config(["--loss", "neuralef",
                            "--neuralef.unbiased", "true"])
    assert "muEG" in loss_descriptor(cfg)
    cfg = parse_pde_config(["--loss", "spin"])
    assert "spin" in loss_descriptor(cfg)
