from neuralsvd_tpu.data.samplers import get_sampler, make_val_grid

__all__ = ["get_sampler", "make_val_grid"]
