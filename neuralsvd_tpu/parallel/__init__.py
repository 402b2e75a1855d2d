from neuralsvd_tpu.parallel.sharding import (
    make_mesh,
    mode_sharded_params,
    make_sharded_train_step,
    make_shard_map_train_step,
)

__all__ = [
    "make_mesh",
    "mode_sharded_params",
    "make_sharded_train_step",
    "make_shard_map_train_step",
]
