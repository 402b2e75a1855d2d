from neuralsvd_tpu.parallel.sharding import (
    make_mesh,
    make_shard_map_cdk_step,
    make_shard_map_train_step,
    make_sharded_train_step,
    mode_sharded_params,
    shard_batch_sampler,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "mode_sharded_params",
    "state_shardings",
    "make_sharded_train_step",
    "make_shard_map_train_step",
    "make_shard_map_cdk_step",
    "shard_batch_sampler",
]
