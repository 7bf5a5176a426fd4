from fithubert_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    replicated,
    shard_batch,
    use_kernel_mesh,
    current_kernel_mesh,
    constrain_batch_sharded,
    batch_shard_map,
)
