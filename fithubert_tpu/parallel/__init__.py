from fithubert_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    replicated,
    shard_batch,
)
