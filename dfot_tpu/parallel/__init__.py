from .mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rule,
    replicated,
    shard_batch,
    shard_params,
)
