from .mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rule,
    replicated,
    shard_batch,
    shard_params,
    tp_param_sharding_rule,
)
from .multihost import (
    barrier,
    broadcast_from_zero,
    gather_for_metrics,
    is_rank_zero,
    rank_zero_print,
)
