"""TPU mesh construction, dp/tp sharding rules, and multi-host (DCN) glue."""

from .distributed import (
    global_mesh,
    host_local_block,
    initialize,
    process_rows,
    shard_global,
    shard_instances_global,
)
from .mesh import (
    batch_sharding,
    instance_sharding,
    make_mesh,
    param_sharding_rule,
    shard_batch,
    shard_instances,
    shard_params,
)
