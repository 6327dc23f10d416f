"""TPU mesh construction and dp/tp sharding rules."""

from .mesh import (
    batch_sharding,
    instance_sharding,
    make_mesh,
    param_sharding_rule,
    shard_batch,
    shard_instances,
    shard_params,
)
