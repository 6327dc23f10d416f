"""TPU mesh construction and dp/tp sharding rules."""

from .mesh import make_mesh, batch_sharding, param_sharding_rule, shard_params
