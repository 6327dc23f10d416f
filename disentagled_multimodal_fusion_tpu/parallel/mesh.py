"""Device mesh + sharding rules for data/tensor parallel training.

The reference has NO distributed capability (SURVEY.md §2.3: every
pl.Trainer is single-process, devices=1). This layer is the TPU-native
scaling story built on jax.sharding:

* ``data`` axis — batch-sharded inputs; gradient all-reduce rides the ICI
  automatically via jit's partitioner (psum of sharded-grad contributions).
* ``model`` axis — Megatron-style split of each MLP's hidden dimension:
  the first Dense's output dim (column parallel) and the next Dense's input
  dim (row parallel). For the model family here (wide-hidden MLP encoders/
  decoders: 512-4096 hidden) this is the natural tensor-parallel cut;
  pipeline/sequence/expert parallelism do not apply to 2-3 layer MLPs over
  fixed feature vectors (SURVEY.md §5.7).

Everything goes through NamedSharding + jit — XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Mesh over the first n_devices devices, shaped (data, model)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % model_parallel == 0, "n_devices must divide by model_parallel"
    grid = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(hidden_dim: int):
    """PartitionSpec rule implementing the hidden-dim tensor-parallel cut.

    Any kernel whose output dim equals hidden_dim is column-parallel
    (P(None, 'model')); a kernel consuming hidden_dim rows is row-parallel
    (P('model', None)); hidden biases shard on 'model'; everything else is
    replicated.
    """

    def rule(x: jax.Array) -> P:
        if x.ndim == 2:
            if x.shape[1] == hidden_dim:
                return P(None, "model")
            if x.shape[0] == hidden_dim:
                return P("model", None)
        if x.ndim == 3:  # stacked (N, in, out) kernels (models/dmvae_fused.py)
            if x.shape[2] == hidden_dim:
                return P(None, None, "model")
            if x.shape[1] == hidden_dim:
                return P(None, "model", None)
        if x.ndim == 1 and x.shape[0] == hidden_dim:
            return P("model")
        return P()

    return rule


def shard_params(params, mesh: Mesh, hidden_dim: int):
    """Place a params pytree on the mesh under the tp rule."""
    rule = param_sharding_rule(hidden_dim)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, rule(x))), params
    )


def shard_batch(pytree, mesh: Mesh):
    """Place batch arrays with the leading axis split over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), pytree)
