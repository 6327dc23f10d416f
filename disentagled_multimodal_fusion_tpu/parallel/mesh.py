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


def param_sharding_rule(hidden_dim: int, instance_axis: Optional[str] = None):
    """PartitionSpec rule implementing the hidden-dim tensor-parallel cut.

    Any kernel whose last dim equals hidden_dim is column-parallel
    (..., 'model'); a kernel consuming hidden_dim rows is row-parallel
    (..., 'model', None); hidden biases shard on 'model'; everything else
    is replicated. Works for plain (in, out) kernels, modality-stacked
    (N, in, out) kernels (models/dmvae_fused.py), and seed-stacked
    (S, ...) variants of either.

    ``instance_axis``: name of a mesh axis to shard the LEADING axis over —
    used by train_many's seed-stacked params, where axis 0 is the instance
    axis (each device owns a slice of the independent trainings).
    """

    lead = instance_axis  # None -> no leading cut

    def rule(x: jax.Array) -> P:
        ndim = x.ndim
        head = [lead] if lead is not None else []
        body_ndim = ndim - len(head)
        if body_ndim >= 2:
            if x.shape[-1] == hidden_dim:
                return P(*head, *([None] * (body_ndim - 1)), "model")
            if x.shape[-2] == hidden_dim:
                return P(*head, *([None] * (body_ndim - 2)), "model", None)
        if body_ndim == 1 and x.shape[-1] == hidden_dim:
            return P(*head, "model")
        if head and ndim >= 1:
            return P(*head, *([None] * (ndim - 1)))
        return P()

    return rule


def instance_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (stacked-instance) axis of train_many inputs."""
    return NamedSharding(mesh, P(axis))


def shard_instances(pytree, mesh: Mesh, axis: str = "data"):
    """Place seed/instance-stacked pytrees with axis 0 split over ``axis``.

    Each device then holds (and trains) only its own slice of the S
    independent instances — the vmapped train program partitions along S
    with ZERO collectives (fully data-local parallelism over ICI-free
    work; the cheapest possible scaling for the seeds x models sweep).
    Multi-process-safe (see parallel.distributed.shard_global).
    """
    from .distributed import shard_global

    return shard_global(pytree, mesh, P(axis))


def shard_params(params, mesh: Mesh, hidden_dim: int):
    """Place a params pytree on the mesh under the tp rule."""
    rule = param_sharding_rule(hidden_dim)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, rule(x))), params
    )


def shard_batch(pytree, mesh: Mesh):
    """Place batch arrays with the leading axis split over 'data'.
    Multi-process-safe (see parallel.distributed.shard_global)."""
    from .distributed import shard_global

    return shard_global(pytree, mesh, P("data"))
