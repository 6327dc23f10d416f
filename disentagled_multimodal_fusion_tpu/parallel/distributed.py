"""Multi-host (DCN) scaffolding: process init + host-local data feeding.

Single-slice dp/tp lives in ``parallel.mesh`` and rides the ICI. Scaling
past one host (TPU pods / multi-slice over DCN) needs two more pieces,
both provided here:

1. **Process initialization** — every host runs the same program and must
   join the cluster before first JAX use (``jax.distributed.initialize``).
   ``initialize()`` wraps that as an idempotent no-op for the 1-process
   case, so runners can call it unconditionally (the reference has no
   counterpart: SURVEY.md §2.3 — every pl.Trainer is single-process).

2. **Host-local -> global arrays** — under multi-process JAX a
   ``device_put`` to a sharding that spans non-addressable devices fails;
   each process instead materializes ONLY its own rows and assembles the
   global view with ``jax.make_array_from_process_local_data``.
   ``shard_global`` dispatches between the two regimes so callers
   (core.train.train_many / runners) stay regime-agnostic.

Layout guidance (jax-ml.github.io/scaling-book): keep the 'model' axis
inside a slice (ICI) and let only the 'data' axis cross DCN — the mesh
helpers here order axes so contiguous device groups (same host/slice) sit
along 'model'.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _prep_cpu_collectives() -> None:
    """Before joining a CPU cluster: pin the cpu platform + gloo collectives.

    A multi-process CPU runtime (the local test regime for the DCN layer —
    see tests/test_multiprocess.py) needs a cross-process collectives
    implementation; jaxlib ships gloo. Both config updates must land before
    the first backend use. The platform re-pin also beats the axon
    sitecustomize, which force-selects the TPU relay via jax.config (env
    JAX_PLATFORMS alone is not enough — config wins over env).
    """
    plats = (os.environ.get("JAX_PLATFORMS") or "").split(",")[0].strip()
    if plats.lower() != "cpu":
        return
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the multi-host cluster; no-op when single-process.

    Cluster membership is detected from (in priority order): explicit
    args; the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars; or the standard TPU-pod / MEGASCALE
    environment markers, in which case ``jax.distributed.initialize()``
    runs ARGLESS so JAX's own cluster auto-detection resolves the
    coordinator from pod metadata. With none of those present this is a
    no-op. Returns True when a multi-process runtime was (or already is)
    initialized, False for the plain single-process regime.

    ORDER MATTERS: jax.distributed.initialize must run before the first
    backend use, so this function deliberately avoids touching the backend
    (no jax.process_count / jax.devices) until after the cluster config is
    resolved. core.setup.configure() calls it first for exactly that
    reason. Safe to call more than once.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0
    )
    if addr is None and nproc <= 1:
        # No explicit cluster config. On a real TPU pod / multislice the
        # runtime exports standard markers; hand off to JAX's native
        # argless auto-detection there instead of silently staying
        # single-process (each host would otherwise see only its own
        # devices and train a disconnected replica). The signal must be
        # genuinely multi-worker: a single-host runtime (e.g. this image's
        # axon relay) also exports TPU_WORKER_HOSTNAMES=localhost.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi_worker = (
            len([h for h in hostnames.split(",") if h.strip()]) > 1
            or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
        )
        if not multi_worker:
            return False  # no cluster config: leave JAX untouched
        try:
            from jax._src import distributed as _dist

            if getattr(_dist.global_state, "client", None) is not None:
                return jax.process_count() > 1
        except ImportError:
            pass
        _prep_cpu_collectives()
        try:
            jax.distributed.initialize()  # argless: JAX pod auto-detection
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
        return jax.process_count() > 1
    # already joined (e.g. by a launcher)? check the distributed client
    # directly — jax.process_count() would initialize the backend.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return jax.process_count() > 1
    except ImportError:  # private-module layout changed; fall through
        pass
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0") or 0
    )
    _prep_cpu_collectives()
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=nproc or None,
            process_id=pid,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg:
            pass
        elif "before" in msg:
            raise RuntimeError(
                "jax.distributed.initialize must run BEFORE the first JAX "
                "backend use in this process; call core.setup.configure() "
                "(or parallel.distributed.initialize()) before any jax "
                "operation"
            ) from e
        else:
            raise
    return jax.process_count() > 1


def global_mesh(
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Mesh over ALL devices in the cluster (every process, every host).

    The device grid is ordered so each 'model' group is a contiguous run
    of device ids — under the standard enumeration those are same-host /
    same-slice devices, which keeps tensor-parallel collectives on ICI and
    lets only data-parallel gradient reductions cross DCN.
    """
    devs = jax.devices()  # global list under multi-process JAX
    n = len(devs)
    if n % model_parallel:
        raise ValueError(
            f"device count {n} must divide by model_parallel={model_parallel}"
        )
    grid = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def process_rows(
    n: int,
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> slice:
    """This process's contiguous row range of a length-n global axis.

    Data loaders call this so each host reads only its shard (the
    reference loads everything everywhere; over DCN that would move the
    whole corpus to every host). ``process_id``/``num_processes`` default
    to the live cluster's values.
    """
    pc = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    per = -(-n // pc)  # ceil
    return slice(pid * per, min(n, (pid + 1) * per))


def host_local_block(arr, spec: P, process_id=None, num_processes=None):
    """This process's block of a GLOBAL array under ``spec``.

    Leading-axis-sharded specs (P('data'), ...) slice the process's
    contiguous row range; replicated/inner-only specs return the array
    whole. Assumes the mesh axis orders devices process-contiguously —
    true for ``global_mesh`` (jax.devices() lists process 0's devices
    first) — and that the leading dim divides evenly over processes (the
    train_many mesh check enforces it).
    """
    if len(spec) == 0 or spec[0] is None:
        return arr
    return arr[process_rows(arr.shape[0], process_id, num_processes)]


def place_global(x, mesh: Mesh, spec: P):
    """Place ONE global array on ``mesh`` under ``spec``, multi-process-safe.

    Single process: plain sharded device_put (zero-copy reshard when the
    value is already on device). Multi-process: each process extracts ITS
    block (``host_local_block``) and the global array view is assembled via
    ``jax.make_array_from_process_local_data`` with the true global shape —
    no cross-host copy, and no device_put onto non-addressable devices.
    Specs that shard only non-leading dims (e.g. the tensor-parallel
    ``P(None, 'model')``) pass the full host value: the process's
    addressable shards jointly cover it, which is exactly the layout
    make_array_from_process_local_data expects.
    """
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    arr = np.asarray(x)
    if len(spec) and spec[0] is not None and arr.shape[0] % jax.process_count():
        # ceil-partitioned host blocks would be unequal and
        # make_array_from_process_local_data would fail with an opaque
        # shape error deep inside JAX — fail loudly at the entry point
        # instead (train_many checks divisibility by the mesh 'data'
        # axis, but not by process count).
        raise ValueError(
            f"place_global: leading dim {arr.shape[0]} of a "
            f"{spec}-sharded array must divide evenly over "
            f"{jax.process_count()} processes; pad the batch/instance "
            f"axis or use a replicated spec"
        )
    local = host_local_block(arr, spec)
    return jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(local), global_shape=arr.shape
    )


def shard_global(pytree, mesh: Mesh, spec: P):
    """Place GLOBAL pytrees on ``mesh`` under ``spec``, multi-process-safe.

    Callers always pass the full global arrays (every host materializes
    the same values — cheap at this framework's KB-MB scales); see
    :func:`place_global` for the per-array regime dispatch. To avoid
    materializing the full array per host (huge corpora), load only
    ``process_rows`` and call make_array_from_process_local_data directly.
    """
    return jax.tree.map(lambda x: place_global(x, mesh, spec), pytree)


def shard_instances_global(pytree, mesh: Mesh, axis: str = "data"):
    """Multi-host variant of parallel.mesh.shard_instances: the stacked
    instance axis (seeds x models) splits over 'data' across ALL hosts —
    still zero collectives, now across DCN too."""
    return shard_global(pytree, mesh, P(axis))
