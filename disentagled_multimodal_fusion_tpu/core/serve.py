"""Production inference/serving path: one fused XLA program per batch bucket.

The reference stops at Lightning ``.test()`` (run.py:179-326) — it has no
deployment story: every trained model dies with its sweep process. This
module completes that story TPU-natively:

- :func:`build_inference_fn` folds the FROZEN backbone forward (DMVAE /
  DisentangledSSL ``get_embedding``) and the evidential head into ONE
  jitted program: raw views in, calibrated probabilities + Dirichlet
  uncertainty decomposition out. No host round-trip between embed and
  probe, no Python between ops — XLA fuses the whole request.
- :class:`ServingEngine` gives the dynamic-batch front: incoming requests
  are padded to a small set of static batch buckets (powers of two by
  default), so XLA compiles each bucket once and every later request hits
  the compiled-program cache. Padding rows are replicas of row 0 and are
  sliced off after the call — all served models are row-independent in
  eval mode (dropout off, BatchNorm on running stats), which
  tests/test_serve.py pins.
- :func:`export_inference` / :func:`load_exported` serialize the program
  via ``jax.export`` (StableHLO): the artifact replays WITHOUT the model
  code or checkpoint — weights are baked in as constants — and is the
  unit you'd hand to a fleet of serving hosts.

CLI: ``python -m disentagled_multimodal_fusion_tpu.runners.serve``
(latency/throughput across buckets on a restored checkpoint, optional
artifact export). Measured numbers live in docs/PERF.md §Serving.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dirichlet import dirichlet_uncertainties

__all__ = [
    "build_inference_fn",
    "ServingEngine",
    "export_inference",
    "load_exported",
    "DEFAULT_BUCKETS",
]

DEFAULT_BUCKETS: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)


def build_inference_fn(
    task,
    params,
    *,
    model_state=None,
    backbone=None,
    backbone_params=None,
    backbone_state=None,
    mesh=None,
):
    """One jitted program: raw views -> predictions + uncertainties.

    task
        An :class:`~..core.tasks.EvidentialTask` (probe, late/intermediate
        fusion — anything with the ``evidences_fn``/``aggregation``
        contract).
    params / model_state
        Trained head parameters and, for BatchNorm-carrying feature
        encoders, the TRAINED batch_stats (same contract as
        eval.analysis._task_evidences: passing a stateful task without its
        trained state is an error, not a silent fallback).
    backbone / backbone_params / backbone_state
        When given, the program starts from RAW views: the frozen
        backbone's ``get_embedding`` runs inline and its (zc, zp) feed the
        probe, exactly the math of core.tasks.embed_dataset — but fused
        into the same XLA program as the head instead of a separate pass.
        When omitted, the task consumes the views directly
        (``data={"xs": ...}``) — the late/intermediate-fusion layout.

    mesh
        Optional ``jax.sharding.Mesh`` with a ``data`` axis: batch rows
        are sharded over it (params replicate; the whole program is
        embarrassingly row-parallel, so XLA inserts no collectives — each
        chip serves its slice of the batch). Batch sizes must divide by
        the ``data`` axis size; pass ``divisor=mesh.shape['data']`` to
        :class:`ServingEngine` so its buckets comply.

    Returns a jitted ``fn(xs: tuple[Array, ...]) -> dict`` with keys
    ``pred`` (B,), ``probs`` (B, C) — the Dirichlet mean alpha/S,
    ``evidence`` (B, V, C) per-view, ``fused_evidence`` (B, C),
    ``epistemic`` (B,) = K/S and ``aleatoric`` (B,) (ops/dirichlet.py,
    reference analysis.py:27-34).
    """
    if (task.model_state is not None) and model_state is None:
        raise ValueError(
            "this task carries model state (BatchNorm stats); pass the "
            "TRAINED model_state — serving with initialization-time stats "
            "would produce silently wrong predictions"
        )
    num_classes = task.num_classes
    stateful = model_state is not None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        row_sharding = NamedSharding(mesh, PartitionSpec("data"))
        # Replicate every captured weight tree across the mesh up front.
        # Training may hand over tp-sharded backbone params (the 'model'
        # axis split); serving a row-parallel program from sharded weights
        # would make XLA insert all-gathers INSIDE the request path. One
        # explicit reshard here keeps the serving program collective-free.
        replicate = jax.jit(
            lambda t: t, out_shardings=NamedSharding(mesh, PartitionSpec())
        )
        params = replicate(params)
        if model_state is not None:
            model_state = replicate(model_state)
        if backbone_params is not None:
            backbone_params = replicate(backbone_params)
        if backbone_state is not None:
            backbone_state = replicate(backbone_state)

    def infer(xs: Tuple[jax.Array, ...]):
        if mesh is not None:
            xs = tuple(
                jax.lax.with_sharding_constraint(x, row_sharding) for x in xs
            )
        if backbone is not None:
            variables = {"params": backbone_params}
            if backbone_state is not None:
                variables["batch_stats"] = backbone_state
            zc, zp_list = backbone.apply(variables, xs, method="get_embedding")
            data = {"zc": zc, "zp": jnp.stack(zp_list, axis=1)}
        else:
            data = {"xs": tuple(xs)}
        if stateful:
            ev = task.evidences_fn(params, data, model_state)
        else:
            ev = task.evidences_fn(params, data)
        fused = task.aggregation(ev)
        alpha = fused.astype(jnp.float32) + 1.0
        probs = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
        epistemic, aleatoric = dirichlet_uncertainties(fused, num_classes)
        return {
            "pred": jnp.argmax(fused, axis=-1),
            "probs": probs,
            "evidence": ev,
            "fused_evidence": fused,
            "epistemic": epistemic,
            "aleatoric": aleatoric,
        }

    jitted = jax.jit(infer)
    if mesh is None:
        return jitted

    # Mesh serving: place each request's rows as a GLOBAL row-sharded array
    # BEFORE the jitted call. Required under multi-process JAX (a host-local
    # array can't feed a program spanning non-addressable devices) and a
    # zero-copy no-op when already placed. Batch sizes must divide by the
    # 'data' axis (and, multi-host, by process count) — ServingEngine's
    # ``divisor`` handles that. ``jit_fn`` keeps the raw jitted program
    # reachable for jax.export (export_inference unwraps it).
    from ..parallel.distributed import place_global

    row_spec = PartitionSpec("data")

    def placed(xs):
        xs = tuple(
            place_global(np.asarray(x), mesh, row_spec) for x in xs
        )
        return jitted(xs)

    placed.jit_fn = jitted
    return placed


class ServingEngine:
    """Static-shape batch bucketing around an inference fn.

    XLA compiles one program per distinct input shape; a serving front
    that forwarded raw request sizes would recompile on every new batch
    size. The engine rounds each request up to the next bucket (padding
    with copies of row 0 — row-independent in eval mode), calls the one
    compiled program for that bucket, and slices the padding back off.
    Requests larger than the top bucket run at the next multiple of it.

    Returns host (numpy) arrays: pad/slice run in numpy on purpose —
    eager jnp ops would silently compile one XLA program per distinct
    request size (see __call__) — and the response pays one bulk
    device->host transfer, which is where serving output ends up anyway.
    """

    def __init__(
        self,
        infer_fn,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        divisor: int = 1,
    ):
        """``divisor``: round every bucket up to a multiple of it — set to
        ``mesh.shape['data']`` when the inference fn shards rows over a
        mesh, so each chip gets an equal slice."""
        if not buckets or any(b <= 0 for b in buckets):
            raise ValueError(f"buckets must be positive: {buckets}")
        if divisor <= 0:
            raise ValueError(f"divisor must be positive: {divisor}")
        self.infer_fn = infer_fn
        self.divisor = int(divisor)
        self.buckets = tuple(
            sorted(set(-(-int(b) // self.divisor) * self.divisor for b in buckets))
        )

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        top = self.buckets[-1]
        return ((n + top - 1) // top) * top

    def warmup(self, xs_sample: Sequence[jax.Array], buckets=None) -> None:
        """Pre-compile the given buckets (all by default) from one row."""
        row = tuple(np.asarray(x)[:1] for x in xs_sample)
        for b in buckets or self.buckets:
            padded = tuple(
                np.broadcast_to(x, (b, *x.shape[1:])) for x in row
            )
            jax.block_until_ready(self.infer_fn(padded))

    def __call__(self, xs: Sequence[jax.Array]):
        # Padding runs in NUMPY, deliberately: eager jnp concat/broadcast
        # ops compile one tiny XLA program PER DISTINCT REQUEST SIZE
        # (~0.8 s each on XLA:CPU — measured; request sizes are unbounded,
        # so that's an unbounded compile-cache leak in the request path).
        # numpy pads for free and the single device transfer below is of
        # the static bucket shape the program was warmed up with.
        xs = tuple(np.asarray(x) for x in xs)
        n = xs[0].shape[0]
        if n == 0:
            raise ValueError("empty batch")
        b = self.bucket_for(n)
        if b != n:
            xs = tuple(
                np.concatenate(
                    [x, np.broadcast_to(x[:1], (b - n, *x.shape[1:]))], axis=0
                )
                for x in xs
            )
        out = self.infer_fn(xs)
        # Responses land on the host (one bulk transfer), and the padding
        # is sliced off in numpy — eager device slicing would compile one
        # program per (bucket, n) pair, the same leak as above. Exception:
        # under multi-process JAX the outputs are GLOBAL arrays spanning
        # non-addressable devices, which device_get refuses — those stay
        # on device (each process consumes its own shards; the
        # per-request-size compile concern doesn't apply to that
        # distributed serving leg).
        if all(
            getattr(leaf, "is_fully_addressable", True)
            for leaf in jax.tree.leaves(out)
        ):
            out = jax.device_get(out)
        if b != n:
            out = jax.tree.map(lambda a: a[:n], out)
        return out


def export_inference(
    infer_fn,
    xs_example: Sequence[jax.Array],
    path: Optional[str] = None,
    *,
    platforms: Optional[Sequence[str]] = None,
):
    """AOT-serialize the inference program (weights baked in) via jax.export.

    ``xs_example`` fixes the (static) batch shape of the artifact — export
    one per serving bucket. ``platforms`` defaults to the current backend;
    pass e.g. ``("tpu",)`` to cross-export from a CPU host. Returns the
    ``jax.export.Exported``; when ``path`` is given also writes the
    serialized bytes there.
    """
    args = (
        tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in xs_example),
    )
    infer_fn = getattr(infer_fn, "jit_fn", infer_fn)  # unwrap mesh placement
    exported = jax.export.export(
        infer_fn, platforms=tuple(platforms) if platforms else None
    )(*args)
    if path is not None:
        Path(path).write_bytes(exported.serialize())
    return exported


def load_exported(path: str):
    """Load an :func:`export_inference` artifact into a callable.

    Needs no model code, config, or checkpoint — the program and weights
    are self-contained. The callable takes the same views tuple (at the
    exported batch shape) and returns the same output dict; wrap it in a
    :class:`ServingEngine` for dynamic batches.
    """
    exported = jax.export.deserialize(Path(path).read_bytes())

    def call(xs: Sequence[jax.Array]):
        return exported.call(tuple(jnp.asarray(x) for x in xs))

    return call
