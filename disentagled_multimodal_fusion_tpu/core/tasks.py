"""Task builders: bind each model family to the jitted train harness.

These replace the reference's LightningModules (EvidentialProbeModule,
DisentangledEvidentialProbeModule, LateFusion, IntermediateFusion, DMVAE,
DisentangledSSL training plumbing) with pure loss/val closures plus an
``evidences_fn`` the evaluation engine consumes.

Optimizer settings mirror the reference exactly:
  * DMVAE: Adam + CosineAnnealingLR(T_max=num_epochs, eta_min=0)
    (dmvae.py:204-210)
  * EvidentialProbe: AdamW(wd=1e-4) + Cosine(eta_min=1e-6)
    (evidential_probe.py:205-212)
  * DisentangledProbe: AdamW(default wd=0.01) + Plateau(f=0.1, patience=5)
    (evidential_probe.py:403-408)
  * LateFusion: Adam + Plateau(f=0.1, patience=10) (baselines.py:143-150)
  * IntermediateFusion: Adam + Plateau(f=0.1, patience=5)
    (baselines.py:245-252)
  * DisentangledSSL: Adam + Cosine(T_max=epochs) (disentangledssl.py:184-194)
"""

from __future__ import annotations

from functools import partial, wraps
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.baselines import FusedLateFusion, IntermediateFusion, LateFusion
from ..models.disentangledssl import DisentangledSSL, disentangledssl_loss
from ..models.dmvae import DMVAE
from ..models.dmvae_fused import FusedDMVAE
from ..models.probes import (
    DisentangledEvidentialProbe,
    EvidentialProbe,
    FusedDisentangledEvidentialProbe,
    FusedEvidentialProbe,
)
from ..ops.dirichlet import avg_trusted_loss, single_evidential_loss
from ..ops.evidence import AGGREGATIONS
from .train import OptimizerConfig


class EvidentialTask(NamedTuple):
    """A trainable evidential classifier exposed to train() and eval.

    ``model_state`` is the mutable flax collection (BatchNorm batch_stats)
    for models whose feature encoders carry one; None otherwise. When set,
    loss_fn/val_fn use the stateful arities documented in core.train.train,
    and evidences_fn is (params, data, state).
    """

    model: Any
    params: Any
    loss_fn: Callable
    val_fn: Callable
    evidences_fn: Callable  # (params, data[, state]) -> (B, V, C) evidences
    aggregation: Callable   # (B, V, C) -> (B, C)
    num_classes: int
    optimizer: OptimizerConfig
    has_shared: bool        # True if evidences[:, 0] is the shared view
    model_state: Any = None
    megakernel: Any = None  # ProbeMegakernelDesc when the whole-epoch
                            # Pallas fast path applies (core/megakernel.py)


_MISS = object()


def _memoized(fn):
    """Value-keyed memo for the closure templates below.

    flax Modules hash/compare STRUCTURALLY, so two sweep cells that build
    the same task config get the IDENTICAL loss/val/evidences closure
    objects back — which is what lets core.train's program cache (keyed on
    function identity) reuse one traced+lowered jit program across all
    seeds/conditions of a sweep instead of re-tracing every cell (~half the
    measured per-cell overhead). Unhashable args (e.g. ad-hoc encoder
    lists) skip the cache and behave exactly as before.
    """
    cache = {}

    @wraps(fn)
    def wrapper(*args):
        try:
            hit = cache.get(args, _MISS)
        except TypeError:
            return fn(*args)
        if hit is _MISS:
            hit = cache[args] = fn(*args)
        return hit

    wrapper.cache = cache
    return wrapper


def _norm_dtype(dtype):
    """Accept None / jnp dtype / string ('bfloat16'); losses stay f32
    regardless (ops/dirichlet.py pins f32), only matmul compute changes."""
    if dtype is None or dtype == "float32":
        return None
    return jnp.dtype(dtype) if isinstance(dtype, str) else dtype


def _acc(evidence_a: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(evidence_a, axis=-1) == y).astype(jnp.float32))


def _apply_stateful(model, params, state, args, kwargs, train, rngs):
    """Apply a flax model with an optional batch_stats collection.

    Returns (output, new_state). With torch-parity momentum the encoders set
    BatchNorm(momentum=0.9) themselves; here we only thread the collection.
    """
    variables = {"params": params}
    if state is not None:
        variables["batch_stats"] = state
    if train and state is not None:
        out, mut = model.apply(
            variables, *args, train=True, rngs=rngs, mutable=["batch_stats"], **kwargs
        )
        return out, mut["batch_stats"]
    return model.apply(variables, *args, train=train, rngs=rngs, **kwargs), state


# ------------------------------------------------------------------ DMVAE
def build_dmvae_task(
    *,
    rng: jax.Array,
    xs_sample: Sequence[jax.Array],
    output_dim: Sequence[int],
    dropout: float = 0.0,
    a: float = 1.0,
    hidden_dim: int = 512,
    embed_dim: int = 100,
    lr: float = 1e-4,
    num_epochs: int = 50,
    poe_temperature: float = 1.5,
    cross_weight: float = 1.0,
    lambda_per_modality: Optional[Sequence[float]] = None,
    feature_encoders: Optional[Tuple] = None,
    fused_modalities: bool = False,
    dtype=None,
):
    """DMVAE backbone + its train-loss closure (reference: run.py:135-146).

    ``fused_modalities=True`` selects FusedDMVAE (modality-stacked einsum
    encoders/decoders — same math, ~N x fewer kernels; see
    models/dmvae_fused.py). ``dtype='bfloat16'`` runs the encoder/decoder
    matmuls on the MXU in bf16; params, VAE stats, and losses stay f32."""
    cls = FusedDMVAE if fused_modalities else DMVAE
    model = cls(
        x_dims=tuple(output_dim),
        hidden_dim=hidden_dim,
        embed_dim=embed_dim,
        dropout=dropout,
        a=a,
        poe_temperature=poe_temperature,
        cross_weight=cross_weight,
        lambda_per_modality=tuple(lambda_per_modality) if lambda_per_modality else None,
        feature_encoders=feature_encoders,
        dtype=_norm_dtype(dtype),
    )
    k_init, k_noise = jax.random.split(rng)
    xs_small = [x[:2] for x in xs_sample]
    variables = model.init(
        {"params": k_init, "noise": k_noise, "dropout": k_noise}, xs_small, train=True
    )
    params = variables["params"]
    bstats = variables.get("batch_stats")
    loss_stateless, loss_stateful = _dmvae_closures(model)
    loss_fn = loss_stateless if bstats is None else loss_stateful

    opt = OptimizerConfig(
        name="adam", lr=lr, schedule="cosine", cosine_t_max=num_epochs, eta_min=0.0
    )
    return model, params, loss_fn, opt, bstats


@_memoized
def _dmvae_closures(model):
    def loss_fn(params, batch, mask, t, key):
        loss_logs, _ = _apply_stateful(
            model, params, None, (batch["xs"],), {"mask": mask}, True,
            {"noise": key, "dropout": jax.random.fold_in(key, 1)},
        )
        return loss_logs[0], loss_logs[1]

    def loss_fn_state(params, batch, mask, t, key, state):
        (loss, _logs), new_state = _apply_stateful(
            model, params, state, (batch["xs"],), {"mask": mask}, True,
            {"noise": key, "dropout": jax.random.fold_in(key, 1)},
        )
        return loss, new_state

    return loss_fn, loss_fn_state


@partial(jax.jit, static_argnames=("backbone_model",))
def embed_dataset(backbone_model: DMVAE, backbone_params, xs, backbone_state=None):
    """Frozen-backbone embeddings, computed once (see probes.py docstring).

    Returns (zc (B, D), zp (B, N, D)). For corpora whose feature encoders
    materialise large activations (LUMA's image CNN), use
    :func:`embed_dataset_chunked` — a whole-corpus single call allocates
    O(rows x conv-activation) HBM.
    """
    variables = {"params": backbone_params}
    if backbone_state is not None:
        variables["batch_stats"] = backbone_state
    zc, zp_list = backbone_model.apply(variables, xs, method="get_embedding")
    return zc, jnp.stack(zp_list, axis=1)


def embed_dataset_chunked(
    backbone_model, backbone_params, xs, backbone_state=None, chunk: int = 4096
):
    """Row-chunked embed_dataset for activation-heavy feature encoders."""
    n = xs[0].shape[0]
    zcs, zps = [], []
    for s0 in range(0, n, chunk):
        part = tuple(x[s0 : s0 + chunk] for x in xs)
        zc, zp = embed_dataset(backbone_model, backbone_params, part, backbone_state)
        zcs.append(zc)
        zps.append(zp)
    return jnp.concatenate(zcs, axis=0), jnp.concatenate(zps, axis=0)


# ------------------------------------------------------------------ probes
def build_probe_task(
    *,
    rng: jax.Array,
    num_modalities: int,
    num_classes: int,
    input_dim: int,
    hidden_dim: Sequence[int] = (128,),
    lr: float = 1e-4,
    dropout: float = 0.3,
    annealing_start: int = 20,
    aggregation: str = "cml",
    fused: float = 1.0,
    num_epochs: int = 200,
    shared_input_dim: Optional[int] = None,
    fused_heads: bool = True,
    dtype=None,
) -> EvidentialTask:
    """Shared+private evidential probe (evidential_probe.py:11-212).

    Data pytree: {'zc': (B, Ds), 'zp': (B, N, D), 'y': (B,)}. Set
    ``shared_input_dim`` when the backbone's Zc width differs from the
    private width (DisentangledSSL: Zc = 2*embed). ``fused_heads`` stacks
    all heads into per-layer einsums (same math family; see
    models/probes.py::FusedEvidentialProbe).
    """
    cls = FusedEvidentialProbe if fused_heads else EvidentialProbe
    model = cls(
        num_modalities=num_modalities,
        num_classes=num_classes,
        input_dim=input_dim,
        hidden_dim=tuple(hidden_dim),
        dropout=dropout,
        shared_input_dim=shared_input_dim,
        dtype=_norm_dtype(dtype),
    )
    agg = AGGREGATIONS[aggregation]
    zc0 = jnp.zeros((2, shared_input_dim or input_dim))
    zp0 = [jnp.zeros((2, input_dim))] * num_modalities
    params = model.init({"params": rng, "dropout": rng}, zc0, zp0, train=True)["params"]
    loss_fn, val_fn, ev_fn = _probe_closures(model, aggregation, annealing_start, fused)

    opt = OptimizerConfig(
        name="adamw", lr=lr, weight_decay=1e-4,
        schedule="cosine", cosine_t_max=num_epochs, eta_min=1e-6,
    )
    mk = None
    if fused_heads and len(tuple(hidden_dim)) == 1 and dtype is None:
        from .megakernel import ProbeMegakernelDesc

        mk = ProbeMegakernelDesc(
            num_modalities, num_classes, input_dim, shared_input_dim,
            tuple(hidden_dim)[0], float(dropout), float(fused),
            float(annealing_start), True,
        )
    return EvidentialTask(
        model, params, loss_fn, val_fn, ev_fn, agg,
        num_classes, opt, has_shared=True, megakernel=mk,
    )


@_memoized
def _probe_closures(model, aggregation, annealing_start, fused):
    agg = AGGREGATIONS[aggregation]
    num_modalities = model.num_modalities
    num_views = 1 + num_modalities

    def evidences(params, data, train=False, key=None):
        zp_list = [data["zp"][:, i] for i in range(num_modalities)]
        rngs = {"dropout": key} if train else None
        return model.apply(
            {"params": params}, data["zc"], zp_list, train=train, rngs=rngs
        )

    def loss_fn(params, batch, mask, t, key):
        ev = evidences(params, batch, train=True, key=key)
        ev_a = agg(ev)
        loss = avg_trusted_loss(
            ev, batch["y"], ev_a,
            annealing_step=t.epoch, num_views=num_views,
            annealing_start=annealing_start, fused=fused, mask=mask,
        )
        return loss, {}

    def val_fn(params, data, t):
        ev = evidences(params, data, train=False)
        ev_a = agg(ev)
        loss = avg_trusted_loss(
            ev, data["y"], ev_a,
            annealing_step=t.epoch, num_views=num_views,
            annealing_start=annealing_start, fused=fused,
        )
        return loss, _acc(ev_a, data["y"])

    return loss_fn, val_fn, jax.jit(lambda p, d: evidences(p, d, train=False))


def build_disentangled_probe_task(
    *,
    rng: jax.Array,
    num_modalities: int,
    num_classes: int,
    input_dim: int,
    hidden_dim: Sequence[int] = (128,),
    lr: float = 1e-4,
    dropout: float = 0.3,
    annealing_start: int = 20,
    aggregation: str = "cml",
    num_epochs: int = 200,
    fused_heads: bool = True,
    dtype=None,
) -> EvidentialTask:
    """Private-only probe (evidential_probe.py:214-408)."""
    if aggregation not in ("cml", "avg"):
        raise ValueError("aggregation must be one of ['cml', 'avg']")
    cls = FusedDisentangledEvidentialProbe if fused_heads else DisentangledEvidentialProbe
    model = cls(
        num_modalities=num_modalities,
        num_classes=num_classes,
        input_dim=input_dim,
        hidden_dim=tuple(hidden_dim),
        dropout=dropout,
        dtype=_norm_dtype(dtype),
    )
    agg = AGGREGATIONS[aggregation]
    zp0 = [jnp.zeros((2, input_dim))] * num_modalities
    params = model.init({"params": rng, "dropout": rng}, zp0, train=True)["params"]
    loss_fn, val_fn, ev_fn = _dis_probe_closures(model, aggregation, annealing_start)

    opt = OptimizerConfig(
        name="adamw", lr=lr, weight_decay=0.01,
        schedule="plateau", plateau_factor=0.1, plateau_patience=5,
    )
    mk = None
    if fused_heads and len(tuple(hidden_dim)) == 1 and dtype is None:
        from .megakernel import ProbeMegakernelDesc

        mk = ProbeMegakernelDesc(
            num_modalities, num_classes, input_dim, None,
            tuple(hidden_dim)[0], float(dropout), 1.0,
            float(annealing_start), False,
        )
    return EvidentialTask(
        model, params, loss_fn, val_fn, ev_fn, agg,
        num_classes, opt, has_shared=False, megakernel=mk,
    )


@_memoized
def _dis_probe_closures(model, aggregation, annealing_start):
    agg = AGGREGATIONS[aggregation]
    num_modalities = model.num_modalities

    def evidences(params, data, train=False, key=None):
        zp_list = [data["zp"][:, i] for i in range(num_modalities)]
        rngs = {"dropout": key} if train else None
        return model.apply({"params": params}, zp_list, train=train, rngs=rngs)

    def loss_fn(params, batch, mask, t, key):
        ev = evidences(params, batch, train=True, key=key)
        ev_a = agg(ev)
        loss = avg_trusted_loss(
            ev, batch["y"], ev_a,
            annealing_step=t.epoch, num_views=num_modalities,
            annealing_start=annealing_start, fused=1.0, mask=mask,
        )
        return loss, {}

    def val_fn(params, data, t):
        ev = evidences(params, data, train=False)
        ev_a = agg(ev)
        loss = avg_trusted_loss(
            ev, data["y"], ev_a,
            annealing_step=t.epoch, num_views=num_modalities,
            annealing_start=annealing_start, fused=1.0,
        )
        return loss, _acc(ev_a, data["y"])

    return loss_fn, val_fn, jax.jit(lambda p, d: evidences(p, d, train=False))


# ------------------------------------------------------------------ baselines
def build_late_fusion_task(
    *,
    rng: jax.Array,
    output_dims: Sequence[int],
    num_classes: int,
    hidden_dim: Sequence[int] = (128,),
    dropout: float = 0.3,
    lr: float = 1e-4,
    annealing_start: int = 20,
    aggregation: str = "cml",
    fused: float = 1.0,
    feature_encoders: Optional[Tuple] = None,
    input_dims: Optional[Sequence[int]] = None,
    fused_heads: bool = True,
    dtype=None,
) -> EvidentialTask:
    """Per-view evidential heads on raw views (baselines.py:12-150).

    Data pytree: {'xs': tuple of N (B, S_i), 'y': (B,)}.
    ``output_dims`` are the evidential-head input widths (the feature
    encoders' outputs); ``input_dims`` are the raw view widths used to
    initialise the feature encoders (defaults to output_dims — the
    Identity-encoder case). ``fused_heads`` stacks the heads (see
    models/baselines.py::FusedLateFusion).
    """
    cls = FusedLateFusion if fused_heads else LateFusion
    model = cls(
        output_dims=tuple(output_dims),
        num_classes=num_classes,
        hidden_dim=tuple(hidden_dim),
        dropout=dropout,
        feature_encoders=feature_encoders,
        dtype=_norm_dtype(dtype),
    )
    agg = AGGREGATIONS[aggregation]
    # input_dims entries may be ints (flat views) or shape tuples
    # (e.g. (n_mfcc, frames) audio maps for AudioEncoder(use_2d=True))
    xs0 = [
        jnp.zeros((2, *d) if isinstance(d, (tuple, list)) else (2, d))
        for d in (input_dims or output_dims)
    ]
    variables = model.init({"params": rng, "dropout": rng}, xs0, train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats")
    stateless, stateful = _late_fusion_closures(model, aggregation, annealing_start, fused)
    loss_fn, val_fn, ev_fn = stateless if bstats is None else stateful

    opt = OptimizerConfig(
        name="adam", lr=lr, schedule="plateau", plateau_factor=0.1, plateau_patience=10
    )
    return EvidentialTask(
        model, params, loss_fn, val_fn, ev_fn, agg,
        num_classes, opt, has_shared=False, model_state=bstats,
    )


@_memoized
def _late_fusion_closures(model, aggregation, annealing_start, fused):
    agg = AGGREGATIONS[aggregation]
    num_views = len(model.output_dims)

    def evidences(params, data, state=None, train=False, key=None):
        rngs = {"dropout": key} if train else None
        ev, new_state = _apply_stateful(
            model, params, state, (data["xs"],), {}, train, rngs
        )
        return ev, new_state

    def _loss(ev, y, t, mask):
        return avg_trusted_loss(
            ev, y, agg(ev),
            annealing_step=t.epoch, num_views=num_views,
            annealing_start=annealing_start, fused=fused, mask=mask,
        )

    def loss_fn(params, batch, mask, t, key):
        ev, _ = evidences(params, batch, train=True, key=key)
        return _loss(ev, batch["y"], t, mask), {}

    def val_fn(params, data, t):
        ev, _ = evidences(params, data, train=False)
        return _loss(ev, data["y"], t, None), _acc(agg(ev), data["y"])

    def loss_fn_s(params, batch, mask, t, key, state):
        ev, new_state = evidences(params, batch, state=state, train=True, key=key)
        return _loss(ev, batch["y"], t, mask), new_state

    def val_fn_s(params, state, data, t):
        ev, _ = evidences(params, data, state=state, train=False)
        return _loss(ev, data["y"], t, None), _acc(agg(ev), data["y"])

    stateless = (loss_fn, val_fn, jax.jit(lambda p, d: evidences(p, d, train=False)[0]))
    stateful = (loss_fn_s, val_fn_s,
                jax.jit(lambda p, d, s: evidences(p, d, state=s, train=False)[0]))
    return stateless, stateful


def build_intermediate_fusion_task(
    *,
    rng: jax.Array,
    output_dims: Sequence[int],
    num_classes: int,
    hidden_dim: int = 32,
    dropout: float = 0.3,
    lr: float = 1e-4,
    annealing_start: int = 20,
    feature_encoders: Optional[Tuple] = None,
    input_dims: Optional[Sequence] = None,
    dtype=None,
    fusion: str = "concat",
    fusion_output_dim: int = 64,
    fusion_rank: int = 8,
) -> EvidentialTask:
    """Fusion -> single head (baselines.py:153-252).

    ``fusion`` picks the fusion op from the library registry
    (models/fusions.py ``INTERMEDIATE_FUSIONS``; the reference's executed
    choice is ``"concat"``, baselines.py:161); ``fusion_output_dim`` /
    ``fusion_rank`` parameterize the projecting fusions. ``input_dims``
    are the raw view widths/shapes used to initialise the feature
    encoders when they differ from ``output_dims`` (the LUMA encoder
    case); encoders with BatchNorm (ImageEncoder) get their batch_stats
    threaded through the stateful loss/val/evidence closures, same as
    build_late_fusion_task.
    """
    from ..models.fusions import build_fusion

    fusion_mod, fused_dim = build_fusion(
        fusion, tuple(output_dims), output_dim=fusion_output_dim, rank=fusion_rank
    )
    model = IntermediateFusion(
        output_dims=tuple(output_dims),
        num_classes=num_classes,
        hidden_dim=hidden_dim,
        dropout=dropout,
        feature_encoders=feature_encoders,
        dtype=_norm_dtype(dtype),
        fusion=fusion_mod,
        fused_dim=fused_dim,
    )
    xs0 = [
        jnp.zeros((2, *d) if isinstance(d, (tuple, list)) else (2, d))
        for d in (input_dims or output_dims)
    ]
    variables = model.init({"params": rng, "dropout": rng}, xs0, train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats")
    stateless, stateful = _intermediate_closures(model, annealing_start)
    loss_fn, val_fn, ev_fn, agg = stateless if bstats is None else stateful

    opt = OptimizerConfig(
        name="adam", lr=lr, schedule="plateau", plateau_factor=0.1, plateau_patience=5
    )
    return EvidentialTask(
        model, params, loss_fn, val_fn, ev_fn, agg,
        num_classes, opt, has_shared=False, model_state=bstats,
    )


@_memoized
def _intermediate_closures(model, annealing_start):
    def evidence(params, data, state=None, train=False, key=None):
        rngs = {"dropout": key} if train else None
        ev, new_state = _apply_stateful(
            model, params, state, (data["xs"],), {}, train, rngs
        )
        return ev, new_state

    def _loss(ev, y, t, mask):
        return single_evidential_loss(
            ev, y, annealing_step=t.epoch,
            annealing_start=annealing_start, mask=mask,
        )

    def loss_fn(params, batch, mask, t, key):
        ev, _ = evidence(params, batch, train=True, key=key)
        return _loss(ev, batch["y"], t, mask), {}

    def val_fn(params, data, t):
        ev, _ = evidence(params, data, train=False)
        return _loss(ev, data["y"], t, None), _acc(ev, data["y"])

    def loss_fn_s(params, batch, mask, t, key, state):
        ev, new_state = evidence(params, batch, state=state, train=True, key=key)
        return _loss(ev, batch["y"], t, mask), new_state

    def val_fn_s(params, state, data, t):
        ev, _ = evidence(params, data, state=state, train=False)
        return _loss(ev, data["y"], t, None), _acc(ev, data["y"])

    agg = lambda ev: ev[:, 0, :]  # noqa: E731 — evidences are (B, 1, C)
    stateless = (
        loss_fn, val_fn,
        jax.jit(lambda p, d: evidence(p, d, train=False)[0][:, None, :]),
        agg,
    )
    stateful = (
        loss_fn_s, val_fn_s,
        jax.jit(lambda p, d, s: evidence(p, d, state=s, train=False)[0][:, None, :]),
        agg,
    )
    return stateless, stateful


# ------------------------------------------------------------------ SSL
def build_disentangledssl_task(
    *,
    rng: jax.Array,
    output_dim: Sequence[int],
    hidden_dim: int = 512,
    embed_dim: int = 100,
    a: float = 1.0,
    distribution: str = "vmf",
    vmfkappa: float = 1.0,
    lr: float = 1e-4,
    lmd_start_value: float = 0.0,
    lmd_end_value: float = 0.0,
    lmd_n_iterations: int = 8000,
    lmd_start_iteration: int = 0,
    condzs: bool = True,
    usezsx: bool = False,
    epochs: int = 50,
    feature_encoders: Optional[Tuple] = None,
):
    """DisentangledSSL backbone (disentangledssl.py:17-194)."""
    model = DisentangledSSL(
        output_dim=tuple(output_dim),
        hidden_dim=hidden_dim,
        embed_dim=embed_dim,
        a=a,
        distribution=distribution,
        vmfkappa=vmfkappa,
        lmd_start_value=lmd_start_value,
        lmd_end_value=lmd_end_value,
        lmd_n_iterations=lmd_n_iterations,
        lmd_start_iteration=lmd_start_iteration,
        condzs=condzs,
        usezsx=usezsx,
        feature_encoders=feature_encoders,
    )
    x0 = [jnp.zeros((4, d)) for d in output_dim]
    params = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        x0[0], x0[1], x0[0], x0[1], 0, train=True,
    )["params"]
    loss_fn = _ssl_closures(model)

    opt = OptimizerConfig(
        name="adam", lr=lr, schedule="cosine", cosine_t_max=epochs, eta_min=0.0
    )
    return model, params, loss_fn, opt


@_memoized
def _ssl_closures(model):
    def loss_fn(params, batch, mask, t, key):
        # SupCon couples all rows of the batch; padded tail rows would change
        # the loss, so SSL training uses drop_last=True (reference uses
        # full batches too).
        del mask
        loss, logs = disentangledssl_loss(model, params, batch["xs"], t.step, key)
        return loss, logs

    return loss_fn


def embed_dataset_ssl(model: DisentangledSSL, params, xs):
    """(Zc, Zp) embeddings for probes over a DisentangledSSL backbone."""
    zc, zp_list = model.apply({"params": params}, xs, method=DisentangledSSL.get_embedding)
    return zc, jnp.stack(zp_list, axis=1)
