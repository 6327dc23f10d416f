"""Device-resident training harness: the whole run is ONE jitted program.

Why this shape (vs the reference's PyTorch-Lightning loop): the reference's
datasets are tiny (<= ~25k rows, <= 3072 features) and its models are
KB-scale MLPs, so its wall-clock is dominated by Python/Lightning per-step
overhead (reference: run.py:199-249 drives ~100-200 epochs x ~20 steps per
fit). Here the full dataset lives in device memory and training is

    lax.scan over epochs
      -> per-epoch shuffle via jax.random.permutation
      -> lax.scan over full fixed-shape batches
      -> one extra step on the EXACT-size ragged tail batch (its own
         static shape) when n % batch_size != 0 and drop_last=False
      -> optional per-epoch validation pass (for plateau LR + histories)

compiled once by XLA. The ragged tail keeps its true size — same rows,
same batch statistics as PyTorch's DataLoader — so stateful models
(BatchNorm) are bit-faithful too, not just the loss (a padded+masked tail
would keep the loss exact but let pad rows pollute the batch statistics).
Loss functions still receive a {0,1} mask per row (all-ones here) so
custom maskings keep working.

Functional equivalents of the reference's stateful pieces:
  * ``criterion.annealing_step += 1`` per epoch (evidential_probe.py:124)
    -> the epoch index is passed into the loss.
  * torch CosineAnnealingLR stepped per epoch (dmvae.py:204-210,
    evidential_probe.py:205-212) -> closed-form lr(epoch).
  * torch ReduceLROnPlateau on val_loss (evidential_probe.py:403-408,
    baselines.py:143-150) -> (lr, best, bad) carried through the scan.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer + per-epoch LR schedule.

    name: 'adam' (torch.optim.Adam defaults) or 'adamw' (decoupled decay).
    schedule: 'constant' | 'cosine' | 'plateau'.
    """

    name: str = "adam"
    lr: float = 1e-4
    weight_decay: float = 0.0
    schedule: str = "constant"
    cosine_t_max: int = 100
    eta_min: float = 0.0
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    plateau_threshold: float = 1e-4
    min_lr: float = 0.0


class StepInfo(NamedTuple):
    """Functional replacement for the reference's stateful counters:
    ``epoch`` mirrors ``criterion.annealing_step`` (incremented per epoch),
    ``step`` mirrors DisentangledSSL's ``self.iterations`` (per train step).
    """

    epoch: jax.Array
    step: jax.Array


class TrainResult(NamedTuple):
    params: Any
    train_loss: jax.Array  # (E,) per-epoch mean train loss
    val_loss: jax.Array    # (E,) per-epoch val loss (nan if no val)
    val_acc: jax.Array     # (E,) per-epoch val accuracy (nan if no val)
    final_lr: jax.Array
    model_state: Any = None   # e.g. BatchNorm batch_stats, threaded when given
    opt_state: Any = None     # final optimizer state (for mid-training resume)
    plateau_state: Any = None # final plateau LR state (for mid-training resume)
    rng: Any = None           # final shuffle/noise key (for exact resume)


def _make_tx(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """Adam/AdamW core; the LR is applied separately so schedules can live
    in the scan carry."""
    parts = [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)]
    if cfg.name == "adamw" and cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    elif cfg.name == "adam" and cfg.weight_decay > 0:
        # torch Adam couples decay into the gradient.
        raise NotImplementedError("coupled L2 for Adam not needed by the reference")
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def _cosine_lr(cfg: OptimizerConfig, epoch: jax.Array) -> jax.Array:
    """torch CosineAnnealingLR value after `epoch` per-epoch steps."""
    t = jnp.asarray(epoch, jnp.float32)
    return cfg.eta_min + (cfg.lr - cfg.eta_min) * (
        1.0 + jnp.cos(jnp.pi * t / cfg.cosine_t_max)
    ) / 2.0


def _plateau_update(cfg: OptimizerConfig, state, metric):
    """torch ReduceLROnPlateau (mode='min', threshold_mode='rel')."""
    lr, best, bad = state
    is_better = metric < best * (1.0 - cfg.plateau_threshold)
    best = jnp.where(is_better, metric, best)
    bad = jnp.where(is_better, 0, bad + 1)
    reduce = bad > cfg.plateau_patience
    lr = jnp.where(reduce, jnp.maximum(lr * cfg.plateau_factor, cfg.min_lr), lr)
    bad = jnp.where(reduce, 0, bad)
    return lr, best, bad


_PROGRAM_CACHE: OrderedDict = OrderedDict()
_PROGRAM_CACHE_MAX = 256


def _cached_program(key, build):
    """LRU cache of jitted train programs.

    Keyed on the loss/val FUNCTION IDENTITIES plus every static argument
    that shapes the traced program (OptimizerConfig hashes by value). The
    task builders return value-memoized closures (core.tasks._memoized),
    so all seeds/conditions of a sweep cell config hit the same entry and
    the per-fit re-trace + re-lower cost (~half the measured per-cell
    overhead on the UQ sweep) is paid once per process. One-off closures
    (un-memoized user code) just occupy an LRU slot each — same behavior
    as the previous jit-per-call, since jax caches compiled executables
    per wrapper.
    """
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = _PROGRAM_CACHE[key] = build()
        if len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)
    else:
        _PROGRAM_CACHE.move_to_end(key)
    return fn


def program_cache_info():
    """(size, max) of the jitted-program cache — exposed for tests."""
    return len(_PROGRAM_CACHE), _PROGRAM_CACHE_MAX


def _epoch_batches(key, n: int, batch_size: int, drop_last: bool, shuffle: bool):
    """Static-shape batch plan: full batches + an EXACT-size ragged tail.

    Returns ``(idx_full (S, B), idx_tail (r,))`` with ``r = n % B`` (0 under
    drop_last, and then the tail array is empty). The tail batch keeps its
    true ragged size — same as PyTorch's DataLoader — so stateful models
    (BatchNorm) see the exact rows, not pad-duplicates: padding the tail
    and masking only the loss would let the pad rows pollute the batch
    statistics even though the loss ignores them.
    """
    if drop_last and n // batch_size == 0:
        raise ValueError(
            f"drop_last=True with n_train={n} < batch_size={batch_size}: "
            f"zero optimizer steps per epoch (the loss would be 0/0=NaN "
            f"and params would never update); shrink batch_size or use "
            f"drop_last=False"
        )
    steps_full = n // batch_size
    r = 0 if drop_last else n % batch_size
    perm = jax.random.permutation(key, n) if shuffle else jnp.arange(n)
    idx_full = perm[: steps_full * batch_size].reshape(steps_full, batch_size)
    idx_tail = perm[steps_full * batch_size : steps_full * batch_size + r]
    return idx_full, idx_tail


def train(
    *,
    rng: jax.Array,
    params: Any,
    loss_fn: Callable,
    data: Any,
    n_train: int,
    optimizer: OptimizerConfig,
    epochs: int,
    batch_size: int,
    drop_last: bool = False,
    shuffle: bool = True,
    val_fn: Optional[Callable] = None,
    val_data: Any = None,
    donate: bool = True,
    model_state: Any = None,
    start_epoch: int = 0,
    resume: Any = None,
    mesh: Any = None,
    tp_hidden_dim: Optional[int] = None,
    megakernel: Any = None,
) -> TrainResult:
    """Run a full training job as one jitted scan.

    Mid-training resume: pass ``start_epoch`` plus the previous segment's
    ``resume=(result.opt_state, result.plateau_state)`` (and its params /
    model_state); epoch-indexed schedules and annealing continue exactly
    where the previous segment stopped.

    Data parallelism: pass a ``jax.sharding.Mesh`` with a 'data' axis —
    the dataset's row axis is sharded across it, params/opt state are
    replicated, and jit's partitioner inserts the gradient all-reduce over
    ICI (SURVEY.md §5.8's TPU-native scaling story).

    Tensor parallelism: when the mesh also has a 'model' axis (size > 1),
    pass ``tp_hidden_dim`` (the MLP hidden width) — params whose kernels
    touch that width are column/row-split over 'model'
    (parallel.mesh.param_sharding_rule) and XLA inserts the activation
    collectives. Opt state inherits the param shardings through jit.

    loss_fn(params, batch, mask, t, rng[, state]) -> (loss, aux). ``batch``
    is the pytree ``data`` gathered at the (B,) batch indices; ``mask`` is
    (B,) 0/1. When ``model_state`` is given (e.g. BatchNorm batch_stats),
    loss_fn takes it as a 6th argument and must return the updated state as
    ``aux``; val_fn then also takes it: (params, state, val_data, t).
    Otherwise val_fn is (params, val_data, t) -> (val_loss, val_acc).

    ``megakernel``: a core.megakernel.ProbeMegakernelDesc (attached to
    probe tasks by core.tasks). When the fit qualifies
    (supports_probe_megakernel: stateless, single-device, adamw), the
    whole-epoch Pallas program replaces the step-scan XLA program —
    same contract, same randomness stream, one kernel launch per epoch.
    Callers opt in per fit (runners: --probe-engine megakernel).
    """
    has_state = model_state is not None
    use_megakernel = False
    if megakernel is not None:
        from .megakernel import supports_probe_megakernel

        use_megakernel = supports_probe_megakernel(
            megakernel, optimizer, model_state=model_state, mesh=mesh
        )

    def build():
        if use_megakernel:
            from .megakernel import make_probe_megakernel_program

            program = make_probe_megakernel_program(
                desc=megakernel,
                n_train=n_train,
                optimizer=optimizer,
                epochs=epochs,
                batch_size=batch_size,
                drop_last=drop_last,
                shuffle=shuffle,
                val_fn=val_fn,
                start_epoch=start_epoch,
            )
        else:
            program = make_train_program(
                loss_fn=loss_fn,
                n_train=n_train,
                optimizer=optimizer,
                epochs=epochs,
                batch_size=batch_size,
                drop_last=drop_last,
                shuffle=shuffle,
                val_fn=val_fn,
                has_state=has_state,
                start_epoch=start_epoch,
            )

        def run(params, rng, data, val_data, model_state, resume):
            return program(params, rng, data, val_data, model_state, resume)

        return jax.jit(run, donate_argnums=(0,) if donate else ())

    run = _cached_program(
        ("single", loss_fn, val_fn, has_state, n_train, optimizer, epochs,
         batch_size, drop_last, shuffle, start_epoch, donate,
         megakernel if use_megakernel else None),
        build,
    )

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from ..parallel.distributed import place_global

        n_dp = mesh.shape["data"]
        # Row sharding must also divide over PROCESSES in the multi-host
        # regime (place_global's host-block assembly); the mesh orders
        # 'data' process-contiguously, and process_count divides n_dp, so
        # padding to n_dp covers both.
        pc = jax.process_count()
        row_div = n_dp if n_dp % pc == 0 else n_dp * pc

        def place_rows(a):
            """Shard rows over 'data'; zero-pad to a shardable multiple.

            Pad rows are inert: the batch plan only ever gathers indices
            < n_train, so training math is unchanged.
            """
            pad = (-a.shape[0]) % row_div
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                )
            return place_global(a, mesh, P("data"))

        data = jax.tree.map(place_rows, data)
        if val_data is not None:
            # val_fn consumes val_data wholesale (no mask), so padding would
            # corrupt the metrics: shard only when evenly divisible.
            val_data = jax.tree.map(
                lambda a: place_global(
                    a, mesh,
                    P("data") if a.shape[0] % row_div == 0 else P(),
                ),
                val_data,
            )
        use_tp = (
            tp_hidden_dim is not None
            and "model" in mesh.axis_names
            and mesh.shape["model"] > 1
        )
        if use_tp:
            from ..parallel.mesh import param_sharding_rule

            rule = param_sharding_rule(tp_hidden_dim)
            place = lambda a: place_global(a, mesh, rule(a))
        else:
            place = lambda a: place_global(a, mesh, P())
        params = jax.tree.map(place, params)
        if model_state is not None:
            model_state = jax.tree.map(place, model_state)

    # Fresh key buffer: donation would otherwise invalidate the caller's key.
    rng = jax.random.fold_in(rng, 0x5CA1AB1E)
    return run(params, rng, data, val_data, model_state, resume)


def train_many(
    *,
    rngs: jax.Array,
    params_stack: Any,
    loss_fn: Callable,
    data_stack: Any,
    n_train: int,
    optimizer: OptimizerConfig,
    epochs: int,
    batch_size: int,
    drop_last: bool = False,
    shuffle: bool = True,
    val_fn: Optional[Callable] = None,
    val_data_stack: Any = None,
    model_state_stack: Any = None,
    data_broadcast: bool = False,
    segment_epochs: Optional[int] = None,
    mesh: Any = None,
) -> TrainResult:
    """Train S independent model instances as ONE vmapped XLA program.

    TPU-first sweep vectorisation (no reference counterpart — the reference
    loops seeds in Python, run.py:180): every pytree input carries a leading
    S axis (stacked seeds/instances); the full scan-per-epoch program is
    vmapped over it, so S trainings share each fused kernel with S x the
    arithmetic intensity. Returns a TrainResult whose leaves have the S
    leading axis.

    ``data_broadcast=True`` shares ONE (unstacked) train/val dataset across
    all instances (e.g. multi-seed training on a fixed corpus) instead of
    materialising S copies.

    ``mesh``: a Mesh with a 'data' axis — the instance (S) axis of every
    stacked input is sharded across it, so each device trains S/ndev
    instances entirely locally (zero collectives; the cheapest scaling for
    the seeds-sweep). Requires S % mesh.shape['data'] == 0. Broadcast data
    is replicated across the mesh.
    """
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from ..parallel.distributed import shard_global
        from ..parallel.mesh import shard_instances

        n_dp = mesh.shape["data"]
        s_count = rngs.shape[0]
        if s_count % n_dp != 0:
            raise ValueError(
                f"train_many(mesh=...): instance count {s_count} must divide "
                f"by the mesh 'data' axis ({n_dp}); pad the seed list or "
                f"shrink the mesh"
            )
        rngs = shard_instances(rngs, mesh)
        params_stack = shard_instances(params_stack, mesh)
        if model_state_stack is not None:
            model_state_stack = shard_instances(model_state_stack, mesh)
        if data_broadcast:
            data_stack = shard_global(data_stack, mesh, P())
            if val_data_stack is not None:
                val_data_stack = shard_global(val_data_stack, mesh, P())
        else:
            data_stack = shard_instances(data_stack, mesh)
            if val_data_stack is not None:
                val_data_stack = shard_instances(val_data_stack, mesh)
    has_state = model_state_stack is not None
    data_ax = None if data_broadcast else 0
    rngs = jax.vmap(lambda k: jax.random.fold_in(k, 0x5CA1AB1E))(rngs)

    def vmapped_run(seg_epochs, seg_start, with_resume):
        def build():
            program = make_train_program(
                loss_fn=loss_fn, n_train=n_train, optimizer=optimizer,
                epochs=seg_epochs, batch_size=batch_size, drop_last=drop_last,
                shuffle=shuffle, val_fn=val_fn, has_state=has_state,
                start_epoch=seg_start,
            )
            axes = (0, 0, data_ax, data_ax, 0) + ((0,) if with_resume else ())
            return jax.jit(jax.vmap(program, in_axes=axes))

        return _cached_program(
            ("vmapped", loss_fn, val_fn, has_state, n_train, optimizer,
             seg_epochs, batch_size, drop_last, shuffle, seg_start, data_ax,
             with_resume),
            build,
        )

    if not segment_epochs or segment_epochs >= epochs:
        run = vmapped_run(epochs, 0, False)
        return run(params_stack, rngs, data_stack, val_data_stack, model_state_stack)

    # exact-resume segmented execution
    results, resume, start = [], None, 0
    params, mstate = params_stack, model_state_stack
    while start < epochs:
        seg = min(segment_epochs, epochs - start)
        run = vmapped_run(seg, start, True)
        r = run(params, rngs, data_stack, val_data_stack, mstate, resume)
        jax.block_until_ready(r.train_loss)
        results.append(r)
        params, mstate = r.params, r.model_state
        resume = (r.opt_state, r.plateau_state, r.rng)
        rngs = r.rng  # unused when resume is given, kept aligned
        start += seg
    cat = lambda xs: jnp.concatenate(xs, axis=1)
    last = results[-1]
    return TrainResult(
        params=last.params,
        train_loss=cat([r.train_loss for r in results]),
        val_loss=cat([r.val_loss for r in results]),
        val_acc=cat([r.val_acc for r in results]),
        final_lr=last.final_lr, model_state=last.model_state,
        opt_state=last.opt_state, plateau_state=last.plateau_state,
        rng=last.rng,
    )


def make_train_program(
    *,
    loss_fn: Callable,
    n_train: int,
    optimizer: OptimizerConfig,
    epochs: int,
    batch_size: int,
    drop_last: bool,
    shuffle: bool,
    val_fn: Optional[Callable],
    has_state: bool,
    start_epoch: int = 0,
):
    """Build the pure (params, rng, data, val_data, model_state) -> TrainResult
    program shared by train() and train_many()."""
    tx = _make_tx(optimizer)

    def lr_for_epoch(epoch, plateau_lr):
        if optimizer.schedule == "cosine":
            return _cosine_lr(optimizer, epoch)
        if optimizer.schedule == "plateau":
            return plateau_lr
        return jnp.float32(optimizer.lr)

    def program(params, rng, data, val_data, model_state, resume=None):
        # ``resume``: (opt_state, plateau_state, rng) from a previous
        # segment — mid-training resume is NEW capability (the reference's
        # checkpoints are terminal artifacts, SURVEY.md §5.4). Resuming with
        # the returned rng continues the exact shuffle/noise key chain of an
        # uninterrupted run.
        if resume is not None:
            opt_state, plateau_state, rng = resume
        else:
            opt_state = tx.init(params)
            plateau_state = (
                jnp.float32(optimizer.lr),
                jnp.float32(jnp.inf),
                jnp.int32(0),
            )

        def step_fn(carry, batch_plan):
            params, opt_state, mstate, lr, epoch, gstep = carry
            idx, mask, key = batch_plan
            batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
            if has_state:
                (loss, mstate), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch, mask, StepInfo(epoch, gstep), key, mstate
                )
            else:
                (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch, mask, StepInfo(epoch, gstep), key
                )
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, mstate, lr, epoch, gstep + 1), loss

        def epoch_fn(carry, epoch):
            params, opt_state, mstate, key, plateau, gstep = carry
            key, k_perm, k_steps = jax.random.split(key, 3)
            idx_full, idx_tail = _epoch_batches(
                k_perm, n_train, batch_size, drop_last, shuffle
            )
            r = idx_tail.shape[0]  # static ragged-tail size (n % B)
            steps_full = idx_full.shape[0]
            step_keys = jax.random.split(k_steps, steps_full + (1 if r else 0))
            lr = lr_for_epoch(epoch, plateau[0])
            masks_full = jnp.ones((steps_full, batch_size), jnp.float32)
            carry_s = (params, opt_state, mstate, lr, epoch, gstep)
            carry_s, losses = jax.lax.scan(
                step_fn, carry_s, (idx_full, masks_full, step_keys[:steps_full]),
            )
            counts = jnp.full((steps_full,), float(batch_size))
            if r:
                # one extra step on the EXACT-size tail batch (its own
                # compiled shape) — bit-faithful to torch's ragged loader
                carry_s, tail_loss = step_fn(
                    carry_s, (idx_tail, jnp.ones((r,), jnp.float32), step_keys[-1]),
                )
                losses = jnp.concatenate([losses, tail_loss[None]])
                counts = jnp.concatenate([counts, jnp.full((1,), float(r))])
            params, opt_state, mstate, _, _, gstep = carry_s
            # Weight per-batch means by batch sizes for the exact epoch mean.
            train_loss = jnp.sum(losses * counts) / jnp.sum(counts)

            if val_fn is not None:
                if has_state:
                    val_loss, val_acc = val_fn(params, mstate, val_data, StepInfo(epoch, gstep))
                else:
                    val_loss, val_acc = val_fn(params, val_data, StepInfo(epoch, gstep))
                plateau = _plateau_update(optimizer, plateau, val_loss)
            else:
                val_loss = jnp.float32(jnp.nan)
                val_acc = jnp.float32(jnp.nan)
            return (
                (params, opt_state, mstate, key, plateau, gstep),
                (train_loss, val_loss, val_acc),
            )

        gstep0 = jnp.int32(start_epoch * (n_train // batch_size if drop_last
                                          else -(-n_train // batch_size)))
        carry = (params, opt_state, model_state, rng, plateau_state, gstep0)
        (params, opt_state, mstate, rng_out, plateau, _), (tl, vl, va) = jax.lax.scan(
            epoch_fn, carry, jnp.arange(start_epoch, start_epoch + epochs)
        )
        return TrainResult(params=params, train_loss=tl, val_loss=vl, val_acc=va,
                           final_lr=plateau[0], model_state=mstate,
                           opt_state=opt_state, plateau_state=plateau,
                           rng=rng_out)

    return program
