"""Megakernel-backed probe-fit program (drop-in for make_train_program).

Builds a ``program(params, rng, data, val_data, model_state, resume)``
with the same contract as ``core.train.make_train_program`` but with the
entire per-epoch optimization (all S steps: forward + backward + AdamW)
executed by ``ops.probe_megakernel.run_epoch_kernel`` — one Pallas kernel
launch per epoch instead of hundreds of latency-bound XLA ops per step
(docs/PERF.md §4's measured ~2.7x headroom on probe fits).

Everything stochastic reproduces the default path's randomness stream
bit-for-bit (see ops/probe_megakernel.py): the epoch key split chain, the
shuffle permutation, the batch plan (including the EXACT-size ragged
tail, which here becomes a padded-but-row-masked extra kernel step — the
probes are stateless, so masking the loss is exact, unlike the BatchNorm
models core.train documents), and the flax dropout masks. Validation,
the plateau-LR carry, and TrainResult assembly (including an
optax-compatible ``opt_state`` for mid-training resume) replicate
core/train.py::make_train_program line for line in plain XLA.

Scope (``supports_probe_megakernel``): the probe task family —
FusedEvidentialProbe / FusedDisentangledEvidentialProbe
(models/probes.py), one hidden layer, adamw + cosine/plateau schedule,
no model_state, single-device. Reference semantics being accelerated:
models/evidential_probe.py:11-408 + models/losses.py:117-248.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.probe_megakernel import dropout_mask_key, run_epoch_kernel
from .train import (
    OptimizerConfig,
    StepInfo,
    TrainResult,
    _cosine_lr,
    _epoch_batches,
    _make_tx,
    _plateau_update,
)

_B1, _B2 = 0.9, 0.999  # mirrors core/train._make_tx


class ProbeMegakernelDesc(NamedTuple):
    """Static facts the kernel program needs about a probe task.

    Attached to EvidentialTask by build_probe_task /
    build_disentangled_probe_task when the config is kernel-compatible.
    """

    num_modalities: int
    num_classes: int
    input_dim: int
    shared_input_dim: Optional[int]  # None for the private-only probe
    hidden_dim: int
    dropout: float
    fused: float
    annealing_start: float
    has_shared: bool


def supports_probe_megakernel(
    desc: Optional[ProbeMegakernelDesc],
    optimizer: OptimizerConfig,
    *,
    model_state: Any = None,
    mesh: Any = None,
) -> bool:
    """True when the fast program is a drop-in for this fit."""
    return (
        desc is not None
        and model_state is None
        and mesh is None
        and optimizer.name == "adamw"
        and optimizer.schedule in ("cosine", "plateau", "constant")
    )


def _stack_views(desc: ProbeMegakernelDesc, data) -> jax.Array:
    """(N, V, pad) stacked probe input — FusedEvidentialProbe's layout.

    Replicates models/probes.py::FusedEvidentialProbe.__call__'s padding
    of zc/zp rows to pad = max(in_dims); padded lanes are zero, so they
    are inert under any w1 (the default path relies on the same fact).
    """
    zp = data["zp"].astype(jnp.float32)                    # (N, M, D)
    n = zp.shape[0]
    if not desc.has_shared:
        return zp
    ds = desc.shared_input_dim or desc.input_dim
    pad = max(ds, desc.input_dim)
    zc = data["zc"].astype(jnp.float32)
    rows = [jnp.pad(zc, ((0, 0), (0, pad - ds)))]
    rows += [
        jnp.pad(zp[:, i], ((0, 0), (0, pad - desc.input_dim)))
        for i in range(desc.num_modalities)
    ]
    return jnp.stack(rows, axis=1)                         # (N, V, pad)


def make_probe_megakernel_program(
    *,
    desc: ProbeMegakernelDesc,
    n_train: int,
    optimizer: OptimizerConfig,
    epochs: int,
    batch_size: int,
    drop_last: bool,
    shuffle: bool,
    val_fn,
    start_epoch: int = 0,
    interpret: Optional[bool] = None,
):
    """Same program contract as core.train.make_train_program."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tx = _make_tx(optimizer)
    steps_full = n_train // batch_size
    r = 0 if drop_last else n_train % batch_size
    s_total = steps_full + (1 if r else 0)
    if s_total == 0:
        raise ValueError("zero optimizer steps per epoch (see _epoch_batches)")
    v_heads = desc.num_modalities + (1 if desc.has_shared else 0)
    keep = 1.0 - desc.dropout
    # numpy on purpose: this is built OUTSIDE the traced program, and a
    # device-resident jnp constant closed over by the jitted program forces
    # a device->host fetch at lowering time, which the axon relay backend
    # rejects (INVALID_ARGUMENT). A numpy array inlines for free.
    counts_const = np.asarray(
        [float(batch_size)] * steps_full + ([float(r)] if r else []),
        np.float32,
    )

    def lr_for_epoch(epoch, plateau_lr):
        if optimizer.schedule == "cosine":
            return _cosine_lr(optimizer, epoch)
        if optimizer.schedule == "plateau":
            return plateau_lr
        return jnp.float32(optimizer.lr)

    def program(params, rng, data, val_data, model_state, resume=None):
        assert model_state is None, "megakernel program is stateless-only"
        inner = params["StackedMLP_0"]
        p4 = (inner["w1"], inner["b1"], inner["w2"], inner["b2"])
        opt_template = tx.init(params)  # structure donor (zeros; free under jit)
        if resume is not None:
            opt_state, plateau_state, rng = resume
            adam = opt_state[0]
            count0 = adam.count
            am = adam.mu["StackedMLP_0"]
            an = adam.nu["StackedMLP_0"]
            mus = (am["w1"], am["b1"], am["w2"], am["b2"])
            nus = (an["w1"], an["b1"], an["w2"], an["b2"])
        else:
            count0 = jnp.int32(0)
            mus = tuple(jnp.zeros_like(p) for p in p4)
            nus = tuple(jnp.zeros_like(p) for p in p4)
            plateau_state = (
                jnp.float32(optimizer.lr),
                jnp.float32(jnp.inf),
                jnp.int32(0),
            )

        xin_all = _stack_views(desc, data)                 # (N, V, pad)
        yoh_all = jax.nn.one_hot(
            data["y"], desc.num_classes, dtype=jnp.float32
        )                                                  # (N, C)
        rmask_full = jnp.ones((steps_full, batch_size, 1), jnp.float32)
        if r:
            tail_mask = jnp.concatenate(
                [jnp.ones((1, r, 1), jnp.float32),
                 jnp.zeros((1, batch_size - r, 1), jnp.float32)], axis=1
            )
            rmasks = jnp.concatenate([rmask_full, tail_mask], axis=0)
        else:
            rmasks = rmask_full

        def epoch_fn(carry, epoch):
            p4, mus, nus, count, key, plateau = carry
            key, k_perm, k_steps = jax.random.split(key, 3)
            idx_full, idx_tail = _epoch_batches(
                k_perm, n_train, batch_size, drop_last, shuffle
            )
            step_keys = jax.random.split(k_steps, s_total)
            lr = lr_for_epoch(epoch, plateau[0])

            # ---- gather the whole epoch's batches (one XLA gather) ----
            idx_flat = jnp.concatenate([idx_full.reshape(-1), idx_tail])
            xg = jnp.take(xin_all, idx_flat, axis=0)       # (S*B + r, V, pad)
            yg = jnp.take(yoh_all, idx_flat, axis=0)
            if r:
                zpad = ((0, batch_size - r), (0, 0), (0, 0))
                x_tail = jnp.pad(xg[steps_full * batch_size :], zpad)[None]
                y_tail = jnp.pad(
                    yg[steps_full * batch_size :],
                    ((0, batch_size - r), (0, 0)),
                )[None]
                xs = jnp.concatenate(
                    [xg[: steps_full * batch_size].reshape(
                        steps_full, batch_size, v_heads, -1), x_tail]
                )
                ys = jnp.concatenate(
                    [yg[: steps_full * batch_size].reshape(
                        steps_full, batch_size, -1), y_tail]
                )
            else:
                xs = xg.reshape(steps_full, batch_size, v_heads, -1)
                ys = yg.reshape(steps_full, batch_size, -1)
            xs = jnp.transpose(xs, (0, 2, 1, 3))           # (S, V, B, pad)

            # ---- flax-exact dropout masks (see ops/probe_megakernel) ----
            if keep < 1.0:
                def step_mask(k, rows):
                    bits = jax.random.bernoulli(
                        dropout_mask_key(k), keep,
                        (rows, v_heads, desc.hidden_dim),
                    )
                    return bits.astype(jnp.float32)

                dm = jax.vmap(lambda k: step_mask(k, batch_size))(
                    step_keys[:steps_full]
                )
                if r:
                    # flax draws the tail mask at its EXACT (r, V, H) shape
                    tail = step_mask(step_keys[-1], r)
                    tail = jnp.pad(
                        tail, ((0, batch_size - r), (0, 0), (0, 0))
                    )[None]
                    dm = jnp.concatenate([dm, tail], axis=0)
                drops = jnp.transpose(dm, (0, 2, 1, 3))    # (S, V, B, H)
            else:
                drops = jnp.ones(
                    (s_total, v_heads, batch_size, desc.hidden_dim),
                    jnp.float32,
                )

            # ---- per-step Adam bias corrections (optax order) ----
            counts_inc = (
                count + 1 + jnp.arange(s_total, dtype=jnp.int32)
            ).astype(jnp.float32)
            bc1s = (1.0 - jnp.power(jnp.float32(_B1), counts_inc))[:, None]
            bc2s = (1.0 - jnp.power(jnp.float32(_B2), counts_inc))[:, None]

            # ---- annealing scalars (ops/dirichlet.avg_trusted_loss) ----
            e32 = jnp.asarray(epoch, jnp.float32)
            coef = jnp.minimum(
                jnp.float32(1.0), e32 / jnp.float32(desc.annealing_start)
            )
            t_gam = jnp.minimum(
                jnp.float32(1.0), e32 / max(1.0, float(desc.annealing_start))
            )
            gamma_t = 0.2 * (1.0 - t_gam) + t_gam  # gamma=1.0 (task default)

            p4, mus, nus, losses = run_epoch_kernel(
                xs, drops, ys, rmasks, bc1s, bc2s, lr, coef, gamma_t,
                p4, mus, nus,
                keep=keep, fused=desc.fused, num_classes=desc.num_classes,
                weight_decay=optimizer.weight_decay, interpret=interpret,
            )
            count = count + s_total
            train_loss = jnp.sum(losses * counts_const) / jnp.sum(counts_const)

            if val_fn is not None:
                tree = {
                    "StackedMLP_0": {
                        "w1": p4[0], "b1": p4[1], "w2": p4[2], "b2": p4[3]
                    }
                }
                val_loss, val_acc = val_fn(tree, val_data, StepInfo(epoch, count))
                plateau = _plateau_update(optimizer, plateau, val_loss)
            else:
                val_loss = jnp.float32(jnp.nan)
                val_acc = jnp.float32(jnp.nan)
            return (
                (p4, mus, nus, count, key, plateau),
                (train_loss, val_loss, val_acc),
            )

        carry = (p4, mus, nus, count0, rng, plateau_state)
        (p4, mus, nus, count, rng_out, plateau), (tl, vl, va) = jax.lax.scan(
            epoch_fn, carry, jnp.arange(start_epoch, start_epoch + epochs)
        )

        params_out = {
            "StackedMLP_0": {
                "w1": p4[0], "b1": p4[1], "w2": p4[2], "b2": p4[3]
            }
        }
        mu_tree = {
            "StackedMLP_0": {
                "w1": mus[0], "b1": mus[1], "w2": mus[2], "b2": mus[3]
            }
        }
        nu_tree = {
            "StackedMLP_0": {
                "w1": nus[0], "b1": nus[1], "w2": nus[2], "b2": nus[3]
            }
        }
        opt_state = (
            opt_template[0]._replace(count=count, mu=mu_tree, nu=nu_tree),
        ) + tuple(opt_template[1:])
        return TrainResult(
            params=params_out, train_loss=tl, val_loss=vl, val_acc=va,
            final_lr=plateau[0], model_state=None, opt_state=opt_state,
            plateau_state=plateau, rng=rng_out,
        )

    return program
