"""Whole-epoch Pallas megakernel for evidential probe fits.

The probe fit is the framework's one dispatch/latency-bound regime
(docs/PERF.md §4): each optimizer step is hundreds of tiny XLA ops
(two stacked matmuls, the saturated-evidence activation, the digamma
EDL loss + KL + DC regulariser, their VJPs, and AdamW), each paying
fixed per-op latency at (B=100, V<=7, H=128, C~10) sizes. This module
fuses ONE FULL EPOCH — all S optimizer steps, forward + backward +
AdamW — into a single Mosaic kernel whose grid iterates the steps while
params and Adam moments stay VMEM-resident; only the per-step batch
slices stream HBM→VMEM (auto double-buffered by the pallas pipeline).

Everything RNG-dependent stays OUTSIDE the kernel and is computed by
the exact same jax.random calls as the default path
(core/train.py::make_train_program):

* the per-epoch shuffle `jax.random.permutation` and batch plan
  (`core.train._epoch_batches`),
* the per-step keys (`jax.random.split` chain), and
* the flax dropout masks — `nn.Dropout` inside
  models/dmvae_fused.py::StackedMLP derives its key as
  ``LazyRng.create(step_key, 'StackedMLP_0', 'Dropout_0', 1)`` (the
  module path plus flax's per-scope rng counter; pinned by
  tests/test_probe_megakernel.py against a real flax apply), then draws
  ``bernoulli(key, keep, (B, V, H))``.

so the kernel path consumes a bit-identical randomness stream; the only
numeric deviations from the XLA path are op-level (matmul tiling,
reduction order, and the Stirling gammaln/digamma from ops/special.py —
Mosaic has no lgamma/digamma lowering). The backward pass is trace-time
``jax.value_and_grad`` INSIDE the kernel body: the loss is written in
elementwise + dot primitives only, so its VJP lowers to Mosaic too.

Reference math being fused: models/losses.py:117-248 (EDL digamma loss,
Dirichlet KL, DC regulariser, AvgTrustedLoss) over the stacked probe
forward of models/evidential_probe.py:11-408; optimizer semantics are
core/train.py::_make_tx (optax scale_by_adam + add_decayed_weights +
scale(-1), LR applied per epoch).

Scope guard (`supports_probe_megakernel`): FusedEvidentialProbe /
FusedDisentangledEvidentialProbe with ONE hidden layer, adamw, no model
state — i.e. every probe fit the sweep drivers actually run. Everything
else falls back to the default XLA program.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .special import digamma_stirling, gammaln_stirling

_LOG1E13 = float(13.0 * math.log(10.0))
_B1, _B2, _EPS = 0.9, 0.999, 1e-8  # core/train._make_tx's scale_by_adam
_DC_EPS = 1e-8                     # ops/dirichlet.dc_loss


# --------------------------------------------------------------------- RNG
def dropout_mask_key(step_key: jax.Array) -> jax.Array:
    """The exact key flax derives for StackedMLP's nn.Dropout.

    nn.Module.apply(rngs={'dropout': step_key}) reaches the Dropout as
    LazyRng(step_key) + path suffix ('StackedMLP_0', 'Dropout_0') + the
    per-scope rng counter (1 on the first — only — make_rng call). Using
    flax's own LazyRng keeps the static string hashing identical to what
    model.apply does; tests pin this against a real apply.
    """
    from flax.core import scope as _fscope

    return _fscope.LazyRng.create(
        step_key, "StackedMLP_0", "Dropout_0", 1
    ).as_jax_rng()


# ------------------------------------------------------------------- kernel
def _stacked_forward(params, x, drop, keep: float, num_classes: int):
    """relu(x[v] @ w1[v] + b1[v]) -> dropout -> @ w2[v] + b2[v] -> evidence.

    x: (V, B, D); drop: (V, B, H) f32 {0,1}; returns list of V (B, C)
    evidences. Unrolled over V so every array in the kernel is 2D
    (clean Mosaic tiling); all math f32 like the default path.
    """
    w1, b1, w2, b2 = params
    v_heads = w1.shape[0]
    evs = []
    for v in range(v_heads):
        h = jax.lax.dot(
            x[v], w1[v], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(h + b1[v : v + 1, :], 0.0)
        if keep < 1.0:
            h = h * drop[v] * jnp.float32(1.0 / keep)
        logits = jax.lax.dot(
            h, w2[v], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) + b2[v : v + 1, :]
        # saturated-exp evidence activation (ops/evidence.py:26-38)
        z = jnp.clip(logits, -10.0, 10.0)
        evs.append(jnp.exp(z + _LOG1E13 - jnp.logaddexp(z, _LOG1E13)))
    return evs


def _avg_trusted_loss_2d(
    evs, yoh, rmask, coef, gamma_t, fused: float, num_classes: int
):
    """ops/dirichlet.py::avg_trusted_loss on per-view 2D arrays.

    evs: list of V (B, C); yoh: (B, C) one-hot f32; rmask: (B, 1) f32;
    coef = min(1, epoch/annealing_start); gamma_t = 0.2(1-t) + t.
    Identical reductions to the flat (B*V, C) form of the default path
    (sums over b and v commute); masked-mean semantics match
    ops/dirichlet._masked_mean including the max(denom, 1) guard.
    """
    v_heads = len(evs)
    c = num_classes
    gammaln_c = jnp.float32(math.lgamma(float(c)))
    msum = jnp.sum(rmask)

    edl_sum = jnp.float32(0.0)
    ps, us = [], []
    for ev in evs:
        alpha = ev + 1.0
        s = jnp.sum(alpha, axis=1, keepdims=True)          # (B, 1)
        a_term = jnp.sum(
            yoh * (digamma_stirling(s) - digamma_stirling(alpha)),
            axis=1, keepdims=True,
        )
        kl_alpha = (alpha - 1.0) * (1.0 - yoh) + 1.0
        skl = jnp.sum(kl_alpha, axis=1, keepdims=True)
        first = (
            gammaln_stirling(skl)
            - jnp.sum(gammaln_stirling(kl_alpha), axis=1, keepdims=True)
            - gammaln_c
        )
        second = jnp.sum(
            (kl_alpha - 1.0)
            * (digamma_stirling(kl_alpha) - digamma_stirling(skl)),
            axis=1, keepdims=True,
        )
        edl_sum = edl_sum + jnp.sum((a_term + coef * (first + second)) * rmask)
        ps.append(alpha / (s + _DC_EPS))
        us.append(c / (s + _DC_EPS))                       # (B, 1)

    # _masked_mean over (B*V, 1) rows, then the reference's extra /V
    edl = edl_sum / jnp.maximum(msum * v_heads, 1.0) / v_heads

    # DC regulariser (dc_loss): sum over ordered pairs i != j via the
    # symmetric unordered loop, / (V-1), masked mean over rows.
    dc_rows = jnp.zeros_like(rmask)
    for i in range(v_heads):
        for j in range(i + 1, v_heads):
            pd = 0.5 * jnp.sum(jnp.abs(ps[i] - ps[j]), axis=1, keepdims=True)
            cc = (1.0 - us[i]) * (1.0 - us[j])
            dc_rows = dc_rows + 2.0 * pd * cc
    dc = jnp.sum(dc_rows / max(1, v_heads - 1) * rmask) / jnp.maximum(msum, 1.0)
    return edl + gamma_t * dc * fused


def _make_epoch_kernel(keep: float, fused: float, num_classes: int,
                       weight_decay: float):
    """Kernel body: one grid step == one optimizer step."""

    def kernel(
        # per-step streamed inputs
        x_ref, drop_ref, yoh_ref, rmask_ref,
        # per-step SMEM scalars
        bc1_ref, bc2_ref,
        # per-epoch SMEM scalars
        lr_ref, coef_ref, gamma_ref,
        # initial state (read once at step 0)
        w1_in, b1_in, w2_in, b2_in,
        m1_in, m2_in, m3_in, m4_in,
        v1_in, v2_in, v3_in, v4_in,
        # carried state (VMEM-resident across the grid) + losses
        w1_o, b1_o, w2_o, b2_o,
        m1_o, m2_o, m3_o, m4_o,
        v1_o, v2_o, v3_o, v4_o,
        loss_ref,
    ):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for src, dst in (
                (w1_in, w1_o), (b1_in, b1_o), (w2_in, w2_o), (b2_in, b2_o),
                (m1_in, m1_o), (m2_in, m2_o), (m3_in, m3_o), (m4_in, m4_o),
                (v1_in, v1_o), (v2_in, v2_o), (v3_in, v3_o), (v4_in, v4_o),
            ):
                dst[...] = src[...]

        x = x_ref[0]                                   # (V, B, D)
        drop = drop_ref[0] if keep < 1.0 else None     # (V, B, H)
        yoh = yoh_ref[0]                               # (B, C)
        rmask = rmask_ref[0]                           # (B, 1)
        lr = lr_ref[0, 0]
        coef = coef_ref[0, 0]
        gamma_t = gamma_ref[0, 0]
        # per-step SMEM operands arrive as FULL (S, 1) arrays (Mosaic
        # rejects blocked (1,1) windows over them) — index by grid step
        bc1 = bc1_ref[step, 0]
        bc2 = bc2_ref[step, 0]

        def loss_of(params):
            evs = _stacked_forward(params, x, drop, keep, num_classes)
            return _avg_trusted_loss_2d(
                evs, yoh, rmask, coef, gamma_t, fused, num_classes
            )

        params = (w1_o[...], b1_o[...], w2_o[...], b2_o[...])
        loss, grads = jax.value_and_grad(loss_of)(params)
        loss_ref[step, 0] = loss

        # scale_by_adam + add_decayed_weights + scale(-1), LR folded in
        # afterwards — exactly core/train.step_fn's update arithmetic.
        for p_ref, m_ref, v_ref, g in zip(
            (w1_o, b1_o, w2_o, b2_o),
            (m1_o, m2_o, m3_o, m4_o),
            (v1_o, v2_o, v3_o, v4_o),
            grads,
        ):
            m = _B1 * m_ref[...] + (1.0 - _B1) * g
            v = _B2 * v_ref[...] + (1.0 - _B2) * (g * g)
            m_ref[...] = m
            v_ref[...] = v
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + _EPS)
            if weight_decay > 0.0:
                upd = upd + jnp.float32(weight_decay) * p_ref[...]
            p_ref[...] = p_ref[...] - lr * upd

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "keep", "fused", "num_classes", "weight_decay", "interpret"
    ),
)
def run_epoch_kernel(
    xs, drops, yohs, rmasks, bc1s, bc2s, lr, coef, gamma_t,
    params, mus, nus,
    *, keep: float, fused: float, num_classes: int, weight_decay: float,
    interpret: bool = False,
):
    """Run one epoch (S steps) in a single pallas_call.

    xs: (S, V, B, D) f32 permuted+padded batches; drops: (S, V, B, H)
    f32 {0,1} flax dropout masks (pass ones when keep == 1); yohs:
    (S, B, C) one-hot targets; rmasks: (S, B, 1) row masks; bc1s/bc2s:
    (S, 1) Adam bias corrections (1 - b^count per step); lr/coef/
    gamma_t: scalars. params/mus/nus: 4-tuples (w1 (V,D,H), b1 (V,H),
    w2 (V,H,C), b2 (V,C)). Returns (params', mus', nus', losses (S,)).
    """
    s_steps, v_heads, b_rows, d_in = xs.shape
    h_dim = params[0].shape[2]

    def scalar_spec(per_step):
        # Per-step scalar streams ride in SMEM as FULL (S, 1) arrays —
        # Mosaic's lowering rejects a blocked (1, 1) window over (S, 1)
        # (block dims must divide (8, 128) or equal the array dims), so
        # the kernel indexes them by pl.program_id instead.
        shape = (s_steps, 1) if per_step else (1, 1)
        return pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.SMEM,
        )

    def carried_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM
        )

    def stream_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * nd, memory_space=pltpu.VMEM
        )

    state_shapes = [p.shape for p in params] * 3
    out_shape = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in state_shapes]
        + [jax.ShapeDtypeStruct((s_steps, 1), jnp.float32)]
    )
    out_specs = (
        [carried_spec(s) for s in state_shapes] + [scalar_spec(True)]
    )

    kernel = _make_epoch_kernel(keep, fused, num_classes, weight_decay)
    outs = pl.pallas_call(
        kernel,
        grid=(s_steps,),
        in_specs=[
            stream_spec((v_heads, b_rows, d_in)),
            stream_spec((v_heads, b_rows, h_dim)),
            stream_spec((b_rows, num_classes)),
            stream_spec((b_rows, 1)),
            scalar_spec(True), scalar_spec(True),
            scalar_spec(False), scalar_spec(False), scalar_spec(False),
        ]
        + [carried_spec(s) for s in state_shapes],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        # the in-kernel value_and_grad materializes ~37 MB of stack
        # temporaries at bench shapes — over Mosaic's 16 MB default
        # scoped-vmem limit but well inside v5e's 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # sequential: state carry
        ),
    )(
        xs, drops, yohs, rmasks, bc1s, bc2s,
        jnp.reshape(lr.astype(jnp.float32), (1, 1)),
        jnp.reshape(coef.astype(jnp.float32), (1, 1)),
        jnp.reshape(gamma_t.astype(jnp.float32), (1, 1)),
        *params, *mus, *nus,
    )
    new_params, new_mus, new_nus = outs[0:4], outs[4:8], outs[8:12]
    losses = outs[12][:, 0]
    return tuple(new_params), tuple(new_mus), tuple(new_nus), losses
