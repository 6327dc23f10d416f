"""Pallas TPU kernels for the evidential hot path.

``evidential_head_fused`` runs the probe-head forward — Dense -> ReLU ->
Dense -> saturated-exp evidence activation (reference math:
classifiers.py:469-502 + utils.py:46-63) — as ONE VMEM-resident kernel:
both matmuls hit the MXU back-to-back and the activation chain never
round-trips to HBM. A (1+N)-head probe stacks its heads on the leading
grid axis so every head's forward shares the same kernel launch.

Weights for these heads are KB-scale (in <= 3072, hidden 128, C <= 68),
so everything fits VMEM comfortably; the batch axis is tiled to the MXU
sublane size. Exercised in interpret mode by tests/test_pallas.py and
compiled on real v5e.

Measured on v5e-1 (B=1600, D=200, H=128, C=10): kernel matches the XLA
path to ~2e-4 relative (Mosaic vs XLA f32 transcendental rounding in the
exp/logaddexp chain) and ties it on wall-clock (~410 us/dispatch, fully
dominated by per-call dispatch latency at these sizes — XLA already fuses
this chain into two MXU ops, confirming SURVEY.md §7's expectation). Kept
as the kernel-path exemplar and for future wide-head models; the flax path
remains the default.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG1E13 = float(13.0 * math.log(10.0))  # python float: kernels can't capture tracers


def _head_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """One batch-tile of: evidence_activation(relu(x W1 + b1) W2 + b2)."""
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0)
    logits = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    # saturated-exp evidence activation in log space (utils.py:46-63)
    z = jnp.clip(logits, -10.0, 10.0)
    log_f = z + _LOG1E13 - jnp.logaddexp(z, _LOG1E13)
    out_ref[:] = jnp.exp(log_f)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def evidential_head_fused(x, w1, b1, w2, b2, interpret: bool = False):
    """Fused evidential head forward.

    x: (B, D); w1: (D, H); b1: (H,); w2: (H, C); b2: (C,) -> (B, C)
    evidence. Pads B to the f32 sublane tile (8) and C to the lane tile
    (128) and slices back — the kernel itself sees aligned shapes.
    """
    b, d = x.shape
    h = w1.shape[1]
    c = w2.shape[1]
    # pad B to a multiple of the batch tile so the grid covers every row
    # (bp // tile_b with a non-multiple silently dropped the tail tile)
    tile_b = min(_round_up(max(b, 8), 8), 512)
    bp = _round_up(max(b, 8), tile_b)
    cp = _round_up(max(c, 128), 128)
    hp = _round_up(max(h, 128), 128)
    dp = _round_up(max(d, 128), 128)

    xp = jnp.zeros((bp, dp), jnp.float32).at[:b, :d].set(x.astype(jnp.float32))
    w1p = jnp.zeros((dp, hp), jnp.float32).at[:d, :h].set(w1.astype(jnp.float32))
    b1p = jnp.zeros((1, hp), jnp.float32).at[0, :h].set(b1.astype(jnp.float32))
    w2p = jnp.zeros((hp, cp), jnp.float32).at[:h, :c].set(w2.astype(jnp.float32))
    b2p = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(b2.astype(jnp.float32))

    grid = (bp // tile_b,)
    out = pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((bp, cp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w1p, b1p, w2p, b2p)
    return out[:b, :c]


def evidential_heads_stacked(x_stack, w1s, b1s, w2s, b2s, interpret: bool = False):
    """V heads over V inputs, vmapped over the head axis.

    x_stack: (V, B, D); w1s: (V, D, H); ... -> (B, V, C) evidences
    (the probe's stacked layout, evidential_probe.py:97-103). vmap lifts
    the per-head kernel over the V axis (Mosaic turns this into a batched
    grid), so all heads share one compiled kernel.
    """
    f = functools.partial(evidential_head_fused, interpret=interpret)
    ev = jax.vmap(f)(x_stack, w1s, b1s, w2s, b2s)  # (V, B, C)
    return jnp.transpose(ev, (1, 0, 2))
