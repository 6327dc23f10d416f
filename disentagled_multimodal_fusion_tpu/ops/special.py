"""Mosaic-lowerable gammaln / digamma (Stirling series + recurrence).

``jax.scipy.special.{gammaln,digamma}`` lower to XLA's ``lgamma``/``digamma``
HLOs, which have no Mosaic (Pallas-TPU) lowering — a whole-step Pallas
kernel over the EDL loss stack (ops/dirichlet.py, reference math
models/losses.py:117-248) therefore needs its own implementations built
from elementwise primitives only (log, reciprocal, polynomial). These are
ordinary traceable jnp functions: they work inside and outside kernels,
and ``jax.grad`` differentiates the approximation itself (no custom VJP
needed), which keeps forward and backward mutually consistent.

Domain: x >= 1 (the EDL stack only ever evaluates alpha = evidence + 1
and its row sums, so x in [1, ~7e14] — see ops/evidence.py's saturated
activation cap of 1e13 per class). The argument is recurrence-shifted by
``_SHIFT`` so the asymptotic series runs at z >= 1 + _SHIFT, where its
truncation error is far below f32 resolution.

Accuracy vs jax.scipy.special on [1, 1e14]: rel err < 2e-6 (f32), see
tests/test_special.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_SHIFT = 8  # recurrence steps: series evaluated at z = x + 8 >= 9
_HALF_LOG_2PI = float(0.5 * math.log(2.0 * math.pi))


def gammaln_stirling(x: jnp.ndarray) -> jnp.ndarray:
    """log Gamma(x) for x >= 1, elementwise-only ops (f32 accuracy).

    gammaln(x) = gammaln(x + 8) - sum_{k=0..7} log(x + k), with the
    Stirling series at z = x + 8:
    (z-1/2) log z - z + log(2 pi)/2 + 1/(12 z) - 1/(360 z^3) + 1/(1260 z^5).
    """
    x = x.astype(jnp.float32)
    z = x + jnp.float32(_SHIFT)
    # sum of logs, not log of product: the product overflows f32 for the
    # saturated-evidence tail (x ~ 1e13 -> prod ~ 1e104).
    shift_logs = jnp.zeros_like(x)
    for k in range(_SHIFT):
        shift_logs = shift_logs + jnp.log(x + jnp.float32(k))
    logz = jnp.log(z)
    rz = 1.0 / z
    rz2 = rz * rz
    series = rz * (
        jnp.float32(1.0 / 12.0)
        + rz2 * (jnp.float32(-1.0 / 360.0) + rz2 * jnp.float32(1.0 / 1260.0))
    )
    return (z - 0.5) * logz - z + jnp.float32(_HALF_LOG_2PI) + series - shift_logs


def digamma_stirling(x: jnp.ndarray) -> jnp.ndarray:
    """psi(x) for x >= 1, elementwise-only ops (f32 accuracy).

    digamma(x) = digamma(x + 8) - sum_{k=0..7} 1/(x + k), with the
    asymptotic series at z = x + 8:
    log z - 1/(2z) - 1/(12 z^2) + 1/(120 z^4) - 1/(252 z^6).
    """
    x = x.astype(jnp.float32)
    z = x + jnp.float32(_SHIFT)
    shift_recip = jnp.zeros_like(x)
    for k in range(_SHIFT):
        shift_recip = shift_recip + 1.0 / (x + jnp.float32(k))
    rz = 1.0 / z
    rz2 = rz * rz
    series = rz2 * (
        jnp.float32(-1.0 / 12.0)
        + rz2 * (jnp.float32(1.0 / 120.0) - rz2 * jnp.float32(1.0 / 252.0))
    )
    return jnp.log(z) - 0.5 * rz + series - shift_recip
