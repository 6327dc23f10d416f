"""Dirichlet / evidential-deep-learning math.

Implements the EDL digamma loss with annealed KL regulariser, the Dirichlet
KL-to-uniform, the vectorised disagreement-consistency (DC) loss, the
multi-view AvgTrusted criterion, the single-head evidential loss, and the
epistemic/aleatoric uncertainty decomposition
(reference: models/losses.py:117-272, analysis.py:27-34).

All functions take an optional ``mask`` of shape (B,) with {0,1} entries so
that a padded (static-shape) final batch reproduces exactly the per-batch
means PyTorch computes on a ragged final batch. Loss math is forced to
float32 regardless of the surrounding compute dtype — the digamma/lgamma
stack is precision-sensitive and drives the calibration metrics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Mean of ``x`` over axis 0, restricted to rows where ``mask`` is 1."""
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    # Broadcast mask across any trailing axes of x.
    bshape = (mask.shape[0],) + (1,) * (x.ndim - 1)
    m = mask.reshape(bshape)
    denom = jnp.sum(mask) * (x.size / x.shape[0])
    return jnp.sum(x * m) / jnp.maximum(denom, 1.0)


def dirichlet_kl_to_uniform(alpha: jax.Array, num_classes: int) -> jax.Array:
    """KL( Dir(alpha) || Dir(1,...,1) ), per row (reference: losses.py:189-204).

    alpha: (B, C) -> returns (B, 1).
    """
    alpha = alpha.astype(jnp.float32)
    sum_alpha = jnp.sum(alpha, axis=1, keepdims=True)
    first = (
        gammaln(sum_alpha)
        - jnp.sum(gammaln(alpha), axis=1, keepdims=True)
        - gammaln(jnp.asarray(float(num_classes), dtype=jnp.float32))
    )
    second = jnp.sum(
        (alpha - 1.0) * (digamma(alpha) - digamma(sum_alpha)), axis=1, keepdims=True
    )
    return first + second


def edl_digamma_loss(
    alpha: jax.Array,
    target_onehot: jax.Array,
    annealing_step: jax.Array,
    num_classes: int,
    annealing_start: float,
    use_kl: bool = True,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Digamma-form EDL loss, mean over rows (reference: losses.py:117-138).

    ``A = sum_c y_c (digamma(S) - digamma(alpha_c))`` plus the annealed
    KL( Dir(alpha~) || Dir(1) ) where ``alpha~ = (alpha-1)(1-y)+1`` and the
    annealing coefficient is ``min(1, annealing_step / annealing_start)``.
    """
    alpha = alpha.astype(jnp.float32)
    y = target_onehot.astype(jnp.float32)
    s = jnp.sum(alpha, axis=1, keepdims=True)
    a_term = jnp.sum(y * (digamma(s) - digamma(alpha)), axis=1, keepdims=True)
    if not use_kl:
        return _masked_mean(a_term, mask)
    coef = jnp.minimum(
        jnp.float32(1.0),
        jnp.asarray(annealing_step, jnp.float32) / jnp.float32(annealing_start),
    )
    kl_alpha = (alpha - 1.0) * (1.0 - y) + 1.0
    kl = coef * dirichlet_kl_to_uniform(kl_alpha, num_classes)
    return _masked_mean(a_term + kl, mask)


def dc_loss(
    evidences: jax.Array, eps: float = 1e-8, mask: Optional[jax.Array] = None
) -> jax.Array:
    """Vectorised disagreement-consistency loss (reference: losses.py:161-187).

    evidences: (B, V, C) non-negative per-view evidences -> scalar.
    """
    evidences = evidences.astype(jnp.float32)
    _, v, c = evidences.shape
    alpha = evidences + 1.0
    s = jnp.sum(alpha, axis=-1, keepdims=True)
    p = alpha / (s + eps)
    u = (c / (s + eps))[..., 0]                                      # (B, V)

    pd = 0.5 * jnp.sum(jnp.abs(p[:, :, None, :] - p[:, None, :, :]), axis=-1)
    one_minus_u = 1.0 - u
    cc = one_minus_u[:, :, None] * one_minus_u[:, None, :]
    dc = pd * cc                                                      # (B, V, V)
    dc_per_i = jnp.sum(dc, axis=2) / max(1, v - 1)                    # (B, V)
    dc_sum_batch = jnp.sum(dc_per_i, axis=1)                          # (B,)
    return _masked_mean(dc_sum_batch, mask)


def avg_trusted_loss(
    evidences: jax.Array,
    target: jax.Array,
    evidence_a: jax.Array,
    annealing_step: jax.Array,
    num_views: int,
    annealing_start: float = 50.0,
    gamma: float = 1.0,
    fused: float = 1.0,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-view trusted EDL criterion (reference: losses.py:209-248).

    ``loss = mean_{B,V}(EDL per view) / V + gamma_t * DC * fused`` with
    ``gamma_t = 0.2 (1-t) + gamma t``, ``t = min(1, step / max(1, start))``.

    Deliberate reference-quirk parity: the fused-branch EDL term is computed
    but never added to the returned loss in the reference
    (losses.py:226-228 vs 247), so we do not compute it at all; the ``fused``
    flag only gates the DC regulariser. ``evidence_a`` is accepted to keep
    the call signature shape-compatible but is unused — exactly matching the
    reference's effective math.
    """
    del evidence_a  # dead branch in the reference; see docstring.
    b, v, c = evidences.shape
    assert v == num_views
    target_onehot = jax.nn.one_hot(target, c, dtype=jnp.float32)

    alpha_flat = (evidences.astype(jnp.float32) + 1.0).reshape(b * v, c)
    target_flat = jnp.repeat(target_onehot, v, axis=0)
    mask_flat = None if mask is None else jnp.repeat(mask, v, axis=0)

    loss_views_mean = edl_digamma_loss(
        alpha_flat, target_flat, annealing_step, c, annealing_start, mask=mask_flat
    )
    loss_acc = loss_views_mean / v

    t = jnp.minimum(
        jnp.float32(1.0),
        jnp.asarray(annealing_step, jnp.float32) / max(1.0, float(annealing_start)),
    )
    gamma_t = 0.2 * (1.0 - t) + gamma * t
    return loss_acc + gamma_t * dc_loss(evidences, mask=mask) * fused


def single_evidential_loss(
    evidence: jax.Array,
    target: jax.Array,
    annealing_step: jax.Array,
    annealing_start: float = 50.0,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """One-head EDL loss for intermediate fusion (reference: losses.py:250-272)."""
    c = evidence.shape[-1]
    target_onehot = jax.nn.one_hot(target, c, dtype=jnp.float32)
    alpha = evidence.astype(jnp.float32) + 1.0
    return edl_digamma_loss(alpha, target_onehot, annealing_step, c, annealing_start, mask=mask)


def dirichlet_uncertainties(evidence: jax.Array, num_classes: int):
    """Epistemic / aleatoric decomposition (reference: analysis.py:27-34).

    evidence: (B, C) with alpha = evidence + 1. Returns (epistemic, aleatoric),
    each (B,): epistemic = K / S; aleatoric =
    ``-sum_c p_c (digamma(alpha_c + 1) - digamma(S + 1))``.
    """
    evidence = evidence.astype(jnp.float32)
    alphas = evidence + 1.0
    s = jnp.sum(alphas, axis=-1, keepdims=True)
    probs = alphas / s
    epistemic = (num_classes / s)[..., 0]
    aleatoric = -jnp.sum(probs * (digamma(alphas + 1.0) - digamma(s + 1.0)), axis=-1)
    return epistemic, aleatoric
