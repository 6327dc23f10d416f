"""Evidence activation and Dirichlet-evidence fusion rules.

Semantics match the reference pipeline's evidence stack
(reference: utils.py:46-116) but are written as pure JAX functions over a
stacked ``(B, V, C)`` evidence tensor so that XLA fuses the whole fusion rule
into the surrounding train/eval step. The discounted-belief fusion is fully
vectorised over views (the reference loops over views in Python).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# log(1e13) as a python float: importing this module must NOT initialize a
# JAX backend (an import-time jnp op did exactly that, and under the axon
# sitecustomize — which force-pins the platform config — it dialed the TPU
# relay from every subprocess, even ones that set JAX_PLATFORMS=cpu).
# Bit-exact with the previous f32 computation: f32(13.0 * log(10)) rounds
# to the same value from the f64 product (verified on the CPU backend).
_LOG1E13 = 13.0 * math.log(10.0)


def evidence_activation(h: jax.Array, activation: str = "exp") -> jax.Array:
    """Map raw head outputs to non-negative Dirichlet evidence.

    ``exp`` variant is the saturated exponential
    ``exp(h) * 1e13 / (exp(h) + 1e13)`` with ``h`` clamped to [-10, 10],
    evaluated in log-space for stability (reference: utils.py:46-63).
    """
    if activation == "softplus":
        return jax.nn.softplus(h)
    h = jnp.clip(h, -10.0, 10.0)
    log1e13 = jnp.asarray(_LOG1E13, dtype=h.dtype)
    log_f = h + log1e13 - jnp.logaddexp(h, log1e13)
    return jnp.exp(log_f)


def cml_fusion(all_evidences: jax.Array) -> jax.Array:
    """Cumulative fusion: sum of per-view evidences (reference: utils.py:66-68)."""
    return jnp.sum(all_evidences, axis=1)


def avg_fusion(all_evidences: jax.Array) -> jax.Array:
    """Average fusion: mean of per-view evidences (reference: utils.py:71-73)."""
    return jnp.mean(all_evidences, axis=1)


def disentangled_fusion(all_evidences: jax.Array, shared_index: int = 0) -> jax.Array:
    """Sum of evidences excluding the shared view (reference: utils.py:76-78)."""
    total = jnp.sum(all_evidences, axis=1)
    return total - all_evidences[:, shared_index, :]


def joint_fusion(
    all_evidences: jax.Array, shared_index: int = 0, shared_weight: float = 0.5
) -> jax.Array:
    """``w * shared + (1-w) * sum(private)`` (reference: utils.py:81-86)."""
    shared = all_evidences[:, shared_index, :]
    disentangled = jnp.sum(all_evidences, axis=1) - shared
    return shared_weight * shared + (1.0 - shared_weight) * disentangled


def discounted_belief_fusion(all_evidences: jax.Array, flambda: float = 3.0) -> jax.Array:
    """Conflict-aware discounted belief fusion (reference: utils.py:88-116).

    For each view i, a discount factor is computed from pairwise
    probability disagreement ``cp`` and certainty coupling ``cc`` against all
    views j; beliefs are discounted, uncertainty is renormalised so that
    ``sum(belief) + u == 1``, and the discounted evidences are averaged.
    Fully vectorised over the view axis (no Python loop).
    """
    num_classes = all_evidences.shape[-1]
    # NOTE: near-duplicates ops/dirichlet.py::dc_loss's alpha/S/p/u block on
    # purpose — the reference's dbf divides by S exactly (utils.py:94-97)
    # while its dc loss divides by S + 1e-8 (losses.py:173-174); both are
    # pinned by golden tests, so do NOT factor them into one helper.
    denominator = jnp.sum(all_evidences + 1.0, axis=-1, keepdims=True)  # (B, V, 1)
    prob = (all_evidences + 1.0) / denominator                          # (B, V, C)
    belief = all_evidences / denominator                                # (B, V, C)
    uncertainty = num_classes / denominator                             # (B, V, 1)

    # cp[b, i, j] = 0.5 * sum_c |p[b,i,c] - p[b,j,c]|
    cp = 0.5 * jnp.sum(
        jnp.abs(prob[:, :, None, :] - prob[:, None, :, :]), axis=-1
    )                                                                   # (B, V, V)
    one_minus_u = 1.0 - uncertainty[..., 0]                             # (B, V)
    cc = one_minus_u[:, :, None] * one_minus_u[:, None, :]              # (B, V, V)
    dc = cp * cc
    # agreement[b, i] = prod_j (1 - dc^lambda)^(1/lambda); j == i term is 1.
    agreement = jnp.prod((1.0 - dc**flambda) ** (1.0 / flambda), axis=2)  # (B, V)

    discount = agreement[..., None]                                     # (B, V, 1)
    belief = belief * discount
    uncertainty = uncertainty * discount + 1.0 - discount
    discounted_evidence = num_classes * belief / (uncertainty + 1e-6)
    return jnp.mean(discounted_evidence, axis=1)


AGGREGATIONS = {
    "cml": cml_fusion,
    "avg": avg_fusion,
    "joint": joint_fusion,
    "disentangled": disentangled_fusion,
    "dbf": discounted_belief_fusion,
}
