"""Supervised-contrastive (SupCon/SimCLR) and orthogonality losses.

Reference semantics: models/losses.py:7-110. The SupCon variant here keeps
the reference's cross-modality mask surgery: within-view pairs are masked
out of both the positives and the normalising denominator, and a detached
within-view diagnostic (loss_x, loss_y) is returned for the 2-view case.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def supcon_loss(
    features: jax.Array,
    labels: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """SupCon loss over ``features`` of shape (B, V, D).

    Returns ``(loss, loss_x, loss_y)`` where loss_x/loss_y are the detached
    per-view diagnostics the reference computes for V == 2
    (reference: losses.py:17-101). With ``labels`` and ``mask`` both None this
    is the SimCLR unsupervised loss with identity positives.
    """
    if features.ndim < 3:
        raise ValueError("`features` must be (B, V, ...)")
    if features.ndim > 3:
        features = features.reshape(features.shape[0], features.shape[1], -1)

    batch_size, contrast_count = features.shape[0], features.shape[1]
    if labels is not None and mask is not None:
        raise ValueError("Cannot define both `labels` and `mask`")
    elif labels is None and mask is None:
        mask = jnp.eye(batch_size, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    # (V*B, D): views unbound along axis 1 then concatenated.
    contrast_feature = jnp.concatenate(
        [features[:, v] for v in range(contrast_count)], axis=0
    )
    if contrast_mode == "one":
        anchor_feature, anchor_count = features[:, 0], 1
    elif contrast_mode == "all":
        anchor_feature, anchor_count = contrast_feature, contrast_count
    else:
        raise ValueError(f"Unknown mode: {contrast_mode}")

    logits = (anchor_feature @ contrast_feature.T) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    n = anchor_count * batch_size
    mask = jnp.tile(mask, (anchor_count, contrast_count))
    # Cross-modality surgery: zero within-view corner blocks (losses.py:73-76).
    logits_mask = jnp.ones((n, contrast_count * batch_size), dtype=jnp.float32)
    logits_mask = logits_mask.at[:batch_size, :batch_size].set(0.0)
    logits_mask = logits_mask.at[batch_size:, batch_size:].set(0.0)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-12)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.sum(mask, axis=1)

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    loss = jnp.mean(loss.reshape(anchor_count, batch_size))

    # Detached within-view diagnostics (losses.py:89-99); defined for V == 2.
    logits_mask_x = jnp.ones_like(mask)
    logits_mask_x = logits_mask_x.at[:batch_size, batch_size:].set(0.0)
    logits_mask_x = logits_mask_x.at[batch_size:, :batch_size].set(0.0)
    exp_logits_x = jnp.exp(logits) * logits_mask_x
    log_prob_x = logits - jnp.log(jnp.sum(exp_logits_x, axis=1, keepdims=True))
    mask_x = jnp.eye(n, dtype=jnp.float32)
    mean_log_prob_pos_x = jnp.sum(mask_x * log_prob_x, axis=1) / jnp.sum(mask_x, axis=1)
    loss_xy = -(temperature / base_temperature) * mean_log_prob_pos_x
    loss_xy = jax.lax.stop_gradient(
        jnp.mean(loss_xy.reshape(anchor_count, batch_size), axis=1)
    )
    loss_x, loss_y = loss_xy[0], loss_xy[-1]
    return loss, loss_x, loss_y


def _l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # Matches torch.nn.functional.normalize: x / max(||x||, eps).
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def ortho_loss(z1: jax.Array, zs: jax.Array) -> jax.Array:
    """Frobenius norm of normalized(z1)^T @ normalized(zs) (losses.py:104-110)."""
    z1 = _l2_normalize(z1, axis=-1)
    zs = _l2_normalize(zs, axis=-1)
    return jnp.linalg.norm(z1.T @ zs)
