"""Keyed, vectorised data augmentations for DisentangledSSL.

Reference semantics: utils.py:118-151 — each sample independently receives
one of {gaussian noise, random feature drop, identity}. The reference loops
over the batch in Python; here one fused select over precomputed variants
runs on-device (the three variants are cheap elementwise ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def noise(key: jax.Array, x: jax.Array, scale: float = 0.01) -> jax.Array:
    """x + N(0, scale^2) elementwise (reference: utils.py:118-120)."""
    return x + jax.random.normal(key, x.shape, dtype=x.dtype) * scale


def swap(x: jax.Array) -> jax.Array:
    """Swap the two halves of the batch (reference: utils.py:122-124)."""
    mid = x.shape[0] // 2
    return jnp.concatenate([x[mid:], x[:mid]], axis=0)


def random_drop(key: jax.Array, x: jax.Array, drop_scale: int = 10) -> jax.Array:
    """Zero a random 1/drop_scale of features per row (reference: utils.py:126-131).

    x: (B, D). Exactly ``D // drop_scale`` features are zeroed per row,
    chosen without replacement (rank-threshold on iid uniforms).
    """
    d = x.shape[-1]
    drop_num = d // drop_scale
    scores = jax.random.uniform(key, x.shape)
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    keep = (ranks >= drop_num).astype(x.dtype)
    return x * keep


def identity_fn(x: jax.Array) -> jax.Array:
    """Identity augmentation (reference: utils.py:133-134)."""
    return x


def augment_data(
    key: jax.Array, x_batch: jax.Array, noise_scale: float = 0.01, drop_scale: int = 10
) -> jax.Array:
    """Per-sample random pick among {noise, drop, identity} (utils.py:136-151)."""
    k_choice, k_noise, k_drop = jax.random.split(key, 3)
    choice = jax.random.randint(k_choice, (x_batch.shape[0],), 0, 3)
    noised = noise(k_noise, x_batch, scale=noise_scale)
    dropped = random_drop(k_drop, x_batch, drop_scale=drop_scale)
    c = choice.reshape(-1, *([1] * (x_batch.ndim - 1)))
    return jnp.where(c == 0, noised, jnp.where(c == 1, dropped, x_batch))
