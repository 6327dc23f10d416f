"""Gaussian latent-variable ops: reparameterisation, KL, product-of-experts.

Reference semantics: models/dmvae.py:80-112. Written over a stacked
``(K, B, D)`` expert axis so the PoE is one fused reduction on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mu + eps * exp(0.5 logvar), eps ~ N(0, I) (reference: dmvae.py:80-84)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return mu + eps * std


def gaussian_kl_standard(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL( N(mu, sigma^2) || N(0, I) ) summed over feature dim, per row.

    Returns shape (B,) (reference: dmvae.py:86-89).
    """
    return -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)


def product_of_experts(
    mus: jax.Array,
    logvars: jax.Array,
    temperature: float = 1.0,
    include_prior: bool = True,
):
    """Tempered Gaussian PoE with optional N(0, I) prior-as-expert.

    mus/logvars: (K, B, D) stacked expert parameters. Temperature T > 1
    softens the experts by dividing each precision by T
    (reference: dmvae.py:91-112). Returns (mu, logvar) each (B, D).
    """
    if include_prior:
        prior_mu = jnp.zeros_like(mus[:1])
        prior_logvar = jnp.zeros_like(logvars[:1])
        mus = jnp.concatenate([mus, prior_mu], axis=0)
        logvars = jnp.concatenate([logvars, prior_logvar], axis=0)

    precisions = jnp.exp(-logvars) / max(temperature, 1e-8)
    precision_sum = jnp.sum(precisions, axis=0) + 1e-8
    var = 1.0 / precision_sum
    mu = var * jnp.sum(precisions * mus, axis=0)
    logvar = jnp.log(var)
    return mu, logvar
