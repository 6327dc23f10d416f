"""Von Mises-Fisher sampling on the hypersphere, jit-compatible.

Reference semantics: models/classifiers.py:281-441 (Wood-1994 rejection
sampler with a Taylor-blended envelope parameter for large kappa, plus a
Householder rotation from the north pole onto ``loc``). The reference uses a
data-dependent Python while-loop; here the rejection loop is a
``lax.while_loop`` over fixed-shape proposal batches so the whole sampler
compiles into the train step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _sample_w3(key: jax.Array, scale: jax.Array, shape) -> jax.Array:
    """Closed-form w sampler for m == 3 (classifiers.py:337-347)."""
    u = jax.random.uniform(key, shape)
    stacked = jnp.stack([jnp.log(u), jnp.log1p(-u) - 2.0 * scale], axis=0)
    return 1.0 + jax.scipy.special.logsumexp(stacked, axis=0) / scale


def _sample_w_rej(key: jax.Array, scale: jax.Array, m: int) -> jax.Array:
    """Rejection sampler for the marginal w (classifiers.py:349-431).

    scale: (B, 1) concentration kappa. Returns w of shape (B, 1).
    """
    c = jnp.sqrt(4.0 * scale**2 + (m - 1) ** 2)
    b_true = (-2.0 * scale + c) / (m - 1)
    # Taylor blend for kappa in (10, 11) to avoid numerical error at large kappa.
    b_app = (m - 1) / (4.0 * scale)
    s = jnp.clip(scale - 10.0, 0.0, 1.0)
    b = b_app * s + b_true * (1.0 - s)

    a = (m - 1 + 2.0 * scale + c) / 4.0
    d = (4.0 * a * b) / (1.0 + b) - (m - 1) * math.log(m - 1)

    con = (m - 1) / 2.0
    eps = 1e-20

    def cond(state):
        _, _, accepted = state
        return jnp.logical_not(jnp.all(accepted))

    def body(state):
        key, w, accepted = state
        key, k_e, k_u = jax.random.split(key, 3)
        e = jax.random.beta(k_e, con, con, shape=scale.shape)
        u = jax.random.uniform(k_u, scale.shape, minval=eps, maxval=1.0 - eps)
        w_prop = (1.0 - (1.0 + b) * e) / (1.0 - (1.0 - b) * e)
        t = (2.0 * a * b) / (1.0 - (1.0 - b) * e)
        accept = ((m - 1.0) * jnp.log(t) - t + d) > jnp.log(u)
        take = jnp.logical_and(accept, jnp.logical_not(accepted))
        w = jnp.where(take, w_prop, w)
        accepted = jnp.logical_or(accepted, accept)
        return key, w, accepted

    init = (key, jnp.zeros_like(scale), jnp.zeros_like(scale, dtype=bool))
    _, w, _ = jax.lax.while_loop(cond, body, init)
    return w


def _householder_rotation(x: jax.Array, loc: jax.Array) -> jax.Array:
    """Rotate north-pole-aligned samples onto loc (classifiers.py:433-437)."""
    e1 = jnp.zeros_like(loc).at[..., 0].set(1.0)
    u = e1 - loc
    u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-5)
    return x - 2.0 * jnp.sum(x * u, axis=-1, keepdims=True) * u


def vmf_rsample(key: jax.Array, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """One reparameterised vMF sample per row.

    loc: (B, D) unit mean directions; scale: (B, 1) kappa. The gradient flows
    through the tangential component exactly as in the reference's rsample.
    """
    m = loc.shape[-1]
    k_w, k_v = jax.random.split(key)
    if m == 3:
        w = _sample_w3(k_w, scale, scale.shape)
    else:
        w = _sample_w_rej(k_w, scale, m)
    v = jax.random.normal(k_v, loc.shape[:-1] + (m - 1,), dtype=loc.dtype)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    w_tangent = jnp.sqrt(jnp.clip(1.0 - w**2, 1e-10))
    x = jnp.concatenate([w, w_tangent * v], axis=-1)
    return _householder_rotation(x, loc)
