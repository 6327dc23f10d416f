"""Stirling gammaln/digamma vs jax.scipy.special over the EDL domain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import digamma, gammaln

from disentagled_multimodal_fusion_tpu.ops.special import (
    digamma_stirling,
    gammaln_stirling,
)

# alpha = evidence + 1 spans [1, 1e13]; row sums reach ~7e14 (ops/evidence.py
# saturation cap x 70 heads). Cover the whole span plus the dense low end.
XS = np.concatenate(
    [
        np.linspace(1.0, 20.0, 997),
        np.geomspace(1.0, 7e14, 1001),
    ]
).astype(np.float32)


def test_gammaln_matches_reference():
    ours = np.asarray(gammaln_stirling(jnp.asarray(XS)))
    ref = np.asarray(gammaln(jnp.asarray(XS)))
    # gammaln crosses 0 at x=1 and x=2; the recurrence-shifted Stirling form
    # is big-minus-big there, so f32 cancellation floors the ABSOLUTE error
    # at ~2e-4 (the relative error away from the zeros stays ~1e-6). At loss
    # scale (EDL KL terms are O(1)+) this is noise; the megakernel's e2e
    # parity tests bound the end effect.
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=5e-4)


def test_digamma_matches_reference():
    ours = np.asarray(digamma_stirling(jnp.asarray(XS)))
    ref = np.asarray(digamma(jnp.asarray(XS)))
    np.testing.assert_allclose(ours, ref, rtol=2e-6, atol=2e-6)


def test_gradients_are_consistent():
    # d/dx gammaln == digamma (of the same approximation family): the
    # autodiff'd Stirling gammaln should track the reference digamma.
    xs = jnp.asarray(np.geomspace(1.0, 1e6, 301).astype(np.float32))
    g = jax.vmap(jax.grad(lambda x: gammaln_stirling(x)))(xs)
    ref = np.asarray(digamma(xs))
    np.testing.assert_allclose(np.asarray(g), ref, rtol=5e-5, atol=5e-5)


def test_digamma_grad_positive():
    # trigamma > 0 everywhere on the domain: the autodiff'd backward the
    # megakernel relies on must not change sign or blow up.
    xs = jnp.asarray(np.geomspace(1.0, 1e12, 301).astype(np.float32))
    g = jax.vmap(jax.grad(lambda x: digamma_stirling(x)))(xs)
    assert np.all(np.asarray(g) > 0)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("fn, ref", [(gammaln_stirling, gammaln), (digamma_stirling, digamma)])
def test_f32_dtype_preserved(fn, ref):
    out = fn(jnp.asarray([1.5, 3.0], jnp.float32))
    assert out.dtype == jnp.float32
