"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.ops.evidence import evidence_activation
from disentagled_multimodal_fusion_tpu.ops.pallas_kernels import (
    evidential_head_fused,
    evidential_heads_stacked,
)

RNG = np.random.default_rng(0)
INTERPRET = jax.default_backend() != "tpu"


def _ref(x, w1, b1, w2, b2):
    h = np.maximum(x @ w1 + b1, 0.0)
    return np.asarray(evidence_activation(jnp.asarray(h @ w2 + b2)))


def test_fused_head_matches_reference():
    b, d, h, c = 100, 200, 128, 10
    x = RNG.standard_normal((b, d)).astype(np.float32)
    w1 = (RNG.standard_normal((d, h)) * 0.05).astype(np.float32)
    b1 = RNG.standard_normal(h).astype(np.float32) * 0.01
    w2 = (RNG.standard_normal((h, c)) * 0.05).astype(np.float32)
    b2 = RNG.standard_normal(c).astype(np.float32) * 0.01
    out = np.asarray(evidential_head_fused(x, w1, b1, w2, b2, interpret=INTERPRET))
    ref = _ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_fused_head_odd_shapes():
    b, d, h, c = 13, 47, 33, 68  # deliberately unaligned
    x = RNG.standard_normal((b, d)).astype(np.float32)
    w1 = (RNG.standard_normal((d, h)) * 0.1).astype(np.float32)
    b1 = np.zeros(h, np.float32)
    w2 = (RNG.standard_normal((h, c)) * 0.1).astype(np.float32)
    b2 = np.zeros(c, np.float32)
    out = np.asarray(evidential_head_fused(x, w1, b1, w2, b2, interpret=INTERPRET))
    ref = _ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_stacked_heads():
    v, b, d, h, c = 3, 32, 16, 24, 5
    xs = RNG.standard_normal((v, b, d)).astype(np.float32)
    w1s = (RNG.standard_normal((v, d, h)) * 0.1).astype(np.float32)
    b1s = np.zeros((v, h), np.float32)
    w2s = (RNG.standard_normal((v, h, c)) * 0.1).astype(np.float32)
    b2s = np.zeros((v, c), np.float32)
    out = np.asarray(
        evidential_heads_stacked(xs, w1s, b1s, w2s, b2s, interpret=INTERPRET)
    )
    assert out.shape == (b, v, c)
    for i in range(v):
        ref = _ref(xs[i], w1s[i], b1s[i], w2s[i], b2s[i])
        np.testing.assert_allclose(out[:, i], ref, rtol=1e-5, atol=1e-6)


def test_large_unaligned_batch_tail_rows():
    """Regression: B > tile (512) and not a tile multiple — the grid must
    cover the tail tile (600 // 512 == 1 silently dropped rows 512+)."""
    b, d, h, c = 600, 40, 32, 10
    x = RNG.standard_normal((b, d)).astype(np.float32)
    w1 = (RNG.standard_normal((d, h)) * 0.1).astype(np.float32)
    b1 = np.zeros(h, np.float32)
    w2 = (RNG.standard_normal((h, c)) * 0.1).astype(np.float32)
    b2 = np.zeros(c, np.float32)
    out = np.asarray(evidential_head_fused(x, w1, b1, w2, b2, interpret=INTERPRET))
    ref = _ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
