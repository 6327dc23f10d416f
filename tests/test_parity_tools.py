"""Smoke tests for the cross-framework parity tools (tools/parity_*.py).

The full campaigns run out-of-band (results/parity_check_*.json); these
tests pin that the torch replicas and the JAX fits stay importable and
numerically sane at tiny shapes, so refactors of the product code can't
silently strand the parity harness.
"""

import numpy as np
import pytest

import sys
from pathlib import Path

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))


def _tiny_views(seed=0, n=60, dims=(12, 10, 8)):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n, d)).astype(np.float32) for d in dims]


def test_dmvae_backbone_replicas_tiny():
    """torch_dmvae_fit (reference-math replica, dmvae.py:128-188) and
    jax_dmvae_fit (our backbone under the parity protocol) both train at
    tiny shapes: finite decreasing losses, matching embedding layouts."""
    import jax.numpy as jnp

    from parity_dmvae import jax_dmvae_fit, torch_dmvae_fit

    dims = (12, 10, 8)
    views_tr = _tiny_views(0, 60, dims)
    views_te = _tiny_views(1, 20, dims)

    t_losses, t_emb_tr, t_emb_te = torch_dmvae_fit(
        views_tr, views_te, list(dims), seed=0, embed_dim=6, hidden_dim=16,
        lr=1e-3, epochs=6, batch=20,
    )
    xs_tr = tuple(jnp.asarray(v) for v in views_tr)
    xs_te = tuple(jnp.asarray(v) for v in views_te)
    j_losses, j_emb_tr, j_emb_te = jax_dmvae_fit(
        xs_tr, xs_te, list(dims), seed=0, embed_dim=6, hidden_dim=16,
        lr=1e-3, epochs=6, batch=20,
    )

    for losses in (t_losses, j_losses):
        assert len(losses) == 6
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]
    # layout: [shared] + one private per modality, matching shapes
    for emb_t, emb_j, n in ((t_emb_tr, j_emb_tr, 60), (t_emb_te, j_emb_te, 20)):
        assert len(emb_t) == len(emb_j) == 1 + len(dims)
        for a, b in zip(emb_t, emb_j):
            assert a.shape == b.shape == (n, 6)
            assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))


def test_dssl_backbone_replicas_tiny():
    """torch_dssl_fit (reference SupCon/ortho/vMF modules) and
    jax_dssl_fit agree on embedding layout at tiny shapes."""
    if not Path("/root/reference/models/classifiers.py").exists():
        pytest.skip("reference checkout not mounted")
    import jax.numpy as jnp

    from parity_dssl import jax_dssl_fit, torch_dssl_fit

    dims = (12, 10)
    views_tr = _tiny_views(0, 64, dims)
    views_te = _tiny_views(1, 32, dims)

    t_losses, t_emb_tr, t_emb_te = torch_dssl_fit(
        views_tr, views_te, list(dims), seed=0, embed_dim=4, hidden_dim=16,
        epochs=3, batch=32,
    )
    xs_tr = tuple(jnp.asarray(v) for v in views_tr)
    xs_te = tuple(jnp.asarray(v) for v in views_te)
    j_losses, j_emb_tr, j_emb_te = jax_dssl_fit(
        xs_tr, xs_te, list(dims), seed=0, embed_dim=4, hidden_dim=16,
        epochs=3, batch=32,
    )

    assert np.all(np.isfinite(t_losses)) and np.all(np.isfinite(j_losses))
    assert len(t_emb_tr) == len(j_emb_tr) == 1 + len(dims)
    for a, b in zip(t_emb_tr, j_emb_tr):
        assert a.shape == b.shape
    for a, b in zip(t_emb_te, j_emb_te):
        assert a.shape == b.shape


def test_tpu_spotcheck_tool_importable():
    """parity_dmvae_tpu main() depends only on archived JSON layout +
    jax_dmvae_fit; keep it importable."""
    import parity_dmvae_tpu  # noqa: F401

    assert callable(parity_dmvae_tpu.main)


def test_luma_collapse_fixture_arrays():
    from luma_collapse_torch import fixture_arrays

    xs_tr, y_tr, xs_te, y_te, num_classes = fixture_arrays(
        n_classes=3, train_per_class=4, test_per_class=2
    )
    assert num_classes == 3
    assert len(xs_tr) == len(xs_te) == 3  # image / audio / text views
    assert all(v.shape[0] == y_tr.shape[0] == 12 for v in xs_tr)
    assert all(v.shape[0] == y_te.shape[0] == 6 for v in xs_te)
    assert set(np.unique(y_tr)) == {0, 1, 2}
