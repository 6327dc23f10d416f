"""Late- and intermediate-fusion evidential baselines.

Reference semantics: models/baselines.py:12-252.

* ``LateFusion`` — per-modality feature encoder + EvidentialNN head on raw
  views, aggregation in {cml, avg, dbf}, AvgTrustedLoss.
* ``IntermediateFusion`` — concat-fused features -> one EvidentialNN head,
  SingleEvidentialLoss.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import EvidentialNN, IdentityEncoder


class LateFusion(nn.Module):
    """Per-view evidential heads over feature encoders (baselines.py:12-70)."""

    output_dims: Sequence[int]
    num_classes: int = 42
    hidden_dim: Sequence[int] = (32,)
    dropout: float = 0.3
    feature_encoders: Optional[Tuple[nn.Module, ...]] = None
    dtype: Any = None

    def setup(self):
        n = len(self.output_dims)
        if self.feature_encoders is not None:
            assert len(self.feature_encoders) == n
            self.feat_encs = self.feature_encoders
        else:
            self.feat_encs = tuple(IdentityEncoder() for _ in range(n))
        self.heads = tuple(
            EvidentialNN(
                layers=(self.output_dims[i], *tuple(self.hidden_dim)),
                output_dims=self.num_classes,
                dropout=self.dropout,
                dtype=self.dtype,
            )
            for i in range(n)
        )

    def __call__(self, xs, train: bool = False):
        """xs: list of N (B, S_i) raw views. Returns evidences (B, N, C)."""
        evid = []
        for i, (enc, head) in enumerate(zip(self.feat_encs, self.heads)):
            feat = enc(xs[i].astype(jnp.float32), train=train)
            evid.append(head(feat, train=train))
        return jnp.stack(evid, axis=1)


class IntermediateFusion(nn.Module):
    """Fusion -> single evidential head (baselines.py:153-194).

    The reference hardcodes Concat (baselines.py:161); ``fusion`` accepts
    any library fusion module over the flat views (models/fusions.py
    ``build_fusion``), with ``fused_dim`` sizing the head's input layer
    (defaults reproduce the reference's concat behavior exactly).
    """

    output_dims: Sequence[int]
    num_classes: int = 42
    hidden_dim: int = 32
    dropout: float = 0.3
    feature_encoders: Optional[Tuple[nn.Module, ...]] = None
    dtype: Any = None
    fusion: Optional[nn.Module] = None
    fused_dim: Optional[int] = None

    def setup(self):
        n = len(self.output_dims)
        if self.feature_encoders is not None:
            self.feat_encs = self.feature_encoders
        else:
            self.feat_encs = tuple(IdentityEncoder() for _ in range(n))
        in_dim = self.fused_dim if self.fused_dim is not None else sum(self.output_dims)
        self.head = EvidentialNN(
            layers=(in_dim, self.hidden_dim),
            output_dims=self.num_classes,
            dropout=self.dropout,
            dtype=self.dtype,
        )

    def __call__(self, xs, train: bool = False):
        """xs: list of N (B, S_i). Returns single evidence (B, C)."""
        feats = [
            enc(x.astype(jnp.float32), train=train) for enc, x in zip(self.feat_encs, xs)
        ]
        flat = [f.reshape(f.shape[0], -1) for f in feats]
        if self.fusion is not None:
            fused = self.fusion(flat)
            fused = fused.reshape(fused.shape[0], -1)
        else:
            fused = jnp.concatenate(flat, axis=1)
        return self.head(fused, train=train)


class FusedLateFusion(nn.Module):
    """LateFusion with per-view evidential heads stacked into einsums.

    Feature encoders run per view (they may differ); their outputs are
    zero-padded to a common width and the N heads run as one StackedMLP —
    the baseline-side analogue of FusedDMVAE (see models/dmvae_fused.py).
    """

    output_dims: Sequence[int]
    num_classes: int = 42
    hidden_dim: Sequence[int] = (32,)
    dropout: float = 0.3
    feature_encoders: Optional[Tuple[nn.Module, ...]] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from ..ops.evidence import evidence_activation
        from .dmvae_fused import StackedMLP

        n = len(self.output_dims)
        encs = self.feature_encoders or tuple(IdentityEncoder() for _ in range(n))
        feats = [
            encs[i](xs[i].astype(jnp.float32), train=train) for i in range(n)
        ]
        pad = max(f.shape[-1] for f in feats)
        x = jnp.stack(
            [jnp.pad(f, ((0, 0), (0, pad - f.shape[-1]))) for f in feats], axis=1
        )
        h = StackedMLP(
            in_dims=tuple(self.output_dims), hidden=tuple(self.hidden_dim),
            out_dims=(self.num_classes,) * n, dropout=self.dropout,
            dtype=self.dtype,
        )(x, train=train)
        return evidence_activation(h.astype(jnp.float32))
