"""Evidential probes over frozen backbone embeddings.

Reference semantics: models/evidential_probe.py:11-408.

* ``EvidentialProbe`` — 1 shared + N per-modality EvidentialNN heads on the
  backbone's (Zc, [Zp_i]) embeddings; evidences stacked (B, 1+N, C);
  aggregation in {cml, avg, joint, disentangled}; AvgTrustedLoss.
* ``DisentangledEvidentialProbe`` — private-only variant: N heads, no shared
  head, aggregation in {cml, avg}.

TPU-first deviation (math-preserving): the reference deep-copies the
backbone, freezes it, and re-runs ``get_embedding`` under ``no_grad`` on
every step (evidential_probe.py:16,60-85). Because the frozen backbone is
deterministic in eval mode, the embeddings are constants of the training
run — so the trainer precomputes (Zc, Zp) once on device and the probe
trains directly on cached embeddings. This produces identical math with
none of the redundant backbone FLOPs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import EvidentialNN


class EvidentialProbe(nn.Module):
    """Shared + per-modality evidential heads (evidential_probe.py:11-103).

    ``shared_input_dim`` lets the shared head size differ from the private
    heads — needed for DisentangledSSL backbones whose Zc is the CONCAT of
    both modalities' shared codes (2*embed) while Zp_i are embed-sized
    (disentangledssl.py:67-80); the reference probe would shape-error there.
    """

    num_modalities: int
    num_classes: int
    input_dim: int
    hidden_dim: Sequence[int] = (32,)
    dropout: float = 0.3
    shared_input_dim: Optional[int] = None
    dtype: Any = None

    def setup(self):
        layers = (self.input_dim, *tuple(self.hidden_dim))
        shared_layers = (self.shared_input_dim or self.input_dim, *tuple(self.hidden_dim))
        self.x_shared = EvidentialNN(
            layers=shared_layers, output_dims=self.num_classes,
            dropout=self.dropout, dtype=self.dtype,
        )
        self.x_specs = tuple(
            EvidentialNN(
                layers=layers, output_dims=self.num_classes, dropout=self.dropout, dtype=self.dtype
            )
            for _ in range(self.num_modalities)
        )

    def __call__(self, zc, zp_list, train: bool = False):
        """zc: (B, D); zp_list: list of N (B, D). Returns (B, 1+N, C)."""
        evid = [self.x_shared(zc, train=train)]
        evid += [self.x_specs[i](zp_list[i], train=train) for i in range(self.num_modalities)]
        return jnp.stack(evid, axis=1)


class DisentangledEvidentialProbe(nn.Module):
    """Private-only evidential heads (evidential_probe.py:214-304)."""

    num_modalities: int
    num_classes: int
    input_dim: int
    hidden_dim: Sequence[int] = (32,)
    dropout: float = 0.3
    dtype: Any = None

    def setup(self):
        layers = (self.input_dim, *tuple(self.hidden_dim))
        self.spec_heads = tuple(
            EvidentialNN(
                layers=layers, output_dims=self.num_classes, dropout=self.dropout, dtype=self.dtype
            )
            for _ in range(self.num_modalities)
        )

    def __call__(self, zp_list, train: bool = False):
        """zp_list: list of N (B, D). Returns (B, N, C)."""
        evid = [self.spec_heads[i](zp_list[i], train=train) for i in range(self.num_modalities)]
        return jnp.stack(evid, axis=1)


class FusedEvidentialProbe(nn.Module):
    """EvidentialProbe with the 1+N heads stacked into per-layer einsums.

    Same math family as :class:`EvidentialProbe` (per-slice init parity via
    dmvae_fused.StackedMLP); one kernel per layer for all heads instead of
    (1+N) separate Dense stacks — the probe fit is dispatch-bound at
    reference batch sizes, so this is the probe-side analogue of FusedDMVAE.
    """

    num_modalities: int
    num_classes: int
    input_dim: int
    hidden_dim: Sequence[int] = (32,)
    dropout: float = 0.3
    shared_input_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, zc, zp_list, train: bool = False):
        from ..ops.evidence import evidence_activation
        from .dmvae_fused import StackedMLP

        ds = self.shared_input_dim or self.input_dim
        in_dims = (ds,) + (self.input_dim,) * self.num_modalities
        pad = max(in_dims)
        rows = [jnp.pad(zc, ((0, 0), (0, pad - zc.shape[-1])))]
        rows += [
            jnp.pad(z, ((0, 0), (0, pad - z.shape[-1]))) for z in zp_list
        ]
        x = jnp.stack(rows, axis=1)                       # (B, V, pad)
        h = StackedMLP(
            in_dims=in_dims, hidden=tuple(self.hidden_dim),
            out_dims=(self.num_classes,) * len(in_dims), dropout=self.dropout,
            dtype=self.dtype,
        )(x, train=train)
        return evidence_activation(h.astype(jnp.float32))


class FusedDisentangledEvidentialProbe(nn.Module):
    """Private-only variant of :class:`FusedEvidentialProbe`."""

    num_modalities: int
    num_classes: int
    input_dim: int
    hidden_dim: Sequence[int] = (32,)
    dropout: float = 0.3
    dtype: Any = None

    @nn.compact
    def __call__(self, zp_list, train: bool = False):
        from ..ops.evidence import evidence_activation
        from .dmvae_fused import StackedMLP

        x = jnp.stack(list(zp_list), axis=1)              # (B, N, D)
        h = StackedMLP(
            in_dims=(self.input_dim,) * self.num_modalities,
            hidden=tuple(self.hidden_dim),
            out_dims=(self.num_classes,) * self.num_modalities,
            dropout=self.dropout, dtype=self.dtype,
        )(x, train=train)
        return evidence_activation(h.astype(jnp.float32))
