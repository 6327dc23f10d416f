"""FusedDMVAE: modality-stacked DMVAE for TPU throughput.

Same math as models/dmvae.py (reference: models/dmvae.py:14-210) with the
per-modality MLPs restructured as BATCHED weight tensors:

  * views are zero-padded to the widest view and stacked (B, N, Dmax);
  * all N encoders run as three einsum matmuls over stacked weights
    (N, Dmax, H) / (N, H, H) / (N, H, 4E) instead of 3N separate Denses;
  * all N decoders run the joint + cross reconstruction stack
    (N decode-rows each) as three einsums over (N, 2E, H) / (N, H, H) /
    (N, H, Dmax), with the MSE masked to each modality's true width.

Why: the plain DMVAE step is dispatch-bound on TPU at reference batch sizes
(bench: 44 ms/epoch = ~2.8 ms/step for ~0.1 GFLOP) — most of the time is
per-kernel launch overhead across ~6N small matmuls. Stacking turns them
into 6 large batched contractions.

Exactness: zero-padded input columns hit weight rows that receive zero
gradient and contribute nothing; per-slice init reproduces the unfused
model's per-modality xavier/bias distributions (padding entries are zero).
tests/test_dmvae_fused.py maps unfused params into the fused layout and
checks get_embedding and the decode stack to f32 round-off.

Trade-off: extra padded FLOPs (sum(Dmax/d_i) on the first/last layers) in
exchange for ~N x fewer kernels — a win whenever the step is
dispatch/launch bound, which the reference's shapes always are.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gaussian import gaussian_kl_standard, product_of_experts, reparameterize
from .dmvae import _masked_mean_rows
from .layers import IdentityEncoder, make_kernel_init, torch_bias_init


def _stacked_dense_init(kernel_init_name, in_dims, pad_in, out_dim):
    """Per-modality init inside a stacked (N, pad_in, out) kernel: each
    slice [i, :in_dims[i], :] is drawn with that modality's fan sizes, the
    padding stays zero (zero grads keep it zero)."""
    base = make_kernel_init(kernel_init_name)

    def init(key, shape, dtype):
        n, p_in, out = shape
        assert p_in == pad_in and out == out_dim
        w = jnp.zeros(shape, dtype)
        keys = jax.random.split(key, n)
        for i, d in enumerate(in_dims):
            w = w.at[i, :d, :].set(base(keys[i], (d, out), dtype))
        return w

    return init


def _stacked_bias_init(in_dims):
    def init(key, shape, dtype):
        n, out = shape
        b = jnp.zeros(shape, dtype)
        keys = jax.random.split(key, n)
        for i, d in enumerate(in_dims):
            b = b.at[i].set(torch_bias_init(keys[i], (out,), dtype, d))
        return b

    return init


class StackedMLP(nn.Module):
    """N parallel (in -> hidden* -> out_i) MLPs as one einsum per layer.

    Inputs (B..., N, pad_in); outputs (B..., N, pad_out) where per-modality
    valid widths are out_dims (the rest is garbage to be masked by caller).
    ``hidden`` may be an int (two hidden layers, DMVAE-style) or a sequence
    of hidden widths (one ReLU+dropout layer each).
    """

    in_dims: Sequence[int]      # true per-modality input widths
    hidden: Any                 # int (-> [h, h]) or Sequence[int]
    out_dims: Sequence[int]     # true per-modality output widths
    dropout: float = 0.0
    initialization: str = "xavier"
    dtype: Any = None           # compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.in_dims)
        pad_in = x.shape[-1]
        pad_out = max(self.out_dims)
        hiddens = (
            [self.hidden, self.hidden] if isinstance(self.hidden, int)
            else list(self.hidden)
        )

        cast = (lambda a: a.astype(self.dtype)) if self.dtype is not None else (lambda a: a)
        y = cast(x)
        in_dims, d_in = list(self.in_dims), pad_in
        for li, h in enumerate(hiddens):
            w = self.param(
                f"w{li + 1}",
                _stacked_dense_init(self.initialization, in_dims, d_in, h),
                (n, d_in, h), jnp.float32,
            )
            b = self.param(f"b{li + 1}", _stacked_bias_init(in_dims), (n, h), jnp.float32)
            y = jnp.einsum("...nd,ndh->...nh", y, cast(w)) + cast(b)
            y = nn.relu(y)
            if self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
            in_dims, d_in = [h] * n, h
        lo = len(hiddens) + 1
        w = self.param(
            f"w{lo}",
            _stacked_dense_init(self.initialization, in_dims, d_in, pad_out),
            (n, d_in, pad_out), jnp.float32,
        )
        b = self.param(f"b{lo}", _stacked_bias_init(in_dims), (n, pad_out), jnp.float32)
        # NOTE: output slices are drawn at width pad_out (vs out_dims[i] in
        # the unfused model) — same family, marginally different xavier
        # bound; parity is statistical (BASELINE.md).
        # Output returns to f32 so the VAE stats/KL/MSE stay full precision.
        out = jnp.einsum("...nh,nho->...no", y, cast(w)) + cast(b)
        return out.astype(jnp.float32)


class FusedDMVAE(nn.Module):
    """Modality-stacked DMVAE; same API/contract as models/dmvae.DMVAE."""

    x_dims: Sequence[int]
    hidden_dim: int = 512
    embed_dim: int = 100
    dropout: float = 0.0
    a: float = 1.0
    poe_temperature: float = 1.5
    cross_weight: float = 1.0
    lambda_per_modality: Optional[Sequence[float]] = None
    initialization: str = "xavier"
    feature_encoders: Optional[Tuple[nn.Module, ...]] = None
    dtype: Any = None

    @property
    def N(self) -> int:
        return len(self.x_dims)

    def setup(self):
        n = self.N
        assert n >= 2
        if self.feature_encoders is not None:
            self.feat_encs = self.feature_encoders
        else:
            self.feat_encs = tuple(IdentityEncoder() for _ in range(n))
        self.encoder = StackedMLP(
            in_dims=tuple(self.x_dims), hidden=self.hidden_dim,
            out_dims=(4 * self.embed_dim,) * n, dropout=self.dropout,
            initialization=self.initialization, dtype=self.dtype,
        )
        self.decoder = StackedMLP(
            in_dims=(2 * self.embed_dim,) * n, hidden=self.hidden_dim,
            out_dims=tuple(self.x_dims), dropout=self.dropout,
            initialization=self.initialization, dtype=self.dtype,
        )

    # ---------- helpers ----------
    def _pad_stack(self, xs, train: bool = False):
        """feature-encode then zero-pad views to Dmax and stack (B, N, Dmax)."""
        feats = [
            self.feat_encs[i](xs[i].astype(jnp.float32), train=train)
            for i in range(self.N)
        ]
        dmax = max(f.shape[-1] for f in feats)
        padded = [
            jnp.pad(f, ((0, 0), (0, dmax - f.shape[-1]))) if f.shape[-1] < dmax else f
            for f in feats
        ]
        return feats, jnp.stack(padded, axis=1)

    def _encode_stats(self, xs, train):
        feats, x = self._pad_stack(xs, train=train)
        four = self.encoder(x, train=train)                  # (B, N, 4E)
        mu_s, logv_s, mu_p, logv_p = jnp.split(four, 4, axis=-1)
        return feats, mu_s, logv_s, mu_p, logv_p             # each (B, N, E)

    def get_embedding(self, xs, return_poe: bool = True):
        _, mu_s, logv_s, mu_p, _ = self._encode_stats(xs, train=False)
        mu_p_all = [mu_p[:, i] for i in range(self.N)]
        if return_poe:
            mu_poe, _ = product_of_experts(
                jnp.moveaxis(mu_s, 1, 0), jnp.moveaxis(logv_s, 1, 0),
                temperature=self.poe_temperature, include_prior=True,
            )
            return mu_poe, mu_p_all
        return mu_s.reshape(mu_s.shape[0], -1), mu_p_all

    def decode_stack(self, dec_in, train: bool = False):
        """dec_in: (R, N, 2E) decode rows -> (R, N, Dmax) reconstructions."""
        return self.decoder(dec_in, train=train)

    def __call__(self, xs, train: bool = True, mask: Optional[jax.Array] = None):
        n = self.N
        b = xs[0].shape[0]
        e = self.embed_dim
        lam = jnp.asarray(list(self.lambda_per_modality or [1.0] * n), jnp.float32)
        feats, mu_s, logv_s, mu_p, logv_p = self._encode_stats(xs, train=train)

        key = self.make_rng("noise") if train else jax.random.PRNGKey(0)
        k_p, k_u, k_s = jax.random.split(key, 3)
        z_p = reparameterize(k_p, mu_p, logv_p)              # (B, N, E)
        z_s_uni = reparameterize(k_u, mu_s, logv_s)          # (B, N, E)
        mu_poe, logv_poe = product_of_experts(
            jnp.moveaxis(mu_s, 1, 0), jnp.moveaxis(logv_s, 1, 0),
            temperature=1.5, include_prior=True,             # quirk parity
        )
        z_s = reparameterize(k_s, mu_poe, logv_poe)          # (B, E)

        # decode rows per modality i: [z_s] + [z_s_uni_j, j != i] -> (N, B, N, 2E)
        # laid out as (rows=N, B, modality=N, 2E): row 0 = joint, rows 1.. =
        # cross with the j-th other modality (ordered j != i per modality).
        others = jnp.stack(
            [
                jnp.stack([z_s_uni[:, j] for j in range(n) if j != i], axis=0)
                for i in range(n)
            ],
            axis=1,
        )                                                     # (N-1, N, B, E)
        zs_rows = jnp.concatenate(
            [jnp.broadcast_to(z_s[None, None], (1, n, b, e)), others], axis=0
        )                                                     # (N, N, B, E)
        zp_rows = jnp.broadcast_to(
            jnp.moveaxis(z_p, 1, 0)[None], (n, n, b, e)
        )                                                     # (N, N, B, E)
        dec_in = jnp.concatenate([zp_rows, zs_rows], axis=-1) # (rows,N,B,2E)
        dec_in = jnp.moveaxis(dec_in, 2, 1)                   # (rows,B,N,2E)
        recon = self.decoder(dec_in, train=train)             # (rows,B,N,Dmax)

        # masked MSE per modality over its true width
        dmax = recon.shape[-1]
        feats_pad = jnp.stack(
            [jnp.pad(f, ((0, 0), (0, dmax - f.shape[-1]))) for f in feats], axis=1
        )                                                     # (B, N, Dmax)
        dim_mask = jnp.stack(
            [
                (jnp.arange(dmax) < d).astype(jnp.float32)
                for d in self.x_dims
            ]
        )                                                     # (N, Dmax)
        row_mask = (
            jnp.ones((b,), jnp.float32) if mask is None else mask.astype(jnp.float32)
        )
        se = (recon - feats_pad[None]) ** 2                   # (rows,B,N,Dmax)
        se = se * dim_mask[None, None] * row_mask[None, :, None, None]
        denom = jnp.maximum(jnp.sum(row_mask), 1.0)
        # per (row, modality) mean over valid elements == F.mse_loss per pair
        per_pair = jnp.sum(se, axis=(1, 3)) / (
            denom * jnp.asarray(list(self.x_dims), jnp.float32)[None, :]
        )                                                     # (rows, N)
        loss_recon_joint = jnp.sum(lam * per_pair[0])
        pairs = n * (n - 1)
        loss_recon_cross = (
            jnp.sum(lam[None, :] * per_pair[1:]) / pairs * self.cross_weight
        )

        kl_p = _masked_mean_rows(
            jnp.sum(
                -0.5 * jnp.sum(1 + logv_p - mu_p**2 - jnp.exp(logv_p), axis=-1),
                axis=1,
            ),
            mask,
        )
        kl_poe = _masked_mean_rows(gaussian_kl_standard(mu_poe, logv_poe), mask)
        kl_uni = _masked_mean_rows(
            jnp.sum(
                -0.5 * jnp.sum(1 + logv_s - mu_s**2 - jnp.exp(logv_s), axis=-1),
                axis=1,
            ),
            mask,
        )

        loss = (
            loss_recon_joint + self.a * (kl_p + n * kl_poe)
            + loss_recon_cross + self.a * kl_uni
        )
        logs = {
            "loss": loss,
            "loss_joint_recon": loss_recon_joint,
            "loss_cross_recon": loss_recon_cross,
            "kl_private": kl_p,
            "kl_shared_poe": kl_poe,
            "kl_shared_uni_sum": kl_uni,
        }
        return loss, logs
