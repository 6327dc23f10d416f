"""Generic fusion-op library.

Reference semantics: models/common_fusions.py:11-473 (the reference's
executed path only uses ``Concat`` via IntermediateFusion, but the whole
library is part of the capability surface). Stateless fusions are plain
functions; parameterised fusions are flax modules with the reference's init
distributions (xavier-normal weights, normal biases where the reference uses
them).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# --------------------------------------------------------------- stateless
def concat(modalities) -> jax.Array:
    """Flatten each modality past dim 0 and concat on dim 1
    (common_fusions.py:11-27)."""
    flat = [m.reshape(m.shape[0], -1) for m in modalities]
    return jnp.concatenate(flat, axis=1)


def concat_early(modalities) -> jax.Array:
    """Concat on dim 2 (common_fusions.py:31-44)."""
    return jnp.concatenate(list(modalities), axis=2)


def stack(modalities) -> jax.Array:
    """Flatten then stack on a new trailing dim (common_fusions.py:48-64)."""
    flat = [m.reshape(m.shape[0], -1) for m in modalities]
    return jnp.stack(flat, axis=2)


def tensor_fusion(modalities) -> jax.Array:
    """TensorFusion: outer product of 1-augmented modalities
    (common_fusions.py:246-276)."""
    if len(modalities) == 1:
        return modalities[0]
    mod0 = modalities[0]
    nonfeature = mod0.shape[:-1]
    ones = jnp.ones(nonfeature + (1,), dtype=mod0.dtype)
    m = jnp.concatenate([ones, mod0], axis=-1)
    for mod in modalities[1:]:
        mod = jnp.concatenate([jnp.ones(nonfeature + (1,), mod.dtype), mod], axis=-1)
        fused = jnp.einsum("...i,...j->...ij", m, mod)
        m = fused.reshape(*nonfeature, -1)
    return m


# --------------------------------------------------------------- modules
class Concat(nn.Module):
    """Module wrapper over :func:`concat` for API parity."""

    @nn.compact
    def __call__(self, modalities):
        return concat(modalities)


class TensorFusion(nn.Module):
    """Module wrapper over :func:`tensor_fusion` (common_fusions.py:246-276)."""

    @nn.compact
    def __call__(self, modalities):
        return tensor_fusion(modalities)


class ConcatWithLinear(nn.Module):
    """Concat then Dense (common_fusions.py:67-87)."""

    input_dim: int
    output_dim: int
    concat_dim: int = 1

    @nn.compact
    def __call__(self, modalities):
        x = jnp.concatenate(list(modalities), axis=self.concat_dim)
        return nn.Dense(self.output_dim)(x)


class MultiplicativeInteractions2Modal(nn.Module):
    """2-way multiplicative interactions (common_fusions.py:118-243).

    ``output`` in {'matrix3D', 'matrix', 'vector', 'scalar'}.
    """

    input_dims: Sequence[int]
    output_dim: Any  # int, or (int, int) for matrix3D
    output: str = "matrix"
    flatten: bool = False
    clip: Any = None
    flip: bool = False

    @nn.compact
    def __call__(self, modalities):
        if len(modalities) == 1:
            return modalities[0]
        assert len(modalities) == 2
        m1, m2 = modalities
        if self.flip:
            m1, m2 = m2, m1
        if self.flatten:
            m1 = m1.reshape(m1.shape[0], -1)
            m2 = m2.reshape(m2.shape[0], -1)
        if self.clip is not None:
            m1 = jnp.clip(m1, self.clip[0], self.clip[1])
            m2 = jnp.clip(m2, self.clip[0], self.clip[1])

        xn = nn.initializers.xavier_normal()
        nrm = nn.initializers.normal(stddev=1.0)
        d0, d1 = self.input_dims

        if self.output == "matrix3D":
            p, q = self.output_dim
            W = self.param("W", xn, (d0, d1, p * q))  # xavier over flattened tail
            U = self.param("U", xn, (d0, p * q))
            V = self.param("V", xn, (d1, p * q))
            b = self.param("b", xn, (p, q))
            # Contract the W-term as (B, d0*d1) @ (d0*d1, p*q) instead of
            # materializing the per-sample weight tensor (B, d1, p, q): at
            # LUMA scale (full-test-batch eval, B=4200, d=200, p*q=12800)
            # the naive form allocates 43 GB; this form's biggest
            # intermediate is the rank-1 outer product (B, d0*d1) and the
            # contraction itself is one large MXU matmul. Same math — the
            # einsum over W distributes across its V / U / b additive terms.
            outer = jnp.einsum("bn,bm->bnm", m1, m2).reshape(-1, d0 * d1)
            core = outer @ W.reshape(d0 * d1, p * q)
            bp = jnp.einsum("bn,nd->bd", m1, U).reshape(-1, p, q) + b
            return (core + m2 @ V).reshape(-1, p, q) + bp
        if self.output == "matrix":
            d = self.output_dim
            W = self.param("W", xn, (d0, d1 * d))
            U = self.param("U", xn, (d0, d))
            V = self.param("V", xn, (d1, d))
            b = self.param("b", nrm, (d,))
            Wp = jnp.einsum("bn,nmd->bmd", m1, W.reshape(d0, d1, d)) + V
            bp = m1 @ U + b
            return jnp.einsum("bm,bmd->bd", m2, Wp) + bp
        if self.output == "vector":
            W = self.param("W", xn, (d0, d1))
            U = self.param("U", xn, (d0, d1))
            V = self.param("V", nrm, (d1,))
            b = self.param("b", nrm, (d1,))
            Wp = m1 @ W + V
            bp = m1 @ U + b
            return Wp * m2 + bp
        if self.output == "scalar":
            W = self.param("W", nrm, (d0,))
            U = self.param("U", nrm, (d0,))
            V = self.param("V", nrm, (1,))
            b = self.param("b", nrm, (1,))
            Wp = (m1 @ W[:, None]) + V  # (B, 1)
            bp = (m1 @ U[:, None]) + b
            return Wp * m2 + bp
        raise ValueError(self.output)


class MultiplicativeInteractions3Modal(nn.Module):
    """3-way multiplicative interactions (common_fusions.py:90-115)."""

    input_dims: Sequence[int]
    output_dim: int

    @nn.compact
    def __call__(self, modalities):
        a = MultiplicativeInteractions2Modal(
            input_dims=self.input_dims[:2],
            output_dim=(self.input_dims[2], self.output_dim),
            output="matrix3D",
        )(modalities[:2])
        b = MultiplicativeInteractions2Modal(
            input_dims=self.input_dims[:2], output_dim=self.output_dim, output="matrix"
        )(modalities[:2])
        return jnp.einsum("bm,bmp->bp", modalities[2], a) + b


class LowRankTensorFusion(nn.Module):
    """Low-rank tensor fusion (common_fusions.py:279-344)."""

    input_dims: Sequence[int]
    output_dim: int
    rank: int
    flatten: bool = True

    @nn.compact
    def __call__(self, modalities):
        batch = modalities[0].shape[0]
        xn = nn.initializers.xavier_normal()
        fused = 1.0
        for i, (modality, in_dim) in enumerate(zip(modalities, self.input_dims)):
            factor = self.param(f"factor_{i}", xn, (self.rank, (in_dim + 1) * self.output_dim))
            factor = factor.reshape(self.rank, in_dim + 1, self.output_dim)
            m = modality.reshape(batch, -1) if self.flatten else modality
            m1 = jnp.concatenate([jnp.ones((batch, 1), m.dtype), m], axis=1)
            fused = fused * jnp.einsum("bi,rio->rbo", m1, factor)
        weights = self.param("fusion_weights", xn, (1, self.rank))
        bias = self.param("fusion_bias", nn.initializers.zeros_init(), (1, self.output_dim))
        out = jnp.einsum("or,rbo2->bo2".replace("o2", "d"), weights, fused) + bias
        return out.reshape(-1, self.output_dim)


class NLgate(nn.Module):
    """Non-local gate fusion (common_fusions.py:347-406)."""

    thw_dim: int
    c_dim: int
    tf_dim: int
    q_linear: Any = None
    k_linear: Any = None
    v_linear: Any = None

    @nn.compact
    def __call__(self, x):
        q, k = x[0], x[1]
        v = x[1]
        qin = (nn.Dense(self.q_linear[1])(q) if self.q_linear else q).reshape(
            -1, self.thw_dim, self.c_dim
        )
        kin = (nn.Dense(self.k_linear[1])(k) if self.k_linear else k).reshape(
            -1, self.c_dim, self.tf_dim
        )
        vin = (nn.Dense(self.v_linear[1])(v) if self.v_linear else v).reshape(
            -1, self.tf_dim, self.c_dim
        )
        attn = jax.nn.softmax(qin @ kin, axis=2)
        out = qin + attn @ vin
        return out.reshape(out.shape[0], -1)


class _TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch nn.TransformerEncoderLayer
    defaults: dim_feedforward=2048, relu, post-LN)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, x):
        attn = nn.MultiHeadDotProductAttention(num_heads=self.nhead)(x, x)
        x = nn.LayerNorm()(x + attn)
        ff = nn.Dense(self.dim_feedforward)(x)
        ff = nn.relu(ff)
        ff = nn.Dense(self.d_model)(ff)
        return nn.LayerNorm()(x + ff)


class EarlyFusionTransformer(nn.Module):
    """Early-fusion transformer (common_fusions.py:409-441)."""

    n_features: int
    embed_dim: int = 9

    @nn.compact
    def __call__(self, x):
        # x: (B, T, n_features) -> 1x1 conv == per-step Dense, no bias.
        h = nn.Dense(self.embed_dim, use_bias=False)(x)
        for _ in range(3):
            h = _TransformerEncoderLayer(self.embed_dim, nhead=3)(h)
        return nn.Dense(1)(h[:, -1])


class LateFusionTransformer(nn.Module):
    """Late-fusion transformer (common_fusions.py:444-473)."""

    embed_dim: int = 9

    @nn.compact
    def __call__(self, x):
        h = x.reshape(x.shape[0], -1, 1)
        h = nn.Dense(self.embed_dim, use_bias=False)(h)
        for _ in range(3):
            h = _TransformerEncoderLayer(self.embed_dim, nhead=3)(h)
        return h[:, -1]


class ConcatTransformerFusion(nn.Module):
    """Concat the flat views, then :class:`LateFusionTransformer` over the
    concatenated feature axis (one scalar token per feature) — the adapter
    that lets the reference's LateFusionTransformer (common_fusions.py:444-473,
    written for a single pre-fused vector) act as an N-view fusion op."""

    embed_dim: int = 9

    @nn.compact
    def __call__(self, modalities):
        return LateFusionTransformer(self.embed_dim)(concat(modalities))


# --------------------------------------------------------------- registry
#: Fusions usable as the IntermediateFusion fusion op over flat (B, S_i)
#: views. NLgate and EarlyFusionTransformer are deliberately excluded:
#: NLgate's THW/C/TF reshape semantics target video feature maps
#: (common_fusions.py:347-406), and EarlyFusionTransformer ends in Dense(1)
#: — a scalar regression output (common_fusions.py:409-441) — so neither
#: yields a usable fused feature vector for an evidential head.
INTERMEDIATE_FUSIONS = (
    "concat",         # sum(dims)                 (the reference's executed choice)
    "concat_linear",  # ConcatWithLinear -> output_dim
    "mi_matrix",      # MultiplicativeInteractions2Modal 'matrix' (2 views)
    "mi_vector",      # MultiplicativeInteractions2Modal 'vector' (2 views)
    "mi3",            # MultiplicativeInteractions3Modal (3 views)
    "tensor",         # outer product of 1-augmented views -> prod(dims+1)
    "lrtf",           # LowRankTensorFusion -> output_dim
    "lft",            # concat -> LateFusionTransformer -> embed_dim (9)
)

#: Safety cap for the TensorFusion output width (prod of dims+1 explodes
#: combinatorially — e.g. HandWritten's 6 views would give ~2e11 features).
TENSOR_FUSION_MAX_DIM = 1_500_000

#: Safety cap for the multiplicative-interaction fusions' parameter count.
#: The mi3/matrix3D weight is (d0, d1, d2*output_dim) — cubic in the view
#: dims — and every fusion param carries 4x its size in train state
#: (grads + Adam m/v). 1.1e9 params (4.1 GiB f32, ~16.4 GiB with state) is
#: the measured-largest program that still trains on a 16 GiB v5e with
#: donated buffers (LUMA mi3: dims [40,128,3072], 1.01e9 params); PIE's
#: (484,256,279) would need 2.2e9 params (~35 GiB with state) and OOMs any
#: single chip — torch included — so it is skipped, not attempted.
MI_FUSION_MAX_PARAMS = 1_100_000_000


def build_fusion(name, input_dims, *, output_dim=64, rank=8):
    """Build a library fusion for flat ``(B, S_i)`` views.

    Returns ``(module, fused_dim)`` where ``module(list_of_views) ->
    (B, fused_dim)`` and ``fused_dim`` sizes the downstream head's input
    layer. ``output_dim``/``rank`` parameterize the fusions that project
    (concat_linear, mi_matrix, mi3, lrtf). See :data:`INTERMEDIATE_FUSIONS`
    for the supported names and the exclusion rationale.
    """
    dims = tuple(int(d) for d in input_dims)
    n = len(dims)
    if name == "concat":
        return Concat(), sum(dims)
    if name == "concat_linear":
        return ConcatWithLinear(input_dim=sum(dims), output_dim=output_dim), output_dim
    if name == "mi_matrix":
        if n != 2:
            raise ValueError(f"mi_matrix fuses exactly 2 views, got {n}")
        n_params = (dims[0] * dims[1] + dims[0] + dims[1] + 1) * output_dim
        if n_params > MI_FUSION_MAX_PARAMS:
            raise ValueError(
                f"mi_matrix needs {n_params:.2e} params for views {dims} "
                f"(cap {MI_FUSION_MAX_PARAMS:.1e}: params + Adam state must "
                f"fit single-chip HBM); use lrtf instead"
            )
        return (
            MultiplicativeInteractions2Modal(
                input_dims=dims, output_dim=output_dim, output="matrix"
            ),
            output_dim,
        )
    if name == "mi_vector":
        if n != 2:
            raise ValueError(f"mi_vector fuses exactly 2 views, got {n}")
        return (
            MultiplicativeInteractions2Modal(
                input_dims=dims, output_dim=dims[1], output="vector"
            ),
            dims[1],
        )
    if name == "mi3":
        if n != 3:
            raise ValueError(f"mi3 fuses exactly 3 views, got {n}")
        # matrix3D branch: W (d0,d1,d2*od) + U (d0,·) + V (d1,·) + b, plus
        # the matrix branch with tail od — cubic in the view dims
        pair = dims[0] * dims[1] + dims[0] + dims[1] + 1
        n_params = pair * (dims[2] * output_dim) + pair * output_dim
        if n_params > MI_FUSION_MAX_PARAMS:
            raise ValueError(
                f"mi3 needs {n_params:.2e} params for views {dims} "
                f"(cap {MI_FUSION_MAX_PARAMS:.1e}: params + Adam state must "
                f"fit single-chip HBM — e.g. PIE (484,256,279) would be "
                f"~35 GiB with optimizer state); use lrtf instead"
            )
        return MultiplicativeInteractions3Modal(input_dims=dims, output_dim=output_dim), output_dim
    if name == "tensor":
        fused_dim = 1
        for d in dims:
            fused_dim *= d + 1
        if fused_dim > TENSOR_FUSION_MAX_DIM:
            raise ValueError(
                f"tensor fusion output dim prod(dims+1)={fused_dim} exceeds "
                f"{TENSOR_FUSION_MAX_DIM} for views {dims}; use lrtf instead"
            )
        return TensorFusion(), fused_dim
    if name == "lrtf":
        return LowRankTensorFusion(input_dims=dims, output_dim=output_dim, rank=rank), output_dim
    if name == "lft":
        mod = ConcatTransformerFusion()
        return mod, mod.embed_dim
    raise ValueError(f"unknown fusion {name!r}; supported: {INTERMEDIATE_FUSIONS}")
