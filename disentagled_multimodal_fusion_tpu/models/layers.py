"""Building-block layers: MLP stacks, evidential heads, LUMA encoders.

Reference semantics: models/classifiers.py (Linear/EvidentialNN MLPs at
16-48 and 469-502, Image/Audio/Text encoders at 55-270) with the weight-init
discipline of utils.py:153-166: hidden/output kernels get the configured
initializer (default xavier-uniform), biases keep the torch nn.Linear
default ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``.

TPU notes: all Dense layers carry an optional ``param_dtype``/compute dtype
so the MXU can run bf16 matmuls while params and losses stay f32; shapes are
static; dropout uses the standard 'dropout' RNG collection.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.evidence import evidence_activation


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_kernel_init(key, shape, dtype):
    """torch nn.Linear/nn.Conv default: kaiming_uniform(a=sqrt(5)), which
    reduces to U(+-1/sqrt(fan_in)). For Dense kernels (in, out) fan_in is
    shape[0]; for Conv kernels (kh, kw, in, out) it is kh*kw*in — i.e. the
    product of every axis but the last, matching torch's fan computation."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_kernel_init(initialization: str = "xavier") -> Callable:
    if initialization == "xavier":
        return nn.initializers.xavier_uniform()
    if initialization == "zeros":
        return nn.initializers.zeros_init()
    if initialization == "normal":
        return nn.initializers.normal(stddev=0.01)
    if initialization == "uniform":
        return lambda key, shape, dtype: jax.random.uniform(key, shape, dtype, -0.05, 0.05)
    if initialization == "torch_default":
        return torch_default_kernel_init
    raise NotImplementedError(initialization)


class TorchLinear(nn.Module):
    """Dense layer with torch-default bias init and configurable kernel init."""

    features: int
    kernel_init_name: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=make_kernel_init(self.kernel_init_name),
            bias_init=lambda k, s, d: torch_bias_init(k, s, d, fan_in),
            dtype=self.dtype,
        )(x)


def _torch_conv(features: int, in_ch: int, dtype, kernel=(3, 3)):
    """nn.Conv with torch Conv2d's DEFAULT init: kaiming_uniform(a=sqrt(5))
    kernels and U(+-1/sqrt(fan_in)) biases, fan_in = kh*kw*in_ch. The LUMA
    encoders (reference classifiers.py:55-217) never call
    utils.initialize_weights, so they keep these torch defaults — using
    flax's lecun_normal here inflates each conv layer's output std ~1.7x,
    which compounds through the stack (round-3 measured: 24x-hot image
    features at init -> the degenerate DMVAE recon objective diverges to
    NaN where the reference's trains)."""
    fan_in = in_ch * kernel[0] * kernel[1]
    return nn.Conv(
        features, kernel, padding="SAME",
        kernel_init=torch_default_kernel_init,
        bias_init=lambda k, s, d: torch_bias_init(k, s, d, fan_in),
        dtype=dtype,
    )


class IdentityEncoder(nn.Module):
    """Pass-through encoder (reference: classifiers.py:10-13)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class MLP(nn.Module):
    """(Dense + ReLU + Dropout)* + output Dense (reference: classifiers.py:16-48).

    ``layers`` lists the input and hidden sizes, e.g. (in, h1, h2); the final
    projection maps to ``output_dims``. Input size is inferred from x, the
    leading entry of ``layers`` is kept for config parity but not used.
    """

    layers: Sequence[int]
    output_dims: int = 128
    dropout: float = 0.1
    initialization: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.float32 if self.dtype is None else self.dtype)
        for width in list(self.layers)[1:]:
            x = TorchLinear(width, self.kernel_name(), dtype=self.dtype)(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return TorchLinear(self.output_dims, self.kernel_name(), dtype=self.dtype)(x)

    def kernel_name(self):
        return self.initialization


class EvidentialNN(nn.Module):
    """MLP head with saturated-exp evidence activation
    (reference: classifiers.py:469-502)."""

    layers: Sequence[int]
    output_dims: int = 10
    dropout: float = 0.1
    initialization: str = "xavier"
    activation: str = "exp"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = MLP(
            layers=self.layers,
            output_dims=self.output_dims,
            dropout=self.dropout,
            initialization=self.initialization,
            dtype=self.dtype,
        )(x, train=train)
        # Evidence math stays f32 for calibration parity.
        return evidence_activation(h.astype(jnp.float32), self.activation)


class ImageEncoder(nn.Module):
    """3-block CNN over (B, 3072) -> (B, output_dim) images
    (reference: classifiers.py:55-130): conv 32/64/128 + BN + ReLU + maxpool
    + channel dropout, then 2048 -> 512 -> output_dim MLP."""

    output_dim: int = 200
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        # (B, 3072) -> NHWC (B, 32, 32, 3); reference stores CHW flattened.
        x = x.reshape(b, 3, 32, 32).transpose(0, 2, 3, 1)
        for in_ch, ch in ((3, 32), (32, 64), (64, 128)):
            x = _torch_conv(ch, in_ch, self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if self.dropout > 0:
                # Dropout2d drops whole channels.
                x = nn.Dropout(
                    self.dropout,
                    broadcast_dims=(1, 2),
                    deterministic=not train,
                )(x)
        x = x.reshape(b, -1)
        # torch-DEFAULT kernels (not xavier): see _torch_conv docstring.
        x = TorchLinear(512, kernel_init_name="torch_default", dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return TorchLinear(self.output_dim, kernel_init_name="torch_default",
                           dtype=self.dtype)(x)


class AudioEncoder(nn.Module):
    """Audio encoder (reference: classifiers.py:133-217).

    use_2d=False (default, the path run_luma exercises): MFCC MLP
    40 -> 128 -> 256 -> output_dim.
    use_2d=True: 2D-spectrogram CNN — 3 conv blocks (1->32->64->128 ch,
    3x3 SAME, BatchNorm + ReLU; blocks 1-2 add MaxPool(2) + channel
    dropout, block 3 ends in global average pooling), then a single
    Dense 128 -> output_dim (reference classifiers.py:155-179). Input is
    (B, H, W) or (B, 1, H, W) / (B, H, W, 1); any spatial size works
    because of the global pool (mirrors AdaptiveAvgPool2d(1)).
    """

    input_dim: int = 40
    output_dim: int = 200
    dropout: float = 0.1
    use_2d: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_2d:
            return self._forward_2d(x, train)
        # torch-DEFAULT kernels (not xavier): see _torch_conv docstring.
        x = TorchLinear(128, kernel_init_name="torch_default", dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = TorchLinear(256, kernel_init_name="torch_default", dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return TorchLinear(self.output_dim, kernel_init_name="torch_default",
                           dtype=self.dtype)(x)

    def _forward_2d(self, x, train: bool):
        b = x.shape[0]
        if x.ndim == 3:  # (B, H, W) -> NHWC
            x = x[..., None]
        elif x.ndim == 4 and x.shape[1] == 1:  # torch NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        for i, (in_ch, ch) in enumerate(((1, 32), (32, 64), (64, 128))):
            x = _torch_conv(ch, in_ch, self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            if i < 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if self.dropout > 0:
                    # Dropout2d drops whole channels.
                    x = nn.Dropout(
                        self.dropout, broadcast_dims=(1, 2),
                        deterministic=not train,
                    )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 128)
        return TorchLinear(self.output_dim, kernel_init_name="torch_default",
                           dtype=self.dtype)(x.reshape(b, -1))


class TextEncoder(nn.Module):
    """Token-ID MLP input_dim -> 256 -> 256 -> output_dim
    (reference: classifiers.py:220-270)."""

    input_dim: int = 128
    output_dim: int = 200
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch-DEFAULT kernels (not xavier): see _torch_conv docstring.
        for _ in range(2):
            x = TorchLinear(256, kernel_init_name="torch_default", dtype=self.dtype)(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return TorchLinear(self.output_dim, kernel_init_name="torch_default",
                           dtype=self.dtype)(x)


ENCODER_REGISTRY = {
    "IdentityEncoder": IdentityEncoder,
    "ImageEncoder": ImageEncoder,
    "AudioEncoder": AudioEncoder,
    "TextEncoder": TextEncoder,
}
