"""DisentangledSSL: 2-modal contrastive disentangler.

Reference semantics: models/disentangledssl.py:17-194. Shared encoders feed
probabilistic heads (vMF with Householder-rotated rejection sampling, or
unit-sigma Normal); SupCon couples the two modalities' shared codes and, per
modality, the clean/augmented private codes; an orthogonality penalty
decorrelates private from shared; lambda follows an exponential schedule.

The reference hardcodes ``.cuda()`` in its shared_step and samplers
(disentangledssl.py:177-178, classifiers.py:461,465); here everything is
device-agnostic jitted JAX. Augmentations (ops/augment.py) are applied
inside the loss wrapper with explicit keys.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.augment import augment_data
from ..ops.contrastive import _l2_normalize, ortho_loss, supcon_loss
from ..ops.schedulers import exponential_schedule
from ..ops.vmf import vmf_rsample
from .layers import MLP, IdentityEncoder


class DisentangledSSL(nn.Module):
    output_dim: Sequence[int] = (100, 100)
    hidden_dim: int = 512
    embed_dim: int = 100
    a: float = 1.0
    distribution: str = "vmf"  # 'vmf' | 'normal'
    vmfkappa: float = 1.0
    lmd_start_value: float = 0.0
    lmd_end_value: float = 0.0
    lmd_n_iterations: int = 8000
    lmd_start_iteration: int = 0
    condzs: bool = True
    usezsx: bool = False
    initialization: str = "xavier"
    feature_encoders: Optional[Tuple[nn.Module, ...]] = None
    dtype: Any = None

    @property
    def N(self) -> int:
        return 2

    def setup(self):
        x1_dim, x2_dim = self.output_dim
        if self.feature_encoders is not None:
            self.feat_encs = self.feature_encoders
        else:
            self.feat_encs = (IdentityEncoder(), IdentityEncoder())
        mk = lambda in_dim: MLP(
            layers=(in_dim, self.hidden_dim, self.hidden_dim),
            output_dims=self.embed_dim,
            initialization=self.initialization,
            dropout=0.0,
            dtype=self.dtype,
        )
        self.encoder_x1s = mk(x1_dim)
        self.encoder_x2s = mk(x2_dim)
        if self.condzs:
            self.encoder_x1 = mk(x1_dim + self.embed_dim)
            self.encoder_x2 = mk(x2_dim + self.embed_dim)
        else:
            self.encoder_x1 = mk(x1_dim)
            self.encoder_x2 = mk(x2_dim)

    # ---------- probabilistic heads (classifiers.py:444-466) ----------
    def _phead_sample(self, key, params):
        if self.distribution == "normal":
            mu = params
            return mu + jax.random.normal(key, mu.shape, mu.dtype)
        elif self.distribution == "vmf":
            loc = params / jnp.linalg.norm(params, axis=-1, keepdims=True)
            scale = jnp.full((params.shape[0], 1), float(self.vmfkappa), params.dtype)
            return vmf_rsample(key, loc, scale)
        raise ValueError(self.distribution)

    def get_embedding(self, xs):
        """(concat(zsx1, zsx2), [z1x1, z2x2]) (disentangledssl.py:67-80)."""
        x1 = self.feat_encs[0](xs[0].astype(jnp.float32), train=False)
        x2 = self.feat_encs[1](xs[1].astype(jnp.float32), train=False)
        zsx1 = self.encoder_x1s(x1)
        zsx2 = self.encoder_x2s(x2)
        if self.condzs:
            z1x1 = self.encoder_x1(jnp.concatenate([x1, zsx1], axis=1))
            z2x2 = self.encoder_x2(jnp.concatenate([x2, zsx2], axis=1))
        else:
            z1x1 = self.encoder_x1(x1)
            z2x2 = self.encoder_x2(x2)
        return jnp.concatenate([zsx1, zsx2], axis=1), [z1x1, z2x2]

    def __call__(self, x1, x2, v1, v2, iteration, train: bool = True):
        """Loss forward (disentangledssl.py:82-160). v1/v2 are the augmented views."""
        x1 = self.feat_encs[0](x1.astype(jnp.float32), train=train)
        v1 = self.feat_encs[0](v1.astype(jnp.float32), train=train)
        x2 = self.feat_encs[1](x2.astype(jnp.float32), train=train)
        v2 = self.feat_encs[1](v2.astype(jnp.float32), train=train)

        e1 = self.encoder_x1s(x1, train=train)
        e2 = self.encoder_x2s(x2, train=train)
        e1_v = self.encoder_x1s(v1, train=train)
        e2_v = self.encoder_x2s(v2, train=train)

        key = self.make_rng("noise") if train else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        zs1 = self._phead_sample(k1, e1)
        zs2 = self._phead_sample(k2, e2)
        zsv1 = self._phead_sample(k3, e1_v)
        zsv2 = self._phead_sample(k4, e2_v)

        joint_loss, loss_x, loss_y = supcon_loss(jnp.stack([zs1, zs2], axis=1))
        joint_loss_v, loss_x_v, loss_y_v = supcon_loss(jnp.stack([zsv1, zsv2], axis=1))
        loss_shared = 0.5 * (joint_loss + joint_loss_v)
        loss_x = 0.5 * (loss_x + loss_x_v)
        loss_y = 0.5 * (loss_y + loss_y_v)

        if self.condzs:
            z1x1 = self.encoder_x1(jnp.concatenate([x1, e1], axis=1), train=train)
            z1xv1 = self.encoder_x1(jnp.concatenate([v1, e1_v], axis=1), train=train)
            z2x2 = self.encoder_x2(jnp.concatenate([x2, e2], axis=1), train=train)
            z2xv2 = self.encoder_x2(jnp.concatenate([v2, e2_v], axis=1), train=train)
        else:
            z1x1 = self.encoder_x1(x1, train=train)
            z1xv1 = self.encoder_x1(v1, train=train)
            z2x2 = self.encoder_x2(x2, train=train)
            z2xv2 = self.encoder_x2(v2, train=train)

        if self.usezsx:
            j1 = _l2_normalize(jnp.concatenate([z1x1, e1], axis=1))
            j2 = _l2_normalize(jnp.concatenate([z2x2, e2], axis=1))
            jv1 = _l2_normalize(jnp.concatenate([z1xv1, e1_v], axis=1))
            jv2 = _l2_normalize(jnp.concatenate([z2xv2, e2_v], axis=1))
            pair1 = jnp.stack([j1, jv1], axis=1)
            pair2 = jnp.stack([j2, jv2], axis=1)
        else:
            pair1 = jnp.stack([_l2_normalize(z1x1), _l2_normalize(z1xv1)], axis=1)
            pair2 = jnp.stack([_l2_normalize(z2x2), _l2_normalize(z2xv2)], axis=1)

        specific_loss_x1, _, _ = supcon_loss(pair1)
        specific_loss_x2, _, _ = supcon_loss(pair2)
        loss_specific = specific_loss_x1 + specific_loss_x2

        if self.lmd_end_value > 0:
            lmd = exponential_schedule(
                iteration,
                self.lmd_start_value,
                self.lmd_end_value,
                self.lmd_n_iterations,
                self.lmd_start_iteration,
            )
        else:
            lmd = jnp.float32(self.lmd_start_value)

        loss_ortho = 0.5 * (ortho_loss(z1x1, e1) + ortho_loss(z2x2, e2)) + 0.5 * (
            ortho_loss(z1xv1, e1_v) + ortho_loss(z2xv2, e2_v)
        )

        loss = (
            2.0 * loss_shared / (1.0 + self.a)
            + self.a * loss_specific / (1.0 + self.a)
            + lmd * loss_ortho
        )
        logs = {
            "loss": loss,
            "shared": loss_shared,
            "clip": loss_shared,
            "loss_x": loss_x,
            "loss_y": loss_y,
            "specific": loss_specific,
            "ortho": loss_ortho,
            "lmd": lmd,
        }
        return loss, logs


def disentangledssl_loss(model: DisentangledSSL, params, xs, iteration, rng, train=True):
    """shared_step + forward (disentangledssl.py:162-181): augment then loss."""
    k_a1, k_a2, k_fwd = jax.random.split(rng, 3)
    x1 = xs[0].astype(jnp.float32)
    x2 = xs[1].astype(jnp.float32)
    v1 = augment_data(k_a1, x1)
    v2 = augment_data(k_a2, x2)
    loss, logs = model.apply(
        {"params": params}, x1, x2, v1, v2, iteration, train=train,
        rngs={"noise": k_fwd, "dropout": jax.random.fold_in(k_fwd, 1)},
    )
    return loss, logs
