"""Golden-value parity tests: JAX ops vs the reference's torch math.

Each test draws random inputs, evaluates the reference implementation
(imported from /root/reference — torch-only modules) and our JAX op, and
checks elementwise agreement to tight f32 tolerances.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.ops import (
    evidence_activation,
    cml_fusion,
    avg_fusion,
    disentangled_fusion,
    joint_fusion,
    discounted_belief_fusion,
    dirichlet_kl_to_uniform,
    edl_digamma_loss,
    dc_loss,
    avg_trusted_loss,
    single_evidential_loss,
    dirichlet_uncertainties,
    reparameterize,
    gaussian_kl_standard,
    product_of_experts,
    supcon_loss,
    ortho_loss,
    linear_schedule,
    exponential_schedule,
)

RNG = np.random.default_rng(0)


def _rand_evidences(b=16, v=3, c=10, scale=3.0):
    return (RNG.random((b, v, c)) * scale).astype(np.float32)


# ---------------------------------------------------------------- activation
def test_evidence_activation_exp(reference_modules):
    h = (RNG.standard_normal((32, 10)) * 5).astype(np.float32)
    ref = reference_modules["utils"].activation_function(torch.tensor(h), "exp").numpy()
    got = np.asarray(evidence_activation(jnp.asarray(h), "exp"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_evidence_activation_softplus(reference_modules):
    h = (RNG.standard_normal((8, 5)) * 3).astype(np.float32)
    ref = reference_modules["utils"].activation_function(torch.tensor(h), "softplus").numpy()
    got = np.asarray(evidence_activation(jnp.asarray(h), "softplus"))
    # torch's softplus switches to a linear branch above a threshold; allow
    # slightly looser f32 tolerance.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------- fusion ops
@pytest.mark.parametrize("name", ["cml", "avg", "disentangled", "joint", "dbf"])
def test_fusion_rules(reference_modules, name):
    u = reference_modules["utils"]
    ev = _rand_evidences()
    t = torch.tensor(ev)
    ref = {
        "cml": lambda: u.get_cml_fusion(t),
        "avg": lambda: u.get_avg_fusion(t),
        "disentangled": lambda: u.get_disentangled_fusion(t),
        "joint": lambda: u.get_joint_fusion(t),
        "dbf": lambda: u.discounted_belief_fusion(t),
    }[name]().numpy()
    got = {
        "cml": lambda: cml_fusion(jnp.asarray(ev)),
        "avg": lambda: avg_fusion(jnp.asarray(ev)),
        "disentangled": lambda: disentangled_fusion(jnp.asarray(ev)),
        "joint": lambda: joint_fusion(jnp.asarray(ev)),
        "dbf": lambda: discounted_belief_fusion(jnp.asarray(ev)),
    }[name]()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=1e-5)


# ---------------------------------------------------------------- EDL losses
def test_dirichlet_kl(reference_modules):
    losses = reference_modules["losses"]
    alpha = (RNG.random((16, 7)) * 5 + 0.5).astype(np.float32)
    ref = losses.kl_divergence(torch.tensor(alpha), 7, device="cpu").numpy()
    got = np.asarray(dirichlet_kl_to_uniform(jnp.asarray(alpha), 7))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=5e-4)


@pytest.mark.parametrize("step,start", [(0, 50), (10, 50), (100, 50)])
def test_edl_digamma_loss(reference_modules, step, start):
    losses = reference_modules["losses"]
    b, c = 24, 6
    alpha = (RNG.random((b, c)) * 4 + 1.0).astype(np.float32)
    y = np.eye(c, dtype=np.float32)[RNG.integers(0, c, b)]
    ref = losses.edl_digamma_loss(
        torch.tensor(alpha), torch.tensor(y), step, c, start, "cpu"
    ).item()
    got = float(edl_digamma_loss(jnp.asarray(alpha), jnp.asarray(y), step, c, start))
    assert abs(got - ref) < 5e-4 * max(1.0, abs(ref))


def test_dc_loss(reference_modules):
    losses = reference_modules["losses"]
    ev = _rand_evidences(b=12, v=4, c=5)
    ref = losses.get_dc_loss_vectorized(torch.tensor(ev)).item()
    got = float(dc_loss(jnp.asarray(ev)))
    assert abs(got - ref) < 1e-4


@pytest.mark.parametrize("fused,step", [(1, 0), (1, 30), (0, 30), (1, 200)])
def test_avg_trusted_loss(reference_modules, fused, step):
    losses = reference_modules["losses"]
    b, v, c = 20, 3, 8
    ev = _rand_evidences(b, v, c)
    target = RNG.integers(0, c, b)
    ev_a = ev.sum(axis=1)
    crit = losses.AvgTrustedLoss(num_views=v, annealing_start=50, gamma=1)
    crit.annealing_step = step
    ref = crit(
        torch.tensor(ev), torch.tensor(target), torch.tensor(ev_a), fused=fused
    ).item()
    got = float(
        avg_trusted_loss(
            jnp.asarray(ev),
            jnp.asarray(target),
            jnp.asarray(ev_a),
            annealing_step=step,
            num_views=v,
            annealing_start=50,
            gamma=1.0,
            fused=fused,
        )
    )
    assert abs(got - ref) < 5e-4 * max(1.0, abs(ref))


def test_avg_trusted_loss_masked_equals_ragged(reference_modules):
    """Padded batch + mask must equal the torch loss on the valid rows only."""
    losses = reference_modules["losses"]
    b, pad, v, c = 13, 16, 3, 8
    ev = _rand_evidences(pad, v, c)
    target = RNG.integers(0, c, pad)
    crit = losses.AvgTrustedLoss(num_views=v, annealing_start=50)
    crit.annealing_step = 7
    ref = crit(
        torch.tensor(ev[:b]), torch.tensor(target[:b]), torch.tensor(ev[:b].sum(1)), fused=1
    ).item()
    mask = np.zeros(pad, np.float32)
    mask[:b] = 1
    got = float(
        avg_trusted_loss(
            jnp.asarray(ev), jnp.asarray(target), jnp.asarray(ev.sum(1)),
            annealing_step=7, num_views=v, annealing_start=50, mask=jnp.asarray(mask),
        )
    )
    assert abs(got - ref) < 5e-4 * max(1.0, abs(ref))


def test_single_evidential_loss(reference_modules):
    losses = reference_modules["losses"]
    b, c = 16, 5
    ev = (RNG.random((b, c)) * 3).astype(np.float32)
    target = RNG.integers(0, c, b)
    crit = losses.SingleEvidentialLoss(annealing_start=50)
    crit.annealing_step = 12
    ref = crit(torch.tensor(ev), torch.tensor(target)).item()
    got = float(
        single_evidential_loss(jnp.asarray(ev), jnp.asarray(target), 12, 50)
    )
    assert abs(got - ref) < 5e-4 * max(1.0, abs(ref))


def test_dirichlet_uncertainties():
    """Epistemic/aleatoric decomposition vs a direct torch transcription
    of analysis.py:27-34."""
    b, c = 10, 6
    ev = (RNG.random((b, c)) * 4).astype(np.float32)
    t = torch.tensor(ev)
    alphas = t + 1.0
    S = alphas.sum(dim=-1, keepdim=True)
    probs = alphas / S
    ref_epi = (c / S).squeeze(-1).numpy()
    ref_ale = (
        -torch.sum(probs * (torch.digamma(alphas + 1) - torch.digamma(S + 1)), dim=-1)
    ).numpy()
    epi, ale = dirichlet_uncertainties(jnp.asarray(ev), c)
    np.testing.assert_allclose(np.asarray(epi), ref_epi, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ale), ref_ale, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------- Gaussian
def test_gaussian_kl():
    mu = RNG.standard_normal((8, 4)).astype(np.float32)
    logvar = RNG.standard_normal((8, 4)).astype(np.float32)
    t_mu, t_lv = torch.tensor(mu), torch.tensor(logvar)
    ref = (-0.5 * torch.sum(1 + t_lv - t_mu.pow(2) - t_lv.exp(), dim=1)).numpy()
    got = np.asarray(gaussian_kl_standard(jnp.asarray(mu), jnp.asarray(logvar)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("temperature,prior", [(1.0, True), (1.5, True), (2.0, False)])
def test_product_of_experts(temperature, prior):
    """PoE vs a direct torch transcription of dmvae.py:91-112."""
    k, b, d = 3, 6, 5
    mus = RNG.standard_normal((k, b, d)).astype(np.float32)
    logvars = (RNG.standard_normal((k, b, d)) * 0.5).astype(np.float32)

    t_mus, t_lvs = torch.tensor(mus), torch.tensor(logvars)
    if prior:
        t_mus = torch.cat([t_mus, torch.zeros_like(t_mus[:1])], dim=0)
        t_lvs = torch.cat([t_lvs, torch.zeros_like(t_lvs[:1])], dim=0)
    precisions = torch.exp(-t_lvs) / max(temperature, 1e-8)
    psum = precisions.sum(dim=0) + 1e-8
    var = 1.0 / psum
    ref_mu = (var * (precisions * t_mus).sum(dim=0)).numpy()
    ref_lv = torch.log(var).numpy()

    mu, lv = product_of_experts(
        jnp.asarray(mus), jnp.asarray(logvars), temperature=temperature, include_prior=prior
    )
    np.testing.assert_allclose(np.asarray(mu), ref_mu, rtol=1e-5, atol=1e-5)
    # log(1/sum) in f32 differs from torch by up to ~1e-4 absolute
    np.testing.assert_allclose(np.asarray(lv), ref_lv, rtol=1e-4, atol=2e-4)


def test_reparameterize_stats():
    key = jax.random.PRNGKey(0)
    mu = jnp.full((20000, 2), 3.0)
    logvar = jnp.full((20000, 2), np.log(0.25).astype(np.float32))
    z = reparameterize(key, mu, logvar)
    assert abs(float(z.mean()) - 3.0) < 0.02
    assert abs(float(z.std()) - 0.5) < 0.02


# ---------------------------------------------------------------- contrastive
def test_supcon_loss(reference_modules):
    losses = reference_modules["losses"]
    b, v, d = 12, 2, 16
    feats = RNG.standard_normal((b, v, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    crit = losses.SupConLoss()
    ref, ref_x, ref_y = crit(torch.tensor(feats))
    got, got_x, got_y = supcon_loss(jnp.asarray(feats))
    # f32 logsumexp noise at temperature 0.07 (exact in f64)
    tol = 1e-2
    assert abs(float(got) - ref.item()) < tol * max(1.0, abs(ref.item()))
    assert abs(float(got_x) - ref_x.item()) < tol * max(1.0, abs(ref_x.item()))
    assert abs(float(got_y) - ref_y.item()) < tol * max(1.0, abs(ref_y.item()))


def test_supcon_loss_labels(reference_modules):
    losses = reference_modules["losses"]
    b, v, d = 10, 2, 8
    feats = RNG.standard_normal((b, v, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = RNG.integers(0, 3, b)
    crit = losses.SupConLoss()
    ref, _, _ = crit(torch.tensor(feats), labels=torch.tensor(labels))
    got, _, _ = supcon_loss(jnp.asarray(feats), labels=jnp.asarray(labels))
    # exact in f64 (verified); f32 exp/log noise only (temperature 0.07
    # makes the logsumexp ill-conditioned in f32 for both torch and XLA)
    assert abs(float(got) - ref.item()) < 1e-2 * max(1.0, abs(ref.item()))


def test_ortho_loss(reference_modules):
    losses = reference_modules["losses"]
    z1 = RNG.standard_normal((16, 8)).astype(np.float32)
    zs = RNG.standard_normal((16, 8)).astype(np.float32)
    ref = losses.ortho_loss(torch.tensor(z1), torch.tensor(zs)).item()
    got = float(ortho_loss(jnp.asarray(z1), jnp.asarray(zs)))
    # exact in f64 (verified); f32 norm accumulation noise only
    assert abs(got - ref) < 2e-3


# ---------------------------------------------------------------- schedulers
def test_schedulers(reference_modules):
    u = reference_modules["utils"]
    lin = u.LinearScheduler(0.1, 2.0, 100, start_iteration=10)
    exp = u.ExponentialScheduler(1e-3, 1.0, 50, start_iteration=5)
    for it in [0, 5, 10, 11, 60, 109, 110, 111, 200]:
        assert abs(float(linear_schedule(it, 0.1, 2.0, 100, 10)) - lin(it)) < 1e-5
        assert (
            abs(float(exponential_schedule(it, 1e-3, 1.0, 50, 5)) - exp(it))
            < 1e-5 * max(1.0, exp(it))
        )


# ---------------------------------------------------------------- vMF
def test_vmf_rsample_on_sphere():
    from disentagled_multimodal_fusion_tpu.ops.vmf import vmf_rsample

    key = jax.random.PRNGKey(1)
    loc = RNG.standard_normal((64, 16)).astype(np.float32)
    loc /= np.linalg.norm(loc, axis=-1, keepdims=True)
    scale = np.full((64, 1), 5.0, np.float32)
    z = np.asarray(vmf_rsample(key, jnp.asarray(loc), jnp.asarray(scale)))
    np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, atol=1e-4)
    # E[cos] for vMF(d=16, kappa=5) is ~kappa/d ~= 0.3.
    cos = (z * loc).sum(-1)
    assert 0.15 < cos.mean() < 0.45
    # High concentration: kappa=50 -> E[cos] ~ 1 - (d-1)/(2 kappa) ~= 0.85.
    z50 = np.asarray(
        vmf_rsample(key, jnp.asarray(loc), jnp.asarray(np.full((64, 1), 50.0, np.float32)))
    )
    assert (z50 * loc).sum(-1).mean() > 0.7


def test_vmf_rsample_m3():
    from disentagled_multimodal_fusion_tpu.ops.vmf import vmf_rsample

    key = jax.random.PRNGKey(2)
    loc = RNG.standard_normal((32, 3)).astype(np.float32)
    loc /= np.linalg.norm(loc, axis=-1, keepdims=True)
    scale = np.full((32, 1), 2.0, np.float32)
    z = np.asarray(vmf_rsample(key, jnp.asarray(loc), jnp.asarray(scale)))
    np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, atol=1e-4)


# ---------------------------------------------------------------- augment
def test_augment_data_shapes():
    from disentagled_multimodal_fusion_tpu.ops.augment import augment_data, swap

    x = jnp.asarray(RNG.standard_normal((20, 30)).astype(np.float32))
    v2 = augment_data(jax.random.PRNGKey(3), x)
    assert v2.shape == x.shape
    # identity rows must exist with prob ~1; dropped rows must contain zeros
    s = np.asarray(swap(x))
    np.testing.assert_allclose(s[:10], np.asarray(x)[10:])
