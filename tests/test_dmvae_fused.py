"""FusedDMVAE must reproduce DMVAE's math when given the same weights."""

import numpy as np
import jax
import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.models.dmvae import DMVAE
from disentagled_multimodal_fusion_tpu.models.dmvae_fused import FusedDMVAE

KEY = jax.random.PRNGKey(0)
RNGS = {"params": KEY, "noise": KEY, "dropout": KEY}
DIMS = (20, 12, 7)
E, H = 4, 32


def _map_params(unfused, dims, embed, hidden):
    """Embed per-modality MLP weights into the stacked layout."""
    n = len(dims)
    dmax = max(dims)

    def pull(group, i, layer):
        mod = unfused[f"{group}_{i}"][f"TorchLinear_{layer}"]["Dense_0"]
        return np.asarray(mod["kernel"]), np.asarray(mod["bias"])

    def stack(group, in_pad, out_pad, true_in, true_out):
        w1 = np.zeros((n, in_pad, hidden), np.float32)
        b1 = np.zeros((n, hidden), np.float32)
        w2 = np.zeros((n, hidden, hidden), np.float32)
        b2 = np.zeros((n, hidden), np.float32)
        w3 = np.zeros((n, hidden, out_pad), np.float32)
        b3 = np.zeros((n, out_pad), np.float32)
        for i in range(n):
            k, b = pull(group, i, 0)
            w1[i, : true_in[i]], b1[i] = k, b
            k, b = pull(group, i, 1)
            w2[i], b2[i] = k, b
            k, b = pull(group, i, 2)
            w3[i, :, : true_out[i]], b3[i, : true_out[i]] = k, b
        return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}

    return {
        "encoder": stack("encoders", dmax, 4 * embed, dims, [4 * embed] * n),
        "decoder": stack("decoders", 2 * embed, dmax, [2 * embed] * n, dims),
    }


def test_fused_matches_unfused_embedding_and_decode():
    model = DMVAE(x_dims=DIMS, hidden_dim=H, embed_dim=E, a=1e-5, dropout=0.0)
    fused = FusedDMVAE(x_dims=DIMS, hidden_dim=H, embed_dim=E, a=1e-5, dropout=0.0)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (10, d)) for i, d in enumerate(DIMS)]
    params = model.init(RNGS, xs, train=True)["params"]
    fparams = jax.tree.map(jnp.asarray, _map_params(params, DIMS, E, H))

    zc, zp = model.apply({"params": params}, xs, method=DMVAE.get_embedding)
    zc_f, zp_f = fused.apply({"params": fparams}, xs, method=FusedDMVAE.get_embedding)
    np.testing.assert_allclose(np.asarray(zc_f), np.asarray(zc), rtol=1e-5, atol=1e-5)
    for a, b in zip(zp_f, zp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    # decoder stack: same z inputs -> same reconstructions (on valid dims)
    z = jax.random.normal(jax.random.PRNGKey(7), (5, len(DIMS), 2 * E))
    rec_f = fused.apply({"params": fparams}, z, method=FusedDMVAE.decode_stack)
    for i, d in enumerate(DIMS):
        rec_u = model.apply(
            {"params": params}, z[:, i],
            method=lambda m, zz: m.decoders[i](zz, train=False),
        )
        np.testing.assert_allclose(
            np.asarray(rec_f[:, i, :d]), np.asarray(rec_u), rtol=1e-4, atol=1e-4
        )


def test_fused_loss_trains():
    fused = FusedDMVAE(x_dims=DIMS, hidden_dim=H, embed_dim=E, a=1e-5)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (16, d)) for i, d in enumerate(DIMS)]
    params = fused.init(RNGS, xs, train=True)["params"]
    loss, logs = fused.apply(
        {"params": params}, xs, train=True, rngs={"noise": KEY, "dropout": KEY}
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: fused.apply(
            {"params": p}, xs, train=True, rngs={"noise": KEY, "dropout": KEY}
        )[0]
    )(params)
    # padded weight slices must receive zero gradient
    gw1 = np.asarray(g["encoder"]["w1"])
    for i, d in enumerate(DIMS):
        if d < max(DIMS):
            assert np.abs(gw1[i, d:]).max() == 0.0
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()


def test_fused_masked_rows_invariant():
    fused = FusedDMVAE(x_dims=DIMS, hidden_dim=H, embed_dim=E, a=1e-5, dropout=0.0)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (8, d)) for i, d in enumerate(DIMS)]
    params = fused.init(RNGS, xs, train=True)["params"]
    mask = jnp.array([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    l1, _ = fused.apply({"params": params}, xs, train=True, mask=mask,
                        rngs={"noise": KEY, "dropout": KEY})
    xs_mut = [x.at[5:].set(1.7) for x in xs]
    l2, _ = fused.apply({"params": params}, xs_mut, train=True, mask=mask,
                        rngs={"noise": KEY, "dropout": KEY})
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_fused_probe_heads_match_unfused():
    from disentagled_multimodal_fusion_tpu.models.probes import (
        EvidentialProbe,
        FusedEvidentialProbe,
    )

    n, c, d_in, hid = 3, 5, 8, 16
    unfused = EvidentialProbe(
        num_modalities=n, num_classes=c, input_dim=d_in, hidden_dim=(hid,), dropout=0.0
    )
    fused = FusedEvidentialProbe(
        num_modalities=n, num_classes=c, input_dim=d_in, hidden_dim=(hid,), dropout=0.0
    )
    zc = jax.random.normal(jax.random.PRNGKey(1), (6, d_in))
    zp = [jax.random.normal(jax.random.PRNGKey(2 + i), (6, d_in)) for i in range(n)]
    up = unfused.init({"params": KEY, "dropout": KEY}, zc, zp)["params"]

    # map head weights into the stacked layout: row 0 = shared, rows 1.. = specs
    v = n + 1
    w1 = np.zeros((v, d_in, hid), np.float32)
    b1 = np.zeros((v, hid), np.float32)
    w2 = np.zeros((v, hid, c), np.float32)
    b2 = np.zeros((v, c), np.float32)
    heads = [up["x_shared"]] + [up[f"x_specs_{i}"] for i in range(n)]
    for i, h in enumerate(heads):
        mlp = h["MLP_0"]
        w1[i] = np.asarray(mlp["TorchLinear_0"]["Dense_0"]["kernel"])
        b1[i] = np.asarray(mlp["TorchLinear_0"]["Dense_0"]["bias"])
        w2[i] = np.asarray(mlp["TorchLinear_1"]["Dense_0"]["kernel"])
        b2[i] = np.asarray(mlp["TorchLinear_1"]["Dense_0"]["bias"])
    fp = {"StackedMLP_0": {
        "w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
        "w2": jnp.asarray(w2), "b2": jnp.asarray(b2),
    }}
    ev_u = unfused.apply({"params": up}, zc, zp)
    ev_f = fused.apply({"params": fp}, zc, zp)
    np.testing.assert_allclose(np.asarray(ev_f), np.asarray(ev_u), rtol=1e-5, atol=1e-6)
