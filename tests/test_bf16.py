"""bf16 compute mode: matmuls run in bfloat16, params/losses stay f32,
end accuracy matches the f32 run on a separable problem."""

import jax
import jax.numpy as jnp
import numpy as np

from disentagled_multimodal_fusion_tpu.core.tasks import (
    build_dmvae_task,
    build_late_fusion_task,
)
from disentagled_multimodal_fusion_tpu.core.train import train


def _toy_classification(n=240, d=10, c=3, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, c, n)
    means = rng.standard_normal((c, d)) * 2.0
    x1 = (means[y] + rng.standard_normal((n, d))).astype(np.float32)
    x2 = (means[y][:, ::-1] + rng.standard_normal((n, d))).astype(np.float32)
    return (jnp.asarray(x1), jnp.asarray(x2)), jnp.asarray(y)


def _fit_lf(dtype):
    xs, y = _toy_classification()
    task = build_late_fusion_task(
        rng=jax.random.PRNGKey(0), output_dims=[10, 10], num_classes=3,
        hidden_dim=(32,), dropout=0.0, lr=3e-3, annealing_start=10,
        aggregation="cml", fused=1.0, dtype=dtype,
    )
    res = train(
        rng=jax.random.PRNGKey(1), params=task.params, loss_fn=task.loss_fn,
        data={"xs": xs, "y": y}, n_train=240, optimizer=task.optimizer,
        epochs=30, batch_size=48, val_fn=task.val_fn,
        val_data={"xs": xs, "y": y},
    )
    return task, res


def test_bf16_late_fusion_accuracy_parity():
    _, res32 = _fit_lf(None)
    task16, res16 = _fit_lf("bfloat16")
    acc32, acc16 = float(res32.val_acc[-1]), float(res16.val_acc[-1])
    assert acc32 > 0.9
    assert abs(acc32 - acc16) < 0.05, (acc32, acc16)
    # params remain f32 under bf16 compute
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(res16.params))


def test_bf16_dmvae_trains_and_params_stay_f32():
    xs, _ = _toy_classification()
    model, params, loss_fn, opt, _ = build_dmvae_task(
        rng=jax.random.PRNGKey(0), xs_sample=xs, output_dim=[10, 10],
        a=1e-5, hidden_dim=32, embed_dim=4, lr=1e-3, num_epochs=5,
        fused_modalities=True, dtype="bfloat16",
    )
    res = train(
        rng=jax.random.PRNGKey(1), params=params, loss_fn=loss_fn,
        data={"xs": xs}, n_train=240, optimizer=opt, epochs=5, batch_size=48,
    )
    losses = np.asarray(res.train_loss)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(res.params))
    # bf16 compute actually engaged: forward matmul output differs from f32
    # beyond f32 roundoff but stays close
    model32, params32, loss32, _, _ = build_dmvae_task(
        rng=jax.random.PRNGKey(0), xs_sample=xs, output_dim=[10, 10],
        a=1e-5, hidden_dim=32, embed_dim=4, lr=1e-3, num_epochs=5,
        fused_modalities=True,
    )
    zc16, _ = model.apply({"params": params32}, xs, method="get_embedding")
    zc32, _ = model32.apply({"params": params32}, xs, method="get_embedding")
    diff = float(jnp.max(jnp.abs(zc16 - zc32)))
    assert 0 < diff < 0.1, diff
