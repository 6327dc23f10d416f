"""Trainer tests: LR schedules vs torch, plateau semantics, masked batching."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.core.train import (
    OptimizerConfig,
    _cosine_lr,
    _epoch_batches,
    _plateau_update,
    train,
)


def test_cosine_matches_torch():
    lr0, t_max, eta = 3e-4, 50, 1e-6
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max, eta_min=eta)
    cfg = OptimizerConfig(lr=lr0, schedule="cosine", cosine_t_max=t_max, eta_min=eta)
    for epoch in range(60):
        torch_lr = opt.param_groups[0]["lr"]
        ours = float(_cosine_lr(cfg, epoch))
        assert abs(ours - torch_lr) < 1e-9 + 1e-5 * torch_lr, (epoch, ours, torch_lr)
        opt.step()
        sch.step()


def test_plateau_matches_torch():
    lr0 = 1e-2
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=3
    )
    cfg = OptimizerConfig(
        lr=lr0, schedule="plateau", plateau_factor=0.1, plateau_patience=3
    )
    state = (jnp.float32(lr0), jnp.float32(np.inf), jnp.int32(0))
    rng = np.random.default_rng(0)
    metrics = list(1.0 - 0.01 * np.arange(10)) + [0.9] * 12 + [0.1, 0.1, 0.1]
    for m in metrics:
        sch.step(m)
        state = _plateau_update(cfg, state, jnp.float32(m))
        torch_lr = opt.param_groups[0]["lr"]
        assert abs(float(state[0]) - torch_lr) < 1e-7 * max(1.0, torch_lr), (
            m, float(state[0]), torch_lr,
        )


def test_epoch_batches_ragged_tail():
    idx, tail = _epoch_batches(jax.random.PRNGKey(0), 10, 4, drop_last=False, shuffle=True)
    assert idx.shape == (2, 4) and tail.shape == (2,)  # exact-size tail
    # every real index appears exactly once across full batches + tail
    all_idx = np.concatenate([np.asarray(idx).ravel(), np.asarray(tail)])
    assert sorted(all_idx.tolist()) == list(range(10))

    idx, tail = _epoch_batches(jax.random.PRNGKey(0), 10, 4, drop_last=True, shuffle=True)
    assert idx.shape == (2, 4) and tail.shape == (0,)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="zero optimizer steps"):
        _epoch_batches(jax.random.PRNGKey(0), 3, 8, drop_last=True, shuffle=True)


def test_train_linear_regression_converges():
    """Least squares via the harness; masked ragged tail batch included."""
    rng = np.random.default_rng(0)
    w_true = rng.standard_normal((5, 1)).astype(np.float32)
    x = rng.standard_normal((103, 5)).astype(np.float32)  # 103 % 16 != 0
    y = x @ w_true

    params = {"w": jnp.zeros((5, 1))}

    def loss_fn(params, batch, mask, t, key):
        pred = batch["x"] @ params["w"]
        se = (pred - batch["y"]) ** 2
        m = mask[:, None]
        return jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0), {}

    res = train(
        rng=jax.random.PRNGKey(0), params=params, loss_fn=loss_fn,
        data={"x": jnp.asarray(x), "y": jnp.asarray(y)}, n_train=103,
        optimizer=OptimizerConfig(name="adam", lr=3e-2, schedule="constant"),
        epochs=200, batch_size=16, drop_last=False,
    )
    w = np.asarray(res.params["w"])
    assert float(res.train_loss[-1]) < 1e-3
    np.testing.assert_allclose(w, w_true, atol=0.05)


def test_train_with_validation_and_plateau():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 3)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int64)

    params = {"w": jnp.zeros((3, 2))}

    def loss_fn(params, batch, mask, t, key):
        logits = batch["x"] @ params["w"]
        ll = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), batch["y"]]
        return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0), {}

    def val_fn(params, data, t):
        logits = data["x"] @ params["w"]
        ll = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), data["y"]]
        acc = jnp.mean((jnp.argmax(logits, 1) == data["y"]).astype(jnp.float32))
        return jnp.mean(ll), acc

    data = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    res = train(
        rng=jax.random.PRNGKey(0), params=params, loss_fn=loss_fn, data=data,
        n_train=64,
        optimizer=OptimizerConfig(
            name="adam", lr=0.05, schedule="plateau", plateau_patience=5
        ),
        epochs=50, batch_size=16, val_fn=val_fn, val_data=data,
    )
    assert float(res.val_acc[-1]) > 0.9
    assert np.all(np.isfinite(np.asarray(res.val_loss)))


def test_ragged_tail_batch_statistics_exact():
    """Stateful models must see the EXACT tail rows, not pad-duplicates:
    a fake-BN state records each batch's row-mean; after one epoch with
    shuffle=False and n % B != 0, the state is the mean of the true tail
    rows (the old padded+masked tail polluted it with copies of row 0)."""
    from disentagled_multimodal_fusion_tpu.core.train import OptimizerConfig, train

    n, b, d = 10, 4, 3
    x = np.arange(n * d, dtype=np.float32).reshape(n, d)
    data = {"x": jnp.asarray(x)}
    params = {"w": jnp.zeros((d,))}

    def loss_fn(params, batch, mask, t, key, state):
        xb = batch["x"]
        loss = jnp.sum((xb @ params["w"]) ** 2 * mask) / jnp.maximum(mask.sum(), 1.0)
        return loss, jnp.mean(xb, axis=0)  # "batch statistics"

    res = train(
        rng=jax.random.PRNGKey(0), params=params, loss_fn=loss_fn, data=data,
        n_train=n, optimizer=OptimizerConfig(name="adam", lr=0.0), epochs=1,
        batch_size=b, drop_last=False, shuffle=False, donate=False,
        model_state=jnp.zeros((d,)),
    )
    np.testing.assert_allclose(
        np.asarray(res.model_state), x[8:10].mean(axis=0), rtol=1e-6)


def test_task_closures_memoized_and_program_cache_reused():
    """Sweep-speed contract: identical task configs return the IDENTICAL
    closure objects (core.tasks._memoized), and train() then reuses ONE
    jitted program across cells instead of re-tracing per fit — the fix for
    the measured ~11 s/cell re-trace+re-lower overhead on the UQ sweep."""
    from disentagled_multimodal_fusion_tpu.core.tasks import build_probe_task
    from disentagled_multimodal_fusion_tpu.core.train import program_cache_info

    t1 = build_probe_task(
        rng=jax.random.PRNGKey(0), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(16,), lr=1e-3, dropout=0.0,
        annealing_start=1, aggregation="cml", num_epochs=3,
    )
    t2 = build_probe_task(
        rng=jax.random.PRNGKey(1), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(16,), lr=1e-3, dropout=0.0,
        annealing_start=1, aggregation="cml", num_epochs=3,
    )
    assert t1.loss_fn is t2.loss_fn
    assert t1.val_fn is t2.val_fn
    assert t1.evidences_fn is t2.evidences_fn
    # different config -> different closures
    t3 = build_probe_task(
        rng=jax.random.PRNGKey(0), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(16,), lr=1e-3, dropout=0.0,
        annealing_start=1, aggregation="avg", num_epochs=3,
    )
    assert t3.loss_fn is not t1.loss_fn

    n = 10
    data = {
        "zc": jnp.zeros((n, 8)),
        "zp": jnp.zeros((n, 2, 8)),
        "y": jnp.zeros((n,), jnp.int32),
    }
    kwargs = dict(
        data=data, n_train=n, epochs=3, batch_size=4, drop_last=False,
        val_fn=t1.val_fn, val_data=data, donate=False,
    )
    size0 = program_cache_info()[0]
    r1 = train(rng=jax.random.PRNGKey(2), params=t1.params,
               loss_fn=t1.loss_fn, optimizer=t1.optimizer, **kwargs)
    size1 = program_cache_info()[0]
    r2 = train(rng=jax.random.PRNGKey(3), params=t2.params,
               loss_fn=t2.loss_fn, optimizer=t2.optimizer, **kwargs)
    size2 = program_cache_info()[0]
    assert size1 == size0 + 1      # first fit adds one program
    assert size2 == size1          # second identical-config fit reuses it
    assert np.isfinite(float(r1.train_loss[-1]))
    assert np.isfinite(float(r2.train_loss[-1]))


def test_val_pass_sees_current_epoch_annealing_index():
    """The epoch-e validation pass must see t.epoch == e (0-based).

    This pins the Lightning hook-order semantics the reference relies
    on: the val loop runs INSIDE the train epoch, and the criterion's
    annealing_step is incremented only afterward (on_train_epoch_end,
    baselines.py:104 / evidential_probe.py:124) — so epoch e's monitored
    val loss is computed with annealing_step == e, starting at 0. An
    off-by-one here changes the KL-annealing coefficient of the
    plateau-monitored val loss and, on knife-edge cells, the whole LR
    trajectory (see tools/parity_check.py's round-3b harness fix)."""
    params = {"w": jnp.zeros((2, 2))}

    def loss_fn(params, batch, mask, t, key):
        return jnp.sum(params["w"]) * 0.0 + jnp.sum(mask) * 0.0, {}

    def val_fn(params, data, t):
        # report the annealing index itself as the "loss"
        return jnp.asarray(t.epoch, jnp.float32), jnp.float32(0.0)

    data = {"x": jnp.zeros((8, 2))}
    res = train(
        rng=jax.random.PRNGKey(0), params=params, loss_fn=loss_fn,
        data=data, n_train=8,
        optimizer=OptimizerConfig(name="adam", lr=1e-3, schedule="constant"),
        epochs=5, batch_size=4, val_fn=val_fn, val_data=data,
    )
    assert np.asarray(res.val_loss).tolist() == [0.0, 1.0, 2.0, 3.0, 4.0]
