"""train_many (vmapped multi-instance training) must reproduce train()."""

import numpy as np
import jax
import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.core.train import (
    OptimizerConfig,
    train,
    train_many,
)


def _make_problem(seed):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((6, 3)).astype(np.float32)
    x = rng.standard_normal((80, 6)).astype(np.float32)
    y = np.argmax(x @ w, axis=1).astype(np.int64)
    return x, y


def _loss_fn(params, batch, mask, t, key):
    logits = batch["x"] @ params["w"] + params["b"]
    ll = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), batch["y"]]
    return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0), {}


def _val_fn(params, data, t):
    logits = data["x"] @ params["w"] + params["b"]
    ll = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), data["y"]]
    acc = jnp.mean((jnp.argmax(logits, 1) == data["y"]).astype(jnp.float32))
    return jnp.mean(ll), acc


def test_train_many_matches_sequential_train():
    s = 3
    problems = [_make_problem(i) for i in range(s)]
    opt = OptimizerConfig(name="adam", lr=0.03, schedule="plateau", plateau_patience=4)
    epochs, batch = 25, 16

    seq_results = []
    for i, (x, y) in enumerate(problems):
        params = {"w": jnp.zeros((6, 3)), "b": jnp.zeros(3)}
        data = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
        res = train(
            rng=jax.random.PRNGKey(i), params=params, loss_fn=_loss_fn,
            data=data, n_train=80, optimizer=opt, epochs=epochs,
            batch_size=batch, val_fn=_val_fn, val_data=data, donate=False,
        )
        seq_results.append(res)

    params_stack = {"w": jnp.zeros((s, 6, 3)), "b": jnp.zeros((s, 3))}
    data_stack = {
        "x": jnp.asarray(np.stack([p[0] for p in problems])),
        "y": jnp.asarray(np.stack([p[1] for p in problems])),
    }
    res_many = train_many(
        rngs=jnp.stack([jax.random.PRNGKey(i) for i in range(s)]),
        params_stack=params_stack, loss_fn=_loss_fn, data_stack=data_stack,
        n_train=80, optimizer=opt, epochs=epochs, batch_size=batch,
        val_fn=_val_fn, val_data_stack=data_stack,
    )

    for i, res in enumerate(seq_results):
        np.testing.assert_allclose(
            np.asarray(res_many.train_loss[i]), np.asarray(res.train_loss),
            rtol=2e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_many.val_acc[i]), np.asarray(res.val_acc), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res_many.params["w"][i]), np.asarray(res.params["w"]),
            rtol=2e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            float(res_many.final_lr[i]), float(res.final_lr), rtol=1e-6
        )


def test_resume_matches_uninterrupted():
    """Two 12+13-epoch segments == one 25-epoch run (exact key chain)."""
    x, y = _make_problem(7)
    data = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    opt = OptimizerConfig(name="adam", lr=0.03, schedule="cosine", cosine_t_max=25)
    params0 = {"w": jnp.zeros((6, 3)), "b": jnp.zeros(3)}

    full = train(
        rng=jax.random.PRNGKey(9), params=params0, loss_fn=_loss_fn, data=data,
        n_train=80, optimizer=opt, epochs=25, batch_size=16,
        val_fn=_val_fn, val_data=data, donate=False,
    )
    seg1 = train(
        rng=jax.random.PRNGKey(9), params=params0, loss_fn=_loss_fn, data=data,
        n_train=80, optimizer=opt, epochs=12, batch_size=16,
        val_fn=_val_fn, val_data=data, donate=False,
    )
    seg2 = train(
        rng=jax.random.PRNGKey(9), params=seg1.params, loss_fn=_loss_fn, data=data,
        n_train=80, optimizer=opt, epochs=13, batch_size=16,
        val_fn=_val_fn, val_data=data, donate=False,
        start_epoch=12, resume=(seg1.opt_state, seg1.plateau_state, seg1.rng),
    )
    np.testing.assert_allclose(
        np.asarray(seg2.params["w"]), np.asarray(full.params["w"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(seg1.train_loss), np.asarray(seg2.train_loss)]),
        np.asarray(full.train_loss), rtol=1e-5, atol=1e-6,
    )


def test_train_many_segmented_matches_monolithic():
    s = 2
    problems = [_make_problem(i + 20) for i in range(s)]
    opt = OptimizerConfig(name="adam", lr=0.03, schedule="cosine", cosine_t_max=24)
    params_stack = {"w": jnp.zeros((s, 6, 3)), "b": jnp.zeros((s, 3))}
    data_stack = {
        "x": jnp.asarray(np.stack([p[0] for p in problems])),
        "y": jnp.asarray(np.stack([p[1] for p in problems])),
    }
    kw = dict(
        rngs=jnp.stack([jax.random.PRNGKey(i) for i in range(s)]),
        params_stack=params_stack, loss_fn=_loss_fn, data_stack=data_stack,
        n_train=80, optimizer=opt, epochs=24, batch_size=16,
        val_fn=_val_fn, val_data_stack=data_stack,
    )
    mono = train_many(**kw)
    seg = train_many(**kw, segment_epochs=7)  # 7+7+7+3
    np.testing.assert_allclose(
        np.asarray(seg.params["w"]), np.asarray(mono.params["w"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(seg.train_loss), np.asarray(mono.train_loss),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(seg.val_acc), np.asarray(mono.val_acc), atol=1e-6
    )
