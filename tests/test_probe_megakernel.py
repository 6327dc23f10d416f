"""Megakernel probe-fit program vs the default XLA program.

The megakernel path (ops/probe_megakernel.py + core/megakernel.py)
reproduces the default path's randomness stream bit-for-bit (shuffle,
batch plan, flax dropout masks), so the two programs are comparable at
float tolerance on every output — not just statistically. Kernel runs in
interpret mode here (CPU suite); compiled-mode parity is measured on the
real chip by bench.py / tools.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentagled_multimodal_fusion_tpu.core.megakernel import (
    ProbeMegakernelDesc,
    make_probe_megakernel_program,
    supports_probe_megakernel,
)
from disentagled_multimodal_fusion_tpu.core.tasks import (
    build_disentangled_probe_task,
    build_probe_task,
)
from disentagled_multimodal_fusion_tpu.core.train import (
    OptimizerConfig,
    make_train_program,
)


def _data(n=64, mods=3, d=12, ds=None, classes=5):
    zc = jax.random.normal(jax.random.PRNGKey(1), (n, ds or d))
    zp = jax.random.normal(jax.random.PRNGKey(2), (n, mods, d))
    y = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, classes)
    return {"zc": zc, "zp": zp, "y": y}


def _fit_both(task, desc, data, val_data, n, b, epochs, val=True):
    ref_prog = make_train_program(
        loss_fn=task.loss_fn, n_train=n, optimizer=task.optimizer,
        epochs=epochs, batch_size=b, drop_last=False, shuffle=True,
        val_fn=task.val_fn if val else None, has_state=False,
    )
    fast_prog = make_probe_megakernel_program(
        desc=desc, n_train=n, optimizer=task.optimizer, epochs=epochs,
        batch_size=b, drop_last=False, shuffle=True,
        val_fn=task.val_fn if val else None, interpret=True,
    )
    rkey = jax.random.PRNGKey(7)
    vd = val_data if val else None
    ref = jax.jit(lambda p, r: ref_prog(p, r, data, vd, None))(task.params, rkey)
    fast = jax.jit(lambda p, r: fast_prog(p, r, data, vd, None))(task.params, rkey)
    return ref, fast


def _assert_close(ref, fast, val=True):
    np.testing.assert_allclose(
        np.asarray(fast.train_loss), np.asarray(ref.train_loss),
        rtol=2e-5, atol=2e-6,
    )
    for k in ("w1", "b1", "w2", "b2"):
        a = np.asarray(fast.params["StackedMLP_0"][k])
        b = np.asarray(ref.params["StackedMLP_0"][k])
        # Adam divides by sqrt(nu)+eps: tiny op-level diffs amplify on
        # near-zero entries, so bound abs and rel jointly.
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)
    if val:
        np.testing.assert_allclose(
            np.asarray(fast.val_loss), np.asarray(ref.val_loss),
            rtol=2e-5, atol=2e-6,
        )
        # same dropout stream + same params => identical argmax decisions
        np.testing.assert_array_equal(
            np.asarray(fast.val_acc), np.asarray(ref.val_acc)
        )
    assert int(fast.opt_state[0].count) == int(ref.opt_state[0].count)


def test_flax_dropout_key_derivation_pinned():
    """The suffix ('StackedMLP_0','Dropout_0',1) must match a REAL apply.

    Guards against flax changing its scope-path/counter key derivation:
    capture the key nn.Dropout actually passes to bernoulli and compare.
    """
    from disentagled_multimodal_fusion_tpu.models.probes import (
        FusedEvidentialProbe,
    )
    from disentagled_multimodal_fusion_tpu.ops.probe_megakernel import (
        dropout_mask_key,
    )

    model = FusedEvidentialProbe(
        num_modalities=2, num_classes=4, input_dim=6, hidden_dim=(8,),
        dropout=0.5,
    )
    zc = jnp.ones((3, 6))
    zp = [jnp.ones((3, 6))] * 2
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        zc, zp, train=True,
    )["params"]

    captured = []
    orig = jax.random.bernoulli

    def spy(key, *a, **kw):
        captured.append(key)
        return orig(key, *a, **kw)

    jax.random.bernoulli = spy
    try:
        step_key = jax.random.PRNGKey(42)
        model.apply({"params": params}, zc, zp, train=True,
                    rngs={"dropout": step_key})
    finally:
        jax.random.bernoulli = orig
    assert len(captured) == 1
    np.testing.assert_array_equal(
        np.asarray(captured[0]), np.asarray(dropout_mask_key(step_key))
    )


def test_shared_probe_no_dropout_no_val():
    task = build_probe_task(
        rng=jax.random.PRNGKey(0), num_modalities=3, num_classes=5,
        input_dim=12, hidden_dim=(8,), lr=3e-3, dropout=0.0,
        annealing_start=2, aggregation="cml", num_epochs=3,
    )
    desc = ProbeMegakernelDesc(3, 5, 12, None, 8, 0.0, 1.0, 2.0, True)
    data = _data()
    ref, fast = _fit_both(task, desc, data, None, 64, 16, 3, val=False)
    _assert_close(ref, fast, val=False)


def test_shared_probe_dropout_val_and_ragged_tail():
    task = build_probe_task(
        rng=jax.random.PRNGKey(0), num_modalities=3, num_classes=5,
        input_dim=12, hidden_dim=(8,), lr=3e-3, dropout=0.3,
        annealing_start=2, aggregation="cml", num_epochs=3,
    )
    desc = ProbeMegakernelDesc(3, 5, 12, None, 8, 0.3, 1.0, 2.0, True)
    data = _data(n=70)
    vd = jax.tree.map(lambda a: a[:32], data)
    ref, fast = _fit_both(task, desc, data, vd, 70, 16, 3)
    _assert_close(ref, fast)


def test_shared_probe_wider_shared_input():
    # DisentangledSSL layout: Zc is 2*embed wide (models/probes.py)
    task = build_probe_task(
        rng=jax.random.PRNGKey(0), num_modalities=2, num_classes=4,
        input_dim=10, hidden_dim=(8,), lr=1e-3, dropout=0.2,
        annealing_start=3, aggregation="joint", num_epochs=2,
        shared_input_dim=20,
    )
    desc = ProbeMegakernelDesc(2, 4, 10, 20, 8, 0.2, 1.0, 3.0, True)
    data = _data(mods=2, d=10, ds=20, classes=4)
    vd = jax.tree.map(lambda a: a[:32], data)
    ref, fast = _fit_both(task, desc, data, vd, 64, 16, 2)
    _assert_close(ref, fast)


def test_disentangled_probe_plateau_schedule():
    task = build_disentangled_probe_task(
        rng=jax.random.PRNGKey(0), num_modalities=3, num_classes=5,
        input_dim=12, hidden_dim=(8,), lr=3e-3, dropout=0.3,
        annealing_start=2, num_epochs=4,
    )
    assert task.optimizer.schedule == "plateau"
    desc = ProbeMegakernelDesc(3, 5, 12, None, 8, 0.3, 1.0, 2.0, False)
    data = _data(n=70)
    vd = jax.tree.map(lambda a: a[:32], data)
    ref, fast = _fit_both(task, desc, data, vd, 70, 16, 4)
    _assert_close(ref, fast)
    np.testing.assert_allclose(
        float(fast.final_lr), float(ref.final_lr), rtol=1e-6
    )


def test_resume_matches_uninterrupted():
    """2 epochs + resume(2 more) == 4 straight epochs (same contract as
    the default program's mid-training resume)."""
    task = build_probe_task(
        rng=jax.random.PRNGKey(0), num_modalities=2, num_classes=4,
        input_dim=10, hidden_dim=(8,), lr=3e-3, dropout=0.2,
        annealing_start=2, aggregation="cml", num_epochs=4,
    )
    desc = ProbeMegakernelDesc(2, 4, 10, None, 8, 0.2, 1.0, 2.0, True)
    data = _data(mods=2, d=10, classes=4)
    vd = jax.tree.map(lambda a: a[:32], data)

    def prog(epochs, start):
        return make_probe_megakernel_program(
            desc=desc, n_train=64, optimizer=task.optimizer, epochs=epochs,
            batch_size=16, drop_last=False, shuffle=True,
            val_fn=task.val_fn, start_epoch=start, interpret=True,
        )

    rkey = jax.random.PRNGKey(7)
    full = prog(4, 0)(task.params, rkey, data, vd, None)
    seg1 = prog(2, 0)(task.params, rkey, data, vd, None)
    seg2 = prog(2, 2)(
        seg1.params, None, data, vd, None,
        resume=(seg1.opt_state, seg1.plateau_state, seg1.rng),
    )
    for k in ("w1", "b1", "w2", "b2"):
        np.testing.assert_allclose(
            np.asarray(seg2.params["StackedMLP_0"][k]),
            np.asarray(full.params["StackedMLP_0"][k]),
            rtol=1e-6, atol=1e-7,
        )
    np.testing.assert_allclose(
        np.asarray(seg2.train_loss), np.asarray(full.train_loss[2:]),
        rtol=1e-6,
    )


def test_supports_guard():
    desc = ProbeMegakernelDesc(3, 5, 12, None, 8, 0.3, 1.0, 2.0, True)
    adamw = OptimizerConfig(name="adamw", lr=1e-3, weight_decay=1e-4,
                            schedule="cosine")
    assert supports_probe_megakernel(desc, adamw)
    assert not supports_probe_megakernel(None, adamw)
    assert not supports_probe_megakernel(desc, adamw, model_state={"bn": 1})
    assert not supports_probe_megakernel(desc, adamw, mesh=object())
    adam = OptimizerConfig(name="adam", lr=1e-3)
    assert not supports_probe_megakernel(desc, adam)
