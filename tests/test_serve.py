"""Serving path (core/serve.py): fused inference, bucketing, jax.export.

The reference has no deployment story (models die with their Lightning
sweep process, run.py:179-326); these tests pin the contract of ours:
the backbone-folded program is bit-equal to the train-time two-step
math, bucketing padding never leaks into real rows, and the jax.export
artifact replays the program without model code or checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentagled_multimodal_fusion_tpu.core.serve import (
    DEFAULT_BUCKETS,
    ServingEngine,
    build_inference_fn,
    export_inference,
    load_exported,
)
from disentagled_multimodal_fusion_tpu.core.tasks import (
    build_dmvae_task,
    build_late_fusion_task,
    build_probe_task,
    embed_dataset,
)


@pytest.fixture(scope="module")
def views():
    rng = np.random.RandomState(0)
    return tuple(
        jnp.asarray(rng.randn(16, d).astype(np.float32)) for d in (12, 10)
    )


@pytest.fixture(scope="module")
def probe_setup(views):
    """Untrained-but-deterministic backbone + probe (init params suffice:
    serving correctness is about program equivalence, not accuracy)."""
    key = jax.random.PRNGKey(0)
    backbone, bb_params, _, _, _ = build_dmvae_task(
        rng=key, xs_sample=views, output_dim=[12, 10], embed_dim=8,
        hidden_dim=32, a=1e-5,
    )
    task = build_probe_task(
        rng=jax.random.PRNGKey(1), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(16,), lr=1e-3, dropout=0.1,
        aggregation="cml",
    )
    return backbone, bb_params, task


def test_backbone_folded_matches_two_step(views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    out = infer(views)

    zc, zp = embed_dataset(backbone, bb_params, views)
    ev = task.evidences_fn(task.params, {"zc": zc, "zp": zp})
    fused = task.aggregation(ev)
    np.testing.assert_allclose(out["evidence"], ev, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        out["fused_evidence"], fused, rtol=1e-6, atol=1e-6
    )
    assert out["pred"].shape == (16,)
    assert out["evidence"].shape == (16, 3, 3)  # [shared, v1, v2] layout


def test_output_semantics(views):
    task = build_late_fusion_task(
        rng=jax.random.PRNGKey(2), output_dims=[12, 10], num_classes=4,
        hidden_dim=(16,), dropout=0.1, lr=1e-3, aggregation="avg",
    )
    out = build_inference_fn(task, task.params)(views)
    np.testing.assert_allclose(
        jnp.sum(out["probs"], axis=-1), np.ones(16), rtol=1e-5
    )
    np.testing.assert_array_equal(
        out["pred"], jnp.argmax(out["fused_evidence"], axis=-1)
    )
    # epistemic = K/S in (0, 1]; aleatoric >= 0 (ops/dirichlet.py)
    assert float(jnp.min(out["epistemic"])) > 0.0
    assert float(jnp.max(out["epistemic"])) <= 1.0
    assert float(jnp.min(out["aleatoric"])) >= 0.0


def test_stateful_task_requires_trained_state(views):
    task = build_late_fusion_task(
        rng=jax.random.PRNGKey(3), output_dims=[12, 10], num_classes=3,
        hidden_dim=(16,), dropout=0.1, lr=1e-3, aggregation="cml",
    )
    fake_stateful = task._replace(model_state={"batch_stats": {}})
    with pytest.raises(ValueError, match="TRAINED model_state"):
        build_inference_fn(fake_stateful, task.params)


def test_bucketing_matches_exact_batch(views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    engine = ServingEngine(infer, buckets=(4, 8))
    xs5 = tuple(x[:5] for x in views)
    out = engine(xs5)  # padded to bucket 8, sliced back
    direct = infer(xs5)
    for k in out:
        assert out[k].shape[0] == 5, k
        np.testing.assert_allclose(out[k], direct[k], rtol=1e-6, atol=1e-6)


def test_bucket_rounding():
    engine = ServingEngine(lambda xs: {"x": xs[0]}, buckets=(4, 8))
    assert engine.bucket_for(1) == 4
    assert engine.bucket_for(8) == 8
    assert engine.bucket_for(9) == 16   # beyond top: next multiple of 8
    assert engine.bucket_for(20) == 24
    with pytest.raises(ValueError):
        ServingEngine(lambda xs: xs, buckets=())


def test_oversize_batch_and_warmup(views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    engine = ServingEngine(infer, buckets=(4,))
    engine.warmup(views)
    out = engine(views)  # 16 rows over a top bucket of 4
    np.testing.assert_allclose(
        out["fused_evidence"], infer(views)["fused_evidence"],
        rtol=1e-6, atol=1e-6,
    )


def test_export_roundtrip(tmp_path, views, probe_setup):
    backbone, bb_params, task = probe_setup
    infer = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    xs8 = tuple(x[:8] for x in views)
    path = str(tmp_path / "probe_b8.stablehlo")
    export_inference(infer, xs8, path)
    served = load_exported(path)
    out = served(xs8)
    direct = infer(xs8)
    for k in direct:
        np.testing.assert_allclose(
            out[k], direct[k], rtol=1e-5, atol=1e-6
        )


def test_default_buckets_sorted():
    assert DEFAULT_BUCKETS == tuple(sorted(DEFAULT_BUCKETS))


def test_mesh_sharded_serving_matches_single_device(views, probe_setup):
    from disentagled_multimodal_fusion_tpu.parallel.mesh import make_mesh

    backbone, bb_params, task = probe_setup
    plain = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params
    )
    mesh = make_mesh(8)
    sharded = build_inference_fn(
        task, task.params, backbone=backbone, backbone_params=bb_params,
        mesh=mesh,
    )
    engine = ServingEngine(sharded, buckets=(4, 16), divisor=8)
    assert engine.buckets == (8, 16)  # 4 rounded up to the data-axis size
    out = engine(tuple(x[:5] for x in views))
    ref = plain(tuple(x[:5] for x in views))
    for k in ref:
        assert out[k].shape == ref[k].shape, k
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-5, atol=1e-6)
