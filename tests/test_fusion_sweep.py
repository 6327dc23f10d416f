"""The fusion library as a swept capability: IntermediateFusion with any
registry fusion (models/fusions.py INTERMEDIATE_FUSIONS) instead of the
reference's hardcoded Concat (baselines.py:161). Covers the builder's
output-dim law, the view-count/size guards, task training for every
compatible fusion, and the runner's skip-marker contract."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.core.tasks import build_intermediate_fusion_task
from disentagled_multimodal_fusion_tpu.core.train import train
from disentagled_multimodal_fusion_tpu.data.synthetic import make_simple_plus_splits
from disentagled_multimodal_fusion_tpu.models.fusions import (
    INTERMEDIATE_FUSIONS,
    TENSOR_FUSION_MAX_DIM,
    build_fusion,
)


@pytest.fixture(scope="module")
def synth2():
    _, (xs_tr, y_tr), (xs_va, y_va) = make_simple_plus_splits(
        n_samples=1200, rho=0.6, shared_class_frac=0.6, seed=0,
        class_sep_shared=1.5, class_sep_private=1.3, noise_std=0.4,
        hetero_noise=False, conflict_frac=0.1, conflict_strength=0.3,
        nonlinear_shared=False, d_spurious=4,
    )
    return (
        tuple(jnp.asarray(x) for x in xs_tr), jnp.asarray(y_tr),
        tuple(jnp.asarray(x) for x in xs_va), jnp.asarray(y_va),
    )


def test_build_fusion_output_dims():
    """fused_dim law per fusion (2-view dims (5, 7), 3-view (5, 7, 3))."""
    cases_2v = {
        "concat": 12,
        "concat_linear": 16,
        "mi_matrix": 16,
        "mi_vector": 7,          # output 'vector' keeps modality-2's width
        "tensor": 6 * 8,         # prod(dims + 1)
        "lrtf": 16,
        "lft": 9,                # LateFusionTransformer embed_dim
    }
    for name, want in cases_2v.items():
        mod, fused_dim = build_fusion(name, (5, 7), output_dim=16, rank=4)
        assert fused_dim == want, name
        out = mod.init_with_output(
            jax.random.PRNGKey(0), [jnp.ones((2, 5)), jnp.ones((2, 7))]
        )[0]
        assert out.reshape(out.shape[0], -1).shape == (2, want), name

    mod, fused_dim = build_fusion("mi3", (5, 7, 3), output_dim=16)
    assert fused_dim == 16
    out = mod.init_with_output(
        jax.random.PRNGKey(0),
        [jnp.ones((2, 5)), jnp.ones((2, 7)), jnp.ones((2, 3))],
    )[0]
    assert out.shape == (2, 16)


def test_build_fusion_guards():
    with pytest.raises(ValueError, match="exactly 2 views"):
        build_fusion("mi_matrix", (5, 7, 3))
    with pytest.raises(ValueError, match="exactly 2 views"):
        build_fusion("mi_vector", (5,) * 6)
    with pytest.raises(ValueError, match="exactly 3 views"):
        build_fusion("mi3", (5, 7))
    with pytest.raises(ValueError, match="exceeds"):
        # HandWritten's 6 views: prod(dims+1) ~ 2e11
        build_fusion("tensor", (240, 76, 216, 47, 64, 6))
    assert np.prod(np.array([241, 77, 217, 48, 65, 7], dtype=np.float64)) \
        > TENSOR_FUSION_MAX_DIM
    with pytest.raises(ValueError, match="unknown fusion"):
        build_fusion("nlgate", (5, 7))


def test_build_fusion_mi_param_guard():
    """mi3's matrix3D weight is (d0, d1, d2*od) — cubic in the view dims.
    PIE's (484, 256, 279) needs 2.2e9 params (~35 GiB with Adam state),
    which RESOURCE_EXHAUSTED's the v5e at param init (observed round 4);
    the guard must skip it. LUMA's (40, 128, 3072) at 1.01e9 params is the
    measured-largest mi3 that trains on a 16 GiB chip and must stay
    allowed."""
    with pytest.raises(ValueError, match="params"):
        build_fusion("mi3", (484, 256, 279))  # PIE dims
    mod, fused_dim = build_fusion("mi3", (40, 128, 3072))  # LUMA dims
    assert fused_dim == 64
    # a pathological 2-view pair trips the mi_matrix guard too
    with pytest.raises(ValueError, match="params"):
        build_fusion("mi_matrix", (200_000, 200_000))


TWO_VIEW = [f for f in INTERMEDIATE_FUSIONS if f != "mi3"]


@pytest.mark.parametrize("fusion", TWO_VIEW)
def test_intermediate_fusion_variants_train(synth2, fusion):
    """Every 2-view-compatible fusion trains through the product task path
    to finite loss and above-chance accuracy (3 classes)."""
    xs_tr, y_tr, xs_va, y_va = synth2
    task = build_intermediate_fusion_task(
        rng=jax.random.PRNGKey(20), output_dims=[20, 20], num_classes=3,
        hidden_dim=64, dropout=0.1, lr=3e-3, annealing_start=10,
        fusion=fusion, fusion_output_dim=16, fusion_rank=4,
    )
    res = train(
        rng=jax.random.PRNGKey(21), params=task.params, loss_fn=task.loss_fn,
        data={"xs": xs_tr, "y": y_tr}, n_train=xs_tr[0].shape[0],
        optimizer=task.optimizer, epochs=15, batch_size=128, drop_last=True,
        val_fn=task.val_fn, val_data={"xs": xs_va, "y": y_va},
    )
    assert np.isfinite(float(res.train_loss[-1])), fusion
    assert float(res.val_acc[-1]) > 0.4, fusion  # chance = 1/3


def test_intermediate_fusion_mi3_trains(synth2):
    """mi3 needs exactly 3 views; synthesize a third from the other two."""
    xs_tr, y_tr, xs_va, y_va = synth2
    key = jax.random.PRNGKey(3)
    x3_tr = 0.5 * (xs_tr[0] + xs_tr[1]) + 0.05 * jax.random.normal(key, xs_tr[0].shape)
    x3_va = 0.5 * (xs_va[0] + xs_va[1])
    task = build_intermediate_fusion_task(
        rng=jax.random.PRNGKey(22), output_dims=[20, 20, 20], num_classes=3,
        hidden_dim=64, dropout=0.1, lr=3e-3, annealing_start=10,
        fusion="mi3", fusion_output_dim=16,
    )
    res = train(
        rng=jax.random.PRNGKey(23), params=task.params, loss_fn=task.loss_fn,
        data={"xs": (*xs_tr, x3_tr), "y": y_tr}, n_train=xs_tr[0].shape[0],
        optimizer=task.optimizer, epochs=15, batch_size=128, drop_last=True,
        val_fn=task.val_fn, val_data={"xs": (*xs_va, x3_va), "y": y_va},
    )
    assert np.isfinite(float(res.train_loss[-1]))
    assert float(res.val_acc[-1]) > 0.4


def test_concat_variant_is_bitwise_the_reference_path(synth2):
    """fusion='concat' must reproduce the historical concat task exactly
    (same params tree, same loss) — archived sweeps depend on it."""
    xs_tr, y_tr, _, _ = synth2
    kw = dict(
        rng=jax.random.PRNGKey(10), output_dims=[20, 20], num_classes=3,
        hidden_dim=64, dropout=0.1, lr=3e-3, annealing_start=10,
    )
    t_default = build_intermediate_fusion_task(**kw)
    t_concat = build_intermediate_fusion_task(**kw, fusion="concat")
    ja, jb = jax.tree.leaves(t_default.params), jax.tree.leaves(t_concat.params)
    assert len(ja) == len(jb)
    for a, b in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    batch = {"xs": tuple(x[:64] for x in xs_tr), "y": y_tr[:64]}
    ev_a = t_default.evidences_fn(t_default.params, batch)
    ev_b = t_concat.evidences_fn(t_concat.params, batch)
    np.testing.assert_array_equal(np.asarray(ev_a), np.asarray(ev_b))


def test_sweep_skips_incompatible_fusion(tmp_path):
    """CLI: --intermediate-fusion with one compatible (lrtf) and one
    incompatible (mi3 on 2-view CUB) fusion — the incompatible one leaves a
    skip marker that satisfies --rows-file completeness and is stripped
    from the report."""
    import json

    from disentagled_multimodal_fusion_tpu.runners.run import main as run_main

    rows_file = str(tmp_path / "rows.json")
    argv = ["--quick", "--seeds", "0", "--datasets", "CUB",
            "--conditions", "Normal", "--rows-file", rows_file,
            "--intermediate-fusion", "lrtf", "mi3"]
    df = run_main(argv)
    saved = json.loads((tmp_path / "rows.json").read_text())
    cell = saved["0"]["Normal"]["CUB"]
    assert len(cell) == 8  # 6 base + lrtf + mi3 marker
    assert "skipped" in cell["intermediate_mi3"]
    assert "fused" in cell["intermediate_lrtf"]
    models = set(df["model"])
    assert "intermediate_lrtf" in models and "intermediate_mi3" not in models
    acc = float(df[df["model"] == "intermediate_lrtf"]["fused_accuracy"].iloc[0])
    assert 0.0 <= acc <= 1.0
