"""Seeded end-to-end slices on the synthetic generator (no downloads):
DMVAE -> probes/baselines -> evaluation -> flattening, small but real."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.core.tasks import (
    build_disentangled_probe_task,
    build_dmvae_task,
    build_intermediate_fusion_task,
    build_late_fusion_task,
    build_probe_task,
    build_disentangledssl_task,
    embed_dataset,
    embed_dataset_ssl,
)
from disentagled_multimodal_fusion_tpu.core.train import train
from disentagled_multimodal_fusion_tpu.data.synthetic import make_simple_plus_splits
from disentagled_multimodal_fusion_tpu.eval.analysis import (
    evaluate_subjective_model,
    evaluate_subjective_model_with_shared,
    flatten_sample_info,
)


@pytest.fixture(scope="module")
def synth():
    ds, (xs_tr, y_tr), (xs_va, y_va) = make_simple_plus_splits(
        n_samples=1200, rho=0.6, shared_class_frac=0.6, seed=0,
        class_sep_shared=1.5, class_sep_private=1.3, noise_std=0.4,
        hetero_noise=False, conflict_frac=0.1, conflict_strength=0.3,
        nonlinear_shared=False, d_spurious=4,
    )
    return (
        tuple(jnp.asarray(x) for x in xs_tr), jnp.asarray(y_tr),
        tuple(jnp.asarray(x) for x in xs_va), jnp.asarray(y_va),
    )


@pytest.fixture(scope="module")
def dmvae_backbone(synth):
    xs_tr, y_tr, xs_va, y_va = synth
    key = jax.random.PRNGKey(0)
    model, params, loss_fn, opt, _ = build_dmvae_task(
        rng=key, xs_sample=xs_tr, output_dim=[20, 20], embed_dim=8,
        hidden_dim=128, a=1e-5, lr=1e-3, num_epochs=25,
    )
    res = train(
        rng=key, params=params, loss_fn=loss_fn, data={"xs": xs_tr},
        n_train=xs_tr[0].shape[0], optimizer=opt, epochs=25,
        batch_size=128, drop_last=True,
    )
    assert float(res.train_loss[-1]) < float(res.train_loss[0])
    return model, res.params


def test_probe_beats_chance(synth, dmvae_backbone):
    xs_tr, y_tr, xs_va, y_va = synth
    model, params = dmvae_backbone
    zc_tr, zp_tr = embed_dataset(model, params, xs_tr)
    zc_va, zp_va = embed_dataset(model, params, xs_va)
    tr = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
    va = {"zc": zc_va, "zp": zp_va, "y": y_va}
    task = build_probe_task(
        rng=jax.random.PRNGKey(1), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(64,), lr=3e-3, dropout=0.1,
        annealing_start=10, aggregation="cml", fused=0.0, num_epochs=40,
    )
    res = train(
        rng=jax.random.PRNGKey(2), params=task.params, loss_fn=task.loss_fn,
        data=tr, n_train=int(zc_tr.shape[0]), optimizer=task.optimizer,
        epochs=40, batch_size=128, drop_last=True,
        val_fn=task.val_fn, val_data=va,
    )
    info = evaluate_subjective_model_with_shared(task, res.params, va)
    assert info["fused"]["accuracy"] > 0.55  # 3 classes, chance ~0.33
    row = flatten_sample_info(info, seed=0, pct=60, model="dmvae_cml")
    assert "shared_accuracy" in row and "view_1_accuracy" in row
    # uncertainty metrics sane: epistemic in (0, 1], aleatoric >= 0
    assert 0.0 < info["fused"]["epistemic_mean"] <= 1.0
    assert info["fused"]["aleatoric_mean"] > 0.0


def test_disentangled_probe_and_joint_agg(synth, dmvae_backbone):
    xs_tr, y_tr, xs_va, y_va = synth
    model, params = dmvae_backbone
    zc_tr, zp_tr = embed_dataset(model, params, xs_tr)
    zc_va, zp_va = embed_dataset(model, params, xs_va)
    tr = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
    va = {"zc": zc_va, "zp": zp_va, "y": y_va}
    dis = build_disentangled_probe_task(
        rng=jax.random.PRNGKey(4), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(64,), lr=3e-3, dropout=0.1,
        annealing_start=10, aggregation="cml",
    )
    res = train(
        rng=jax.random.PRNGKey(5), params=dis.params, loss_fn=dis.loss_fn,
        data=tr, n_train=int(zc_tr.shape[0]), optimizer=dis.optimizer,
        epochs=30, batch_size=128, drop_last=True,
        val_fn=dis.val_fn, val_data=va,
    )
    info = evaluate_subjective_model(dis, res.params, va)
    assert info["fused"]["accuracy"] > 0.5
    assert len(info["per_view"]) == 2 and "shared" not in info

    joint = build_probe_task(
        rng=jax.random.PRNGKey(6), num_modalities=2, num_classes=3,
        input_dim=8, hidden_dim=(64,), lr=3e-3, dropout=0.1,
        annealing_start=10, aggregation="joint", fused=1.0, num_epochs=30,
    )
    res_j = train(
        rng=jax.random.PRNGKey(7), params=joint.params, loss_fn=joint.loss_fn,
        data=tr, n_train=int(zc_tr.shape[0]), optimizer=joint.optimizer,
        epochs=30, batch_size=128, drop_last=True,
        val_fn=joint.val_fn, val_data=va,
    )
    info_j = evaluate_subjective_model_with_shared(joint, res_j.params, va)
    assert info_j["fused"]["accuracy"] > 0.5


@pytest.mark.parametrize("agg", ["cml", "avg", "dbf"])
def test_late_fusion_aggregations(synth, agg):
    xs_tr, y_tr, xs_va, y_va = synth
    lf = build_late_fusion_task(
        rng=jax.random.PRNGKey(8), output_dims=[20, 20], num_classes=3,
        hidden_dim=(64,), dropout=0.1, lr=3e-3, annealing_start=10,
        aggregation=agg, fused=0.0,
    )
    res = train(
        rng=jax.random.PRNGKey(9), params=lf.params, loss_fn=lf.loss_fn,
        data={"xs": xs_tr, "y": y_tr}, n_train=xs_tr[0].shape[0],
        optimizer=lf.optimizer, epochs=30, batch_size=128, drop_last=True,
        val_fn=lf.val_fn, val_data={"xs": xs_va, "y": y_va},
    )
    info = evaluate_subjective_model(lf, res.params, {"xs": xs_va, "y": y_va})
    assert info["fused"]["accuracy"] > 0.5, agg


def test_intermediate_fusion(synth):
    xs_tr, y_tr, xs_va, y_va = synth
    imf = build_intermediate_fusion_task(
        rng=jax.random.PRNGKey(10), output_dims=[20, 20], num_classes=3,
        hidden_dim=64, dropout=0.1, lr=3e-3, annealing_start=10,
    )
    res = train(
        rng=jax.random.PRNGKey(11), params=imf.params, loss_fn=imf.loss_fn,
        data={"xs": xs_tr, "y": y_tr}, n_train=xs_tr[0].shape[0],
        optimizer=imf.optimizer, epochs=30, batch_size=128, drop_last=True,
        val_fn=imf.val_fn, val_data={"xs": xs_va, "y": y_va},
    )
    assert float(res.val_acc[-1]) > 0.5


def test_disentangledssl_trains_and_probes(synth):
    xs_tr, y_tr, xs_va, y_va = synth
    model, params, loss_fn, opt = build_disentangledssl_task(
        rng=jax.random.PRNGKey(12), output_dim=[20, 20], hidden_dim=64,
        embed_dim=8, distribution="normal", lr=1e-3, epochs=10,
    )
    res = train(
        rng=jax.random.PRNGKey(13), params=params, loss_fn=loss_fn,
        data={"xs": xs_tr}, n_train=xs_tr[0].shape[0], optimizer=opt,
        epochs=10, batch_size=128, drop_last=True,
    )
    assert np.isfinite(float(res.train_loss[-1]))
    zc, zp = embed_dataset_ssl(model, res.params, xs_va)
    assert zc.shape == (xs_va[0].shape[0], 16)
    assert zp.shape == (xs_va[0].shape[0], 2, 8)


def test_checkpoint_roundtrip(tmp_path, synth, dmvae_backbone):
    from disentagled_multimodal_fusion_tpu.core.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    model, params = dmvae_backbone
    path = save_checkpoint(str(tmp_path / "ckpt"), params, {"a": 1e-5})
    restored = restore_checkpoint(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_sweep_rows_file_resume(tmp_path, capsys):
    """--rows-file: a completed (condition, dataset) cell is checkpointed
    and skipped on re-invocation; the rebuilt report matches the original."""
    import json

    from disentagled_multimodal_fusion_tpu.runners.run import main as run_main

    rows_file = str(tmp_path / "rows.json")
    argv = ["--quick", "--seeds", "0", "--datasets", "CUB",
            "--conditions", "Normal", "--rows-file", rows_file,
            "--include-intermediate"]
    df1 = run_main(argv)
    saved = json.loads((tmp_path / "rows.json").read_text())
    # all seven models recorded (incl. the --include-intermediate baseline)
    assert len(saved["0"]["Normal"]["CUB"]) == 7
    assert "intermediate_fusion" in saved["0"]["Normal"]["CUB"]

    df2 = run_main(argv)  # resumes: trains nothing, rebuilds the report
    out = capsys.readouterr().out
    assert "already complete (--rows-file), skipping" in out
    assert df1.shape == df2.shape
    np.testing.assert_allclose(
        df1["fused_accuracy"].to_numpy(), df2["fused_accuracy"].to_numpy())


def test_vmap_seeds_axon_guard(monkeypatch, capsys):
    """The axon-relay safety guard: the known-crash config (tpu backend via
    the axon relay, f32 precision, >=2 seeds) auto-falls back to sequential
    with a loud warning; bf16, single-seed, and --force-vmap-seeds pass."""
    import argparse

    from disentagled_multimodal_fusion_tpu.runners import common

    monkeypatch.setattr(
        "jax.default_backend", lambda: "tpu", raising=True)
    from jax._src import xla_bridge as xb

    monkeypatch.setattr(xb, "backends", lambda: {"axon": None, "cpu": None})

    assert common.vmap_seeds_unsafe(5, "float32") is not None
    assert common.vmap_seeds_unsafe(5, None) is not None
    assert common.vmap_seeds_unsafe(5, "bfloat16") is None
    assert common.vmap_seeds_unsafe(1, "float32") is None

    args = argparse.Namespace(vmap_seeds=True, force_vmap_seeds=False)
    assert common.guard_vmap_seeds(args, 5, "float32") is False
    assert "falling back to sequential" in capsys.readouterr().out
    args.force_vmap_seeds = True
    assert common.guard_vmap_seeds(args, 5, "float32") is True
    assert "overrides a known-bad config" in capsys.readouterr().out

    # healthy backends are untouched
    monkeypatch.setattr(xb, "backends", lambda: {"tpu": None, "cpu": None})
    assert common.vmap_seeds_unsafe(5, "float32") is None


def test_artifact_root_isolation(tmp_path, monkeypatch):
    """Relative artifact paths (checkpoints/, logs/) re-root under
    DMF_ARTIFACT_ROOT; absolute paths pass through. Pins the isolation
    that keeps runner-driving tests from clobbering repo artifacts."""
    from disentagled_multimodal_fusion_tpu.core.artifacts import artifact_path
    from disentagled_multimodal_fusion_tpu.core.checkpoint import (
        restore_checkpoint, save_checkpoint)

    monkeypatch.setenv("DMF_ARTIFACT_ROOT", str(tmp_path))
    assert artifact_path("checkpoints/x") == tmp_path / "checkpoints" / "x"
    assert artifact_path(tmp_path / "abs") == tmp_path / "abs"
    params = {"w": jnp.arange(4.0)}
    save_checkpoint("checkpoints/unit_iso", params, wait=True)
    assert (tmp_path / "checkpoints" / "unit_iso").exists()
    out = restore_checkpoint("checkpoints/unit_iso", params)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.arange(4.0))


def test_evaluate_reload_synthetic(tmp_path):
    """runners/evaluate round-trips a synthetic-driver checkpoint: the
    reloaded evaluation reproduces the runner's fused accuracy exactly."""
    from disentagled_multimodal_fusion_tpu.runners.evaluate import main as eval_main
    from disentagled_multimodal_fusion_tpu.runners.run_synthetic import main as synth_main

    df = synth_main(["--quick", "--seeds", "0", "--deps", "50"])
    want = float(df[df["model"] == "dmvae_cml"]["fused_accuracy"].iloc[0])
    info = eval_main([
        "--model", "dmvae_cml", "--dataset", "synthetic", "--seed", "0",
        "--dep", "50", "--quick",
    ])
    np.testing.assert_allclose(float(info["fused"]["accuracy"]), want, atol=1e-6)
    # late-fusion naming scheme reloads too
    want_lf = float(df[df["model"] == "avg"]["fused_accuracy"].iloc[0])
    info_lf = eval_main([
        "--model", "avg_fusion", "--dataset", "synthetic", "--seed", "0",
        "--dep", "50", "--quick",
    ])
    np.testing.assert_allclose(float(info_lf["fused"]["accuracy"]), want_lf, atol=1e-6)


def test_evaluate_reload_luma(tmp_path):
    """runners/evaluate round-trips LUMA checkpoints (probe incl. the
    frozen-DMVAE re-embed, and LateFusion incl. the BatchNorm-stats
    sidecar) on the fixture corpus."""
    from disentagled_multimodal_fusion_tpu.data.luma import make_fake_luma
    from disentagled_multimodal_fusion_tpu.runners.evaluate import main as eval_main
    from disentagled_multimodal_fusion_tpu.runners.run_luma import main as luma_main

    root = make_fake_luma(
        tmp_path / "luma", n_classes=3, train_per_class=4, test_per_class=2)
    df = luma_main([
        "--seeds", "0", "--data-path", root,
        "--dmvae-epochs", "2", "--probe-epochs", "2",
    ])
    for model in ("dmvae_cml", "cml_fusion"):
        want = float(df[df["model"] == model]["fused_accuracy"].iloc[0])
        info = eval_main([
            "--model", model, "--dataset", "LUMA", "--seed", "0",
            "--data-path", root,
        ])
        np.testing.assert_allclose(
            float(info["fused"]["accuracy"]), want, atol=1e-6,
            err_msg=f"reload mismatch for {model}",
        )


def test_luma_rows_file_ood_resume(tmp_path):
    """run_luma --rows-file + --ood-eval: resuming must not double-count a
    completed seed's OOD rows. The OOD summary derives from the rows
    checkpoint (single source of truth) — the regression risk is the
    vmapped path, which retrains EVERY seed unless all are complete, so an
    accumulator rebuilt at resume time would count the completed seed
    twice."""
    import json
    from pathlib import Path

    from disentagled_multimodal_fusion_tpu.data.luma import make_fake_luma
    from disentagled_multimodal_fusion_tpu.runners.run_luma import main as luma_main

    root = make_fake_luma(
        tmp_path / "luma", n_classes=3, train_per_class=4, test_per_class=2,
        ood_classes=1)
    rows_file = str(tmp_path / "rows.json")
    base = ["--data-path", root, "--dmvae-epochs", "2", "--probe-epochs", "2",
            "--rows-file", rows_file, "--ood-eval"]
    luma_main(base + ["--seeds", "0"])
    assert set(json.loads(Path(rows_file).read_text())) == {"0"}
    # resume with an extra seed through the vmapped path: seed 0 is already
    # complete in the rows file, both seeds retrain
    luma_main(base + ["--seeds", "0", "1", "--vmap-seeds"])
    from disentagled_multimodal_fusion_tpu.core.artifacts import artifact_path

    ood = json.loads(artifact_path("logs/luma_ood.json").read_text())
    assert ood["per_seed"], "OOD summary missing"
    for model, rs in ood["per_seed"].items():
        assert len(rs) == 2, (model, len(rs))


def test_luma_intermediate_fusion_with_batchnorm(tmp_path):
    """run_luma --include-intermediate: IntermediateFusion over the LUMA
    feature encoders — the ImageEncoder carries BatchNorm batch_stats, so
    this exercises the stateful intermediate closures (the combination
    that used to raise NotImplementedError in core/tasks.py) end-to-end,
    plus the --ood-eval AUROC row for the intermediate model."""
    import json

    from disentagled_multimodal_fusion_tpu.core.artifacts import artifact_path
    from disentagled_multimodal_fusion_tpu.data.luma import make_fake_luma
    from disentagled_multimodal_fusion_tpu.runners.run_luma import main as luma_main

    root = make_fake_luma(
        tmp_path / "luma", n_classes=3, train_per_class=4, test_per_class=2,
        ood_classes=1)
    df = luma_main([
        "--seeds", "0", "--data-path", root,
        "--dmvae-epochs", "2", "--probe-epochs", "2",
        "--include-intermediate", "--ood-eval",
    ])
    assert "intermediate_fusion" in set(df["model"])
    acc = float(df[df["model"] == "intermediate_fusion"]["fused_accuracy"].iloc[0])
    assert 0.0 <= acc <= 1.0
    ood = json.loads(artifact_path("logs/luma_ood.json").read_text())
    assert "intermediate_fusion" in ood["per_seed"]


def test_luma_intermediate_vmapped_and_skip_marker(tmp_path):
    """Vmapped LUMA path with an intermediate job (BatchNorm state stacked
    across seeds) plus a view-count-incompatible fusion (mi_matrix is
    2-modal; LUMA has 3 views): the incompatible one leaves a skip marker
    that satisfies the --rows-file count and is stripped from the report."""
    import json
    from pathlib import Path

    from disentagled_multimodal_fusion_tpu.data.luma import make_fake_luma
    from disentagled_multimodal_fusion_tpu.runners.run_luma import main as luma_main

    root = make_fake_luma(
        tmp_path / "luma", n_classes=3, train_per_class=4, test_per_class=2)
    rows_file = str(tmp_path / "rows.json")
    df = luma_main([
        "--seeds", "0", "1", "--data-path", root,
        "--dmvae-epochs", "2", "--probe-epochs", "2",
        "--vmap-seeds", "--force-vmap-seeds",
        "--intermediate-fusion", "concat", "mi_matrix",
        "--rows-file", rows_file,
    ])
    models = set(df["model"])
    assert "intermediate_fusion" in models
    assert "intermediate_mi_matrix" not in models  # skipped, stripped
    saved = json.loads(Path(rows_file).read_text())
    for s in ("0", "1"):
        cell = saved[s]["Normal"]["LUMA"]
        assert "skipped" in cell["intermediate_mi_matrix"]
        # 6 base + concat + skip marker = complete at n_models == 8
        assert len(cell) == 8


def test_evaluate_reload_noise_condition(tmp_path):
    """runners/evaluate reloads a Noise-condition .mat checkpoint (the
    _noise suffix + test-row noise injection replay)."""
    from disentagled_multimodal_fusion_tpu.runners.evaluate import main as eval_main
    from disentagled_multimodal_fusion_tpu.runners.run import main as run_main

    df = run_main(["--quick", "--seeds", "0", "--datasets", "CUB",
                   "--conditions", "Noise"])
    want = float(df[(df["model"] == "cml_fusion")
                    & (df["type"] == "Noise")]["fused_accuracy"].iloc[0])
    info = eval_main([
        "--model", "cml_fusion", "--dataset", "CUB", "--seed", "0",
        "--condition", "noise",
    ])
    np.testing.assert_allclose(float(info["fused"]["accuracy"]), want, atol=1e-6)
