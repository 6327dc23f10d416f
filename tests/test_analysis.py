"""Evaluation-engine tests: vectorised metrics vs a streaming numpy
transcription of the reference evaluator (analysis.py:6-399), and the
flattener column schema."""

import numpy as np
import torch

import jax.numpy as jnp

from disentagled_multimodal_fusion_tpu.eval.analysis import (
    build_metrics_dataframe,
    build_metrics_dataframe_datasets,
    evaluate_evidences,
    flatten_sample_info,
)

RNG = np.random.default_rng(3)


def _streaming_reference(evidences, fused, target, K, has_shared, batch=7):
    """Direct numpy/torch transcription of analysis.py:194-399 semantics."""

    def dirichlet(evi):
        a = torch.tensor(evi) + 1.0
        s = a.sum(-1, keepdim=True)
        p = a / s
        epi = (K / s).squeeze(-1)
        ale = -torch.sum(p * (torch.digamma(a + 1) - torch.digamma(s + 1)), -1)
        return epi.numpy(), ale.numpy()

    def ece_np(ev):
        alphas = ev + 1.0
        probs = alphas / alphas.sum(-1, keepdims=True)
        conf = probs.max(-1)
        correct = (probs.argmax(-1) == target).astype(np.float64)
        n_bins = 15
        edges = np.linspace(0, 1, n_bins + 1)
        idx = np.clip(np.searchsorted(edges, conf, side="left") - 1, 0, n_bins - 1)
        ece = 0.0
        for b in range(n_bins):
            m = idx == b
            if m.any():
                ece += m.mean() * abs(correct[m].mean() - conf[m].mean())
        return ece

    def block(ev):
        epi, ale = dirichlet(ev)
        preds = ev.argmax(-1)
        correct = preds == target
        inc = ~correct
        out = {
            "accuracy": correct.mean(),
            "ece": ece_np(ev),
            "evidence_mean": ev.sum(-1).mean(),
            "epistemic_mean": epi.mean(),
            "aleatoric_mean": ale.mean(),
            "incorrect_only": {
                "evidence_mean": ev.sum(-1)[inc].mean() if inc.any() else 0.0,
                "epistemic_mean": epi[inc].mean() if inc.any() else 0.0,
                "aleatoric_mean": ale[inc].mean() if inc.any() else 0.0,
            },
        }
        return out

    res = {"fused": block(fused)}
    uncond = {"fused": fused.mean(0).tolist()}
    counts = np.bincount(target, minlength=K).astype(np.float64)
    truecls = {
        "fused": (
            np.bincount(target, weights=fused[np.arange(len(target)), target], minlength=K)
            / np.clip(counts, 1e-12, None)
        ).tolist()
    }
    if has_shared:
        res["shared"] = block(evidences[:, 0])
        res["per_view"] = [block(evidences[:, v]) for v in range(1, evidences.shape[1])]
        uncond["shared"] = evidences[:, 0].mean(0).tolist()
        uncond["per_view"] = [evidences[:, v].mean(0).tolist() for v in range(1, evidences.shape[1])]
        truecls["shared"] = (
            np.bincount(target, weights=evidences[np.arange(len(target)), 0, target], minlength=K)
            / np.clip(counts, 1e-12, None)
        ).tolist()
        truecls["per_view"] = [
            (np.bincount(target, weights=evidences[np.arange(len(target)), v, target], minlength=K)
             / np.clip(counts, 1e-12, None)).tolist()
            for v in range(1, evidences.shape[1])
        ]
    else:
        res["per_view"] = [block(evidences[:, v]) for v in range(evidences.shape[1])]
        uncond["per_view"] = [evidences[:, v].mean(0).tolist() for v in range(evidences.shape[1])]
        truecls["per_view"] = [
            (np.bincount(target, weights=evidences[np.arange(len(target)), v, target], minlength=K)
             / np.clip(counts, 1e-12, None)).tolist()
            for v in range(evidences.shape[1])
        ]
    res["per_class_evidence"] = {"unconditional": uncond, "true_class": truecls}
    return res


def _assert_close(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a), set(b))
        for k in a:
            _assert_close(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list) and a and isinstance(a[0], (dict, list)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_close(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=path)


def test_evaluate_evidences_matches_streaming_with_shared():
    b, v, c = 57, 4, 6
    ev = (RNG.random((b, v, c)) * 4).astype(np.float32)
    fused = ev.sum(1)
    y = RNG.integers(0, c, b)
    ours = evaluate_evidences(jnp.asarray(ev), jnp.asarray(fused), jnp.asarray(y), c, True)
    # round-5 UQ-depth extras have no reference counterpart (tested below)
    ours["fused"].pop("reliability"), ours["fused"].pop("risk_coverage")
    ref = _streaming_reference(ev, fused, y, c, True)
    _assert_close(ours, ref)


def test_evaluate_evidences_matches_streaming_no_shared():
    b, v, c = 41, 2, 5
    ev = (RNG.random((b, v, c)) * 4).astype(np.float32)
    fused = ev.mean(1)
    y = RNG.integers(0, c, b)
    ours = evaluate_evidences(jnp.asarray(ev), jnp.asarray(fused), jnp.asarray(y), c, False)
    ours["fused"].pop("reliability"), ours["fused"].pop("risk_coverage")
    ref = _streaming_reference(ev, fused, y, c, False)
    _assert_close(ours, ref)


def test_flatten_columns_schema():
    b, v, c = 10, 3, 4
    ev = (RNG.random((b, v, c))).astype(np.float32)
    y = RNG.integers(0, c, b)
    info = evaluate_evidences(jnp.asarray(ev), jnp.asarray(ev.sum(1)), jnp.asarray(y), c, True)
    row = flatten_sample_info(info, seed=0, pct=50, model="m")
    # reference column names (analysis.py:402-480)
    for col in [
        "fused_accuracy", "fused_evidence_mean", "fused_epistemic_mean",
        "fused_aleatoric_mean", "fused_incorrect_only_evidence_mean",
        "shared_accuracy", "view_0_accuracy", "view_1_accuracy",
        "fused_per_class_evidence_class_0",
        "fused_per_class_evidence_true_class_3",
        "shared_per_class_evidence_class_0",
        "view_1_per_class_evidence_true_class_2",
        # round-5 UQ depth (fused head only)
        "fused_aurc", "fused_risk_at_50", "fused_risk_at_80",
        "fused_risk_at_90", "fused_rel_bin00_count", "fused_rel_bin14_acc",
        "fused_rel_bin07_conf",
    ]:
        assert col in row, col
    # per-view blocks do NOT get the 45-column reliability expansion
    assert "view_0_aurc" not in row
    assert "view_0_rel_bin00_count" not in row
    df = build_metrics_dataframe({0: {50: {"m": info}}})
    assert list(df.columns[:3]) == ["seed", "dep", "model"]
    df2 = build_metrics_dataframe_datasets({0: {"Normal": {"CUB": {"m": info}}}})
    assert list(df2.columns[:4]) == ["seed", "type", "dataset", "model"]


def test_risk_coverage_vs_numpy_transcription():
    """risk_coverage (one sort + cumsum inside jit) vs a direct numpy
    selective-prediction transcription."""
    from disentagled_multimodal_fusion_tpu.eval.analysis import (
        RC_COVERAGE_GRID,
        risk_coverage,
    )

    n, c = 97, 5
    probs = RNG.random((n, c)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    y = RNG.integers(0, c, n)
    out = {k: np.asarray(v) for k, v in
           risk_coverage(jnp.asarray(probs), jnp.asarray(y)).items()}

    conf = probs.max(1)
    correct = (probs.argmax(1) == y).astype(np.float64)
    order = np.argsort(-conf, kind="stable")
    err = 1.0 - correct[order]
    cum = np.cumsum(err) / np.arange(1, n + 1)
    np.testing.assert_allclose(out["aurc"], cum.mean(), rtol=1e-6)
    for cov, got in zip(RC_COVERAGE_GRID, out["risk"]):
        k = max(1, int(np.ceil(cov * n)))
        np.testing.assert_allclose(got, cum[k - 1], rtol=1e-6, err_msg=str(cov))
    for cov, key in [(0.5, "risk_at_50"), (0.8, "risk_at_80"),
                     (0.9, "risk_at_90")]:
        k = int(np.ceil(cov * n))
        np.testing.assert_allclose(out[key], cum[k - 1], rtol=1e-6)
    # coverage=1.0 risk is exactly the error rate
    np.testing.assert_allclose(out["risk"][-1], 1.0 - correct.mean(), rtol=1e-6)


def test_reliability_bins_consistent_with_ece():
    from disentagled_multimodal_fusion_tpu.eval.analysis import (
        expected_calibration_error,
        reliability_bins,
    )

    n, c = 64, 4
    probs = RNG.random((n, c)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    y = RNG.integers(0, c, n)
    b = {k: np.asarray(v) for k, v in
         reliability_bins(jnp.asarray(probs), jnp.asarray(y)).items()}
    assert b["count"].sum() == n
    ece = float(expected_calibration_error(jnp.asarray(probs), jnp.asarray(y)))
    manual = float(np.sum(
        b["count"] / n * np.abs(b["accuracy"] - b["confidence"])))
    np.testing.assert_allclose(ece, manual, rtol=1e-6)
    # occupied bins carry confidences inside their edges
    occupied = b["count"] > 0
    assert np.all(b["confidence"][occupied] >= 0.0)
    assert np.all(b["confidence"][occupied] <= 1.0)


def test_uq_plots_artifact(tmp_path):
    """write_uq_plots renders one SVG per (condition, dataset) cell from
    the nested sweep-row layout, and skips pre-round-5 rows without the
    UQ-depth entries."""
    from disentagled_multimodal_fusion_tpu.eval.uq_plots import write_uq_plots

    b, v, c = 12, 3, 4
    ev = RNG.random((b, v, c)).astype(np.float32)
    y = RNG.integers(0, c, b)
    info = evaluate_evidences(
        jnp.asarray(ev), jnp.asarray(ev.sum(1)), jnp.asarray(y), c, True
    )
    legacy = {"fused": {"accuracy": 0.5}}  # pre-round-5 row: no reliability
    rows = {
        1: {"normal": {"CUB": {"dmvae_cml": info, "old_model": legacy}},
            "conflict": {"CUB": {"avg_fusion": info}}},
        2: {"normal": {"CUB": {"dmvae_cml": info}}},
    }
    written = write_uq_plots(rows, tmp_path / "plots")
    names = sorted(p.split("/")[-1] for p in written)
    assert names == ["conflict_CUB_uq.svg", "normal_CUB_uq.svg"]
    for p in written:
        body = open(p).read()
        assert "<svg" in body
        assert "Risk-coverage" in body or "Risk" in body
