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
    ref = _streaming_reference(ev, fused, y, c, True)
    _assert_close(ours, ref)


def test_evaluate_evidences_matches_streaming_no_shared():
    b, v, c = 41, 2, 5
    ev = (RNG.random((b, v, c)) * 4).astype(np.float32)
    fused = ev.mean(1)
    y = RNG.integers(0, c, b)
    ours = evaluate_evidences(jnp.asarray(ev), jnp.asarray(fused), jnp.asarray(y), c, False)
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
    ]:
        assert col in row, col
    df = build_metrics_dataframe({0: {50: {"m": info}}})
    assert list(df.columns[:3]) == ["seed", "dep", "model"]
    df2 = build_metrics_dataframe_datasets({0: {"Normal": {"CUB": {"m": info}}}})
    assert list(df2.columns[:4]) == ["seed", "type", "dataset", "model"]
