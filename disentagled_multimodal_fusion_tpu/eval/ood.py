"""OOD scoring from evidential uncertainties.

NEW capability beyond the reference (its LUMA corpus ships 8 OOD classes
and compile-time OOD knobs — compile_luma.py:34-47, dataset_luma.py:56 —
but no OOD evaluation ever runs). Given fused evidences for in-distribution
and out-of-distribution inputs, score each sample by an uncertainty measure
and report AUROC of OOD-vs-ID separation.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..ops.dirichlet import dirichlet_uncertainties


def auroc(scores_pos: np.ndarray, scores_neg: np.ndarray) -> float:
    """Rank-based AUROC: P(score_pos > score_neg) with tie correction.
    NaN when either side is empty (undefined, not an error)."""
    if len(scores_pos) == 0 or len(scores_neg) == 0:
        return float("nan")
    scores = np.concatenate([scores_pos, scores_neg])
    order = scores.argsort(kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    n_pos, n_neg = len(scores_pos), len(scores_neg)
    r_pos = ranks[: n_pos].sum()
    return float((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def ood_scores(evidence, num_classes: int) -> Dict[str, np.ndarray]:
    """Per-sample OOD scores from fused evidence (B, C): higher = more OOD."""
    epi, ale = dirichlet_uncertainties(jnp.asarray(evidence), num_classes)
    total = jnp.sum(jnp.asarray(evidence), axis=-1)
    return {
        "epistemic": np.asarray(epi),
        "aleatoric": np.asarray(ale),
        "neg_evidence": -np.asarray(total),
    }


def evaluate_ood(evidence_id, evidence_ood, num_classes: int) -> Dict[str, float]:
    """AUROC per uncertainty measure (OOD = positive class)."""
    s_id = ood_scores(evidence_id, num_classes)
    s_ood = ood_scores(evidence_ood, num_classes)
    return {f"auroc_{k}": auroc(s_ood[k], s_id[k]) for k in s_id}
