"""Regenerate the RESULTS.md summary tables from the archived sweep CSVs.

Prints markdown so doc numbers always come straight from results/ instead
of hand transcription:

  python tools/make_results_tables.py
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd

RESULTS = Path(__file__).resolve().parent.parent / "results"

MODELS = ["dmvae_dis", "dmvae_cml", "dmvae_joint", "dbf_fusion", "cml_fusion",
          "avg_fusion"]
DATASETS = ["HandWritten", "CUB", "Scene", "PIE"]


def uq_table():
    df = pd.read_csv(RESULTS / "dataset_analysis_main_grouped.csv")
    g = df.groupby(["type", "dataset", "model"])["fused_accuracy"].mean()
    print("| dataset | " + " | ".join(m.replace("_fusion", "") for m in MODELS)
          + " |")
    print("|---" * (len(MODELS) + 1) + "|")
    for ds in DATASETS:
        cells = []
        for m in MODELS:
            n = g.get(("Normal", ds, m), float("nan"))
            c = g.get(("Conflict", ds, m), float("nan"))
            cells.append(f"{n:.3f} / {c:.3f}".replace("0.", "."))
        print(f"| {ds} | " + " | ".join(cells) + " |")


def noise_table():
    path = RESULTS / "noise_condition_main_grouped.csv"
    if not path.exists():
        return
    df = pd.read_csv(path)
    g = df.groupby(["dataset", "model"])[["fused_accuracy",
                                          "fused_aleatoric_mean"]].mean()
    order = ["dmvae_cml", "dmvae_joint", "dmvae_dis", "dbf_fusion",
             "cml_fusion", "avg_fusion"]
    print("\n| dataset | " + " | ".join(m.replace("_fusion", "") for m in order)
          + " |")
    print("|---" * (len(order) + 1) + "|")
    ds_order = [d for d in ("HandWritten", "CUB") if d in set(df["dataset"])]
    for ds in ds_order:
        cells = []
        for m in order:
            a = g.loc[(ds, m)]
            cells.append(f"{a['fused_accuracy']:.3f} / "
                         f"{a['fused_aleatoric_mean']:.2f}".replace("0.", "."))
        print(f"| {ds} | " + " | ".join(cells) + " |")


def synthetic_table():
    df = pd.read_csv(RESULTS / "synthetic_dataset_main_grouped.csv")
    g = df.groupby(["dep", "model"])[["fused_accuracy", "shared_accuracy"]].mean()
    print("\n| dep % | dmvae_cml | cml | avg | dmvae_cml shared-head |")
    print("|---|---|---|---|---|")
    for dep in sorted(df["dep"].unique()):
        row = [f"{g.loc[(dep, m), 'fused_accuracy']:.3f}".replace("0.", ".")
               for m in ("dmvae_cml", "cml", "avg")]
        sh = g.loc[(dep, "dmvae_cml"), "shared_accuracy"]
        print(f"| {int(dep)} | " + " | ".join(row)
              + f" | {sh:.3f} |".replace("0.", "."))


if __name__ == "__main__":
    print("## UQ sweep (fused accuracy, Normal / Conflict)\n")
    uq_table()
    print("\n## Noise condition (fused accuracy / aleatoric)")
    noise_table()
    print("\n## Synthetic dependence sweep")
    synthetic_table()
