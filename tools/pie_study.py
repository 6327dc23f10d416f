"""PIE protocol sensitivity study (ROADMAP item: "PIE protocol study").

Round-1 finding (RESULTS.md): under the reference's exact protocol
(AdamW lr=3e-3, annealing_start=50, plateau(0.1, 5), 200 epochs —
reference run.py:109-111 + evidential_probe.py:403-408) the private-only
disentangled probe on PIE collapses to ~2.5% (68 classes, chance=1.5%),
and a plain-torch replica built from the reference's own loss code
collapses identically (2.2%). This study sweeps the probe's lr and the
EDL annealing_start on the SAME frozen DMVAE embeddings to establish
whether the collapse is (a) a property of the published hyperparameters
(other settings recover), or (b) an information ceiling of the PIE
embeddings themselves (nothing recovers).

Also reports the shared+private probe (cml) on the same grid for
contrast, and a raw-views LateFusion reference point.

Run:  python tools/pie_study.py            (TPU or CPU)
Out:  results/pie_study.json + stdout table
"""

from __future__ import annotations

import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()
    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_disentangled_probe_task,
        build_probe_task,
    )
    from disentagled_multimodal_fusion_tpu.core.train import train
    from disentagled_multimodal_fusion_tpu.data.multiview import DATASET_REGISTRY
    from disentagled_multimodal_fusion_tpu.eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )
    from tools.parity_check import frozen_dmvae_embeddings

    seeds = [0, 1, 2]
    lrs = [3e-4, 1e-3, 3e-3, 1e-2]
    anneals = [10, 50]
    epochs = 200
    results = {"grid": [], "meta": {
        "seeds": seeds, "lrs": lrs, "annealing_starts": anneals,
        "epochs": epochs,
        "reference_protocol": {"lr": 3e-3, "annealing_start": 50},
    }}

    per_seed_emb = {}
    for seed in seeds:
        ds = DATASET_REGISTRY["PIE"]()
        rng_np = np.random.default_rng(seed)
        idx = rng_np.permutation(len(ds))
        n_tr = int(0.8 * len(ds))
        tr, te = idx[:n_tr], idx[n_tr:]
        views, y = ds.arrays()
        xs_tr = tuple(jnp.asarray(v[tr]) for v in views)
        xs_te = tuple(jnp.asarray(v[te]) for v in views)
        y_tr, y_te = jnp.asarray(y[tr]), jnp.asarray(y[te])
        dims = [v.shape[1] for v in views]

        # identical backbone protocol to the parity harness (shared helper)
        (zc_tr, zp_tr), (zc_te, zp_te) = frozen_dmvae_embeddings(
            xs_tr, xs_te, dims, seed,
        )
        per_seed_emb[seed] = dict(
            probe_tr={"zc": zc_tr, "zp": zp_tr, "y": y_tr},
            probe_te={"zc": zc_te, "zp": zp_te, "y": y_te},
            n_train=len(tr), num_classes=ds.num_classes, n_views=len(dims),
        )
        print(f"[seed {seed}] DMVAE trained, embeddings ready", flush=True)

    for lr, ann in itertools.product(lrs, anneals):
        for kind in ("dis", "cml"):
            accs, evs = [], []
            t0 = time.time()
            for seed in seeds:
                e = per_seed_emb[seed]
                if kind == "dis":
                    task = build_disentangled_probe_task(
                        rng=jax.random.PRNGKey(seed + 5),
                        num_modalities=e["n_views"], num_classes=e["num_classes"],
                        input_dim=200, hidden_dim=(128,), lr=lr, dropout=0.1,
                        annealing_start=ann, aggregation="cml",
                        num_epochs=epochs,
                    )
                    ev_fn = evaluate_subjective_model
                else:
                    task = build_probe_task(
                        rng=jax.random.PRNGKey(seed + 5),
                        num_modalities=e["n_views"], num_classes=e["num_classes"],
                        input_dim=200, hidden_dim=(128,), lr=lr, dropout=0.1,
                        annealing_start=ann, aggregation="cml", fused=1.0,
                        num_epochs=epochs,
                    )
                    ev_fn = evaluate_subjective_model_with_shared
                res = train(
                    rng=jax.random.PRNGKey(seed + 300), params=task.params,
                    loss_fn=task.loss_fn, data=e["probe_tr"],
                    n_train=e["n_train"], optimizer=task.optimizer,
                    epochs=epochs, batch_size=100, val_fn=task.val_fn,
                    val_data=e["probe_te"],
                )
                info = ev_fn(task, res.params, e["probe_te"])
                accs.append(float(info["fused"]["accuracy"]))
                evs.append(float(info["fused"]["evidence_mean"]))
            row = {
                "model": f"dmvae_{kind}", "lr": lr, "annealing_start": ann,
                "fused_accuracy_mean": float(np.mean(accs)),
                "fused_accuracy_per_seed": accs,
                "fused_evidence_mean": float(np.mean(evs)),
            }
            results["grid"].append(row)
            print(
                f"lr={lr:g} ann={ann} {row['model']}: acc "
                f"{row['fused_accuracy_mean']:.3f} (ev {row['fused_evidence_mean']:.1f}) "
                f"[{time.time()-t0:.0f}s]", flush=True,
            )

    Path("results").mkdir(exist_ok=True)
    Path("results/pie_study.json").write_text(json.dumps(results, indent=1))
    print("wrote results/pie_study.json")


if __name__ == "__main__":
    main()
