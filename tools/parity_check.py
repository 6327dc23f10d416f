"""Cross-framework parity harness.

Trains plain-torch models that use the REFERENCE'S OWN loss/activation code
(imported from /root/reference — losses.py and utils.py are torch-only) and
compares end metrics against this framework's models on identical data:

  1. LateFusion(cml) on raw HandWritten views (torch heads + reference
     AvgTrustedLoss/activation vs our jitted task), identical split.
  2. EvidentialProbe(cml) on OUR frozen-DMVAE embeddings (isolates the
     probe stack: EDL loss + AdamW + cosine schedule parity).

Run: python tools/parity_check.py [--epochs 200]
Writes results to stdout and results/parity_check.json.

This substitutes for running the reference end-to-end (pytorch_lightning
is not installed in this image): everything Lightning adds is plumbing;
the math comes from the reference's modules verbatim.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def load_ref(name, rel):
    spec = importlib.util.spec_from_file_location(name, Path("/root/reference") / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def torch_heads_fit(
    views_tr, y_tr, views_te, y_te, num_classes, *, lr, annealing_start,
    epochs, batch, hidden, dropout, optimizer, schedule, seed=0, agg="cml",
):
    """Reference-math multi-view evidential heads (baselines.py:12-150 /
    evidential_probe.py:87-212 math without the Lightning wrapper)."""
    import torch
    import torch.nn as nn

    L = load_ref("ref_losses", "models/losses.py")
    U = load_ref("ref_utils", "utils.py")
    torch.manual_seed(seed)

    v = len(views_tr)
    xs_tr = [torch.tensor(x) for x in views_tr]
    xs_te = [torch.tensor(x) for x in views_te]
    yt, ye = torch.tensor(y_tr), torch.tensor(y_te)

    heads = nn.ModuleList()
    for x in xs_tr:
        h = nn.Sequential(
            nn.Linear(x.shape[1], hidden), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(hidden, num_classes),
        )
        nn.init.xavier_uniform_(h[0].weight)
        nn.init.xavier_uniform_(h[3].weight)
        heads.append(h)

    if optimizer == "adamw":
        opt = torch.optim.AdamW(heads.parameters(), lr=lr, weight_decay=1e-4)
    else:
        opt = torch.optim.Adam(heads.parameters(), lr=lr)
    if schedule == "cosine":
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=1e-6)
    else:
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.1, patience=10
        )
    crit = L.AvgTrustedLoss(num_views=v, annealing_start=annealing_start)
    agg_fn = {"cml": U.get_cml_fusion, "avg": U.get_avg_fusion}[agg]
    n = len(y_tr)

    for _ in range(epochs):
        perm = torch.randperm(n)
        heads.train()
        for s0 in range(0, n, batch):
            b = perm[s0 : s0 + batch]
            ev = torch.stack(
                [U.activation_function(heads[i](xs_tr[i][b]), "exp") for i in range(v)],
                dim=1,
            )
            loss = crit(ev, yt[b], agg_fn(ev), fused=1)
            opt.zero_grad()
            loss.backward()
            opt.step()
        crit.annealing_step += 1
        heads.eval()
        with torch.no_grad():
            ev = torch.stack(
                [U.activation_function(heads[i](xs_te[i]), "exp") for i in range(v)],
                dim=1,
            )
            vloss = crit(ev, ye, agg_fn(ev), fused=1)
        if schedule == "cosine":
            sch.step()
        else:
            sch.step(vloss.item())

    with torch.no_grad():
        ev = torch.stack(
            [U.activation_function(heads[i](xs_te[i]), "exp") for i in range(v)], dim=1
        )
        fused = agg_fn(ev)
        acc = (fused.argmax(1) == ye).float().mean().item()
        alphas = fused + 1
        s = alphas.sum(-1, keepdim=True)
        epi = (num_classes / s).mean().item()
        ale = (
            -torch.sum(
                alphas / s * (torch.digamma(alphas + 1) - torch.digamma(s + 1)), -1
            ).mean().item()
        )
        from disentagled_multimodal_fusion_tpu.eval.analysis import (
            expected_calibration_error,
        )
        import jax.numpy as jnp

        probs = (alphas / s).numpy()
        ece = float(expected_calibration_error(jnp.asarray(probs), jnp.asarray(y_te)))
    return {"accuracy": acc, "ece": ece, "epistemic_mean": epi, "aleatoric_mean": ale}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    parser.add_argument("--dataset", default="HandWritten")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()
    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_dmvae_task,
        build_late_fusion_task,
        build_probe_task,
        embed_dataset,
    )
    from disentagled_multimodal_fusion_tpu.core.train import train
    from disentagled_multimodal_fusion_tpu.data.multiview import DATASET_REGISTRY
    from disentagled_multimodal_fusion_tpu.eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )

    out = {"late_fusion_cml": {"torch": [], "ours": []},
           "dmvae_probe_cml": {"torch": [], "ours": []}}

    for seed in args.seeds:
        rng_np = np.random.default_rng(seed)
        ds = DATASET_REGISTRY[args.dataset]()
        idx = rng_np.permutation(len(ds))
        n_tr = int(0.8 * len(ds))
        tr, te = idx[:n_tr], idx[n_tr:]
        views, y = ds.arrays()
        views_tr = [v[tr] for v in views]
        views_te = [v[te] for v in views]
        dims = [int(d[0]) for d in ds.dims]
        xs_tr = tuple(jnp.asarray(v) for v in views_tr)
        xs_te = tuple(jnp.asarray(v) for v in views_te)
        y_tr, y_te = jnp.asarray(y[tr]), jnp.asarray(y[te])

        # ---------------- 1) LateFusion(cml) on raw views ----------------
        t0 = time.time()
        ref = torch_heads_fit(
            views_tr, y[tr], views_te, y[te], ds.num_classes,
            lr=3e-3, annealing_start=50, epochs=args.epochs, batch=100,
            hidden=128, dropout=0.1, optimizer="adam", schedule="plateau",
            seed=seed,
        )
        t_torch = time.time() - t0
        task = build_late_fusion_task(
            rng=jax.random.PRNGKey(seed), output_dims=dims,
            num_classes=ds.num_classes, hidden_dim=(128,), dropout=0.1,
            lr=3e-3, annealing_start=50, aggregation="cml", fused=1.0,
        )
        t0 = time.time()
        res = train(
            rng=jax.random.PRNGKey(seed + 100), params=task.params,
            loss_fn=task.loss_fn, data={"xs": xs_tr, "y": y_tr},
            n_train=n_tr, optimizer=task.optimizer, epochs=args.epochs,
            batch_size=100, val_fn=task.val_fn,
            val_data={"xs": xs_te, "y": y_te},
        )
        t_ours = time.time() - t0
        ours = evaluate_subjective_model(task, res.params, {"xs": xs_te, "y": y_te})
        out["late_fusion_cml"]["torch"].append(ref)
        out["late_fusion_cml"]["ours"].append({
            "accuracy": ours["fused"]["accuracy"],
            "ece": ours["fused"]["ece"],
            "epistemic_mean": ours["fused"]["epistemic_mean"],
            "aleatoric_mean": ours["fused"]["aleatoric_mean"],
        })
        print(f"[seed {seed}] late_fusion_cml: torch acc {ref['accuracy']:.4f} "
              f"({t_torch:.0f}s) vs ours {ours['fused']['accuracy']:.4f} "
              f"({t_ours:.1f}s)", flush=True)

        # ------------- 2) Probe(cml) on OUR frozen embeddings -------------
        model, params, loss_fn, opt, _ = build_dmvae_task(
            rng=jax.random.PRNGKey(seed), xs_sample=xs_tr, output_dim=dims,
            a=1e-5, hidden_dim=512, embed_dim=200, lr=1e-4, num_epochs=100,
        )
        res_b = train(
            rng=jax.random.PRNGKey(seed + 200), params=params, loss_fn=loss_fn,
            data={"xs": xs_tr}, n_train=n_tr, optimizer=opt, epochs=100,
            batch_size=100,
        )
        zc_tr, zp_tr = embed_dataset(model, res_b.params, xs_tr)
        zc_te, zp_te = embed_dataset(model, res_b.params, xs_te)
        # torch probe: shared + private heads == multi-view heads over
        # [zc, zp_0..zp_{N-1}]
        emb_tr = [np.asarray(zc_tr)] + [np.asarray(zp_tr[:, i]) for i in range(len(dims))]
        emb_te = [np.asarray(zc_te)] + [np.asarray(zp_te[:, i]) for i in range(len(dims))]
        ref = torch_heads_fit(
            emb_tr, y[tr], emb_te, y[te], ds.num_classes,
            lr=3e-3, annealing_start=50, epochs=args.epochs, batch=100,
            hidden=128, dropout=0.1, optimizer="adamw", schedule="cosine",
            seed=seed,
        )
        task = build_probe_task(
            rng=jax.random.PRNGKey(seed + 5), num_modalities=len(dims),
            num_classes=ds.num_classes, input_dim=200, hidden_dim=(128,),
            lr=3e-3, dropout=0.1, annealing_start=50, aggregation="cml",
            fused=1.0, num_epochs=args.epochs,
        )
        probe_tr = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
        probe_te = {"zc": zc_te, "zp": zp_te, "y": y_te}
        res_p = train(
            rng=jax.random.PRNGKey(seed + 300), params=task.params,
            loss_fn=task.loss_fn, data=probe_tr, n_train=n_tr,
            optimizer=task.optimizer, epochs=args.epochs, batch_size=100,
            val_fn=task.val_fn, val_data=probe_te,
        )
        ours = evaluate_subjective_model_with_shared(task, res_p.params, probe_te)
        out["dmvae_probe_cml"]["torch"].append(ref)
        out["dmvae_probe_cml"]["ours"].append({
            "accuracy": ours["fused"]["accuracy"],
            "ece": ours["fused"]["ece"],
            "epistemic_mean": ours["fused"]["epistemic_mean"],
            "aleatoric_mean": ours["fused"]["aleatoric_mean"],
        })
        print(f"[seed {seed}] dmvae_probe_cml: torch acc {ref['accuracy']:.4f} "
              f"vs ours {ours['fused']['accuracy']:.4f}", flush=True)

    summary = {}
    for k, d in out.items():
        summary[k] = {
            side: {
                m: float(np.mean([r[m] for r in runs]))
                for m in ["accuracy", "ece", "epistemic_mean", "aleatoric_mean"]
            }
            for side, runs in d.items()
        }
        summary[k]["accuracy_gap"] = abs(
            summary[k]["torch"]["accuracy"] - summary[k]["ours"]["accuracy"]
        )
        summary[k]["ece_gap"] = abs(
            summary[k]["torch"]["ece"] - summary[k]["ours"]["ece"]
        )
    print(json.dumps(summary, indent=1))
    Path("results").mkdir(exist_ok=True)
    dest = args.out or f"results/parity_check_{args.dataset.lower()}.json"
    Path(dest).write_text(json.dumps({"per_seed": out, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
