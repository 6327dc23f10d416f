"""Cross-framework parity harness — full six-model protocol.

Trains plain-torch models that use the REFERENCE'S OWN loss/activation/
fusion code (imported from /root/reference — losses.py and utils.py are
torch-only) and compares end metrics against this framework's models on
identical data and identical frozen-DMVAE embeddings:

  dmvae_dis    private-only probe, cml     (evidential_probe.py:214-408)
  dmvae_cml    shared+private probe, cml   (evidential_probe.py:11-212)
  dmvae_joint  shared+private probe, joint (utils.py:81-86)
  dbf_fusion   LateFusion dbf on raw views (baselines.py + utils.py:88-116)
  cml_fusion   LateFusion cml on raw views
  avg_fusion   LateFusion avg on raw views

Run:
  python tools/parity_check.py --dataset HandWritten --seeds 0 1 2 3 4
  python tools/parity_check.py --dataset synthetic --deps 50   # dep cell
Writes results/parity_check_<dataset>.json: per-seed metrics both sides,
means, gaps, and the torch per-seed spread (to judge whether a gap sits
inside seed noise).

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

METRICS = ["accuracy", "ece", "epistemic_mean", "aleatoric_mean"]


def load_ref(name, rel):
    spec = importlib.util.spec_from_file_location(name, Path("/root/reference") / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def torch_heads_fit(
    views_tr, y_tr, views_te, y_te, num_classes, *, lr, annealing_start,
    epochs, batch, hidden, dropout, optimizer, schedule, seed=0, agg="cml",
    weight_decay=None, plateau_patience=10, fused=1, drop_last=False,
):
    """Reference-math multi-view evidential heads (baselines.py:12-150 /
    evidential_probe.py:87-408 math without the Lightning wrapper).

    agg: cml | avg | joint | dbf (reference utils.py:66-116). For the
    disentangled probe pass only the private views with agg='cml'.
    """
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
        kw = {} if weight_decay is None else {"weight_decay": weight_decay}
        opt = torch.optim.AdamW(heads.parameters(), lr=lr, **kw)
    else:
        opt = torch.optim.Adam(heads.parameters(), lr=lr)
    if schedule == "cosine":
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=1e-6)
    else:
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.1, patience=plateau_patience
        )
    crit = L.AvgTrustedLoss(num_views=v, annealing_start=annealing_start)
    agg_fn = {
        "cml": U.get_cml_fusion,
        "avg": U.get_avg_fusion,
        "joint": U.get_joint_fusion,
        "dbf": U.discounted_belief_fusion,
    }[agg]
    n = len(y_tr)

    def all_evidences(xs, rows=None):
        return torch.stack(
            [
                U.activation_function(
                    heads[i](xs[i] if rows is None else xs[i][rows]), "exp"
                )
                for i in range(v)
            ],
            dim=1,
        )

    # reference loaders: drop_last=True for the synthetic splits
    # (dataset.py:469), False for the .mat DataLoaders (run.py:68-69)
    n_used = n - (n % batch) if drop_last else n
    for _ in range(epochs):
        perm = torch.randperm(n)
        heads.train()
        for s0 in range(0, n_used, batch):
            b = perm[s0 : s0 + batch]
            ev = all_evidences(xs_tr, b)
            loss = crit(ev, yt[b], agg_fn(ev), fused=fused)
            opt.zero_grad()
            loss.backward()
            opt.step()
        heads.eval()
        with torch.no_grad():
            ev = all_evidences(xs_te)
            vloss = crit(ev, ye, agg_fn(ev), fused=fused)
        if schedule == "cosine":
            sch.step()
        else:
            sch.step(vloss.item())
        # Lightning runs the val loop INSIDE the train epoch (after the
        # last batch) and fires on_train_epoch_end — where the reference
        # increments annealing_step (baselines.py:104,
        # evidential_probe.py:124) — AFTERWARD. So epoch e's val loss is
        # computed with annealing_step == e, and the increment belongs
        # here, after validation. Incrementing before val (this
        # harness's original order) shifts the KL-annealing coefficient
        # in the monitored val loss by one epoch, which flips plateau
        # best-tracking on knife-edge cells: at epoch 0 the true
        # reference coefficient is 0 (no KL), producing a low unbeatable
        # `best` that cascades LR -> 0 by ~epoch 35 — behavior our
        # framework reproduces and the old harness order masked (found
        # by the n=15 synthetic dep50 campaign: a systematic 7-pt
        # cml/avg_fusion gap, paired t = 4.35, that this fix closes).
        crit.annealing_step += 1

    with torch.no_grad():
        fused_ev = agg_fn(all_evidences(xs_te))
        acc = (fused_ev.argmax(1) == ye).float().mean().item()
        alphas = fused_ev + 1
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


def frozen_dmvae_embeddings(
    xs_tr, xs_te, dims, seed, *, embed_dim=200, hidden_dim=512, lr=1e-4,
    epochs=100, batch=100, drop_last=False,
):
    """Train the frozen DMVAE backbone and embed train/test.

    One protocol, shared by the parity harness and tools/pie_study.py:
    PRNGKey(seed) init, PRNGKey(seed+200) training stream, a=1e-5 —
    so both studies always probe identical embeddings."""
    import jax

    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_dmvae_task, embed_dataset,
    )
    from disentagled_multimodal_fusion_tpu.core.train import train

    model, params, loss_fn, opt, _ = build_dmvae_task(
        rng=jax.random.PRNGKey(seed), xs_sample=xs_tr, output_dim=list(dims),
        a=1e-5, hidden_dim=hidden_dim, embed_dim=embed_dim, lr=lr,
        num_epochs=epochs,
    )
    res_b = train(
        rng=jax.random.PRNGKey(seed + 200), params=params, loss_fn=loss_fn,
        data={"xs": xs_tr}, n_train=xs_tr[0].shape[0], optimizer=opt,
        epochs=epochs, batch_size=batch, drop_last=drop_last,
    )
    return (
        embed_dataset(model, res_b.params, xs_tr),
        embed_dataset(model, res_b.params, xs_te),
    )


def ours_metrics(info):
    return {
        "accuracy": info["fused"]["accuracy"],
        "ece": info["fused"]["ece"],
        "epistemic_mean": info["fused"]["epistemic_mean"],
        "aleatoric_mean": info["fused"]["aleatoric_mean"],
    }


def run_seed(seed, *, dataset, epochs, dep, models, out, torch_cache=None,
             seed_index=0):
    """One parity seed: identical split + identical frozen embeddings,
    six reference-math torch fits vs six of our jitted tasks."""
    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_disentangled_probe_task,
        build_late_fusion_task,
        build_probe_task,
    )
    from disentagled_multimodal_fusion_tpu.core.train import train
    from disentagled_multimodal_fusion_tpu.eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )

    synthetic = dataset == "synthetic"
    if synthetic:
        from disentagled_multimodal_fusion_tpu.data.synthetic import (
            make_simple_plus_splits,
        )

        rho = dep / 100.0
        _, (v_tr, ytr), (v_te, yte) = make_simple_plus_splits(
            batch_size=128, seed=seed, rho=rho, shared_class_frac=rho,
        )
        views_tr, views_te = list(v_tr), list(v_te)
        y_np_tr, y_np_te = np.asarray(ytr), np.asarray(yte)
        num_classes = 3
        lr, batch, annealing = 3e-4, 128, 10
        fused_flag = 0  # run_synthetic.py uses fused=0
        embed_dim, probe_in = 16, 16
        dmvae_lr, dmvae_hidden, dmvae_epochs = 1e-3, 512, min(100, epochs)
    else:
        from disentagled_multimodal_fusion_tpu.data.multiview import DATASET_REGISTRY

        ds = DATASET_REGISTRY[dataset]()
        rng_np = np.random.default_rng(seed)
        idx = rng_np.permutation(len(ds))
        n_tr = int(0.8 * len(ds))
        tr, te = idx[:n_tr], idx[n_tr:]
        views, y = ds.arrays()
        views_tr = [v[tr] for v in views]
        views_te = [v[te] for v in views]
        y_np_tr, y_np_te = y[tr], y[te]
        num_classes = ds.num_classes
        lr = {"CalTech": 3e-4, "Scene": 0.01, "CUB": 3e-3, "HandWritten": 3e-3,
              "PIE": 3e-3}[dataset]
        batch, annealing = 100, 50
        fused_flag = 1
        embed_dim, probe_in = 200, 200
        dmvae_lr, dmvae_hidden, dmvae_epochs = 1e-4, 512, min(100, epochs)

    dims = [v.shape[1] for v in views_tr]
    n_train = len(y_np_tr)
    xs_tr = tuple(jnp.asarray(v) for v in views_tr)
    xs_te = tuple(jnp.asarray(v) for v in views_te)
    y_tr, y_te = jnp.asarray(y_np_tr), jnp.asarray(y_np_te)

    # ---- shared frozen backbone: OUR DMVAE, embeddings used by BOTH sides
    # (skipped when --models selects only raw-view fusion jobs)
    needs_probe = models is None or any(m.startswith("dmvae_") for m in models)
    if needs_probe:
        (zc_tr, zp_tr), (zc_te, zp_te) = frozen_dmvae_embeddings(
            xs_tr, xs_te, dims, seed, embed_dim=embed_dim,
            hidden_dim=dmvae_hidden, lr=dmvae_lr, epochs=dmvae_epochs,
            batch=batch, drop_last=synthetic,
        )
        emb_tr = [np.asarray(zc_tr)] + [np.asarray(zp_tr[:, i]) for i in range(len(dims))]
        emb_te = [np.asarray(zc_te)] + [np.asarray(zp_te[:, i]) for i in range(len(dims))]
        probe_tr = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
        probe_te = {"zc": zc_te, "zp": zp_te, "y": y_te}
    else:
        emb_tr = emb_te = probe_tr = probe_te = None
    lf_tr = {"xs": xs_tr, "y": y_tr}
    lf_te = {"xs": xs_te, "y": y_te}

    def fit_ours(task, tr_d, te_d, with_shared):
        res = train(
            rng=jax.random.PRNGKey(seed + 300), params=task.params,
            loss_fn=task.loss_fn, data=tr_d, n_train=n_train,
            optimizer=task.optimizer, epochs=epochs, batch_size=batch,
            drop_last=synthetic, val_fn=task.val_fn, val_data=te_d,
        )
        ev = (evaluate_subjective_model_with_shared if with_shared
              else evaluate_subjective_model)
        return ours_metrics(ev(task, res.params, te_d))

    jobs = {}
    # 1) dmvae_dis — private-only probe: AdamW(default wd) + plateau(0.1, 5)
    jobs["dmvae_dis"] = (
        lambda: torch_heads_fit(
            emb_tr[1:], y_np_tr, emb_te[1:], y_np_te, num_classes,
            lr=lr, annealing_start=annealing, epochs=epochs, batch=batch,
            hidden=128, dropout=0.1, optimizer="adamw", schedule="plateau",
            plateau_patience=5, seed=seed, agg="cml", fused=fused_flag,
            drop_last=synthetic,
        ),
        lambda: fit_ours(
            build_disentangled_probe_task(
                rng=jax.random.PRNGKey(seed + 5), num_modalities=len(dims),
                num_classes=num_classes, input_dim=probe_in, hidden_dim=(128,),
                lr=lr, dropout=0.1, annealing_start=annealing,
                aggregation="cml", num_epochs=epochs,
            ),
            probe_tr, probe_te, with_shared=False,
        ),
    )
    # 2-3) shared+private probe, cml and joint: AdamW(1e-4) + cosine
    for agg in ("cml", "joint"):
        jobs[f"dmvae_{agg}"] = (
            (lambda agg=agg: torch_heads_fit(
                emb_tr, y_np_tr, emb_te, y_np_te, num_classes,
                lr=lr, annealing_start=annealing, epochs=epochs, batch=batch,
                hidden=128, dropout=0.1, optimizer="adamw", schedule="cosine",
                weight_decay=1e-4, seed=seed, agg=agg, fused=fused_flag,
                drop_last=synthetic,
            )),
            (lambda agg=agg: fit_ours(
                build_probe_task(
                    rng=jax.random.PRNGKey(seed + 5), num_modalities=len(dims),
                    num_classes=num_classes, input_dim=probe_in, hidden_dim=(128,),
                    lr=lr, dropout=0.1, annealing_start=annealing,
                    aggregation=agg, fused=float(fused_flag), num_epochs=epochs,
                ),
                probe_tr, probe_te, with_shared=True,
            )),
        )
    # 4-6) LateFusion dbf/cml/avg on raw views: Adam + plateau(0.1, 10)
    for agg in ("dbf", "cml", "avg"):
        jobs[f"{agg}_fusion"] = (
            (lambda agg=agg: torch_heads_fit(
                views_tr, y_np_tr, views_te, y_np_te, num_classes,
                lr=lr, annealing_start=annealing, epochs=epochs, batch=batch,
                hidden=128, dropout=0.1, optimizer="adam", schedule="plateau",
                plateau_patience=10, seed=seed, agg=agg, fused=fused_flag,
                drop_last=synthetic,
            )),
            (lambda agg=agg: fit_ours(
                build_late_fusion_task(
                    rng=jax.random.PRNGKey(seed), output_dims=dims,
                    num_classes=num_classes, hidden_dim=(128,), dropout=0.1,
                    lr=lr, annealing_start=annealing, aggregation=agg,
                    fused=float(fused_flag),
                ),
                lf_tr, lf_te, with_shared=False,
            )),
        )

    for name, (torch_fn, ours_fn) in jobs.items():
        if models and name not in models:
            continue
        t0 = time.time()
        cached = (
            torch_cache.get(name, {}).get("torch", [])
            if torch_cache is not None else []
        )
        if seed_index < len(cached):
            ref = cached[seed_index]  # --reuse-torch: identical data/seed
        else:
            ref = torch_fn()
        t_torch = time.time() - t0
        t0 = time.time()
        ours = ours_fn()
        t_ours = time.time() - t0
        out.setdefault(name, {"torch": [], "ours": []})
        out[name]["torch"].append(ref)
        out[name]["ours"].append(ours)
        print(
            f"[seed {seed}] {name}: torch acc {ref['accuracy']:.4f} "
            f"({t_torch:.0f}s) vs ours {ours['accuracy']:.4f} ({t_ours:.1f}s) | "
            f"ece {ref['ece']:.4f} vs {ours['ece']:.4f}", flush=True,
        )


def summarize(out):
    summary = {}
    for k, d in out.items():
        summary[k] = {
            side: {m: float(np.mean([r[m] for r in runs])) for m in METRICS}
            for side, runs in d.items()
        }
        for m in ("accuracy", "ece"):
            summary[k][f"{m}_gap"] = abs(
                summary[k]["torch"][m] - summary[k]["ours"][m]
            )
            summary[k][f"{m}_torch_seed_std"] = float(
                np.std([r[m] for r in d["torch"]])
            )
            # paired per-seed deltas (ours - torch on the IDENTICAL split +
            # frozen embeddings): a finer instrument than mean gaps when a
            # cell sits above the 1% band — the pairing controls for the
            # split-to-split difficulty variation that dominates seed std
            deltas = np.array([r[m] for r in d["ours"]]) - np.array(
                [r[m] for r in d["torch"]]
            )
            summary[k][f"{m}_paired_delta"] = {
                "mean": float(deltas.mean()),
                "std": float(deltas.std()),
                "per_seed": [float(x) for x in deltas],
            }
    return summary


def check_resume_args(dest, run_args):
    """Refuse to resume under a changed command line.

    The output file records per-model metric lists in SEED ORDER, so a
    resume with different --seeds/--models/--epochs would silently
    misalign them and corrupt the paired-delta stats. Campaigns written
    since the 'args' block landed carry their own metadata; validate
    against it and error on mismatch. Older files get a loud warning
    (the operator contract from the original --resume help text).
    """
    recorded = json.loads(Path(dest).read_text()).get("args")
    if recorded is None:
        print(
            f"WARNING --resume: {dest} predates the recorded-args block; "
            "cannot validate that dataset/seeds/models/epochs match the "
            "original run — they MUST (see --resume help)", flush=True,
        )
        return
    mismatched = {
        k: (recorded.get(k), run_args.get(k))
        for k in sorted(set(recorded) | set(run_args))
        if recorded.get(k) != run_args.get(k)
    }
    if mismatched:
        raise SystemExit(
            f"--resume: command line does not match the campaign recorded "
            f"in {dest}: "
            + "; ".join(f"{k}: recorded {a!r} vs given {b!r}"
                        for k, (a, b) in mismatched.items())
            + " — a mismatched resume would misalign the per-seed lists"
        )


def load_resume(dest):
    """Load completed seeds from an interrupted campaign's output file.

    A seed is complete only when EVERY model in the file has both sides
    recorded for it; any partially-written tail (some models done, some
    not, from an interruption mid-seed) is truncated so that seed re-runs
    whole. Returns (out, start): the preloaded accumulator and the number
    of leading seeds to skip.
    """
    if not Path(dest).exists():
        return {}, 0
    prev = json.loads(Path(dest).read_text())["per_seed"]
    lens = [len(d[side]) for d in prev.values() for side in ("torch", "ours")]
    start = min(lens, default=0)
    out = {
        name: {side: list(d[side][:start]) for side in ("torch", "ours")}
        for name, d in prev.items()
    }
    return out, start


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    parser.add_argument("--dataset", default="HandWritten",
                        help="HandWritten | CUB | PIE | Scene | synthetic")
    parser.add_argument("--dep", type=int, default=50,
                        help="synthetic dependence knob (synthetic only)")
    parser.add_argument("--models", type=str, nargs="*", default=None,
                        help="subset of the 6 model names")
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--reuse-torch", action="store_true",
        help="reuse the torch-side per-seed metrics from an existing "
             "results JSON (same dataset/seeds => identical splits and "
             "reference fits) and re-run only our side — for re-validating "
             "after framework-side changes without re-paying the CPU fits",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="resume an interrupted campaign: load the completed seeds "
             "already in --out (the per-seed incremental writes) and run "
             "only the remaining ones. Must be invoked with the SAME "
             "dataset/seeds/models/epochs as the original run — the file "
             "records per-model metric lists in seed order, so a changed "
             "command line would silently misalign them. A seed with a "
             "partially-written model set re-runs in full.",
    )
    args = parser.parse_args()
    if not args.seeds:
        parser.error("--seeds needs at least one value")

    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()

    if args.dataset == "synthetic" and args.models is None:
        # the reference synthetic protocol trains exactly these three
        # (run_synthetic.py:139-229), all with fused=0
        args.models = ["dmvae_cml", "cml_fusion", "avg_fusion"]

    tag = (f"{args.dataset.lower()}_dep{args.dep}" if args.dataset == "synthetic"
           else args.dataset.lower())
    dest = args.out or f"results/parity_check_{tag}.json"
    torch_cache = None
    if args.reuse_torch:
        if not Path(dest).exists():
            parser.error(f"--reuse-torch: no existing results at {dest}")
        torch_cache = json.loads(Path(dest).read_text())["per_seed"]
        print(f"reusing torch-side metrics from {dest}")

    # recorded alongside the results so --resume / promote_refresh can
    # validate the command line instead of trusting the operator to
    # re-type it (the per-seed lists are positional in seed order)
    run_args = {
        "dataset": args.dataset, "seeds": list(args.seeds),
        "models": args.models, "epochs": args.epochs,
    }
    if args.dataset == "synthetic":
        run_args["dep"] = args.dep

    if args.resume and Path(dest).exists():
        check_resume_args(dest, run_args)
    out, start = ({}, 0) if not args.resume else load_resume(dest)
    if args.resume:
        print(f"--resume: skipping {start} completed seed(s) from {dest}",
              flush=True)

    def write(out):
        summary = summarize(out)
        Path("results").mkdir(exist_ok=True)
        Path(dest).write_text(json.dumps(
            {"args": run_args, "per_seed": out, "summary": summary}, indent=1))
        return summary

    summary = {}
    for i, seed in enumerate(args.seeds):
        if i < start:
            continue
        run_seed(
            seed, dataset=args.dataset, epochs=args.epochs, dep=args.dep,
            models=args.models, out=out, torch_cache=torch_cache, seed_index=i,
        )
        # incremental write: long runs survive interruption
        summary = write(out)
    # covers the --resume everything-already-complete case too
    summary = write(out)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
