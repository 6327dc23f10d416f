"""Cross-framework parity for the DMVAE backbone's OWN training.

Round 2's parity harness (tools/parity_check.py) trains OUR JAX DMVAE and
feeds those embeddings to both the torch and JAX probe sides — a
systematic divergence in backbone training (init law, Adam eps, PoE
trajectory, KL weighting) would be invisible to every cell there. This
tool closes that hole. Per (dataset, seed), on the IDENTICAL 80/20 split:

  1. Train a plain-torch DMVAE replica of the reference's own math
     (/root/reference/models/dmvae.py:128-188: PoE T=1.5 with prior
     expert, joint + cross reconstructions, a * KL terms; xavier_uniform
     init per utils.py:153-166; Adam + CosineAnnealingLR(T_max=num_epochs,
     eta_min=0) per dmvae.py:204-209), recording per-epoch train loss.
  2. Train OUR JAX DMVAE under the sweep protocol (same as
     parity_check.frozen_dmvae_embeddings), recording its loss trajectory.
  3. Embed train/test with EACH backbone (get_embedding semantics,
     dmvae.py:116-126: shared = PoE mu at T=1.5 incl. prior, private =
     per-modality mu).
  4. Fit the SAME reference-math torch probe (torch_heads_fit, the
     dmvae_cml protocol: shared+private heads, AdamW(1e-4)+cosine,
     agg=cml) on each side's embeddings. Because the probe is held fixed,
     any downstream accuracy/ECE gap isolates BACKBONE-training
     divergence from probe divergence.

Run:
  python tools/parity_dmvae.py --dataset HandWritten --seeds 0 1 2 3 4
Writes results/parity_check_dmvae_<dataset>.json: per-seed losses (full
trajectories both sides), per-seed downstream probe metrics on torch-emb
vs jax-emb, paired per-seed deltas, and the torch seed spread.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from parity_check import torch_heads_fit  # noqa: E402 (same tools/ dir)

PROBE_METRICS = ["accuracy", "ece", "epistemic_mean", "aleatoric_mean"]


def torch_dmvae_fit(
    views_tr, views_te, dims, seed, *, embed_dim=200, hidden_dim=512,
    lr=1e-4, epochs=100, batch=100, a=1e-5,
):
    """Train the reference-math torch DMVAE; return (losses, emb_tr, emb_te).

    Math replicated from /root/reference/models/dmvae.py:128-188 with the
    .mat protocol's knobs (IdentityEncoder feature pre-encoders, dropout 0,
    lambda_per_modality = 1, cross_weight = 1). Embeddings follow
    get_embedding (dmvae.py:116-126): PoE mu at T=poe_temperature(=1.5)
    with the prior expert, and per-modality private mus.
    """
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    n_mod = len(dims)

    def mlp(i, h, o):
        m = nn.Sequential(
            nn.Linear(i, h), nn.ReLU(), nn.Linear(h, h), nn.ReLU(),
            nn.Linear(h, o),
        )
        # utils.py:153-166 initialization='xavier': xavier_uniform on every
        # Linear weight, torch-default bias
        for layer in m:
            if isinstance(layer, nn.Linear):
                nn.init.xavier_uniform_(layer.weight)
        return m

    encoders = nn.ModuleList([mlp(d, hidden_dim, 4 * embed_dim) for d in dims])
    decoders = nn.ModuleList([mlp(2 * embed_dim, hidden_dim, d) for d in dims])
    params = list(encoders.parameters()) + list(decoders.parameters())
    opt = torch.optim.Adam(params, lr=lr)
    # dmvae.py:204-209: cosine to eta_min=0, stepped per epoch
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=0)

    xs = [torch.tensor(v) for v in views_tr]
    n = xs[0].shape[0]

    def poe(mus, logvars, t=1.5):
        # dmvae.py:93-112: prior expert + tempered precisions
        mus = torch.stack(mus + [torch.zeros_like(mus[0])])
        logvars = torch.stack(logvars + [torch.zeros_like(logvars[0])])
        prec = torch.exp(-logvars) / t
        var = 1.0 / (prec.sum(0) + 1e-8)
        return var * (prec * mus).sum(0), torch.log(var)

    def kl(mu, lv):
        return -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=1)

    losses = []
    for _ in range(epochs):
        perm = torch.randperm(n)
        epoch_losses = []
        for s0 in range(0, n, batch):  # drop_last=False (run.py:68-69)
            b = perm[s0 : s0 + batch]
            xb = [x[b] for x in xs]
            stats = [enc(x).chunk(4, dim=1) for enc, x in zip(encoders, xb)]
            mu_s = [st[0] for st in stats]
            lv_s = [st[1] for st in stats]
            z_p = [st[2] + torch.randn_like(st[2]) * torch.exp(0.5 * st[3])
                   for st in stats]
            z_s_uni = [m + torch.randn_like(m) * torch.exp(0.5 * l)
                       for m, l in zip(mu_s, lv_s)]
            mu_poe, lv_poe = poe(mu_s, lv_s)
            z_s = mu_poe + torch.randn_like(mu_poe) * torch.exp(0.5 * lv_poe)
            rec_j = sum(
                F.mse_loss(decoders[i](torch.cat([z_p[i], z_s], 1)), xb[i])
                for i in range(n_mod)
            )
            rec_c, pairs = 0.0, 0
            for i in range(n_mod):
                for j in range(n_mod):
                    if i == j:
                        continue
                    rec_c = rec_c + F.mse_loss(
                        decoders[i](torch.cat([z_p[i], z_s_uni[j]], 1)), xb[i]
                    )
                    pairs += 1
            rec_c = rec_c / pairs
            kl_p = sum(kl(st[2], st[3]) for st in stats).mean()
            kl_poe = kl(mu_poe, lv_poe).mean()
            kl_uni = sum(kl(m, l) for m, l in zip(mu_s, lv_s)).mean()
            loss = rec_j + a * (kl_p + n_mod * kl_poe) + rec_c + a * kl_uni
            opt.zero_grad()
            loss.backward()
            opt.step()
            epoch_losses.append(float(loss.detach()))
        sch.step()
        losses.append(float(np.mean(epoch_losses)))

    @torch.no_grad()
    def embed(views):
        vx = [torch.tensor(v) for v in views]
        stats = [enc(x).chunk(4, dim=1) for enc, x in zip(encoders, vx)]
        zc, _ = poe([st[0] for st in stats], [st[1] for st in stats])
        return ([zc.numpy()] + [st[2].numpy() for st in stats])

    return losses, embed(views_tr), embed(views_te)


def jax_dmvae_fit(
    xs_tr, xs_te, dims, seed, *, embed_dim=200, hidden_dim=512, lr=1e-4,
    epochs=100, batch=100,
):
    """Train OUR JAX DMVAE (exact parity-harness protocol: PRNGKey(seed)
    init, PRNGKey(seed+200) training stream, a=1e-5); return
    (losses, emb_tr, emb_te) in the same layout as torch_dmvae_fit."""
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
    res = train(
        rng=jax.random.PRNGKey(seed + 200), params=params, loss_fn=loss_fn,
        data={"xs": xs_tr}, n_train=xs_tr[0].shape[0], optimizer=opt,
        epochs=epochs, batch_size=batch, drop_last=False,
    )

    def unpack(xs):
        zc, zp = embed_dataset(model, res.params, xs)
        return [np.asarray(zc)] + [np.asarray(zp[:, i]) for i in range(len(dims))]

    losses = [float(x) for x in np.asarray(res.train_loss)]
    return losses, unpack(xs_tr), unpack(xs_te)


def run_seed(seed, *, dataset, out, backbone_epochs, probe_epochs):
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.data.multiview import DATASET_REGISTRY

    # identical split law to parity_check.run_seed / run.py
    ds = DATASET_REGISTRY[dataset]()
    rng_np = np.random.default_rng(seed)
    idx = rng_np.permutation(len(ds))
    n_tr = int(0.8 * len(ds))
    tr, te = idx[:n_tr], idx[n_tr:]
    views, y = ds.arrays()
    views_tr = [v[tr] for v in views]
    views_te = [v[te] for v in views]
    y_tr, y_te = y[tr], y[te]
    dims = [v.shape[1] for v in views_tr]
    lr_probe = {"CalTech": 3e-4, "Scene": 0.01, "CUB": 3e-3,
                "HandWritten": 3e-3, "PIE": 3e-3}[dataset]

    t0 = time.time()
    t_losses, t_emb_tr, t_emb_te = torch_dmvae_fit(
        views_tr, views_te, dims, seed, epochs=backbone_epochs,
    )
    t_torch = time.time() - t0
    t0 = time.time()
    xs_tr = tuple(jnp.asarray(v) for v in views_tr)
    xs_te = tuple(jnp.asarray(v) for v in views_te)
    j_losses, j_emb_tr, j_emb_te = jax_dmvae_fit(
        xs_tr, xs_te, dims, seed, epochs=backbone_epochs,
    )
    t_jax = time.time() - t0
    print(
        f"[seed {seed}] backbone losses: torch final {t_losses[-1]:.4f} "
        f"({t_torch:.0f}s) vs jax final {j_losses[-1]:.4f} ({t_jax:.0f}s)",
        flush=True,
    )

    # the SAME reference-math probe on each side's embeddings
    # (dmvae_cml protocol: AdamW(1e-4)+cosine, shared+private, agg=cml)
    def probe(emb_tr, emb_te):
        return torch_heads_fit(
            emb_tr, y_tr, emb_te, y_te, ds.num_classes, lr=lr_probe,
            annealing_start=50, epochs=probe_epochs, batch=100, hidden=128,
            dropout=0.1, optimizer="adamw", schedule="cosine",
            weight_decay=1e-4, seed=seed, agg="cml", fused=1,
        )

    t0 = time.time()
    probe_on_torch = probe(t_emb_tr, t_emb_te)
    probe_on_jax = probe(j_emb_tr, j_emb_te)
    print(
        f"[seed {seed}] downstream probe: on-torch-emb acc "
        f"{probe_on_torch['accuracy']:.4f} vs on-jax-emb acc "
        f"{probe_on_jax['accuracy']:.4f} | ece {probe_on_torch['ece']:.4f} "
        f"vs {probe_on_jax['ece']:.4f} ({time.time() - t0:.0f}s)",
        flush=True,
    )

    out["seeds"].append(seed)
    out["torch_loss"].append(t_losses)
    out["jax_loss"].append(j_losses)
    out["probe_on_torch_emb"].append(probe_on_torch)
    out["probe_on_jax_emb"].append(probe_on_jax)


def summarize(out):
    s = {}
    tl = np.array([l[-1] for l in out["torch_loss"]])
    jl = np.array([l[-1] for l in out["jax_loss"]])
    s["final_loss"] = {
        "torch_mean": float(tl.mean()), "jax_mean": float(jl.mean()),
        "gap": float(abs(tl.mean() - jl.mean())),
        "rel_gap": float(abs(tl.mean() - jl.mean()) / max(abs(tl.mean()), 1e-12)),
        "torch_seed_std": float(tl.std()),
        "paired_delta_mean": float((jl - tl).mean()),
        "paired_delta_per_seed": [float(d) for d in (jl - tl)],
    }
    # trajectory agreement: mean |gap| over epochs, vs the torch side's own
    # per-epoch seed std (each framework has its own shuffle/reparam RNG,
    # so per-epoch equality is only expected up to seed noise)
    tmat = np.array(out["torch_loss"])  # (S, E)
    jmat = np.array(out["jax_loss"])
    s["trajectory"] = {
        "mean_abs_gap_of_means": float(np.abs(tmat.mean(0) - jmat.mean(0)).mean()),
        "torch_mean_epoch_seed_std": float(tmat.std(0).mean()),
        "last10_torch_mean": float(tmat[:, -10:].mean()),
        "last10_jax_mean": float(jmat[:, -10:].mean()),
    }
    for m in PROBE_METRICS:
        a = np.array([r[m] for r in out["probe_on_torch_emb"]])
        b = np.array([r[m] for r in out["probe_on_jax_emb"]])
        s[f"probe_{m}"] = {
            "on_torch_emb_mean": float(a.mean()),
            "on_jax_emb_mean": float(b.mean()),
            "gap": float(abs(a.mean() - b.mean())),
            "torch_seed_std": float(a.std()),
            "paired_delta_mean": float((b - a).mean()),
            "paired_delta_std": float((b - a).std()),
            "paired_delta_per_seed": [float(d) for d in (b - a)],
        }
    return s


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="HandWritten",
                        help="HandWritten | CUB | PIE | Scene")
    parser.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    parser.add_argument("--backbone-epochs", type=int, default=100)
    parser.add_argument("--probe-epochs", type=int, default=200)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()

    dest = args.out or f"results/parity_check_dmvae_{args.dataset.lower()}.json"
    out = {"seeds": [], "torch_loss": [], "jax_loss": [],
           "probe_on_torch_emb": [], "probe_on_jax_emb": []}
    for seed in args.seeds:
        run_seed(seed, dataset=args.dataset, out=out,
                 backbone_epochs=args.backbone_epochs,
                 probe_epochs=args.probe_epochs)
        summary = summarize(out)
        import jax

        meta = {"dataset": args.dataset, "jax_backend": jax.default_backend(),
                "backbone_epochs": args.backbone_epochs,
                "probe_epochs": args.probe_epochs}
        Path("results").mkdir(exist_ok=True)
        Path(dest).write_text(
            json.dumps({"meta": meta, "per_seed": out, "summary": summary},
                       indent=1)
        )
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
