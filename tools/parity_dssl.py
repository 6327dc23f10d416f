"""Cross-framework parity for the DisentangledSSL backbone's OWN training.

Companion to tools/parity_dmvae.py (VERDICT r2 item 4): round 2 pinned
SupCon/ortho/vMF op-by-op with golden tests, but no torch DSSL *training
run* was ever compared. This tool trains a plain-torch DisentangledSSL
step built from the REFERENCE'S OWN modules — SupConLoss / ortho_loss
(models/losses.py), VonMisesFisher + Linear (models/classifiers.py),
augment_data (utils.py:118-151) — replicating the reference training step
(/root/reference/models/disentangledssl.py:85-194: condzs=True,
usezsx=False, lmd=0 defaults, Adam + CosineAnnealingLR(T_max=epochs,
eta_min=0)), against our ``build_disentangledssl_task`` on the identical
synthetic dependence cells, then fits the SAME reference-math torch probe
(torch_heads_fit, the run_synthetic dmvae_fusion protocol) on each side's
embeddings.

Two deviations from the reference source, both device plumbing this
CPU-only image cannot execute: ProbabilisticEncoder's hardcoded
``.cuda()`` (classifiers.py:461,465) — the vMF head is constructed inline
with the same loc/scale math on CPU, sampling still goes through the
reference's own VonMisesFisher class — and ``utils.noise``'s
``noise.cuda()`` (utils.py:120), so ``augment_data`` is transcribed
verbatim below minus that call.

Run:
  python tools/parity_dssl.py --deps 0 50 100 --seeds 0 1 2 3 4
Writes results/parity_check_dssl.json.

Real-data mode (VERDICT r3 item 3 — the reference documents SSL as a
drop-in backbone under the same get_embedding contract,
/root/reference/README.md:110-229, but never executes it on real data;
CUB is the 2-view contract-compatible .mat):
  python tools/parity_dssl.py --dataset CUB --seeds 0 1 2 3 4 \
      --probe-epochs 200 --out results/parity_check_dssl_cub.json
mirrors `run.py --backbone dssl --datasets CUB` hyperparameters
(embed 200, hidden 512, lr 1e-3, batch 100, drop_last) plus the
real-data dmvae_cml probe protocol (lr 3e-3, annealing 50, fused=1).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, "/root/reference")  # classifiers.py does `from utils import ...`

import numpy as np

from parity_check import load_ref, torch_heads_fit  # noqa: E402

PROBE_METRICS = ["accuracy", "ece", "epistemic_mean", "aleatoric_mean"]


def augment_data_cpu(x_batch, noise_scale=0.01, drop_scale=10):
    """utils.py:118-151 verbatim, minus the noise().cuda() device move."""
    import torch

    v2 = torch.clone(x_batch)
    transforms = ["n", "r", "i"]
    for i in range(x_batch.shape[0]):
        t2 = transforms[np.random.choice(3, 1, replace=False)[0]]
        if t2 == "n":
            v2[i] = v2[i] + torch.randn(v2[i].shape) * noise_scale
        elif t2 == "r":
            drop_num = v2[i].shape[0] // drop_scale
            drop_idxs = np.random.choice(v2[i].shape[0], drop_num, replace=False)
            aug = torch.clone(v2[i])
            aug[drop_idxs] = 0.0
            v2[i] = aug
    return v2


def torch_dssl_fit(
    views_tr, views_te, dims, seed, *, embed_dim=16, hidden_dim=512,
    lr=1e-3, epochs=100, batch=128, a=1.0, vmfkappa=1.0,
):
    """Reference-math DisentangledSSL training; returns
    (per-epoch losses, emb_tr, emb_te) with embeddings in get_embedding
    layout (disentangledssl.py:69-82): zc = concat(zsx1, zsx2),
    zp_i = conditional private codes."""
    import torch
    import torch.nn as nn

    L = load_ref("ref_losses", "models/losses.py")
    Cls = load_ref("ref_classifiers", "models/classifiers.py")
    torch.manual_seed(seed)
    np.random.seed(seed)  # augment_data's transform choices use np.random
    d1, d2 = dims

    Linear = Cls.Linear
    enc_x1s = Linear(layers=(d1, hidden_dim, hidden_dim), output_dims=embed_dim,
                     initialization="xavier", dropout=0)
    enc_x2s = Linear(layers=(d2, hidden_dim, hidden_dim), output_dims=embed_dim,
                     initialization="xavier", dropout=0)
    # condzs=True (reference default): private encoders see [x, zs]
    enc_x1 = Linear(layers=(d1 + embed_dim, hidden_dim, hidden_dim),
                    output_dims=embed_dim, initialization="xavier", dropout=0)
    enc_x2 = Linear(layers=(d2 + embed_dim, hidden_dim, hidden_dim),
                    output_dims=embed_dim, initialization="xavier", dropout=0)
    critic = L.SupConLoss()
    mods = nn.ModuleList([enc_x1s, enc_x2s, enc_x1, enc_x2])
    opt = torch.optim.Adam(mods.parameters(), lr=lr)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=0)

    def phead_sample(params):
        # classifiers.py:463-466 sans .cuda(): vMF head over the shared code
        loc = params / params.norm(dim=-1, keepdim=True)
        scale = vmfkappa * torch.ones(params.shape[0], 1)
        return Cls.VonMisesFisher(loc, scale).rsample()

    xs = [torch.tensor(v) for v in views_tr]
    n = xs[0].shape[0]
    n_used = n - (n % batch)  # drop_last=True (reference dataset.py:469)

    losses = []
    for _ in range(epochs):
        perm = torch.randperm(n)
        epoch_losses = []
        for s0 in range(0, n_used, batch):
            b = perm[s0 : s0 + batch]
            x1, x2 = xs[0][b], xs[1][b]
            v1, v2 = augment_data_cpu(x1), augment_data_cpu(x2)  # shared_step

            # --- forward (disentangledssl.py:85-160) ---
            e1, e2 = enc_x1s(x1), enc_x2s(x2)
            e1_v, e2_v = enc_x1s(v1), enc_x2s(v2)
            zs1, zs2 = phead_sample(e1), phead_sample(e2)
            zsv1, zsv2 = phead_sample(e1_v), phead_sample(e2_v)

            ce = torch.cat([zs1.unsqueeze(1), zs2.unsqueeze(1)], dim=1)
            ce_v = torch.cat([zsv1.unsqueeze(1), zsv2.unsqueeze(1)], dim=1)
            jl, _, _ = critic(ce)
            jl_v, _, _ = critic(ce_v)
            loss_shared = 0.5 * (jl + jl_v)

            z1x1 = enc_x1(torch.cat([x1, e1], dim=1))
            z1xv1 = enc_x1(torch.cat([v1, e1_v], dim=1))
            z2x2 = enc_x2(torch.cat([x2, e2], dim=1))
            z2xv2 = enc_x2(torch.cat([v2, e2_v], dim=1))

            # usezsx=False branch
            norm = nn.functional.normalize
            c1 = torch.cat([norm(z1x1, dim=-1).unsqueeze(1),
                            norm(z1xv1, dim=-1).unsqueeze(1)], dim=1)
            c2 = torch.cat([norm(z2x2, dim=-1).unsqueeze(1),
                            norm(z2xv2, dim=-1).unsqueeze(1)], dim=1)
            sl1, _, _ = critic(c1)
            sl2, _, _ = critic(c2)
            loss_specific = sl1 + sl2

            lmd = 0.0  # lmd_start_value/end_value defaults (both 0)
            loss_ortho = (
                0.5 * (L.ortho_loss(z1x1, e1, norm=True)
                       + L.ortho_loss(z2x2, e2, norm=True))
                + 0.5 * (L.ortho_loss(z1xv1, e1_v, norm=True)
                         + L.ortho_loss(z2xv2, e2_v, norm=True))
            )
            loss = (2 * loss_shared / (1 + a) + a * loss_specific / (1 + a)
                    + lmd * loss_ortho)
            opt.zero_grad()
            loss.backward()
            opt.step()
            epoch_losses.append(float(loss.detach()))
        sch.step()
        losses.append(float(np.mean(epoch_losses)))

    @torch.no_grad()
    def embed(views):
        x1, x2 = torch.tensor(views[0]), torch.tensor(views[1])
        zsx1, zsx2 = enc_x1s(x1), enc_x2s(x2)
        z1x1 = enc_x1(torch.cat([x1, zsx1], dim=1))
        z2x2 = enc_x2(torch.cat([x2, zsx2], dim=1))
        zc = torch.cat([zsx1, zsx2], dim=1)
        return [zc.numpy(), z1x1.numpy(), z2x2.numpy()]

    return losses, embed(views_tr), embed(views_te)


def jax_dssl_fit(
    xs_tr, xs_te, dims, seed, *, embed_dim=16, hidden_dim=512, lr=1e-3,
    epochs=100, batch=128,
):
    """Our DisentangledSSL under the run_synthetic --backbone dssl
    protocol; returns (losses, emb_tr, emb_te) in the same layout."""
    import jax

    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_disentangledssl_task, embed_dataset_ssl,
    )
    from disentagled_multimodal_fusion_tpu.core.train import train

    model, params, loss_fn, opt = build_disentangledssl_task(
        rng=jax.random.PRNGKey(seed), output_dim=list(dims),
        hidden_dim=hidden_dim, embed_dim=embed_dim, a=1.0,
        distribution="vmf", vmfkappa=1.0, lr=lr, epochs=epochs,
    )
    res = train(
        rng=jax.random.PRNGKey(seed + 200), params=params, loss_fn=loss_fn,
        data={"xs": xs_tr}, n_train=xs_tr[0].shape[0], optimizer=opt,
        epochs=epochs, batch_size=batch, drop_last=True,
    )

    def unpack(xs):
        zc, zp = embed_dataset_ssl(model, res.params, xs)
        return [np.asarray(zc)] + [np.asarray(zp[:, i]) for i in range(len(dims))]

    losses = [float(x) for x in np.asarray(res.train_loss)]
    return losses, unpack(xs_tr), unpack(xs_te)


def run_cell(seed, dep, *, out, backbone_epochs, probe_epochs):
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.data.synthetic import (
        make_simple_plus_splits,
    )

    rho = dep / 100.0
    _, (v_tr, ytr), (v_te, yte) = make_simple_plus_splits(
        batch_size=128, seed=seed, rho=rho, shared_class_frac=rho,
    )
    views_tr, views_te = list(v_tr), list(v_te)
    y_tr, y_te = np.asarray(ytr), np.asarray(yte)
    dims = [v.shape[1] for v in views_tr]

    t0 = time.time()
    t_losses, t_emb_tr, t_emb_te = torch_dssl_fit(
        views_tr, views_te, dims, seed, epochs=backbone_epochs,
    )
    t_torch = time.time() - t0
    t0 = time.time()
    xs_tr = tuple(jnp.asarray(v) for v in views_tr)
    xs_te = tuple(jnp.asarray(v) for v in views_te)
    j_losses, j_emb_tr, j_emb_te = jax_dssl_fit(
        xs_tr, xs_te, dims, seed, epochs=backbone_epochs,
    )
    t_jax = time.time() - t0
    print(
        f"[dep {dep} seed {seed}] dssl losses: torch final {t_losses[-1]:.4f} "
        f"({t_torch:.0f}s) vs jax final {j_losses[-1]:.4f} ({t_jax:.0f}s)",
        flush=True,
    )

    # the run_synthetic dmvae_fusion probe protocol (AdamW(1e-4)+cosine,
    # lr 3e-4, annealing 10, fused=0, drop_last) on BOTH embedding sets
    def probe(emb_tr, emb_te):
        return torch_heads_fit(
            emb_tr, y_tr, emb_te, y_te, 3, lr=3e-4, annealing_start=10,
            epochs=probe_epochs, batch=128, hidden=128, dropout=0.1,
            optimizer="adamw", schedule="cosine", weight_decay=1e-4,
            seed=seed, agg="cml", fused=0, drop_last=True,
        )

    probe_on_torch = probe(t_emb_tr, t_emb_te)
    probe_on_jax = probe(j_emb_tr, j_emb_te)
    print(
        f"[dep {dep} seed {seed}] probe: on-torch-emb acc "
        f"{probe_on_torch['accuracy']:.4f} vs on-jax-emb acc "
        f"{probe_on_jax['accuracy']:.4f}",
        flush=True,
    )

    cell = out.setdefault(str(dep), {
        "seeds": [], "torch_loss": [], "jax_loss": [],
        "probe_on_torch_emb": [], "probe_on_jax_emb": [],
    })
    cell["seeds"].append(seed)
    cell["torch_loss"].append(t_losses)
    cell["jax_loss"].append(j_losses)
    cell["probe_on_torch_emb"].append(probe_on_torch)
    cell["probe_on_jax_emb"].append(probe_on_jax)


def run_cell_mat(seed, dataset, *, out, backbone_epochs, probe_epochs):
    """One real-data (.mat) parity seed: identical 80/20 split (the
    parity_check.py convention), DSSL backbones trained on both sides
    under run.py --backbone dssl hyperparameters, then the real-data
    dmvae_cml probe protocol on each side's embeddings."""
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.data.multiview import DATASET_REGISTRY

    ds = DATASET_REGISTRY[dataset]()
    rng_np = np.random.default_rng(seed)
    idx = rng_np.permutation(len(ds))
    n_tr = int(0.8 * len(ds))
    tr, te = idx[:n_tr], idx[n_tr:]
    views, y = ds.arrays()
    views_tr = [v[tr] for v in views]
    views_te = [v[te] for v in views]
    if len(views_tr) != 2:
        raise ValueError(
            f"dssl is 2-modal (disentangledssl.py:17-194); {dataset} has "
            f"{len(views_tr)} views — use CUB"
        )
    y_tr, y_te = np.asarray(y[tr]), np.asarray(y[te])
    dims = [v.shape[1] for v in views_tr]

    # run.py --backbone dssl defaults: embed C("dssl.embed_dim", 200),
    # hidden 512, lr 1e-3, batch C("dataloader.batch_size", 100), drop_last
    kw = dict(embed_dim=200, hidden_dim=512, lr=1e-3,
              epochs=backbone_epochs, batch=100)
    t0 = time.time()
    t_losses, t_emb_tr, t_emb_te = torch_dssl_fit(
        views_tr, views_te, dims, seed, **kw)
    t_torch = time.time() - t0
    t0 = time.time()
    xs_tr = tuple(jnp.asarray(v) for v in views_tr)
    xs_te = tuple(jnp.asarray(v) for v in views_te)
    j_losses, j_emb_tr, j_emb_te = jax_dssl_fit(xs_tr, xs_te, dims, seed, **kw)
    t_jax = time.time() - t0
    print(
        f"[{dataset} seed {seed}] dssl losses: torch final {t_losses[-1]:.4f} "
        f"({t_torch:.0f}s) vs jax final {j_losses[-1]:.4f} ({t_jax:.0f}s)",
        flush=True,
    )

    # the real-data dmvae_cml probe protocol (parity_check.py jobs 2-3:
    # AdamW(1e-4)+cosine, CUB lr 3e-3, annealing 50, fused=1, batch 100)
    def probe(emb_tr, emb_te):
        return torch_heads_fit(
            emb_tr, y_tr, emb_te, y_te, ds.num_classes, lr=3e-3,
            annealing_start=50, epochs=probe_epochs, batch=100, hidden=128,
            dropout=0.1, optimizer="adamw", schedule="cosine",
            weight_decay=1e-4, seed=seed, agg="cml", fused=1,
            drop_last=False,
        )

    probe_on_torch = probe(t_emb_tr, t_emb_te)
    probe_on_jax = probe(j_emb_tr, j_emb_te)
    print(
        f"[{dataset} seed {seed}] probe: on-torch-emb acc "
        f"{probe_on_torch['accuracy']:.4f} vs on-jax-emb acc "
        f"{probe_on_jax['accuracy']:.4f}",
        flush=True,
    )

    cell = out.setdefault(dataset, {
        "seeds": [], "torch_loss": [], "jax_loss": [],
        "probe_on_torch_emb": [], "probe_on_jax_emb": [],
    })
    cell["seeds"].append(seed)
    cell["torch_loss"].append(t_losses)
    cell["jax_loss"].append(j_losses)
    cell["probe_on_torch_emb"].append(probe_on_torch)
    cell["probe_on_jax_emb"].append(probe_on_jax)


def summarize(out):
    s = {}
    for dep, cell in out.items():
        tl = np.array([l[-1] for l in cell["torch_loss"]])
        jl = np.array([l[-1] for l in cell["jax_loss"]])
        d = {
            "final_loss": {
                "torch_mean": float(tl.mean()), "jax_mean": float(jl.mean()),
                "gap": float(abs(tl.mean() - jl.mean())),
                "torch_seed_std": float(tl.std()),
            }
        }
        for m in PROBE_METRICS:
            a = np.array([r[m] for r in cell["probe_on_torch_emb"]])
            b = np.array([r[m] for r in cell["probe_on_jax_emb"]])
            d[f"probe_{m}"] = {
                "on_torch_emb_mean": float(a.mean()),
                "on_jax_emb_mean": float(b.mean()),
                "gap": float(abs(a.mean() - b.mean())),
                "torch_seed_std": float(a.std()),
                "paired_delta_per_seed": [float(x) for x in (b - a)],
            }
        s[dep] = d
    return s


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--deps", type=int, nargs="*", default=[0, 50, 100])
    parser.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    parser.add_argument("--backbone-epochs", type=int, default=100)
    parser.add_argument("--probe-epochs", type=int, default=50)
    parser.add_argument("--dataset", default="synthetic",
                        help="synthetic (default; cells from --deps) or a "
                             "2-view .mat registry name (CUB)")
    parser.add_argument("--out", default="results/parity_check_dssl.json")
    args = parser.parse_args()

    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()
    import jax

    out = {}
    cells = args.deps if args.dataset == "synthetic" else [args.dataset]
    for cell in cells:
        for seed in args.seeds:
            if args.dataset == "synthetic":
                run_cell(seed, cell, out=out,
                         backbone_epochs=args.backbone_epochs,
                         probe_epochs=args.probe_epochs)
            else:
                run_cell_mat(seed, cell, out=out,
                             backbone_epochs=args.backbone_epochs,
                             probe_epochs=args.probe_epochs)
            summary = summarize(out)
            meta = {"jax_backend": jax.default_backend(),
                    "backbone_epochs": args.backbone_epochs,
                    "probe_epochs": args.probe_epochs,
                    "dataset": args.dataset}
            Path("results").mkdir(exist_ok=True)
            Path(args.out).write_text(json.dumps(
                {"meta": meta, "per_cell": out, "summary": summary}, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
