"""Benchmark: HandWritten DMVAE training epoch wall-clock vs the PyTorch
reference.

Prints ONE JSON line:
  {"metric": "handwritten_dmvae_epoch_ms", "value": <ms/epoch (ours)>,
   "unit": "ms", "vs_baseline": <torch_ms / ours — speedup factor>}

Protocol (BASELINE.md): the reference publishes no numbers, so the baseline
is measured here — a plain-torch replica of the reference's DMVAE hot loop
(models/dmvae.py:128-188 math, Adam, batch 100) on this host's CPU (the
reference runs CPU/1-GPU; this image has torch-cpu). Ours is the jitted
scan-per-epoch program on the default JAX backend (TPU under the driver).

Config: HandWritten 80/20 split (seed 0), embed 200, hidden 512, a=1e-5,
batch 100 — BASELINE.json config #1. Both sides time full epochs over the
1600-row train split. JAX timing excludes compilation (program run twice,
second run timed); torch gets a 1-epoch warmup.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


EPOCHS_JAX = 100
BATCH = 100
HIDDEN = 512
EMBED = 200
A = 1e-5
LR = 1e-4


def load_data():
    from disentagled_multimodal_fusion_tpu.data.multiview import HandWritten

    ds = HandWritten()
    views, labels = ds.arrays()
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(ds))
    n_tr = int(0.8 * len(ds))
    tr = idx[:n_tr]
    return [v[tr] for v in views], [int(d[0]) for d in ds.dims]


def bench_jax(xs_np, dims, fused_modalities: bool = True) -> float:
    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()
    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import build_dmvae_task
    from disentagled_multimodal_fusion_tpu.core.train import train

    _log(f"jax backend: {jax.default_backend()} {jax.devices()}")
    xs = tuple(jnp.asarray(x) for x in xs_np)
    key = jax.random.PRNGKey(0)
    model, params0, loss_fn, opt, _bstats = build_dmvae_task(
        rng=key, xs_sample=xs, output_dim=dims, a=A, hidden_dim=HIDDEN,
        embed_dim=EMBED, lr=LR, num_epochs=EPOCHS_JAX,
        fused_modalities=fused_modalities,
    )

    def run(params):
        res = train(
            rng=key, params=params, loss_fn=loss_fn, data={"xs": xs},
            n_train=xs[0].shape[0], optimizer=opt, epochs=EPOCHS_JAX,
            batch_size=BATCH, drop_last=False, donate=False,
        )
        jax.block_until_ready(res.params)
        return res

    t0 = time.perf_counter()
    res = run(params0)  # includes compile
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run(params0)
    t_run = time.perf_counter() - t0
    _log(
        f"jax (fused={fused_modalities}): {EPOCHS_JAX} epochs in {t_run:.3f}s "
        f"(first call incl. compile {t_compile:.1f}s); "
        f"final loss {float(res.train_loss[-1]):.4f}"
    )
    return t_run / EPOCHS_JAX * 1000.0


def bench_torch(xs_np, dims) -> float:
    """Plain-torch replica of the reference DMVAE train epoch (CPU)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    n_mod = len(dims)

    def mlp(i, h, o):
        return nn.Sequential(nn.Linear(i, h), nn.ReLU(), nn.Linear(h, h), nn.ReLU(), nn.Linear(h, o))

    encoders = nn.ModuleList([mlp(d, HIDDEN, 4 * EMBED) for d in dims])
    decoders = nn.ModuleList([mlp(2 * EMBED, HIDDEN, d) for d in dims])
    all_params = list(encoders.parameters()) + list(decoders.parameters())
    opt = torch.optim.Adam(all_params, lr=LR)
    xs = [torch.tensor(x) for x in xs_np]
    n = xs[0].shape[0]

    def poe(mus, logvars, t=1.5):
        mus = torch.stack(mus + [torch.zeros_like(mus[0])])
        logvars = torch.stack(logvars + [torch.zeros_like(logvars[0])])
        prec = torch.exp(-logvars) / t
        var = 1.0 / (prec.sum(0) + 1e-8)
        return var * (prec * mus).sum(0), torch.log(var)

    def kl(mu, lv):
        return -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=1)

    def epoch():
        perm = torch.randperm(n)
        for s in range(0, n, BATCH):
            b = perm[s : s + BATCH]
            xb = [x[b] for x in xs]
            stats = [enc(x).chunk(4, dim=1) for enc, x in zip(encoders, xb)]
            mu_s = [st[0] for st in stats]
            lv_s = [st[1] for st in stats]
            z_p = [st[2] + torch.randn_like(st[2]) * torch.exp(0.5 * st[3]) for st in stats]
            z_s_uni = [m + torch.randn_like(m) * torch.exp(0.5 * l) for m, l in zip(mu_s, lv_s)]
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
            loss = rec_j + A * (kl_p + n_mod * kl_poe) + rec_c + A * kl_uni
            opt.zero_grad()
            loss.backward()
            opt.step()

    epoch()  # warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        epoch()
    per_epoch = (time.perf_counter() - t0) / reps
    _log(f"torch: {per_epoch * 1000:.1f} ms/epoch (cpu, {reps} reps)")
    return per_epoch * 1000.0


def main():
    xs_np, dims = load_data()
    _log(f"HandWritten train split: {xs_np[0].shape[0]} rows, dims {dims}")
    ours_ms = bench_jax(xs_np, dims)
    torch_ms = bench_torch(xs_np, dims)
    print(
        json.dumps(
            {
                "metric": "handwritten_dmvae_epoch_ms",
                "value": round(ours_ms, 3),
                "unit": "ms",
                "vs_baseline": round(torch_ms / ours_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
