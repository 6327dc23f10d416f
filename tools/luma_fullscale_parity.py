"""Probe-fit parity on identical checkpointed LUMA embeddings.

Loads a saved DMVAE checkpoint, embeds a featurized LUMA corpus once,
and trains BOTH
  (a) the reference-math plain-torch probe (imported losses.py/utils.py),
  (b) our jitted probe task,
on the SAME embeddings for --epochs epochs with per-epoch validation
traces on each side — isolating probe-training parity from backbone
parity.

HISTORY NOTE: this tool's first measurements ("ridge 99.98% on the
extended run's embeddings, so the backbone is fine and the probe fit is
implicated") were taken against a checkpoint the test suite had silently
overwritten with a fixture-trained model — the confusion that exposed the
artifact-isolation bug fixed via DMF_ARTIFACT_ROOT. The pristine
extended-run checkpoints are genuinely degenerate (constant embeddings;
both frameworks' probes at chance on them, trivially). The settled
full-scale collapse story lives in tools/luma_collapse_{torch,jax}.py and
RESULTS.md §LUMA; this tool remains useful as a probe-level parity
instrument on any healthy checkpoint. CAVEAT: the checkpoint name
template carries no corpus identity (the reference's own convention,
run_luma.py:235-237), so make sure --checkpoint and --corpus come from
the same run — run_luma overwrites these slots on every invocation.

Reference anchors: /root/reference/models/evidential_probe.py:11-212
(probe math), /root/reference/models/losses.py:209-248 (AvgTrustedLoss),
/root/reference/run_luma.py:162 (the reference itself never runs LUMA
probes past 2 epochs — the extended budget is this repo's extension).

Run (CPU is fine; ~10 min):
  JAX_PLATFORMS=cpu python tools/luma_fullscale_parity.py --epochs 200
Writes results/luma_fullscale_probe_parity.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tools.parity_check import load_ref  # reference module importer


def torch_probe_fit_traced(
    views_tr, y_tr, views_te, y_te, num_classes, *, lr, annealing_start,
    epochs, batch, hidden, dropout, seed=0, agg="cml", fused=1,
):
    """tools/parity_check.torch_heads_fit (dmvae_cml configuration:
    AdamW(wd=1e-4) + cosine) with a per-epoch val-accuracy trace."""
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

    opt = torch.optim.AdamW(heads.parameters(), lr=lr, weight_decay=1e-4)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs, eta_min=1e-6)
    crit = L.AvgTrustedLoss(num_views=v, annealing_start=annealing_start)
    agg_fn = {"cml": U.get_cml_fusion, "avg": U.get_avg_fusion,
              "joint": U.get_joint_fusion}[agg]
    n = len(y_tr)

    def all_evidences(xs, rows=None):
        return torch.stack(
            [U.activation_function(
                heads[i](xs[i] if rows is None else xs[i][rows]), "exp")
             for i in range(v)], dim=1)

    trace = []
    for ep in range(epochs):
        perm = torch.randperm(n)
        heads.train()
        for s0 in range(0, n, batch):
            b = perm[s0: s0 + batch]
            ev = all_evidences(xs_tr, b)
            loss = crit(ev, yt[b], agg_fn(ev), fused=fused)
            opt.zero_grad()
            loss.backward()
            opt.step()
        crit.annealing_step += 1
        heads.eval()
        with torch.no_grad():
            fused_ev = agg_fn(all_evidences(xs_te))
            acc = (fused_ev.argmax(1) == ye).float().mean().item()
        trace.append(acc)
        sch.step()
        if ep % 10 == 0 or ep == epochs - 1:
            print(f"  [torch] epoch {ep:3d} val_acc {acc:.4f}", flush=True)

    with torch.no_grad():
        fused_ev = agg_fn(all_evidences(xs_te))
        alphas = fused_ev + 1
        s = alphas.sum(-1, keepdim=True)
        epi = (num_classes / s).mean().item()
    return {"accuracy": trace[-1], "epistemic_mean": epi,
            "evidence_mean": float(fused_ev.sum(-1).mean()), "trace": trace}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--corpus", default="data/luma_fullscale")
    p.add_argument("--checkpoint",
                   default="checkpoints/dmvae_datasetLUMA_seed{seed}_a1e-05_normal")
    p.add_argument("--skip-ours", action="store_true",
                   help="torch side only (our trace already measured)")
    p.add_argument("--out", default="results/luma_fullscale_probe_parity.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.checkpoint import restore_checkpoint
    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_dmvae_task, build_probe_task, embed_dataset_chunked)
    from disentagled_multimodal_fusion_tpu.core.train import train
    from disentagled_multimodal_fusion_tpu.data.luma import get_luma_arrays
    from disentagled_multimodal_fusion_tpu.models.layers import (
        AudioEncoder, ImageEncoder, TextEncoder)

    audio_cfg = {"sample_rate": 16000, "max_length": 3.0, "n_mfcc": 40,
                 "use_mfcc": True, "use_2d": False}
    text_cfg = {"max_length": 128, "model_name": "bert-base-uncased",
                "use_pretrained": True}
    image_cfg = {"size": (32, 32), "normalize": True}
    xs_tr, y_tr, xs_te, y_te, num_classes, num_views, dims = get_luma_arrays(
        args.corpus, audio_cfg, text_cfg, image_cfg)
    xs_tr = tuple(jnp.asarray(x) for x in xs_tr)
    xs_te = tuple(jnp.asarray(x) for x in xs_te)
    print(f"{len(y_tr)} train / {len(y_te)} test, {num_classes} classes",
          flush=True)

    encoders = (
        AudioEncoder(input_dim=40, output_dim=200, dropout=0.1, use_2d=False),
        TextEncoder(input_dim=128, output_dim=200, dropout=0.1),
        ImageEncoder(output_dim=200, dropout=0.1),
    )
    model, p0, _, _, bstats0 = build_dmvae_task(
        rng=jax.random.PRNGKey(args.seed), xs_sample=xs_tr,
        output_dim=[200] * 3, dropout=0.0, a=1e-5, hidden_dim=512,
        embed_dim=200, lr=1e-4, num_epochs=100, feature_encoders=encoders,
        fused_modalities=True)
    ckpt = args.checkpoint.format(seed=args.seed)
    params = restore_checkpoint(ckpt, p0)
    bstats = (restore_checkpoint(ckpt + "_state", bstats0)
              if bstats0 is not None else None)
    zc_tr, zp_tr = embed_dataset_chunked(model, params, xs_tr, bstats)
    zc_te, zp_te = embed_dataset_chunked(model, params, xs_te, bstats)
    print("embedded from checkpoint", ckpt, flush=True)

    emb_tr = [np.asarray(zc_tr)] + [np.asarray(zp_tr[:, i]) for i in range(num_views)]
    emb_te = [np.asarray(zc_te)] + [np.asarray(zp_te[:, i]) for i in range(num_views)]
    y_np_tr, y_np_te = np.asarray(y_tr), np.asarray(y_te)

    result = {"epochs": args.epochs, "seed": args.seed,
              "num_classes": int(num_classes), "checkpoint": ckpt}

    if not args.skip_ours:
        t0 = time.time()
        task = build_probe_task(
            rng=jax.random.PRNGKey(args.seed + 5), num_modalities=num_views,
            num_classes=num_classes, input_dim=200, hidden_dim=(128,),
            lr=3e-4, dropout=0.1, annealing_start=50, aggregation="cml",
            fused=1.0, num_epochs=args.epochs)
        probe_tr = {"zc": zc_tr, "zp": zp_tr, "y": jnp.asarray(y_tr)}
        probe_te = {"zc": zc_te, "zp": zp_te, "y": jnp.asarray(y_te)}
        res = train(
            rng=jax.random.PRNGKey(args.seed + 300), params=task.params,
            loss_fn=task.loss_fn, data=probe_tr, n_train=len(y_np_tr),
            optimizer=task.optimizer, epochs=args.epochs, batch_size=64,
            drop_last=False, val_fn=task.val_fn, val_data=probe_te)
        ours_trace = [float(a) for a in np.asarray(res.val_acc)]
        result["ours"] = {"accuracy": ours_trace[-1], "trace": ours_trace}
        print(f"ours: final {ours_trace[-1]:.4f}, peak {max(ours_trace):.4f} "
              f"@ep{int(np.argmax(ours_trace))} ({time.time()-t0:.0f}s)",
              flush=True)

    t0 = time.time()
    ref = torch_probe_fit_traced(
        emb_tr, y_np_tr, emb_te, y_np_te, num_classes, lr=3e-4,
        annealing_start=50, epochs=args.epochs, batch=64, hidden=128,
        dropout=0.1, seed=args.seed, agg="cml", fused=1)
    result["torch"] = ref
    tr = ref["trace"]
    print(f"torch: final {tr[-1]:.4f}, peak {max(tr):.4f} "
          f"@ep{int(np.argmax(tr))} ({time.time()-t0:.0f}s)", flush=True)

    Path("results").mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
