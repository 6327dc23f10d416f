"""JAX-side trajectory of the full-scale LUMA DMVAE representation
collapse, measured with the same instruments as the torch replica
(tools/luma_collapse_torch.py) for an epoch-for-epoch comparison.

Trains our DMVAE (run_luma's exact sequential-path config) on a
featurized LUMA corpus in ``--segment`` epoch segments via the trainer's
exact mid-training resume, and after each segment records
  - feat_norm: mean L2 norm of the trainable feature-encoder outputs
    (the decay signature of the reference's mse(decoder(z), encoder(x))
    objective, dmvae.py:136,155),
  - zc_std: per-dim std of the PoE shared mean over the SAME stride-512
    row subsample the torch tool uses,
then fits the evidential probe + a ridge control on the final embeddings.

Run (real TPU; ~1-2 min warm):
  python tools/luma_collapse_jax.py --data-path data/luma_fullscale
Writes results/luma_collapse_jax_fullscale.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", default="data/luma_fullscale")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--segment", type=int, default=5)
    p.add_argument("--probe-epochs", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="results/luma_collapse_jax_fullscale.json")
    args = p.parse_args()

    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()

    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_dmvae_task, build_probe_task, embed_dataset_chunked)
    from disentagled_multimodal_fusion_tpu.core.train import train
    from disentagled_multimodal_fusion_tpu.data.luma import get_luma_arrays
    from disentagled_multimodal_fusion_tpu.models.layers import (
        AudioEncoder, ImageEncoder, TextEncoder)

    # run_luma's exact feature configs (run_luma.py:138-155 defaults) so the
    # cached featurization of the sweep corpus is reused verbatim
    xs_tr, y_tr, xs_te, y_te, num_classes, num_views, dims = get_luma_arrays(
        args.data_path,
        {"sample_rate": 16000, "max_length": 3.0, "n_mfcc": 40,
         "use_mfcc": True, "use_2d": False},
        {"max_length": 128, "model_name": "bert-base-uncased",
         "use_pretrained": True},
        {"size": (32, 32), "normalize": True})
    xs_tr = tuple(jnp.asarray(x) for x in xs_tr)
    xs_te = tuple(jnp.asarray(x) for x in xs_te)
    y_tr, y_te = jnp.asarray(y_tr), jnp.asarray(y_te)
    n = len(y_tr)
    print(f"{n} train / {len(y_te)} test, {num_classes} classes", flush=True)

    keys = jax.random.split(jax.random.PRNGKey(args.seed), 16)
    encoders = (
        AudioEncoder(input_dim=40, output_dim=200, dropout=0.1, use_2d=False),
        TextEncoder(input_dim=128, output_dim=200, dropout=0.1),
        ImageEncoder(output_dim=200, dropout=0.1),
    )
    model, params, loss_fn, opt, bstats = build_dmvae_task(
        rng=keys[0], xs_sample=xs_tr, output_dim=[200] * 3, dropout=0.0,
        a=1e-5, hidden_dim=512, embed_dim=200, lr=1e-4,
        num_epochs=args.epochs, feature_encoders=encoders,
        fused_modalities=True)

    # same subsample protocol as the torch tool
    probe_rows = np.arange(0, n, max(1, n // 512))[:512]
    xs_probe = tuple(x[probe_rows] for x in xs_tr)

    @jax.jit
    def diag(params, state):
        variables = {"params": params}
        if state is not None:
            variables["batch_stats"] = state
        # DMVAEFused._encode_stats returns (feats, mu_s, logv_s, mu_p,
        # logv_p); the unfused variant returns (feats, stats). Either way
        # element 0 is the per-modality trainable-encoder outputs.
        feats = model.apply(
            variables, xs_probe, False, method="_encode_stats")[0]
        feat_norm = jnp.mean(
            jnp.stack([jnp.linalg.norm(f, axis=1).mean() for f in feats]))
        zc, _ = model.apply(variables, xs_probe, method="get_embedding")
        return feat_norm, zc.std(axis=0).mean()

    feat_norms, zc_stds, losses = [], [], []
    fn0, zs0 = diag(params, bstats)
    print(f"  [jax dmvae] init feat_norm {float(fn0):.4f} "
          f"zc_std {float(zs0):.5f}", flush=True)

    state_p, state_m, resume = params, bstats, None
    rng = keys[1]
    t0 = time.time()
    for e0 in range(0, args.epochs, args.segment):
        seg = min(args.segment, args.epochs - e0)
        res = train(
            rng=rng, params=state_p, loss_fn=loss_fn, data={"xs": xs_tr},
            n_train=n, optimizer=opt, epochs=seg, batch_size=64,
            drop_last=False, model_state=state_m, start_epoch=e0,
            resume=resume, donate=False)
        state_p, state_m = res.params, res.model_state
        resume = (res.opt_state, res.plateau_state, res.rng)
        rng = res.rng
        losses.extend(float(x) for x in np.asarray(res.train_loss))
        fn, zs = diag(state_p, state_m)
        feat_norms.append(float(fn))
        zc_stds.append(float(zs))
        print(f"  [jax dmvae] epoch {e0 + seg:3d} loss {losses[-1]:.4f} "
              f"feat_norm {feat_norms[-1]:.4f} zc_std {zc_stds[-1]:.5f}",
              flush=True)
    print(f"DMVAE ({args.epochs} ep, segmented) in {time.time()-t0:.0f}s",
          flush=True)

    zc_tr, zp_tr = embed_dataset_chunked(model, state_p, xs_tr, state_m)
    zc_te, zp_te = embed_dataset_chunked(model, state_p, xs_te, state_m)

    def ridge_acc(Xf, yf, Xe, ye, lam=1e-3):
        Xf = np.concatenate([np.asarray(Xf), np.ones((len(Xf), 1))], 1)
        Xe = np.concatenate([np.asarray(Xe), np.ones((len(Xe), 1))], 1)
        Y = np.eye(num_classes)[np.asarray(yf)]
        W = np.linalg.solve(Xf.T @ Xf + lam * np.eye(Xf.shape[1]), Xf.T @ Y)
        return float((np.argmax(Xe @ W, 1) == np.asarray(ye)).mean())

    ridge_zc = ridge_acc(zc_tr, y_tr, zc_te, y_te)
    ridge_raw0 = ridge_acc(
        np.asarray(xs_tr[0]).reshape(n, -1), y_tr,
        np.asarray(xs_te[0]).reshape(len(y_te), -1), y_te, lam=1e-1)
    print(f"ridge control: zc {ridge_zc:.4f} vs raw view[0] {ridge_raw0:.4f}",
          flush=True)

    task = build_probe_task(
        rng=keys[3], num_modalities=3, num_classes=num_classes,
        input_dim=200, hidden_dim=(128,), lr=3e-4, dropout=0.1,
        annealing_start=50, aggregation="cml", fused=1.0,
        num_epochs=args.probe_epochs)
    res_p = train(
        rng=keys[9], params=task.params, loss_fn=task.loss_fn,
        data={"zc": zc_tr, "zp": zp_tr, "y": y_tr}, n_train=n,
        optimizer=task.optimizer, epochs=args.probe_epochs, batch_size=64,
        drop_last=False, val_fn=task.val_fn,
        val_data={"zc": zc_te, "zp": zp_te, "y": y_te})
    va = np.asarray(res_p.val_acc)
    print(f"probe: final {va[-1]:.4f}, peak {va.max():.4f} "
          f"@ep{int(va.argmax())}", flush=True)

    chance = 1.0 / num_classes
    out = {
        "data_path": args.data_path,
        "num_classes": int(num_classes),
        "chance": chance,
        "dmvae_epochs": args.epochs,
        "segment": args.segment,
        "probe_epochs": args.probe_epochs,
        "feat_norm_init": float(fn0),
        "zc_std_init": float(zs0),
        "feat_norm_trajectory": feat_norms,
        "zc_std_trajectory": zc_stds,
        "dmvae_loss_trajectory": losses,
        "ridge_on_zc": ridge_zc,
        "ridge_on_raw_view0": ridge_raw0,
        "probe_accuracy_final": float(va[-1]),
        "probe_accuracy_trace": [float(a) for a in va],
        "collapse_confirmed": bool(
            va[-1] < chance + 0.15 and ridge_zc < chance + 0.15
            and feat_norms[-1] < 0.1 * float(fn0)),
    }
    Path("results").mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
