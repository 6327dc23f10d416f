"""Evaluate a saved checkpoint without retraining.

The reference records checkpoint paths in its result rows (run.py:256,326)
but ships no loader; this CLI completes that story: it replays the seeded
split for a dataset, rebuilds the matching task, restores the Orbax
checkpoint, and prints the subjective-model evaluation as JSON.

Examples:
  python -m disentagled_multimodal_fusion_tpu.runners.evaluate \
      --model cml_fusion --dataset HandWritten --seed 0
  python -m disentagled_multimodal_fusion_tpu.runners.evaluate \
      --model dmvae_cml --dataset CUB --seed 1 --conflict
"""

from __future__ import annotations

import argparse
import json

from ..core.setup import configure

MODELS = ["dmvae_dis", "dmvae_cml", "dmvae_joint", "dbf_fusion", "cml_fusion", "avg_fusion"]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=MODELS, required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--conflict", action="store_true")
    parser.add_argument("--checkpoint", default=None,
                        help="override the systematic checkpoint path")
    parser.add_argument("--dmvae-checkpoint", default=None)
    parser.add_argument("--no-fused-dmvae", action="store_true")
    args = parser.parse_args(argv)

    configure()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.checkpoint import restore_checkpoint
    from ..core.tasks import (
        build_disentangled_probe_task,
        build_dmvae_task,
        build_late_fusion_task,
        build_probe_task,
        embed_dataset_chunked,
    )
    from ..data.multiview import DATASET_REGISTRY
    from ..eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )
    from .common import load_config, make_getter

    C = make_getter(load_config("config.yaml"))
    seed, name, cond = args.seed, args.model, ("conflict" if args.conflict else "normal")

    # replay the split exactly as run.py does (legacy global np.random
    # stream, reference-identical)
    np.random.seed(seed)
    dataset = DATASET_REGISTRY[args.dataset]()
    idx = np.arange(len(dataset))
    np.random.shuffle(idx)
    n_tr = int(C("data.split.train_frac", 0.8) * len(dataset))
    test_idx = idx[n_tr:]
    if args.conflict:
        pp = C("data.conflict", {}) or {}
        dataset.postprocessing(
            test_idx, addNoise=pp.get("addNoise", False), sigma=pp.get("sigma", 0.5),
            ratio_noise=pp.get("ratio_noise", 0.0),
            addConflict=pp.get("addConflict", True),
            ratio_conflict=pp.get("ratio_conflict", 1.0), rng=None,
        )
    views, labels = dataset.arrays()
    xs_te = tuple(jnp.asarray(v[test_idx]) for v in views)
    y_te = jnp.asarray(labels[test_idx])
    dims = [int(d[0]) for d in dataset.dims]
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    lr = C("optim.dataset_lr", {}).get(args.dataset, 3e-3)

    ckpt = args.checkpoint or (
        f"checkpoints/{name}_fusion_ds{args.dataset}_seed{seed}"
        + ("_conflict" if args.conflict else "")
    )

    if name.startswith("dmvae_"):
        model, _, _, _, _ = build_dmvae_task(
            rng=jax.random.PRNGKey(0), xs_sample=xs_te, output_dim=dims,
            a=C("dmvae.a", 1e-5), hidden_dim=C("dmvae.hidden_dim", 512),
            embed_dim=C("dmvae.embed_dim", 200),
            fused_modalities=not args.no_fused_dmvae,
        )
        dmvae_ckpt = args.dmvae_checkpoint or (
            f"checkpoints/dmvae_dataset{args.dataset}_seed{seed}_a1e-05_{cond}"
        )
        dmvae_params = restore_checkpoint(
            dmvae_ckpt,
            build_dmvae_task(
                rng=jax.random.PRNGKey(0), xs_sample=xs_te, output_dim=dims,
                a=C("dmvae.a", 1e-5), hidden_dim=C("dmvae.hidden_dim", 512),
                embed_dim=C("dmvae.embed_dim", 200),
                fused_modalities=not args.no_fused_dmvae,
            )[1],
        )
        zc, zp = embed_dataset_chunked(model, dmvae_params, xs_te)
        data = {"zc": zc, "zp": zp, "y": y_te}
        if name == "dmvae_dis":
            task = build_disentangled_probe_task(
                rng=jax.random.PRNGKey(0), num_modalities=len(dims),
                num_classes=dataset.num_classes,
                input_dim=C("probes.input_dim", 200), hidden_dim=probe_hidden,
                lr=lr, dropout=C("probes.dropout_p", 0.1),
            )
        else:
            task = build_probe_task(
                rng=jax.random.PRNGKey(0), num_modalities=len(dims),
                num_classes=dataset.num_classes,
                input_dim=C("probes.input_dim", 200), hidden_dim=probe_hidden,
                lr=lr, dropout=C("probes.dropout_p", 0.1),
                aggregation=name.split("_")[1],
            )
    else:
        task = build_late_fusion_task(
            rng=jax.random.PRNGKey(0), output_dims=dims,
            num_classes=dataset.num_classes, hidden_dim=probe_hidden,
            dropout=C("probes.dropout_p", 0.1), lr=lr,
            aggregation=name.split("_")[0],
        )
        data = {"xs": xs_te, "y": y_te}

    params = restore_checkpoint(ckpt, task.params)
    if name == "dmvae_dis":
        info = evaluate_subjective_model(task, params, data)
    else:
        info = evaluate_subjective_model_with_shared(task, params, data)
    print(json.dumps(info, indent=1, default=float))
    return info


if __name__ == "__main__":
    main()
