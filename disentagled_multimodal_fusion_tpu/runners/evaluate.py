"""Evaluate a saved checkpoint without retraining.

The reference records checkpoint paths in its result rows (run.py:256,326)
but ships no loader; this CLI completes that story across ALL three
drivers: it replays the seeded split for a dataset (.mat registry, LUMA,
or the synthetic generator), rebuilds the matching task, restores the
Orbax checkpoint (+ the ``_state`` BatchNorm-stats sidecar when the model
has one), and prints the subjective-model evaluation as JSON.

Checkpoint naming note: the systematic names carry the reference's own
``{name}_fusion_ds...`` pattern (run.py:223), which doubles the suffix for
the LateFusion baselines (``cml_fusion_fusion_ds...``) — kept verbatim for
parity with the reference's checkpoint layout, not a bug.

Examples:
  python -m disentagled_multimodal_fusion_tpu.runners.evaluate \
      --model cml_fusion --dataset HandWritten --seed 0
  python -m disentagled_multimodal_fusion_tpu.runners.evaluate \
      --model dmvae_cml --dataset CUB --seed 1 --condition conflict
  python -m disentagled_multimodal_fusion_tpu.runners.evaluate \
      --model avg_fusion --dataset PIE --seed 0 --condition noise
  python -m disentagled_multimodal_fusion_tpu.runners.evaluate \
      --model dmvae_cml --dataset LUMA --seed 0 --data-path data/luma_compiled
  python -m disentagled_multimodal_fusion_tpu.runners.evaluate \
      --model dmvae_cml --dataset synthetic --seed 0 --dep 50
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..core.setup import configure

MODELS = ["dmvae_dis", "dmvae_cml", "dmvae_joint", "dbf_fusion", "cml_fusion", "avg_fusion"]
# synthetic driver trains only these three (run_synthetic.py:139-229)
SYNTH_MODELS = {"dmvae_cml", "cml_fusion", "avg_fusion"}


def _restore_state(ckpt: str, target):
    """Restore the optional BatchNorm-stats sidecar saved at <ckpt>_state."""
    from ..core.checkpoint import restore_checkpoint

    if target is None:
        return None
    path = ckpt + "_state"
    if not Path(path).exists():
        return target  # stateless checkpoint era / stateless model
    return restore_checkpoint(path, target)


def _eval_mat(args, C):
    """.mat sweep checkpoints (run.py), all three conditions."""
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

    seed, name, cond = args.seed, args.model, args.condition

    # replay the split exactly as run.py does (legacy global np.random
    # stream, reference-identical)
    np.random.seed(seed)
    dataset = DATASET_REGISTRY[args.dataset]()
    idx = np.arange(len(dataset))
    np.random.shuffle(idx)
    n_tr = int(C("data.split.train_frac", 0.8) * len(dataset))
    test_idx = idx[n_tr:]
    if cond != "normal":
        pp = C("data.conflict", {}) or {}
        dataset.postprocessing(
            test_idx,
            addNoise=(cond == "noise") or pp.get("addNoise", False),
            sigma=pp.get("sigma", 0.5),
            ratio_noise=1.0 if cond == "noise" else pp.get("ratio_noise", 0.0),
            addConflict=(cond == "conflict") and pp.get("addConflict", True),
            ratio_conflict=pp.get("ratio_conflict", 1.0), rng=None,
        )
    views, labels = dataset.arrays()
    xs_te = tuple(jnp.asarray(v[test_idx]) for v in views)
    y_te = jnp.asarray(labels[test_idx])
    dims = [int(d[0]) for d in dataset.dims]
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    lr = C("optim.dataset_lr", {}).get(args.dataset, 3e-3)

    suffix = {"normal": "", "conflict": "_conflict", "noise": "_noise"}[cond]
    ckpt = args.checkpoint or (
        f"checkpoints/{name}_fusion_ds{args.dataset}_seed{seed}{suffix}"
    )

    if name.startswith("dmvae_"):
        model, dmvae_p0, _, _, _ = build_dmvae_task(
            rng=jax.random.PRNGKey(0), xs_sample=xs_te, output_dim=dims,
            a=C("dmvae.a", 1e-5), hidden_dim=C("dmvae.hidden_dim", 512),
            embed_dim=C("dmvae.embed_dim", 200),
            fused_modalities=not args.no_fused_dmvae,
        )
        dmvae_ckpt = args.dmvae_checkpoint or (
            f"checkpoints/dmvae_dataset{args.dataset}_seed{seed}_a1e-05_{cond}"
        )
        dmvae_params = restore_checkpoint(dmvae_ckpt, dmvae_p0)
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
    ms = _restore_state(ckpt, task.model_state)
    if name == "dmvae_dis":
        return evaluate_subjective_model(task, params, data, ms)
    return evaluate_subjective_model_with_shared(task, params, data, ms)


def _eval_luma(args, _C):
    """LUMA checkpoints (run_luma.py): rebuild the featurized corpus and
    the real Audio/Text/Image-encoder tasks, restore params + state."""
    import jax
    import jax.numpy as jnp

    from ..core.checkpoint import restore_checkpoint
    from ..core.tasks import (
        build_disentangled_probe_task,
        build_dmvae_task,
        build_late_fusion_task,
        build_probe_task,
        embed_dataset_chunked,
    )
    from ..data.luma import get_luma_arrays
    from ..eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )
    from ..models.layers import AudioEncoder, ImageEncoder, TextEncoder
    from .common import load_config, make_getter

    C = make_getter(load_config("luma_config.yaml"))
    seed, name = args.seed, args.model
    data_path = args.data_path or C("data.luma_path", "data/luma_compiled")
    enc_out = 200
    luma_lr = C("optim.luma_lr", 3e-4)
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    probe_dropout = C("probes.dropout_p", 0.1)

    audio_cfg = {
        "sample_rate": C("data.audio.sample_rate", 16000),
        "max_length": C("data.audio.max_length", 3.0),
        "n_mfcc": C("data.audio.n_mfcc", 40),
        "use_mfcc": C("data.audio.use_mfcc", True),
        "use_2d": args.use_2d or C("data.audio.use_2d", False),
    }
    text_cfg = {
        "max_length": C("data.text.max_length", 128),
        "model_name": C("data.text.model_name", "bert-base-uncased"),
        "use_pretrained": C("data.text.use_pretrained", True),
    }
    image_cfg = {
        "size": tuple(C("data.image.size", (32, 32))),
        "normalize": C("data.image.normalize", True),
    }
    _, _, xs_te_np, y_te_np, num_classes, _, _ = get_luma_arrays(
        data_path, audio_cfg, text_cfg, image_cfg,
        replicate_image_bug=args.replicate_image_bug,
    )
    xs_te = tuple(jnp.asarray(x) for x in xs_te_np)
    y_te = jnp.asarray(y_te_np)
    view_shapes = [tuple(x.shape[1:]) for x in xs_te_np]

    def encoders():
        return (
            AudioEncoder(input_dim=audio_cfg["n_mfcc"], output_dim=enc_out,
                         dropout=0.1, use_2d=audio_cfg["use_2d"]),
            TextEncoder(input_dim=text_cfg["max_length"], output_dim=enc_out,
                        dropout=0.1),
            ImageEncoder(output_dim=enc_out, dropout=0.1),
        )

    ckpt = args.checkpoint or f"checkpoints/{name}_fusion_dsLUMA_seed{seed}"

    if name.startswith("dmvae_"):
        model, dmvae_p0, _, _, bstats0 = build_dmvae_task(
            rng=jax.random.PRNGKey(seed), xs_sample=xs_te,
            output_dim=[enc_out] * 3, a=C("dmvae.a", 1e-5),
            hidden_dim=C("dmvae.hidden_dim", 512),
            embed_dim=C("dmvae.embed_dim", 200),
            feature_encoders=encoders(),
            fused_modalities=not args.no_fused_dmvae,
        )
        dmvae_ckpt = args.dmvae_checkpoint or (
            f"checkpoints/dmvae_datasetLUMA_seed{seed}_a1e-05_normal"
        )
        dmvae_params = restore_checkpoint(dmvae_ckpt, dmvae_p0)
        dmvae_state = _restore_state(dmvae_ckpt, bstats0)
        zc, zp = embed_dataset_chunked(model, dmvae_params, xs_te, dmvae_state)
        data = {"zc": zc, "zp": zp, "y": y_te}
        kw = dict(
            rng=jax.random.PRNGKey(0), num_modalities=3,
            num_classes=num_classes, input_dim=C("probes.input_dim", 200),
            hidden_dim=probe_hidden, lr=luma_lr, dropout=probe_dropout,
        )
        if name == "dmvae_dis":
            task = build_disentangled_probe_task(**kw)
        else:
            task = build_probe_task(aggregation=name.split("_")[1], **kw)
    else:
        task = build_late_fusion_task(
            rng=jax.random.PRNGKey(0), output_dims=[enc_out] * 3,
            num_classes=num_classes, hidden_dim=probe_hidden,
            dropout=probe_dropout, lr=luma_lr,
            aggregation=name.split("_")[0],
            feature_encoders=encoders(), input_dims=view_shapes,
        )
        data = {"xs": xs_te, "y": y_te}

    params = restore_checkpoint(ckpt, task.params)
    ms = _restore_state(ckpt, task.model_state)
    if name == "dmvae_dis":
        return evaluate_subjective_model(task, params, data, ms)
    return evaluate_subjective_model_with_shared(task, params, data, ms)


def _eval_synthetic(args, _C):
    """Synthetic-driver checkpoints (run_synthetic.py naming:
    dmvae_fusion_seed{S}_dep{D} / late_fusion_seed{S}_dep{D}_agg{A})."""
    import jax

    from ..core.checkpoint import restore_checkpoint
    from ..core.tasks import (
        build_dmvae_task,
        build_late_fusion_task,
        build_probe_task,
        embed_dataset,
    )
    from ..data.synthetic import make_simple_plus_splits
    from ..eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )
    from .common import load_config, make_getter

    C = make_getter(load_config("synthetic_config.yaml"))
    seed, name, dep = args.seed, args.model, args.dep
    if name not in SYNTH_MODELS:
        raise SystemExit(
            f"the synthetic driver trains only {sorted(SYNTH_MODELS)} "
            f"(run_synthetic.py protocol); got {name}"
        )
    # replay the generator with the SAME preset knobs the driver trained
    # under (run_synthetic.py:74-101)
    pre = f"data.common_{args.preset}"
    common = dict(
        n_samples=C(f"{pre}.n_samples", 10000),
        d_signal=C(f"{pre}.d_signal", 16),
        d_spurious=C(f"{pre}.d_spurious", 16),
        alpha_shared=C(f"{pre}.alpha_shared", 0.7),
        beta_specific=C(f"{pre}.beta_specific", 0.6),
        class_sep_shared=C(f"{pre}.class_sep_shared", 1.1),
        class_sep_private=C(f"{pre}.class_sep_private", 0.9),
        noise_std=C(f"{pre}.noise_std", 0.7),
        hetero_noise=C(f"{pre}.hetero_noise", True),
        hetero_scale=C(f"{pre}.hetero_scale", 0.4),
        nonlinear_shared=C(f"{pre}.nonlinear_shared", True),
        nonlinear_specific=C(f"{pre}.nonlinear_specific", False),
        conflict_frac=C(f"{pre}.conflict_frac", 0.4),
        conflict_strength=C(f"{pre}.conflict_strength", 0.7),
    )
    if args.quick:
        common["n_samples"] = 1000
    rho = dep / 100.0
    _, _, (v_va, y_va) = make_simple_plus_splits(
        batch_size=128, seed=seed, rho=rho, shared_class_frac=rho, **common,
    )
    import jax.numpy as jnp

    xs_va = tuple(jnp.asarray(v) for v in v_va)
    y_va_j = jnp.asarray(y_va)
    view_dims = [v.shape[1] for v in v_va]

    if name == "dmvae_cml":
        model, dmvae_p0, _, _, _ = build_dmvae_task(
            rng=jax.random.PRNGKey(seed), xs_sample=xs_va,
            output_dim=view_dims, a=C("dmvae.a", 1e-5),
            hidden_dim=C("dmvae.hidden_dim", 512),
            embed_dim=C("dmvae.embed_dim", 16),
            fused_modalities=not args.no_fused_dmvae,
        )
        dmvae_ckpt = args.dmvae_checkpoint or f"checkpoints/dmvae_seed{seed}_dep{dep}"
        dmvae_params = restore_checkpoint(dmvae_ckpt, dmvae_p0)
        zc, zp = embed_dataset(model, dmvae_params, xs_va)
        data = {"zc": zc, "zp": zp, "y": y_va_j}
        shared_dim = C("dmvae.embed_dim", 16)  # run_synthetic.py:263
        task = build_probe_task(
            rng=jax.random.PRNGKey(0), num_modalities=2,
            num_classes=C("dmvae_fusion.num_classes", 3),
            input_dim=C("dmvae_fusion.input_dim", 16),
            hidden_dim=tuple(C("dmvae_fusion.hidden_dim", (128,))),
            lr=C("dmvae_fusion.lr", 3e-4),
            dropout=C("dmvae_fusion.dropout", 0.1),
            aggregation=C("dmvae_fusion.aggregation", "cml"), fused=0.0,
            shared_input_dim=shared_dim,
        )
        ckpt = args.checkpoint or f"checkpoints/dmvae_fusion_seed{seed}_dep{dep}"
        params = restore_checkpoint(ckpt, task.params)
        return evaluate_subjective_model_with_shared(task, params, data)

    agg = name.split("_")[0]
    task = build_late_fusion_task(
        rng=jax.random.PRNGKey(0), output_dims=view_dims,
        num_classes=C("latefusion.num_classes", 3),
        hidden_dim=tuple(C("latefusion.hidden_dim", (128,))),
        dropout=C("latefusion.dropout", 0.1), lr=C("latefusion.lr", 3e-4),
        aggregation=agg, fused=0.0,
    )
    ckpt = args.checkpoint or f"checkpoints/late_fusion_seed{seed}_dep{dep}_agg{agg}"
    params = restore_checkpoint(ckpt, task.params)
    return evaluate_subjective_model(task, params, {"xs": xs_va, "y": y_va_j})


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--model", choices=MODELS, required=True)
    parser.add_argument("--dataset", required=True,
                        help=".mat registry name | LUMA | synthetic")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--condition", choices=["normal", "conflict", "noise"],
                        default="normal")
    parser.add_argument("--conflict", action="store_true",
                        help="alias for --condition conflict")
    parser.add_argument("--dep", type=int, default=50,
                        help="synthetic dependence knob (synthetic only)")
    parser.add_argument("--preset", choices=["easy", "med", "hard"], default="med",
                        help="synthetic difficulty preset the checkpoint "
                             "was trained under (synthetic only)")
    parser.add_argument("--quick", action="store_true",
                        help="checkpoint came from a --quick run "
                             "(synthetic only: n_samples=1000)")
    parser.add_argument("--data-path", default=None,
                        help="compiled LUMA corpus path (LUMA only)")
    parser.add_argument("--use-2d", action="store_true",
                        help="checkpoint was trained with run_luma --use-2d "
                             "(2D-spectrogram audio; LUMA only)")
    parser.add_argument("--replicate-image-bug", action="store_true",
                        help="checkpoint was trained with run_luma "
                             "--replicate-image-bug (LUMA only)")
    parser.add_argument("--checkpoint", default=None,
                        help="override the systematic checkpoint path")
    parser.add_argument("--dmvae-checkpoint", default=None)
    parser.add_argument("--no-fused-dmvae", action="store_true")
    args = parser.parse_args(argv)
    if args.conflict:
        args.condition = "conflict"

    configure()
    from .common import load_config, make_getter

    C = make_getter(load_config("config.yaml"))
    if args.dataset == "LUMA":
        info = _eval_luma(args, C)
    elif args.dataset == "synthetic":
        info = _eval_synthetic(args, C)
    else:
        info = _eval_mat(args, C)
    print(json.dumps(info, indent=1, default=float))
    return info


if __name__ == "__main__":
    main()
