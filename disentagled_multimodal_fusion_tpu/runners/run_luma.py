"""LUMA 3-modality protocol: DMVAE + six probe/baseline models.

Reference semantics: run_luma.py:149-358. Per seed: load the compiled LUMA
corpus (featurized offline — see data/luma.py), train the DMVAE with real
Audio/Text/Image feature encoders (run_luma.py:199-203), then the six-model
loop (dmvae_dis / dmvae_cml / dmvae_joint / dbf / cml / avg), evaluate, and
write logs/luma_analysis.xlsx (+ CSV mirrors). Epoch counts default to the
reference's hardcoded debug values (DMVAE 3, probes 2) but are configurable.

Documented deviations (both reference defects, see data/luma.py docstring):
  * images are real (image_idx bug fixed) unless --replicate-image-bug;
  * LateFusion heads are sized to the feature-encoder output (200), where
    the reference passes raw view dims that cannot run
    (run_luma.py:131-140 + baselines.py:23-25 with real encoders).
"""

from __future__ import annotations

import argparse
import time

from ..core.setup import configure


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seeds", type=int, nargs="*", default=None)
    parser.add_argument("--data-path", type=str, default=None)
    parser.add_argument("--replicate-image-bug", action="store_true")
    parser.add_argument("--use-ood", action="store_true",
                        help="include the 8 OOD classes (reference knob "
                             "dataset_luma.py:56,173; disabled there too)")
    parser.add_argument("--ood-eval", action="store_true",
                        help="after each model, score the held-out OOD "
                             "classes' test rows by evidential uncertainty "
                             "and report OOD-vs-ID AUROC (eval/ood.py; NEW "
                             "capability — the reference ships OOD classes "
                             "but never evaluates them). OOD classes come "
                             "from the metadata.yaml 'ood_classes' list "
                             "when present, else the alphabetical TAIL "
                             "beyond num_classes is assumed OOD")
    parser.add_argument("--use-2d", action="store_true",
                        help="2D-spectrogram audio path: featurize full "
                             "(n_mfcc, frames) MFCC maps and run the "
                             "AudioEncoder conv branch (reference "
                             "classifiers.py:155-217, latent there — "
                             "run_luma.py never sets it); equivalent to "
                             "data.audio.use_2d: true in luma_config.yaml")
    parser.add_argument("--dmvae-epochs", type=int, default=None)
    parser.add_argument("--probe-epochs", type=int, default=None)
    parser.add_argument("--vmap-seeds", action="store_true",
                        help="train all seeds as one vmapped program per "
                             "model type (LUMA data is shared across seeds "
                             "via data_broadcast)")
    parser.add_argument("--no-fused-dmvae", action="store_true",
                        help="use the unfused per-modality DMVAE")
    parser.add_argument("--segment-epochs", type=int, default=None,
                        help="split vmapped trainings into exact-resume "
                             "segments of this many epochs (keeps single "
                             "device executions short)")
    parser.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default="float32",
        help="matmul compute dtype (params/losses stay f32; bfloat16 runs "
             "the encoder/decoder/head matmuls — including the LUMA image "
             "CNN, the one compute-dense stack here — on the MXU in bf16; "
             "also the relay-safe --vmap-seeds mode, see runners/common.py)",
    )
    parser.add_argument(
        "--include-intermediate", action="store_true",
        help="also sweep the IntermediateFusion baseline (concat -> single "
             "evidential head on the LUMA feature encoders; reference "
             "baselines.py:153-252, defined there but never swept)",
    )
    parser.add_argument(
        "--intermediate-fusion", type=str, nargs="*", default=None,
        metavar="NAME",
        help="sweep IntermediateFusion with these library fusion ops "
             "(models/fusions.py INTERMEDIATE_FUSIONS, e.g. lrtf mi3 "
             "concat_linear; 'concat' is the reference's choice and is what "
             "--include-intermediate adds); view-count-incompatible fusions "
             "are skipped with a warning. With --ood-eval each intermediate "
             "model also gets an OOD-vs-ID AUROC row",
    )
    parser.add_argument("--rows-file", default=None, metavar="PATH",
                        help="crash-resilient protocol: result rows are "
                             "checkpointed to PATH after every seed; on "
                             "restart, completed seeds are skipped (same "
                             "contract as run.py --rows-file; in "
                             "--vmap-seeds mode the whole block is skipped "
                             "only when every seed is complete)")
    from .common import (
        add_force_vmap_flag, add_mesh_args, build_runner_mesh, guard_vmap_seeds,
    )
    add_mesh_args(parser)
    add_force_vmap_flag(parser)
    args = parser.parse_args(argv)
    if args.use_ood and args.ood_eval:
        parser.error("--use-ood trains on ALL classes, leaving no held-out "
                     "set for --ood-eval; pick one")

    configure()
    import jax
    import jax.numpy as jnp
    import numpy as np

    mesh = build_runner_mesh(args.data_parallel, args.model_parallel)

    from ..core.checkpoint import save_checkpoint
    from ..core.logging import log_training_csv
    from ..core.tasks import (
        build_disentangled_probe_task,
        build_dmvae_task,
        build_intermediate_fusion_task,
        build_late_fusion_task,
        build_probe_task,
        embed_dataset_chunked,
    )
    from ..models.fusions import INTERMEDIATE_FUSIONS, build_fusion

    ifusions = list(args.intermediate_fusion or [])
    unknown = [f for f in ifusions if f not in INTERMEDIATE_FUSIONS]
    if unknown:
        parser.error(f"unknown --intermediate-fusion {unknown}; "
                     f"supported: {INTERMEDIATE_FUSIONS}")
    if args.include_intermediate and "concat" not in ifusions:
        ifusions.insert(0, "concat")
    if args.dtype != "float32":
        from functools import partial

        build_dmvae_task = partial(build_dmvae_task, dtype=args.dtype)
        build_probe_task = partial(build_probe_task, dtype=args.dtype)
        build_disentangled_probe_task = partial(
            build_disentangled_probe_task, dtype=args.dtype
        )
        build_late_fusion_task = partial(build_late_fusion_task, dtype=args.dtype)
        build_intermediate_fusion_task = partial(
            build_intermediate_fusion_task, dtype=args.dtype
        )
    from ..core.train import train, train_many
    from ..data.luma import get_luma_arrays, get_luma_ood_arrays
    from ..eval.analysis import (
        _task_evidences,
        build_metrics_dataframe_datasets,
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )
    from ..eval.ood import evaluate_ood
    from ..models.layers import AudioEncoder, ImageEncoder, TextEncoder
    from .common import load_config, main_columns, make_getter, write_report

    C = make_getter(load_config("luma_config.yaml"))
    seeds = args.seeds if args.seeds is not None else C("experiment.seeds", [0, 1, 2, 3, 4])
    data_path = args.data_path or C("data.luma_path", "data/luma_compiled")
    batch_size = C("dataloader.batch_size", 64)
    luma_lr = C("optim.luma_lr", 3e-4)
    dmvae_epochs = (args.dmvae_epochs if args.dmvae_epochs is not None
                    else C("dmvae.num_epochs", 3))
    probe_epochs = (args.probe_epochs if args.probe_epochs is not None
                    else C("probes.model_epochs", 2))
    embed_dim = C("dmvae.embed_dim", 200)
    probe_input_dim = C("probes.input_dim", 200)
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    probe_dropout = C("probes.dropout_p", 0.1)
    annealing_start = C("probes.annealing_start", 50)
    enc_out = 200  # AudioEncoder/TextEncoder/ImageEncoder output_dim

    audio_cfg = {
        "sample_rate": C("data.audio.sample_rate", 16000),
        "max_length": C("data.audio.max_length", 3.0),
        "n_mfcc": C("data.audio.n_mfcc", 40),
        "use_mfcc": C("data.audio.use_mfcc", True),
        # reference classifiers.py:149 use_2d — 2D-spectrogram conv branch
        # (latent in the reference: run_luma.py never sets it)
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

    xs_tr_np, y_tr_np, xs_te_np, y_te_np, num_classes, num_views, dims = get_luma_arrays(
        data_path, audio_cfg, text_cfg, image_cfg,
        replicate_image_bug=args.replicate_image_bug, use_ood=args.use_ood,
    )
    print(f"LUMA: {len(y_tr_np)} train / {len(y_te_np)} test, "
          f"{num_classes} classes, dims {[int(d[0]) for d in dims]}", flush=True)

    xs_tr = tuple(jnp.asarray(x) for x in xs_tr_np)
    xs_te = tuple(jnp.asarray(x) for x in xs_te_np)
    y_tr, y_te = jnp.asarray(y_tr_np), jnp.asarray(y_te_np)
    n_train = len(y_tr_np)
    # per-view feature shapes for encoder init (audio is a 2D
    # (n_mfcc, frames) map when data.audio.use_2d is set)
    view_shapes = [tuple(x.shape[1:]) for x in xs_tr_np]

    xs_ood = None
    if args.ood_eval:
        xs_ood_np, y_ood_np, _n_id = get_luma_ood_arrays(
            data_path, audio_cfg, text_cfg, image_cfg,
            replicate_image_bug=args.replicate_image_bug,
        )
        if len(y_ood_np) == 0:
            print("--ood-eval: corpus declares no held-out OOD classes; "
                  "skipping OOD scoring", flush=True)
        else:
            xs_ood = tuple(jnp.asarray(x) for x in xs_ood_np)
            # labels are outside the ID head range; evidences ignore y
            y_ood = jnp.zeros(len(y_ood_np), y_tr.dtype)
            print(f"OOD eval: {len(y_ood_np)} held-out rows from "
                  f"{len(np.unique(y_ood_np))} OOD classes", flush=True)
    def ood_info(task, params, ms, id_data, ood_data):
        """OOD-vs-ID AUROC from fused evidential uncertainty."""
        ev_id = task.aggregation(_task_evidences(task, params, id_data, ms))
        ev_ood = task.aggregation(_task_evidences(task, params, ood_data, ms))
        return evaluate_ood(np.asarray(ev_id), np.asarray(ev_ood), num_classes)

    def encoders():
        # run_luma.py:199-203
        return (
            AudioEncoder(input_dim=audio_cfg["n_mfcc"], output_dim=enc_out,
                         dropout=0.1, use_2d=audio_cfg["use_2d"]),
            TextEncoder(input_dim=text_cfg["max_length"], output_dim=enc_out, dropout=0.1),
            ImageEncoder(output_dim=enc_out, dropout=0.1),
        )

    # IntermediateFusion jobs (reference baselines.py:153-252 on the LUMA
    # encoders): view-count/size-incompatible fusions become skip markers
    # that satisfy the --rows-file completeness count (run.py contract)
    # and are stripped from reports
    inter_jobs, inter_skipped = [], {}
    for fname in ifusions:
        jname = ("intermediate_fusion" if fname == "concat"
                 else f"intermediate_{fname}")
        try:
            build_fusion(fname, tuple([enc_out] * 3))
        except ValueError as e:
            print(f"  [LUMA] skipping {jname}: {e}", flush=True)
            inter_skipped[jname] = {"skipped": str(e)}
            continue
        inter_jobs.append((jname, fname))

    def imf_builder(fname):
        def b(k):
            return build_intermediate_fusion_task(
                rng=k, output_dims=[enc_out] * 3, num_classes=num_classes,
                dropout=probe_dropout, lr=luma_lr,
                annealing_start=annealing_start, fusion=fname,
                feature_encoders=encoders(), input_dims=view_shapes,
            )
        return b

    rows = {}
    t_start = time.time()

    # ---- crash-resilient rows checkpoint (--rows-file), run.py contract ----
    import json as _json
    from pathlib import Path as _Path

    n_models = 6 + len(ifusions)

    def _seed_complete(s):
        return len(rows.get(s, {}).get("Normal", {}).get("LUMA", {})) >= n_models

    if args.rows_file and _Path(args.rows_file).exists():
        saved = _json.loads(_Path(args.rows_file).read_text())
        rows = {int(s): conds for s, conds in saved.items()}
        done = [s for s in seeds if _seed_complete(s)]
        print(f"--rows-file: resuming; {len(done)} completed seed(s) found "
              f"{done}", flush=True)

    def _save_rows():
        if not args.rows_file:
            return
        from ..core.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # rows carry checkpoint paths — make them durable
        tmp = _Path(args.rows_file).with_suffix(".tmp")
        tmp.write_text(_json.dumps(rows))
        tmp.replace(args.rows_file)

    # axon-relay safety guard (see runners/common.py:vmap_seeds_unsafe)
    args.vmap_seeds = guard_vmap_seeds(args, len(seeds), args.dtype)
    if args.vmap_seeds and len(seeds) > 1 and all(_seed_complete(s) for s in seeds):
        print("--rows-file: every seed complete, skipping training", flush=True)
        seeds_to_loop = []
    elif args.vmap_seeds and len(seeds) > 1:
        # ---- all seeds as one vmapped program per model type; the LUMA
        # corpus is shared across seeds via data_broadcast ----
        t0 = time.time()
        for s in seeds:
            rows[s] = {"Normal": {"LUMA": dict(inter_skipped)}}
        stack = lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
        seed_keys = [jax.random.PRNGKey(s) for s in seeds]
        keyrows = [jax.random.split(k, 16) for k in seed_keys]

        dm = [
            build_dmvae_task(
                rng=kr[0], xs_sample=xs_tr, output_dim=[enc_out] * 3,
                dropout=C("dmvae.dropout", 0.0), a=C("dmvae.a", 1e-5),
                hidden_dim=C("dmvae.hidden_dim", 512), embed_dim=embed_dim,
                lr=C("dmvae.lr", 1e-4), num_epochs=dmvae_epochs,
                feature_encoders=encoders(),
                fused_modalities=not args.no_fused_dmvae,
            )
            for kr in keyrows
        ]
        model, _, loss_fn, opt, _ = dm[0]
        params_stack = stack([t[1] for t in dm])
        bstats_stack = stack([t[4] for t in dm]) if dm[0][4] is not None else None
        res = train_many(
            rngs=jnp.stack([kr[1] for kr in keyrows]), params_stack=params_stack,
            loss_fn=loss_fn, data_stack={"xs": xs_tr}, n_train=n_train,
            optimizer=opt, epochs=dmvae_epochs, batch_size=batch_size,
            model_state_stack=bstats_stack, data_broadcast=True,
            segment_epochs=args.segment_epochs, mesh=mesh,
        )
        dmvae_params, dmvae_state = res.params, res.model_state
        for i, s in enumerate(seeds):
            ckpt = f"checkpoints/dmvae_datasetLUMA_seed{s}_a1e-05_normal"
            save_checkpoint(
                ckpt,
                jax.tree.map(lambda a: a[i], dmvae_params), {"dataset": "LUMA", "seed": s}, wait=False,)
            if dmvae_state is not None:
                # feature-encoder BatchNorm stats: without them a reload
                # (runners/evaluate.py) can't reproduce the evaluation
                save_checkpoint(
                    ckpt + "_state",
                    jax.tree.map(lambda a: a[i], dmvae_state),
                    {"dataset": "LUMA", "seed": s}, wait=False,)
        print(f"DMVAE x{len(seeds)} seeds trained ({time.time() - t0:.1f}s)", flush=True)

        # per-seed, row-chunked embedding: the image CNN's activations for
        # the whole corpus x 5 seeds would exceed HBM in one call
        def embed_all(xs):
            outs = [
                embed_dataset_chunked(
                    model,
                    jax.tree.map(lambda a: a[i], dmvae_params),
                    xs,
                    jax.tree.map(lambda a: a[i], dmvae_state)
                    if dmvae_state is not None else None,
                )
                for i in range(len(seeds))
            ]
            return (jnp.stack([o[0] for o in outs]), jnp.stack([o[1] for o in outs]))

        zc_tr, zp_tr = embed_all(xs_tr)
        zc_te, zp_te = embed_all(xs_te)
        probe_train = {"zc": zc_tr, "zp": zp_tr,
                       "y": jnp.broadcast_to(y_tr, (len(seeds),) + y_tr.shape)}
        probe_test = {"zc": zc_te, "zp": zp_te,
                      "y": jnp.broadcast_to(y_te, (len(seeds),) + y_te.shape)}
        lf_train = {"xs": xs_tr, "y": y_tr}
        lf_test = {"xs": xs_te, "y": y_te}
        probe_ood = lf_ood = None
        if xs_ood is not None:
            zc_o, zp_o = embed_all(xs_ood)
            probe_ood = {"zc": zc_o, "zp": zp_o,
                         "y": jnp.broadcast_to(y_ood, (len(seeds),) + y_ood.shape)}
            lf_ood = {"xs": xs_ood, "y": y_ood}

        def builders_for(j):
            if j == 0:
                return "dmvae_dis", lambda k: build_disentangled_probe_task(
                    rng=k, num_modalities=3, num_classes=num_classes,
                    input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=luma_lr,
                    dropout=probe_dropout, annealing_start=annealing_start,
                    num_epochs=probe_epochs), False
            if j in (1, 2):
                agg = ["cml", "joint"][j - 1]
                return f"dmvae_{agg}", lambda k: build_probe_task(
                    rng=k, num_modalities=3, num_classes=num_classes,
                    input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=luma_lr,
                    dropout=probe_dropout, annealing_start=annealing_start,
                    aggregation=agg, fused=1.0, num_epochs=probe_epochs), False
            if j < 6:
                agg = ["dbf", "cml", "avg"][j - 3]
                return f"{agg}_fusion", lambda k: build_late_fusion_task(
                    rng=k, output_dims=[enc_out] * 3, num_classes=num_classes,
                    hidden_dim=probe_hidden, dropout=probe_dropout, lr=luma_lr,
                    annealing_start=annealing_start, aggregation=agg, fused=1.0,
                    feature_encoders=encoders(),
                    input_dims=view_shapes), True
            jname, fname = inter_jobs[j - 6]
            return jname, imf_builder(fname), True

        for j in range(6 + len(inter_jobs)):
            name, builder, is_lf = builders_for(j)
            # base jobs keep their archived key slots (kr[2+j] init,
            # kr[10+j] train); intermediate jobs draw fresh streams from
            # the unused kr[8]/kr[9] slots via fold_in
            init_keys = ([kr[2 + j] for kr in keyrows] if j < 6 else
                         [jax.random.fold_in(kr[8], j) for kr in keyrows])
            tasks = [builder(k) for k in init_keys]
            task = tasks[0]
            p_stack = stack([t.params for t in tasks])
            ms_stack = (stack([t.model_state for t in tasks])
                        if task.model_state is not None else None)
            train_keys = ([kr[10 + j] for kr in keyrows] if j < 6 else
                          [jax.random.fold_in(kr[9], j) for kr in keyrows])
            res_m = train_many(
                rngs=jnp.stack(train_keys),
                params_stack=p_stack, loss_fn=task.loss_fn,
                data_stack=lf_train if is_lf else probe_train,
                n_train=n_train, optimizer=task.optimizer, epochs=probe_epochs,
                batch_size=batch_size, val_fn=task.val_fn,
                val_data_stack=lf_test if is_lf else probe_test,
                model_state_stack=ms_stack, data_broadcast=is_lf,
                segment_epochs=args.segment_epochs, mesh=mesh,
            )
            for i, s in enumerate(seeds):
                p_i = jax.tree.map(lambda a: a[i], res_m.params)
                ms_i = (jax.tree.map(lambda a: a[i], res_m.model_state)
                        if res_m.model_state is not None else None)
                te_i = (lf_test if is_lf
                        else jax.tree.map(lambda a: a[i], probe_test))
                # intermediate has ONE head -> per-view evaluator layout
                if name == "dmvae_dis" or name.startswith("intermediate"):
                    info = evaluate_subjective_model(task, p_i, te_i, ms_i)
                else:
                    info = evaluate_subjective_model_with_shared(task, p_i, te_i, ms_i)
                if xs_ood is not None:
                    od = lf_ood if is_lf else jax.tree.map(lambda a: a[i], probe_ood)
                    info["ood"] = ood_info(task, p_i, ms_i, te_i, od)
                info["path"] = save_checkpoint(
                    f"checkpoints/{name}_fusion_dsLUMA_seed{s}", p_i,
                    {"model": name, "dataset": "LUMA", "seed": s}, wait=False,)
                if ms_i is not None:
                    save_checkpoint(
                        f"checkpoints/{name}_fusion_dsLUMA_seed{s}_state", ms_i,
                        {"model": name, "dataset": "LUMA", "seed": s}, wait=False,)
                rows[s]["Normal"]["LUMA"][name] = info
            accs = [rows[s]["Normal"]["LUMA"][name]["fused"]["accuracy"] for s in seeds]
            import numpy as _np
            print(f"{name} x{len(seeds)}: fused_acc {_np.mean(accs):.4f} "
                  f"+/- {_np.std(accs):.4f}", flush=True)
        _save_rows()
        seeds_to_loop = []
    else:
        seeds_to_loop = seeds

    for seed in seeds_to_loop:
        if _seed_complete(seed):
            print(f"[seed {seed}] already complete (--rows-file), skipping",
                  flush=True)
            continue
        t0 = time.time()
        rows[seed] = {"Normal": {"LUMA": dict(inter_skipped)}}
        out = rows[seed]["Normal"]["LUMA"]
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, 16)

        model, params, loss_fn, opt, bstats = build_dmvae_task(
            rng=keys[0], xs_sample=xs_tr,
            output_dim=[enc_out] * 3,  # post-feature-encoder dims
            dropout=C("dmvae.dropout", 0.0), a=C("dmvae.a", 1e-5),
            hidden_dim=C("dmvae.hidden_dim", 512), embed_dim=embed_dim,
            lr=C("dmvae.lr", 1e-4), num_epochs=dmvae_epochs,
            feature_encoders=encoders(),
            fused_modalities=not args.no_fused_dmvae,
        )
        res = train(
            rng=keys[1], params=params, loss_fn=loss_fn, data={"xs": xs_tr},
            n_train=n_train, optimizer=opt, epochs=dmvae_epochs,
            batch_size=batch_size, drop_last=False, model_state=bstats,
            mesh=mesh, tp_hidden_dim=C("dmvae.hidden_dim", 512),
        )
        dmvae_params = res.params
        dmvae_state = res.model_state
        save_checkpoint(
            f"checkpoints/dmvae_datasetLUMA_seed{seed}_a1e-05_normal", dmvae_params,
            {"dataset": "LUMA", "seed": seed}, wait=False,)
        if dmvae_state is not None:
            save_checkpoint(
                f"checkpoints/dmvae_datasetLUMA_seed{seed}_a1e-05_normal_state",
                dmvae_state, {"dataset": "LUMA", "seed": seed}, wait=False,)
        print(f"[seed {seed}] DMVAE trained ({time.time() - t0:.1f}s)", flush=True)

        zc_tr, zp_tr = embed_dataset_chunked(model, dmvae_params, xs_tr, dmvae_state)
        zc_te, zp_te = embed_dataset_chunked(model, dmvae_params, xs_te, dmvae_state)
        probe_train = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
        probe_test = {"zc": zc_te, "zp": zp_te, "y": y_te}
        lf_train = {"xs": xs_tr, "y": y_tr}
        lf_test = {"xs": xs_te, "y": y_te}
        probe_ood = lf_ood = None
        if xs_ood is not None:
            zc_o, zp_o = embed_dataset_chunked(model, dmvae_params, xs_ood, dmvae_state)
            probe_ood = {"zc": zc_o, "zp": zp_o, "y": y_ood}
            lf_ood = {"xs": xs_ood, "y": y_ood}

        jobs = [(
            "dmvae_dis",
            build_disentangled_probe_task(
                rng=keys[2], num_modalities=3, num_classes=num_classes,
                input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=luma_lr,
                dropout=probe_dropout, annealing_start=annealing_start,
                num_epochs=probe_epochs,
            ), probe_train, probe_test,
        )]
        for agg, k in [("cml", keys[3]), ("joint", keys[4])]:
            jobs.append((
                f"dmvae_{agg}",
                build_probe_task(
                    rng=k, num_modalities=3, num_classes=num_classes,
                    input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=luma_lr,
                    dropout=probe_dropout, annealing_start=annealing_start,
                    aggregation=agg, fused=1.0, num_epochs=probe_epochs,
                ), probe_train, probe_test,
            ))
        for agg, k in [("dbf", keys[5]), ("cml", keys[6]), ("avg", keys[7])]:
            jobs.append((
                f"{agg}_fusion",
                build_late_fusion_task(
                    rng=k, output_dims=[enc_out] * 3, num_classes=num_classes,
                    hidden_dim=probe_hidden, dropout=probe_dropout, lr=luma_lr,
                    annealing_start=annealing_start, aggregation=agg, fused=1.0,
                    feature_encoders=encoders(),
                    input_dims=view_shapes,
                ), lf_train, lf_test,
            ))
        for jname, fname in inter_jobs:
            # concat keeps run.py's key convention (keys[15]); other
            # fusions fold their registry index into it
            k = (keys[15] if fname == "concat"
                 else jax.random.fold_in(keys[15], INTERMEDIATE_FUSIONS.index(fname)))
            jobs.append((jname, imf_builder(fname)(k), lf_train, lf_test))

        for i, (name, task, tr_d, te_d) in enumerate(jobs):
            # jobs beyond the historical 6 draw fresh train keys by fold_in
            # so the base models keep their archived streams
            train_rng = (keys[8 + i] if i < 6
                         else jax.random.fold_in(keys[8], 1000 + i))
            res_m = train(
                rng=train_rng, params=task.params, loss_fn=task.loss_fn,
                data=tr_d, n_train=n_train, optimizer=task.optimizer,
                epochs=probe_epochs, batch_size=batch_size, drop_last=False,
                val_fn=task.val_fn, val_data=te_d, model_state=task.model_state,
                mesh=mesh, tp_hidden_dim=probe_hidden[0],
            )
            # intermediate has ONE head -> per-view evaluator layout
            if name == "dmvae_dis" or name.startswith("intermediate"):
                info = evaluate_subjective_model(task, res_m.params, te_d, res_m.model_state)
            else:
                info = evaluate_subjective_model_with_shared(task, res_m.params, te_d, res_m.model_state)
            if xs_ood is not None:
                od = (lf_ood if name.endswith("_fusion")
                      or name.startswith("intermediate") else probe_ood)
                info["ood"] = ood_info(task, res_m.params, res_m.model_state, te_d, od)
            log_training_csv(f"{name}_fusion_dsLUMA_seed{seed}", res_m)
            path = save_checkpoint(
                f"checkpoints/{name}_fusion_dsLUMA_seed{seed}", res_m.params,
                {"model": name, "dataset": "LUMA", "seed": seed}, wait=False,)
            if res_m.model_state is not None:
                save_checkpoint(
                    f"checkpoints/{name}_fusion_dsLUMA_seed{seed}_state",
                    res_m.model_state,
                    {"model": name, "dataset": "LUMA", "seed": seed}, wait=False,)
            info["path"] = path
            out[name] = info
            print(f"[seed {seed}] {name}: fused_acc={info['fused']['accuracy']:.4f}", flush=True)
        _save_rows()
        print(f"[seed {seed}] done in {time.time() - t0:.1f}s", flush=True)

    # drop view-count-incompatible fusion skip markers ({"skipped": reason}
    # rows satisfy the --rows-file completeness count but carry no metrics)
    rows = {
        seed: {
            cond: {
                ds: {m: v for m, v in models.items()
                     if not (isinstance(v, dict) and "skipped" in v)}
                for ds, models in conds.items()
            }
            for cond, conds in by_cond.items()
        }
        for seed, by_cond in rows.items()
    }
    df = build_metrics_dataframe_datasets(rows)
    df["seed"] = df["seed"].astype(int)
    df_main = main_columns(df, ["seed", "type", "dataset", "model"])
    df_grouped = (
        df.groupby(["type", "dataset", "model"]).mean().reset_index()
        .sort_values(["type", "dataset", "model"])
    )
    df_main_grouped = (
        df_main.groupby(["type", "dataset", "model"]).mean().reset_index()
        .sort_values(["type", "dataset", "model"])
    )
    write_report(
        {"main_grouped": df_main_grouped, "all_results": df, "grouped_results": df_grouped},
        "logs/luma_analysis.xlsx",
    )
    # the per-model OOD table derives from the (possibly resumed) rows —
    # single source of truth, so a partial vmapped resume can't count a
    # completed seed twice (rebuild-then-retrain would have)
    ood_rows: dict = {}
    for s in seeds:
        for name, info in rows.get(s, {}).get("Normal", {}).get("LUMA", {}).items():
            if "ood" in info:
                ood_rows.setdefault(name, []).append(info["ood"])
    if ood_rows:
        import json

        from ..core.artifacts import artifact_path

        summary = {
            name: {
                k: float(np.mean([r[k] for r in rs]))
                for k in rs[0]
            }
            for name, rs in ood_rows.items()
        }
        ood_path = artifact_path("logs/luma_ood.json")
        ood_path.parent.mkdir(parents=True, exist_ok=True)
        ood_path.write_text(
            json.dumps({"mean": summary, "per_seed": ood_rows}, indent=1))
        for name, s in summary.items():
            print(f"OOD {name}: " + " ".join(f"{k}={v:.3f}" for k, v in s.items()),
                  flush=True)
        print("OOD AUROC written to logs/luma_ood.json", flush=True)
    from ..core.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # async saves must be durable before we declare done
    print(f"LUMA protocol done in {time.time() - t_start:.1f}s")
    return df


if __name__ == "__main__":
    main()
