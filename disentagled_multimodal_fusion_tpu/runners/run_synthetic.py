"""Synthetic dependence sweep: seeds x dep in {0,25,50,75,100}.

Reference semantics: run_synthetic.py. For each (seed, dep):
DMVAE (embed 16, views [32,32], 100 ep) -> EvidentialProbe(cml, fused=0)
-> LateFusion(cml) -> LateFusion(avg), all with fused=0 (DC term off),
evaluated with the subjective-model engine and flattened to the same
three-sheet report (main_grouped / all_results / grouped_results).

The per-(seed, dep) pipeline runs as three jitted scan-per-epoch training
programs on device; the sweep itself is a plain host loop (model configs are
identical across cells, so everything after the first cell hits the jit
cache).
"""

from __future__ import annotations

import argparse
import time

from ..core.setup import configure


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seeds", type=int, nargs="*", default=None)
    parser.add_argument("--deps", type=int, nargs="*", default=None)
    parser.add_argument("--quick", action="store_true",
                        help="tiny epoch counts for smoke testing")
    parser.add_argument(
        "--probe-engine", choices=["xla", "megakernel"], default="xla",
        help="probe-fit engine (sequential path): 'megakernel' runs each "
             "epoch as ONE Pallas kernel (core/megakernel.py); same "
             "randomness stream as 'xla', float-level parity pinned by "
             "tests/test_probe_megakernel.py")
    parser.add_argument("--no-fused-dmvae", action="store_true",
                        help="use the unfused per-modality DMVAE")
    parser.add_argument("--vmap-seeds", action="store_true",
                        help="train all seeds of each dep cell as one "
                             "vmapped program per model type")
    parser.add_argument("--preset", choices=["easy", "med", "hard"], default="med",
                        help="synthetic difficulty preset (data.common_<preset>)")
    parser.add_argument("--backbone", choices=["dmvae", "dssl"], default="dmvae",
                        help="disentangling backbone: DMVAE (reference "
                             "protocol) or DisentangledSSL (drop-in, "
                             "disentangledssl.py:17-194)")
    parser.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default="float32",
        help="matmul compute dtype for DMVAE/probe/late-fusion fits "
             "(params/losses stay f32; the DisentangledSSL backbone always "
             "runs f32 — KB-scale MLPs are HBM-bound, bf16 buys nothing "
             "there, see docs/PERF.md)",
    )
    from .common import (
        add_force_vmap_flag, add_mesh_args, build_runner_mesh, guard_vmap_seeds,
    )
    add_mesh_args(parser)
    add_force_vmap_flag(parser)
    args = parser.parse_args(argv)

    configure()
    import jax
    import jax.numpy as jnp

    mesh = build_runner_mesh(args.data_parallel, args.model_parallel)

    from ..core.tasks import (
        build_disentangledssl_task,
        build_dmvae_task,
        build_late_fusion_task,
        build_probe_task,
        embed_dataset,
        embed_dataset_ssl,
    )
    if args.dtype != "float32":
        from functools import partial

        build_dmvae_task = partial(build_dmvae_task, dtype=args.dtype)
        build_probe_task = partial(build_probe_task, dtype=args.dtype)
        build_late_fusion_task = partial(build_late_fusion_task, dtype=args.dtype)
    from ..core.train import train
    from ..core.checkpoint import save_checkpoint
    from ..core.logging import log_training_csv
    from ..data.synthetic import make_simple_plus_splits
    from ..eval.analysis import (
        build_metrics_dataframe,
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )
    from .common import load_config, main_columns, make_getter, write_report

    C = make_getter(load_config("synthetic_config.yaml"))

    pre = f"data.common_{args.preset}"
    # medium-preset fallbacks == the reference's effective code defaults
    # (run_synthetic.py:26-41)
    common_med = dict(
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

    seeds = args.seeds if args.seeds is not None else C("experiment.seeds", [0, 1, 2, 3, 4])
    deps = args.deps if args.deps is not None else C("experiment.deps", [0, 25, 50, 75, 100])

    dmvae_epochs = 3 if args.quick else C("dmvae.num_epochs", 100)
    fusion_epochs = 3 if args.quick else C("dmvae_fusion.num_epochs", 50)
    late_epochs = 3 if args.quick else C("latefusion.num_epochs", 50)
    if args.quick:
        common_med["n_samples"] = 1000

    batch_size = 128  # reference: make_loaders_simple_plus default
    rows = {}
    t_start = time.time()

    # axon-relay safety guard (see runners/common.py:vmap_seeds_unsafe)
    args.vmap_seeds = guard_vmap_seeds(args, len(seeds), args.dtype)
    if args.probe_engine == "megakernel" and args.vmap_seeds:
        parser.error("--probe-engine megakernel runs the sequential path "
                     "only (train_many has no kernel program)")
    if args.vmap_seeds and len(seeds) > 1 and args.backbone == "dmvae":
        from ..core.train import train_many
        from numpy import stack as np_stack
        import numpy as np

        stackp = lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
        for seed in seeds:
            rows[seed] = {}
        for dep in deps:
            t0 = time.time()
            rho = dep / 100.0
            cells = [
                make_simple_plus_splits(
                    batch_size=batch_size, seed=s, rho=rho,
                    shared_class_frac=rho, **common_med,
                )
                for s in seeds
            ]
            xs_tr = tuple(
                jnp.asarray(np_stack([c[1][0][v] for c in cells]))
                for v in range(2)
            )
            xs_va = tuple(
                jnp.asarray(np_stack([c[2][0][v] for c in cells]))
                for v in range(2)
            )
            y_tr = jnp.asarray(np_stack([c[1][1] for c in cells]))
            y_va = jnp.asarray(np_stack([c[2][1] for c in cells]))
            n_train = xs_tr[0].shape[1]
            view_dims = [int(x.shape[2]) for x in xs_tr]
            embed_dim = C("dmvae.embed_dim", 16)
            seed_keys = [jax.random.PRNGKey(s) for s in seeds]

            dm = [
                build_dmvae_task(
                    rng=jax.random.fold_in(k, 0),
                    xs_sample=[x[0] for x in xs_tr], output_dim=view_dims,
                    a=C("dmvae.a", 1e-5), hidden_dim=C("dmvae.hidden_dim", 512),
                    embed_dim=embed_dim, lr=C("dmvae.lr", 1e-3),
                    num_epochs=dmvae_epochs,
                    fused_modalities=not args.no_fused_dmvae,
                )
                for k in seed_keys
            ]
            model, _, loss_fn, opt, _ = dm[0]
            res = train_many(
                rngs=jnp.stack([jax.random.fold_in(k, 1) for k in seed_keys]),
                params_stack=stackp([t[1] for t in dm]), loss_fn=loss_fn,
                data_stack={"xs": xs_tr}, n_train=n_train, optimizer=opt,
                epochs=dmvae_epochs, batch_size=batch_size, drop_last=True,
                mesh=mesh,
            )
            for i, s in enumerate(seeds):
                save_checkpoint(
                    f"checkpoints/dmvae_seed{s}_dep{dep}",
                    jax.tree.map(lambda a: a[i], res.params),
                    {"seed": s, "dep": dep, "model": "dmvae"}, wait=False,)
            embed_v = jax.jit(jax.vmap(lambda p, xs: embed_dataset(model, p, xs)))
            zc_tr, zp_tr = embed_v(res.params, xs_tr)
            zc_va, zp_va = embed_v(res.params, xs_va)
            probe_train = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
            probe_val = {"zc": zc_va, "zp": zp_va, "y": y_va}

            jobs = [(
                "dmvae_cml", True,
                lambda k: build_probe_task(
                    rng=k, num_modalities=2,
                    num_classes=C("dmvae_fusion.num_classes", 3),
                    input_dim=C("dmvae_fusion.input_dim", 16),
                    hidden_dim=tuple(C("dmvae_fusion.hidden_dim", (128,))),
                    lr=C("dmvae_fusion.lr", 3e-4),
                    dropout=C("dmvae_fusion.dropout", 0.1),
                    annealing_start=C("dmvae_fusion.annealing_start", 10),
                    aggregation=C("dmvae_fusion.aggregation", "cml"),
                    fused=0.0, num_epochs=fusion_epochs,
                ), fusion_epochs, probe_train, probe_val,
            )]
            for agg in ["cml", "avg"]:
                jobs.append((
                    agg, False,
                    (lambda agg: lambda k: build_late_fusion_task(
                        rng=k, output_dims=view_dims,
                        num_classes=C("latefusion.num_classes", 3),
                        hidden_dim=tuple(C("latefusion.hidden_dim", (128,))),
                        dropout=C("latefusion.dropout", 0.1),
                        lr=C("latefusion.lr", 3e-4),
                        annealing_start=C("latefusion.annealing_start", 10),
                        aggregation=agg, fused=0.0,
                    ))(agg), late_epochs,
                    {"xs": xs_tr, "y": y_tr}, {"xs": xs_va, "y": y_va},
                ))
            for j, (label, with_shared, builder, n_ep, tr_d, va_d) in enumerate(jobs):
                tasks = [builder(jax.random.fold_in(k, 10 + j)) for k in seed_keys]
                task = tasks[0]
                res_m = train_many(
                    rngs=jnp.stack([jax.random.fold_in(k, 100 + j) for k in seed_keys]),
                    params_stack=stackp([t.params for t in tasks]),
                    loss_fn=task.loss_fn, data_stack=tr_d, n_train=n_train,
                    optimizer=task.optimizer, epochs=n_ep, batch_size=batch_size,
                    drop_last=True, val_fn=task.val_fn, val_data_stack=va_d,
                    mesh=mesh,
                )
                for i, s in enumerate(seeds):
                    p_i = jax.tree.map(lambda a: a[i], res_m.params)
                    va_i = jax.tree.map(lambda a: a[i], va_d)
                    if with_shared:
                        info = evaluate_subjective_model_with_shared(task, p_i, va_i)
                    else:
                        info = evaluate_subjective_model(task, p_i, va_i)
                    rows[s].setdefault(dep, {})[label] = info
                    # same per-seed artifacts as the sequential path
                    from ..core.train import TrainResult
                    csv_name = (f"dmvae_fusion_seed{s}_dep{dep}" if with_shared
                                else f"late_fusion_seed{s}_dep{dep}_agg{label}")
                    log_training_csv(csv_name, TrainResult(
                        params=None, train_loss=res_m.train_loss[i],
                        val_loss=res_m.val_loss[i], val_acc=res_m.val_acc[i],
                        final_lr=res_m.final_lr[i]))
                    save_checkpoint(
                        f"checkpoints/{csv_name}", p_i,
                        {"seed": s, "dep": dep, "model": label}, wait=False,)
            accs = [rows[s][dep]["dmvae_cml"]["fused"]["accuracy"] for s in seeds]
            print(f"[dep {dep}] x{len(seeds)} seeds: dmvae_cml fused acc "
                  f"{np.mean(accs):.3f} +/- {np.std(accs):.3f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        seeds_to_loop = []
    else:
        seeds_to_loop = seeds

    for seed in seeds_to_loop:
        rows[seed] = {}
        for dep in deps:
            t0 = time.time()
            rows[seed][dep] = {}
            rho = dep / 100.0
            ds, (xs_tr, y_tr), (xs_va, y_va) = make_simple_plus_splits(
                batch_size=batch_size, seed=seed, rho=rho,
                shared_class_frac=rho, **common_med,
            )
            xs_tr = tuple(jnp.asarray(x) for x in xs_tr)
            xs_va = tuple(jnp.asarray(x) for x in xs_va)
            y_tr_j, y_va_j = jnp.asarray(y_tr), jnp.asarray(y_va)
            n_train = xs_tr[0].shape[0]
            # view widths follow the preset (d_signal + d_spurious), not the
            # config's [32, 32] (which matches the medium preset only)
            view_dims = [int(x.shape[1]) for x in xs_tr]

            key = jax.random.PRNGKey(seed)
            k_dmvae, k_probe, k_cml, k_avg, k_train = jax.random.split(key, 5)

            # ---- backbone: DMVAE (run_synthetic.py:53-72) or DisentangledSSL ----
            embed_dim = C("dmvae.embed_dim", 16)
            shared_dim = embed_dim
            if args.backbone == "dmvae":
                model, params, loss_fn, opt, bstats = build_dmvae_task(
                    rng=k_dmvae,
                    xs_sample=xs_tr,
                    output_dim=view_dims,
                    a=C("dmvae.a", 1e-5),
                    hidden_dim=C("dmvae.hidden_dim", 512),
                    embed_dim=embed_dim,
                    lr=C("dmvae.lr", 1e-3),
                    num_epochs=dmvae_epochs,
                    fused_modalities=not args.no_fused_dmvae,
                )
            else:
                model, params, loss_fn, opt = build_disentangledssl_task(
                    rng=k_dmvae,
                    output_dim=view_dims,
                    hidden_dim=C("dssl.hidden_dim", 512),
                    embed_dim=embed_dim,
                    a=C("dssl.a", 1.0),
                    distribution=C("dssl.distribution", "vmf"),
                    vmfkappa=C("dssl.vmfkappa", 1.0),
                    lr=C("dssl.lr", 1e-3),
                    epochs=dmvae_epochs,
                )
                shared_dim = 2 * embed_dim  # Zc = concat(zsx1, zsx2)
            res = train(
                rng=k_train, params=params, loss_fn=loss_fn, data={"xs": xs_tr},
                n_train=n_train, optimizer=opt, epochs=dmvae_epochs,
                batch_size=batch_size, drop_last=True,
                mesh=mesh, tp_hidden_dim=C("dmvae.hidden_dim", 512),
            )
            dmvae_params = res.params
            save_checkpoint(
                f"checkpoints/{args.backbone}_seed{seed}_dep{dep}", dmvae_params,
                {"seed": seed, "dep": dep, "model": args.backbone}, wait=False,)

            if args.backbone == "dmvae":
                zc_tr, zp_tr = embed_dataset(model, dmvae_params, xs_tr)
                zc_va, zp_va = embed_dataset(model, dmvae_params, xs_va)
            else:
                zc_tr, zp_tr = embed_dataset_ssl(model, dmvae_params, xs_tr)
                zc_va, zp_va = embed_dataset_ssl(model, dmvae_params, xs_va)
            probe_train = {"zc": zc_tr, "zp": zp_tr, "y": y_tr_j}
            probe_val = {"zc": zc_va, "zp": zp_va, "y": y_va_j}

            # ---- EvidentialProbe cml, fused=0 (run_synthetic.py:74-95) ----
            task = build_probe_task(
                rng=k_probe,
                num_modalities=2,
                num_classes=C("dmvae_fusion.num_classes", 3),
                input_dim=C("dmvae_fusion.input_dim", 16),
                hidden_dim=tuple(C("dmvae_fusion.hidden_dim", (128,))),
                lr=C("dmvae_fusion.lr", 3e-4),
                dropout=C("dmvae_fusion.dropout", 0.1),
                annealing_start=C("dmvae_fusion.annealing_start", 10),
                aggregation=C("dmvae_fusion.aggregation", "cml"),
                fused=0.0,
                num_epochs=fusion_epochs,
                shared_input_dim=shared_dim,
            )
            res_p = train(
                rng=jax.random.fold_in(k_train, 1), params=task.params,
                loss_fn=task.loss_fn, data=probe_train, n_train=n_train,
                optimizer=task.optimizer, epochs=fusion_epochs,
                batch_size=batch_size, drop_last=True,
                val_fn=task.val_fn, val_data=probe_val,
                mesh=mesh, tp_hidden_dim=tuple(C("dmvae_fusion.hidden_dim", (128,)))[0],
                megakernel=(task.megakernel
                            if args.probe_engine == "megakernel" else None),
            )
            log_training_csv(f"dmvae_fusion_seed{seed}_dep{dep}", res_p)
            save_checkpoint(
                f"checkpoints/dmvae_fusion_seed{seed}_dep{dep}", res_p.params,
                {"seed": seed, "dep": dep, "model": "dmvae_cml"}, wait=False,)
            rows[seed][dep]["dmvae_cml"] = evaluate_subjective_model_with_shared(
                task, res_p.params, probe_val
            )

            # ---- LateFusion cml / avg, fused=0 (run_synthetic.py:116-135) ----
            lf_train = {"xs": xs_tr, "y": y_tr_j}
            lf_val = {"xs": xs_va, "y": y_va_j}
            for agg, k, label in [("cml", k_cml, "cml"), ("avg", k_avg, "avg")]:
                lf = build_late_fusion_task(
                    rng=k,
                    output_dims=view_dims,
                    num_classes=C("latefusion.num_classes", 3),
                    hidden_dim=tuple(C("latefusion.hidden_dim", (128,))),
                    dropout=C("latefusion.dropout", 0.1),
                    lr=C("latefusion.lr", 3e-4),
                    annealing_start=C("latefusion.annealing_start", 10),
                    aggregation=agg,
                    fused=0.0,
                )
                res_lf = train(
                    rng=jax.random.fold_in(k, 7), params=lf.params,
                    loss_fn=lf.loss_fn, data=lf_train, n_train=n_train,
                    optimizer=lf.optimizer, epochs=late_epochs,
                    batch_size=batch_size, drop_last=True,
                    val_fn=lf.val_fn, val_data=lf_val,
                    mesh=mesh, tp_hidden_dim=tuple(C("latefusion.hidden_dim", (128,)))[0],
                )
                log_training_csv(f"late_fusion_seed{seed}_dep{dep}_agg{agg}", res_lf)
                save_checkpoint(
                    f"checkpoints/late_fusion_seed{seed}_dep{dep}_agg{agg}",
                    res_lf.params, {"seed": seed, "dep": dep, "model": label}, wait=False,)
                rows[seed][dep][label] = evaluate_subjective_model(lf, res_lf.params, lf_val)

            acc = rows[seed][dep]["dmvae_cml"]["fused"]["accuracy"]
            print(
                f"[seed {seed} dep {dep}] dmvae_cml fused acc "
                f"{acc:.3f}  ({time.time() - t0:.1f}s)",
                flush=True,
            )

    df = build_metrics_dataframe(rows)
    df["seed"] = df["seed"].astype(int)
    df["dep"] = df["dep"].astype(float)
    df_main = main_columns(df, ["seed", "dep", "model"])
    df_grouped = df.groupby(["dep", "model"]).mean().reset_index().sort_values(["dep", "model"])
    df_main_grouped = (
        df_main.groupby(["dep", "model"]).mean().reset_index().sort_values(["dep", "model"])
    )
    write_report(
        {
            "main_grouped": df_main_grouped,
            "all_results": df,
            "grouped_results": df_grouped,
        },
        C("logging.excel_path", "logs/synthetic_dataset.xlsx"),
    )
    from ..core.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # async saves must be durable before we declare done
    print(f"sweep done in {time.time() - t_start:.1f}s")
    return df


if __name__ == "__main__":
    main()
