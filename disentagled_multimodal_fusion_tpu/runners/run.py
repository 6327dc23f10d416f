"""UQ-datasets sweep: seeds x {Normal, Conflict} x datasets x 6 models.

Reference semantics: run.py (module-level sweep; here wrapped in main()).
Per (seed, condition, dataset):
  1. 80/20 split (seeded); Conflict additionally injects cross-class view
     conflicts into the TEST rows only (ratio 1.0) (run.py:52-102).
  2. DMVAE (embed 200, hidden 512, a=1e-5, 100 epochs, Adam+cosine).
  3. Six probe/baseline trainings (200 epochs each): dmvae_dis (private-only
     probe), dmvae_cml, dmvae_joint (shared+private probes), and dbf/cml/avg
     LateFusion — each fit with val=test, then evaluated with the
     subjective-model engine (dmvae_dis uses the per-view layout, all others
     the with-shared layout, mirroring run.py:252-255 — for LateFusion that
     deliberately labels view 0 as "shared", a reference quirk kept for
     column parity).
  4. Flatten to the three-sheet report (main_grouped/all_results/
     grouped_results) at logs/dataset_analysis.xlsx (+ CSV mirrors).

TPU shape: raw views live on device; every fit is a single jitted
scan-per-epoch program; probes train on embeddings precomputed once from
the frozen DMVAE.
"""

from __future__ import annotations

import argparse
import time

from ..core.setup import configure


def run_condition(
    *, C, seed, dataset_name, conflict, quick, jax, jnp, np, builders, rows_out,
    fused_dmvae=True, noise=False, mesh=None, intermediate_fusions=(),
    dtype=None, backbone="dmvae", probe_engine="xla",
):
    from ..core.checkpoint import save_checkpoint
    from ..core.logging import log_training_csv
    from ..core.train import train
    from ..data.multiview import DATASET_REGISTRY
    from ..eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )

    (build_dmvae_task, build_probe_task, build_disentangled_probe_task,
     build_late_fusion_task, embed_dataset) = builders

    t0 = time.time()
    # legacy global np.random stream, seeded like pl.seed_everything
    # (run.py:180-181): splits and conflict injections are bit-identical to
    # the reference's under the same seed (tests pin the injection path)
    np.random.seed(seed)
    dataset = DATASET_REGISTRY[dataset_name]()
    n = len(dataset)
    train_frac = C("data.split.train_frac", 0.8)
    idx = np.arange(n)
    np.random.shuffle(idx)
    n_tr = int(train_frac * n)
    train_idx, test_idx = idx[:n_tr], idx[n_tr:]

    if conflict or noise:
        pp = C("data.conflict", {}) or {}
        dataset.postprocessing(
            test_idx,
            addNoise=noise or pp.get("addNoise", False),
            sigma=pp.get("sigma", 0.5),
            ratio_noise=1.0 if noise else pp.get("ratio_noise", 0.0),
            addConflict=conflict and pp.get("addConflict", True),
            ratio_conflict=pp.get("ratio_conflict", 1.0),
            rng=None,
        )

    views, labels = dataset.arrays()
    xs_tr = tuple(jnp.asarray(v[train_idx]) for v in views)
    xs_te = tuple(jnp.asarray(v[test_idx]) for v in views)
    y_tr = jnp.asarray(labels[train_idx])
    y_te = jnp.asarray(labels[test_idx])
    num_classes = dataset.num_classes
    dims = [int(d[0]) for d in dataset.dims]
    n_train = len(train_idx)
    batch_size = C("dataloader.batch_size", 100)

    lr = C("optim.dataset_lr", {}).get(
        dataset_name,
        {"CalTech": 3e-4, "Scene": 0.01, "CUB": 3e-3, "HandWritten": 3e-3, "PIE": 3e-3}[
            dataset_name
        ],
    )
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    probe_dropout = C("probes.dropout_p", 0.1)
    annealing_start = C("probes.annealing_start", 50)
    probe_epochs = 2 if quick else C("probes.model_epochs", 200)
    dmvae_epochs = 2 if quick else C("dmvae.num_epochs", 100)
    embed_dim = C("dmvae.embed_dim", 200)
    probe_input_dim = C("probes.input_dim", 200)

    from .common import cell_seed
    key = jax.random.PRNGKey(cell_seed(seed, dataset_name, conflict))
    keys = jax.random.split(key, 16)

    # ---- backbone: DMVAE (default) or DisentangledSSL (--backbone dssl;
    # the reference documents SSL as a drop-in under the same
    # get_embedding contract, README.md:110-229, but never runs it on
    # real data — CUB is the 2-view contract-compatible dataset) ----
    shared_input_dim = None
    cond = "conflict" if conflict else ("noise" if noise else "normal")
    if backbone == "dssl":
        from ..core.tasks import build_disentangledssl_task, embed_dataset_ssl

        if len(dims) != 2:
            raise ValueError(
                f"--backbone dssl is 2-modal (disentangledssl.py:17-194); "
                f"{dataset_name} has {len(dims)} views — use CUB"
            )
        ssl_embed = C("dssl.embed_dim", embed_dim)
        model, params, loss_fn, opt = build_disentangledssl_task(
            rng=keys[0], output_dim=dims,
            hidden_dim=C("dssl.hidden_dim", 512), embed_dim=ssl_embed,
            a=C("dssl.a", 1.0),
            distribution=C("dssl.distribution", "vmf"),
            vmfkappa=C("dssl.vmfkappa", 1.0),
            lr=C("dssl.lr", 1e-3), epochs=dmvae_epochs,
        )
        res = train(
            rng=keys[1], params=params, loss_fn=loss_fn, data={"xs": xs_tr},
            n_train=n_train, optimizer=opt, epochs=dmvae_epochs,
            batch_size=batch_size, drop_last=True,  # SupCon couples the batch
            mesh=mesh, tp_hidden_dim=C("dssl.hidden_dim", 512),
        )
        dmvae_params = res.params
        save_checkpoint(
            f"checkpoints/dssl_dataset{dataset_name}_seed{seed}_{cond}",
            dmvae_params, {"dataset": dataset_name, "seed": seed, "cond": cond},
            wait=False,)
        probe_input_dim = ssl_embed  # private width
        shared_input_dim = 2 * ssl_embed  # Zc = concat(zsx1, zsx2)
        zc_tr, zp_tr = embed_dataset_ssl(model, dmvae_params, xs_tr)
        zc_te, zp_te = embed_dataset_ssl(model, dmvae_params, xs_te)
    else:
        model, params, loss_fn, opt, bstats = build_dmvae_task(
            rng=keys[0], xs_sample=xs_tr, output_dim=dims,
            dropout=C("dmvae.dropout", 0.0), a=C("dmvae.a", 1e-5),
            hidden_dim=C("dmvae.hidden_dim", 512), embed_dim=embed_dim,
            lr=C("dmvae.lr", 1e-4), num_epochs=dmvae_epochs,
            fused_modalities=fused_dmvae,
        )
        res = train(
            rng=keys[1], params=params, loss_fn=loss_fn, data={"xs": xs_tr},
            n_train=n_train, optimizer=opt, epochs=dmvae_epochs,
            batch_size=batch_size, drop_last=False, model_state=bstats,
            mesh=mesh, tp_hidden_dim=C("dmvae.hidden_dim", 512),
        )
        dmvae_params = res.params
        save_checkpoint(
            f"checkpoints/dmvae_dataset{dataset_name}_seed{seed}_a1e-05_{cond}",
            dmvae_params, {"dataset": dataset_name, "seed": seed, "cond": cond}, wait=False,)

        zc_tr, zp_tr = embed_dataset(model, dmvae_params, xs_tr)
        zc_te, zp_te = embed_dataset(model, dmvae_params, xs_te)
    probe_train = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
    probe_test = {"zc": zc_te, "zp": zp_te, "y": y_te}
    lf_train = {"xs": xs_tr, "y": y_tr}
    lf_test = {"xs": xs_te, "y": y_te}
    num_modalities = len(dims)

    # ---- six probe/baseline models (run.py:210-219) ----
    jobs = []
    jobs.append((
        "dmvae_dis",
        build_disentangled_probe_task(
            rng=keys[2], num_modalities=num_modalities, num_classes=num_classes,
            input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=lr,
            dropout=probe_dropout, annealing_start=annealing_start,
            num_epochs=probe_epochs,
        ),
        probe_train, probe_test,
    ))
    for agg, k in [("cml", keys[3]), ("joint", keys[4])]:
        jobs.append((
            f"dmvae_{agg}",
            build_probe_task(
                rng=k, num_modalities=num_modalities, num_classes=num_classes,
                input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=lr,
                dropout=probe_dropout, annealing_start=annealing_start,
                aggregation=agg, fused=1.0, num_epochs=probe_epochs,
                shared_input_dim=shared_input_dim,
            ),
            probe_train, probe_test,
        ))
    for agg, k in [("dbf", keys[5]), ("cml", keys[6]), ("avg", keys[7])]:
        jobs.append((
            f"{agg}_fusion",
            build_late_fusion_task(
                rng=k, output_dims=dims, num_classes=num_classes,
                hidden_dim=probe_hidden, dropout=probe_dropout, lr=lr,
                annealing_start=annealing_start, aggregation=agg, fused=1.0,
            ),
            lf_train, lf_test,
        ))
    if intermediate_fusions:
        # extra models (reference baselines.py:153-252, defined but never
        # swept there): library fusion -> single evidential head. The
        # concat variant keeps its historical rng (keys[15]) and name so
        # archived sweeps stay bitwise-reproducible; other fusions fold
        # their registry index into that key.
        from ..core.tasks import build_intermediate_fusion_task
        from ..models.fusions import INTERMEDIATE_FUSIONS, build_fusion

        for fname in intermediate_fusions:
            jname = ("intermediate_fusion" if fname == "concat"
                     else f"intermediate_{fname}")
            try:
                build_fusion(fname, dims)  # cheap view-count/size check
            except ValueError as e:
                print(f"  [{dataset_name}] skipping {jname}: {e}", flush=True)
                rows_out[jname] = {"skipped": str(e)}
                continue
            k = (keys[15] if fname == "concat"
                 else jax.random.fold_in(keys[15], INTERMEDIATE_FUSIONS.index(fname)))
            jobs.append((
                jname,
                build_intermediate_fusion_task(
                    rng=k, output_dims=dims, num_classes=num_classes,
                    dropout=probe_dropout, lr=lr, annealing_start=annealing_start,
                    dtype=dtype, fusion=fname,
                ),
                lf_train, lf_test,
            ))

    for i, (name, task, tr_data, te_data) in enumerate(jobs):
        # jobs beyond the historical 7 (6 base + concat-intermediate) draw
        # fresh keys by fold_in so the first 7 keep their archived streams
        train_rng = keys[8 + i] if i < 7 else jax.random.fold_in(keys[8], 1000 + i)
        res_m = train(
            rng=train_rng, params=task.params, loss_fn=task.loss_fn,
            data=tr_data, n_train=n_train, optimizer=task.optimizer,
            epochs=probe_epochs, batch_size=batch_size, drop_last=False,
            val_fn=task.val_fn, val_data=te_data,
            mesh=mesh, tp_hidden_dim=probe_hidden[0],
            # whole-epoch Pallas path for the probe fits (core/megakernel);
            # non-probe tasks carry megakernel=None, so this is a no-op there
            megakernel=task.megakernel if probe_engine == "megakernel" else None,
        )
        # dispatch mirrors run.py:252-255 (intermediate has ONE head ->
        # per-view layout; with_shared needs V >= 2)
        if name == "dmvae_dis" or name.startswith("intermediate"):
            info = evaluate_subjective_model(task, res_m.params, te_data)
        else:
            info = evaluate_subjective_model_with_shared(task, res_m.params, te_data)
        # probes over the SSL backbone report/checkpoint as dssl_* so they
        # can't be mistaken for (or clobber) the DMVAE-backbone artifacts
        if backbone == "dssl":
            name = name.replace("dmvae_", "dssl_")
        # NOTE the doubled suffix for LateFusion names (cml_fusion_fusion_
        # ds...): the reference's own template (run.py:223) — kept verbatim
        # so checkpoint/log layouts match; runners/evaluate.py documents it
        model_name = (f"{name}_fusion_ds{dataset_name}_seed{seed}"
                      + ("_conflict" if conflict else "_noise" if noise else ""))
        log_training_csv(model_name, res_m)
        path = save_checkpoint(
            f"checkpoints/{model_name}",
            res_m.params, {"model": name, "dataset": dataset_name, "seed": seed}, wait=False,)
        info["path"] = path
        rows_out[name] = info
        print(
            f"  [{dataset_name}/{cond}/seed{seed}] {name}: "
            f"fused_acc={info['fused']['accuracy']:.4f} "
            f"val_acc_last={float(res_m.val_acc[-1]):.4f}",
            flush=True,
        )
    print(f"  {dataset_name}/{cond}/seed{seed} done in {time.time() - t0:.1f}s", flush=True)


def prepare_cell_data(*, C, seeds, dataset_name, conflict, noise, jnp, np):
    """Per-seed splits (+ conflict/noise injection), stacked (S, n, D).

    Reference-identical split + injection streams (see run_condition);
    shared by the --vmap-seeds and --one-program-cells paths.
    Returns (xs_tr, xs_te, y_tr, y_te, dims, num_classes).
    """
    from ..data.multiview import DATASET_REGISTRY

    xs_tr_l, xs_te_l, y_tr_l, y_te_l = [], [], [], []
    for seed in seeds:
        np.random.seed(seed)
        dataset = DATASET_REGISTRY[dataset_name]()
        n = len(dataset)
        idx = np.arange(n)
        np.random.shuffle(idx)
        n_tr = int(C("data.split.train_frac", 0.8) * n)
        train_idx, test_idx = idx[:n_tr], idx[n_tr:]
        if conflict or noise:
            pp = C("data.conflict", {}) or {}
            dataset.postprocessing(
                test_idx,
                addNoise=noise or pp.get("addNoise", False),
                sigma=pp.get("sigma", 0.5),
                ratio_noise=1.0 if noise else pp.get("ratio_noise", 0.0),
                addConflict=conflict and pp.get("addConflict", True),
                ratio_conflict=pp.get("ratio_conflict", 1.0), rng=None,
            )
        views, labels = dataset.arrays()
        xs_tr_l.append([v[train_idx] for v in views])
        xs_te_l.append([v[test_idx] for v in views])
        y_tr_l.append(labels[train_idx])
        y_te_l.append(labels[test_idx])
        num_classes = dataset.num_classes
        dims = [int(d[0]) for d in dataset.dims]

    s_count = len(seeds)
    xs_tr = tuple(jnp.asarray(np.stack([xs_tr_l[s][v] for s in range(s_count)]))
                  for v in range(len(dims)))
    xs_te = tuple(jnp.asarray(np.stack([xs_te_l[s][v] for s in range(s_count)]))
                  for v in range(len(dims)))
    y_tr = jnp.asarray(np.stack(y_tr_l))
    y_te = jnp.asarray(np.stack(y_te_l))
    return xs_tr, xs_te, y_tr, y_te, dims, num_classes


def build_cell_head_specs(
    *, build_probe_task, build_disentangled_probe_task,
    build_late_fusion_task, dims, num_classes, lr, probe_input_dim,
    probe_hidden, probe_dropout, annealing_start, probe_epochs,
    intermediate_fusions, dtype, dataset_name, seeds, rows_by_seed,
):
    """Canonical head-model roster for one sweep cell, shared by BOTH
    seed-batched engines (run_condition_vmapped and run_condition_onejit).

    Returns [(name, builder(key) -> task, kind, shared_layout)] with kind
    'probe' (trains on embeddings) or 'raw' (trains on views), and
    shared_layout the evaluation layout quirk (run.py:246-255 dispatches
    by MODEL NAME: LateFusion is evaluated with-shared, its view 0
    labeled "shared", for column parity; dmvae_dis and the intermediate
    fusions are not). One source of truth matters here: the roster ORDER
    fixes the per-model RNG fold indices (10+j init, 100+j train), so a
    roster edited in one engine but not the other would silently break
    their bit-identity. View-count-incompatible intermediate fusions are
    skipped with a marker row (the --rows-file resume contract).
    """
    def probe_builder(agg, fused):
        def b(k):
            return build_probe_task(
                rng=k, num_modalities=len(dims), num_classes=num_classes,
                input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=lr,
                dropout=probe_dropout, annealing_start=annealing_start,
                aggregation=agg, fused=fused, num_epochs=probe_epochs,
            )
        return b

    def dis_builder(k):
        return build_disentangled_probe_task(
            rng=k, num_modalities=len(dims), num_classes=num_classes,
            input_dim=probe_input_dim, hidden_dim=probe_hidden, lr=lr,
            dropout=probe_dropout, annealing_start=annealing_start,
            num_epochs=probe_epochs,
        )

    def lf_builder(agg):
        def b(k):
            return build_late_fusion_task(
                rng=k, output_dims=dims, num_classes=num_classes,
                hidden_dim=probe_hidden, dropout=probe_dropout, lr=lr,
                annealing_start=annealing_start, aggregation=agg, fused=1.0,
            )
        return b

    specs = [
        ("dmvae_dis", dis_builder, "probe", False),
        ("dmvae_cml", probe_builder("cml", 1.0), "probe", True),
        ("dmvae_joint", probe_builder("joint", 1.0), "probe", True),
        ("dbf_fusion", lf_builder("dbf"), "raw", True),
        ("cml_fusion", lf_builder("cml"), "raw", True),
        ("avg_fusion", lf_builder("avg"), "raw", True),
    ]
    if intermediate_fusions:
        from ..core.tasks import build_intermediate_fusion_task
        from ..models.fusions import build_fusion

        def imf_builder(fname):
            def b(k):
                return build_intermediate_fusion_task(
                    rng=k, output_dims=dims, num_classes=num_classes,
                    dropout=probe_dropout, lr=lr,
                    annealing_start=annealing_start,
                    dtype=dtype, fusion=fname,
                )
            return b

        for fname in intermediate_fusions:
            jname = ("intermediate_fusion" if fname == "concat"
                     else f"intermediate_{fname}")
            try:
                build_fusion(fname, dims)  # cheap view-count/size check
            except ValueError as e:
                print(f"  [{dataset_name}] skipping {jname}: {e}", flush=True)
                for s_ in seeds:
                    rows_by_seed[s_][jname] = {"skipped": str(e)}
                continue
            specs.append((jname, imf_builder(fname), "raw", False))
    return specs


def run_condition_vmapped(
    *, C, seeds, dataset_name, conflict, quick, jax, jnp, np, builders, rows_by_seed,
    fused_dmvae=True, noise=False, mesh=None, intermediate_fusions=(),
    dtype=None,
):
    """Seed-vectorised variant of run_condition: all seeds of one
    (dataset, condition) cell train as ONE vmapped program per model type
    (core.train.train_many). Identical math per seed. Throughput is
    regime-dependent (docs/PERF.md §3-4, measured): dispatch-bound probe
    fits amortise per-op latency (~2x per seed at S=25); the HBM-bound
    DMVAE fit moves S x the parameter traffic so its time scales ~linearly
    — there the value is orchestration (one program, one compile, one set
    of mesh collectives), not per-seed speedup."""
    import jax.numpy as jnp  # noqa: F811 (keep local for clarity)

    from ..core.checkpoint import save_checkpoint
    from ..core.logging import log_training_csv
    from ..core.tasks import embed_dataset
    from ..core.train import train_many
    from ..data.multiview import DATASET_REGISTRY
    from ..eval.analysis import (
        evaluate_subjective_model,
        evaluate_subjective_model_with_shared,
    )

    (build_dmvae_task, build_probe_task, build_disentangled_probe_task,
     build_late_fusion_task, _embed) = builders
    t0 = time.time()
    cond = "conflict" if conflict else ("noise" if noise else "normal")

    s_count = len(seeds)
    xs_tr, xs_te, y_tr, y_te, dims, num_classes = prepare_cell_data(
        C=C, seeds=seeds, dataset_name=dataset_name, conflict=conflict,
        noise=noise, jnp=jnp, np=np,
    )
    n_train = xs_tr[0].shape[1]
    batch_size = C("dataloader.batch_size", 100)

    lr = C("optim.dataset_lr", {}).get(dataset_name, 3e-3)
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    probe_dropout = C("probes.dropout_p", 0.1)
    annealing_start = C("probes.annealing_start", 50)
    probe_epochs = 2 if quick else C("probes.model_epochs", 200)
    dmvae_epochs = 2 if quick else C("dmvae.num_epochs", 100)
    embed_dim = C("dmvae.embed_dim", 200)
    probe_input_dim = C("probes.input_dim", 200)

    def stack_params(tasks_or_params):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *tasks_or_params)

    from .common import cell_seed
    seed_keys = [jax.random.PRNGKey(cell_seed(s, dataset_name, conflict)) for s in seeds]

    # ---- DMVAE, all seeds at once ----
    dm = [
        build_dmvae_task(
            rng=jax.random.fold_in(k, 0), xs_sample=[x[0] for x in xs_tr],
            output_dim=dims, dropout=C("dmvae.dropout", 0.0), a=C("dmvae.a", 1e-5),
            hidden_dim=C("dmvae.hidden_dim", 512), embed_dim=embed_dim,
            lr=C("dmvae.lr", 1e-4), num_epochs=dmvae_epochs,
            fused_modalities=fused_dmvae,
        )
        for k in seed_keys
    ]
    model, _, loss_fn, opt, _ = dm[0]
    params_stack = stack_params([t[1] for t in dm])
    res = train_many(
        rngs=jnp.stack([jax.random.fold_in(k, 1) for k in seed_keys]),
        params_stack=params_stack, loss_fn=loss_fn, data_stack={"xs": xs_tr},
        n_train=n_train, optimizer=opt, epochs=dmvae_epochs, batch_size=batch_size,
        mesh=mesh,
    )
    dmvae_params = res.params
    for i, seed in enumerate(seeds):
        save_checkpoint(
            f"checkpoints/dmvae_dataset{dataset_name}_seed{seed}_a1e-05_{cond}",
            jax.tree.map(lambda a: a[i], dmvae_params),
            {"dataset": dataset_name, "seed": seed, "cond": cond}, wait=False,)
    print(f"  [{dataset_name}/{cond}] DMVAE x{s_count} seeds trained "
          f"({time.time() - t0:.1f}s)", flush=True)

    embed_v = jax.jit(jax.vmap(lambda p, xs: embed_dataset(model, p, xs)),
                      static_argnums=())
    zc_tr, zp_tr = embed_v(dmvae_params, xs_tr)
    zc_te, zp_te = embed_v(dmvae_params, xs_te)
    probe_train = {"zc": zc_tr, "zp": zp_tr, "y": y_tr}
    probe_test = {"zc": zc_te, "zp": zp_te, "y": y_te}
    lf_train = {"xs": xs_tr, "y": y_tr}
    lf_test = {"xs": xs_te, "y": y_te}

    # ---- six model types, each vmapped over seeds (the roster comes
    # from build_cell_head_specs — ONE source of truth with the
    # one-program engine, so their RNG fold indices can't drift) ----
    specs = build_cell_head_specs(
        build_probe_task=build_probe_task,
        build_disentangled_probe_task=build_disentangled_probe_task,
        build_late_fusion_task=build_late_fusion_task,
        dims=dims, num_classes=num_classes, lr=lr,
        probe_input_dim=probe_input_dim, probe_hidden=probe_hidden,
        probe_dropout=probe_dropout, annealing_start=annealing_start,
        probe_epochs=probe_epochs, intermediate_fusions=intermediate_fusions,
        dtype=dtype, dataset_name=dataset_name, seeds=seeds,
        rows_by_seed=rows_by_seed,
    )
    data_for = {"probe": (probe_train, probe_test), "raw": (lf_train, lf_test)}
    for j, (name, builder, kind, shared_layout) in enumerate(specs):
        tr_d, te_d = data_for[kind]
        tasks = [builder(jax.random.fold_in(k, 10 + j)) for k in seed_keys]
        task = tasks[0]
        params_stack = stack_params([t.params for t in tasks])
        res_m = train_many(
            rngs=jnp.stack([jax.random.fold_in(k, 100 + j) for k in seed_keys]),
            params_stack=params_stack, loss_fn=task.loss_fn, data_stack=tr_d,
            n_train=n_train, optimizer=task.optimizer, epochs=probe_epochs,
            batch_size=batch_size, val_fn=task.val_fn, val_data_stack=te_d,
            mesh=mesh,
        )
        for s, seed in enumerate(seeds):
            params_s = jax.tree.map(lambda a: a[s], res_m.params)
            te_s = jax.tree.map(lambda a: a[s], te_d)
            if shared_layout:
                info = evaluate_subjective_model_with_shared(task, params_s, te_s)
            else:
                info = evaluate_subjective_model(task, params_s, te_s)
            model_name = (
                f"{name}_fusion_ds{dataset_name}_seed{seed}"
                + ("_conflict" if conflict else "_noise" if noise else "")
            )
            from ..core.train import TrainResult
            log_training_csv(model_name, TrainResult(
                params=None, train_loss=res_m.train_loss[s],
                val_loss=res_m.val_loss[s], val_acc=res_m.val_acc[s],
                final_lr=res_m.final_lr[s]))
            info["path"] = save_checkpoint(
                f"checkpoints/{model_name}", params_s,
                {"model": name, "dataset": dataset_name, "seed": seed}, wait=False,)
            rows_by_seed[seed][name] = info
        accs = [rows_by_seed[s][name]["fused"]["accuracy"] for s in seeds]
        print(f"  [{dataset_name}/{cond}] {name} x{s_count}: fused_acc "
              f"{np.mean(accs):.4f} +/- {np.std(accs):.4f}", flush=True)
    print(f"  {dataset_name}/{cond} ({s_count} seeds) done in "
          f"{time.time() - t0:.1f}s", flush=True)


def run_condition_onejit(
    *, C, seeds, dataset_name, conflict, quick, jax, jnp, np, builders,
    rows_by_seed, fused_dmvae=True, noise=False, mesh=None,
    intermediate_fusions=(), dtype=None, defer_artifacts=False,
):
    """ONE-program cell: the entire (dataset, condition) — backbone fit,
    embeddings, all head fits, all evaluations, all seeds — as a single
    jitted XLA program (core/sweep_cell.py). Bit-identical RNG streams and
    math to run_condition_vmapped; only the program boundaries moved, so
    per-fit dispatch and host syncs (the dominant residual cost, docs/
    PERF.md §4) disappear entirely.

    ``defer_artifacts=True`` returns a ``finish()`` closure instead of
    running the artifacts phase (device->host fetch, rows, checkpoints,
    CSVs) inline: the caller runs it concurrently with the NEXT cell's
    device execution. On a relay-attached chip the artifacts phase is a
    pure host-transfer wait (up to minutes for big-params datasets,
    RESULTS.md) while the device sits idle — a 1-deep pipeline overlaps
    the two."""
    from ..core.checkpoint import save_checkpoint
    from ..core.logging import log_training_csv
    from ..core.sweep_cell import CellJob, cell_rows, run_cell
    from ..core.train import TrainResult

    (build_dmvae_task, build_probe_task, build_disentangled_probe_task,
     build_late_fusion_task, _embed) = builders
    t0 = time.time()
    cond = "conflict" if conflict else ("noise" if noise else "normal")

    s_count = len(seeds)
    xs_tr, xs_te, y_tr, y_te, dims, num_classes = prepare_cell_data(
        C=C, seeds=seeds, dataset_name=dataset_name, conflict=conflict,
        noise=noise, jnp=jnp, np=np,
    )
    n_train = xs_tr[0].shape[1]
    batch_size = C("dataloader.batch_size", 100)

    lr = C("optim.dataset_lr", {}).get(dataset_name, 3e-3)
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    probe_dropout = C("probes.dropout_p", 0.1)
    annealing_start = C("probes.annealing_start", 50)
    probe_epochs = 2 if quick else C("probes.model_epochs", 200)
    dmvae_epochs = 2 if quick else C("dmvae.num_epochs", 100)
    embed_dim = C("dmvae.embed_dim", 200)
    probe_input_dim = C("probes.input_dim", 200)

    def stack_params(params_list):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)

    from .common import cell_seed
    seed_keys = [jax.random.PRNGKey(cell_seed(s, dataset_name, conflict)) for s in seeds]

    # ---- backbone task, per seed (same rng derivation as the vmapped path)
    dm = [
        build_dmvae_task(
            rng=jax.random.fold_in(k, 0), xs_sample=[x[0] for x in xs_tr],
            output_dim=dims, dropout=C("dmvae.dropout", 0.0), a=C("dmvae.a", 1e-5),
            hidden_dim=C("dmvae.hidden_dim", 512), embed_dim=embed_dim,
            lr=C("dmvae.lr", 1e-4), num_epochs=dmvae_epochs,
            fused_modalities=fused_dmvae,
        )
        for k in seed_keys
    ]
    model, _, bb_loss_fn, bb_opt, bb_state = dm[0]
    if bb_state is not None:
        raise ValueError(
            "one-program cells require a stateless backbone; this config "
            "carries BatchNorm feature encoders — use --vmap-seeds or the "
            "sequential path"
        )

    # ---- head jobs (the roster comes from build_cell_head_specs — ONE
    # source of truth with the vmapped engine, same order + rng
    # derivations by construction) ----
    specs = build_cell_head_specs(
        build_probe_task=build_probe_task,
        build_disentangled_probe_task=build_disentangled_probe_task,
        build_late_fusion_task=build_late_fusion_task,
        dims=dims, num_classes=num_classes, lr=lr,
        probe_input_dim=probe_input_dim, probe_hidden=probe_hidden,
        probe_dropout=probe_dropout, annealing_start=annealing_start,
        probe_epochs=probe_epochs, intermediate_fusions=intermediate_fusions,
        dtype=dtype, dataset_name=dataset_name, seeds=seeds,
        rows_by_seed=rows_by_seed,
    )

    jobs = []
    for j, (name, builder, kind, shared_layout) in enumerate(specs):
        tasks = [builder(jax.random.fold_in(k, 10 + j)) for k in seed_keys]
        jobs.append(CellJob(
            name=name, task=tasks[0],
            params_stack=stack_params([t.params for t in tasks]),
            rngs=jnp.stack([jax.random.fold_in(k, 100 + j) for k in seed_keys]),
            kind=kind, epochs=probe_epochs, shared_layout=shared_layout,
        ))

    result = run_cell(
        backbone_model=model,
        bb_params_stack=stack_params([t[1] for t in dm]),
        bb_loss_fn=bb_loss_fn, bb_optimizer=bb_opt, bb_epochs=dmvae_epochs,
        bb_rngs=jnp.stack([jax.random.fold_in(k, 1) for k in seed_keys]),
        jobs=jobs, xs_tr=xs_tr, xs_te=xs_te, y_tr=y_tr, y_te=y_te,
        n_train=n_train, batch_size=batch_size, mesh=mesh,
    )
    jax.block_until_ready(result.backbone_train_loss)
    t_run = time.time()
    print(f"  [{dataset_name}/{cond}] one-program cell ({s_count} seeds x "
          f"{len(jobs) + 1} fits) executed in {t_run - t0:.1f}s", flush=True)

    def finish(result=result):
        # ---- host side: rows, checkpoints, CSV logs (same artifacts) ----
        # ONE bulk device->host transfer of the whole cell result: the
        # per-seed per-leaf slicing below then runs on numpy. Sliced device
        # arrays would each pay a relay RTT (~28 ms, docs/PERF.md) —
        # measured 62 s of artifact time per cell against 24 s of compute
        # before this.
        result = jax.device_get(result)
        rows = cell_rows(jobs, result, seeds)
        for i, seed in enumerate(seeds):
            save_checkpoint(
                f"checkpoints/dmvae_dataset{dataset_name}_seed{seed}_a1e-05_{cond}",
                jax.tree.map(lambda a: a[i], result.backbone_params),
                {"dataset": dataset_name, "seed": seed, "cond": cond}, wait=False,
            )
        for job in jobs:
            out = result.jobs[job.name]
            for s, seed in enumerate(seeds):
                params_s = jax.tree.map(lambda a: a[s], out["params"])
                model_name = (
                    f"{job.name}_fusion_ds{dataset_name}_seed{seed}"
                    + ("_conflict" if conflict else "_noise" if noise else "")
                )
                log_training_csv(model_name, TrainResult(
                    params=None, train_loss=out["train_loss"][s],
                    val_loss=out["val_loss"][s], val_acc=out["val_acc"][s],
                    final_lr=out["final_lr"][s]))
                info = rows[int(seed)][job.name]
                info["path"] = save_checkpoint(
                    f"checkpoints/{model_name}", params_s,
                    {"model": job.name, "dataset": dataset_name, "seed": seed},
                    wait=False,
                )
                rows_by_seed[seed][job.name] = info
            accs = [rows_by_seed[s][job.name]["fused"]["accuracy"] for s in seeds]
            print(f"  [{dataset_name}/{cond}] {job.name} x{s_count}: fused_acc "
                  f"{np.mean(accs):.4f} +/- {np.std(accs):.4f}", flush=True)
        print(f"  {dataset_name}/{cond} ({s_count} seeds) one-program cell done "
              f"in {time.time() - t0:.1f}s (run {t_run - t0:.1f}s, "
              f"artifacts {time.time() - t_run:.1f}s)", flush=True)

    if defer_artifacts:
        return finish
    finish()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seeds", type=int, nargs="*", default=None)
    parser.add_argument("--datasets", type=str, nargs="*", default=None)
    parser.add_argument("--conditions", type=str, nargs="*", default=["Normal", "Conflict"])
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--backbone", choices=["dmvae", "dssl"], default="dmvae",
                        help="disentangling backbone: DMVAE (reference "
                             "run.py protocol) or DisentangledSSL "
                             "(disentangledssl.py:17-194 — the reference "
                             "documents it as a drop-in under the same "
                             "get_embedding contract, README.md:110-229, "
                             "but never runs it on real data; 2-modal, so "
                             "use --datasets CUB). Probe rows/checkpoints "
                             "are named dssl_* and the report goes to "
                             "logs/dssl_dataset_analysis.xlsx")
    parser.add_argument("--no-fused-dmvae", action="store_true",
                        help="use the unfused per-modality DMVAE")
    parser.add_argument(
        "--probe-engine", choices=["xla", "megakernel"], default="xla",
        help="probe-fit execution engine: 'xla' (default; the step-scan "
             "program) or 'megakernel' (whole-epoch Pallas kernel, "
             "core/megakernel.py — one kernel launch per epoch with "
             "params/Adam state VMEM-resident; same randomness stream, "
             "float-level parity pinned by tests/test_probe_megakernel.py). "
             "Sequential path only; applies to the probe fits (the DMVAE "
             "fit is HBM-bound and keeps the XLA program either way)",
    )
    parser.add_argument(
        "--one-program-cells", action="store_true",
        help="run each (dataset, condition) cell as ONE jitted XLA program: "
             "backbone fit -> embeddings -> all head fits -> all "
             "evaluations, seeds vmapped (core/sweep_cell.py). Same math "
             "and RNG streams as --vmap-seeds with zero per-fit dispatch "
             "or host syncs; the fastest full-sweep engine on TPU. "
             "Stateless models only (the .mat UQ protocol qualifies)",
    )
    parser.add_argument(
        "--vmap-seeds", action="store_true",
        help="train all seeds of each (dataset, condition) cell as one "
             "vmapped program (identical math per seed). Wall-clock effect "
             "depends on the regime (docs/PERF.md §3-4): dispatch-bound "
             "probe fits get ~2x per-seed; the HBM-bound DMVAE fit scales "
             "~linearly in traffic, so the win there is sweep "
             "orchestration (one program, one compile), not per-seed speed",
    )
    parser.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default="float32",
        help="matmul compute dtype (params/losses stay f32; bfloat16 runs "
             "encoder/decoder/head matmuls on the MXU in bf16)",
    )
    parser.add_argument(
        "--include-intermediate", action="store_true",
        help="also sweep the IntermediateFusion baseline (concat -> single "
             "evidential head; reference baselines.py:153-252, defined "
             "there but never swept)",
    )
    parser.add_argument(
        "--intermediate-fusion", type=str, nargs="*", default=None,
        metavar="NAME",
        help="sweep IntermediateFusion with these library fusion ops "
             "(models/fusions.py INTERMEDIATE_FUSIONS, e.g. lrtf tensor "
             "mi_matrix lft; 'concat' is the reference's choice and is what "
             "--include-intermediate adds); view-count-incompatible fusions "
             "are skipped per dataset with a warning",
    )
    parser.add_argument(
        "--profile", action="store_true",
        help="collect a jax.profiler trace of the sweep to logs/traces/ "
             "(view with TensorBoard or Perfetto; §5.1 capability the "
             "reference lacks entirely)",
    )
    parser.add_argument(
        "--skip-report", action="store_true",
        help="skip the final report write (used by sweep_parallel workers, "
             "whose rows are merged and reported once by the orchestrator — "
             "prevents partial worker reports clobbering the canonical one)",
    )
    parser.add_argument(
        "--rows-file", default=None, metavar="PATH",
        help="crash-resilient sweeps: after every (condition, dataset) cell "
             "the accumulated result rows are checkpointed to PATH (JSON); "
             "on restart, completed cells are skipped and the report is "
             "built once all requested cells exist. Lets a wrapper simply "
             "re-invoke the sweep until it completes (NEW capability — the "
             "reference loses everything on a crash)",
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
    import numpy as np

    mesh = build_runner_mesh(args.data_parallel, args.model_parallel)

    from ..core.tasks import (
        build_disentangled_probe_task,
        build_dmvae_task,
        build_late_fusion_task,
        build_probe_task,
        embed_dataset,
    )
    from .common import load_config, make_getter

    C = make_getter(load_config("config.yaml"))
    if args.dtype != "float32":
        from functools import partial

        build_dmvae_task = partial(build_dmvae_task, dtype=args.dtype)
        build_probe_task = partial(build_probe_task, dtype=args.dtype)
        build_disentangled_probe_task = partial(
            build_disentangled_probe_task, dtype=args.dtype
        )
        build_late_fusion_task = partial(build_late_fusion_task, dtype=args.dtype)
    builders = (build_dmvae_task, build_probe_task, build_disentangled_probe_task,
                build_late_fusion_task, embed_dataset)

    seeds = args.seeds if args.seeds is not None else C("experiment.seeds", [0, 1, 2, 3, 4])
    if args.backbone == "dssl" and (args.vmap_seeds or args.one_program_cells):
        parser.error("--backbone dssl runs the sequential path only "
                     "(the SSL backbone has no vmapped trainer; same "
                     "restriction as run_synthetic)")
    if args.probe_engine == "megakernel" and (args.vmap_seeds or args.one_program_cells):
        parser.error("--probe-engine megakernel runs the sequential path "
                     "only (train_many has no kernel program)")
    if args.probe_engine == "megakernel" and (args.data_parallel > 1
                                              or args.model_parallel > 1):
        parser.error("--probe-engine megakernel is single-device "
                     "(probe fits are KB-scale; mesh parallelism applies "
                     "to the backbone fit, which keeps the XLA program)")
    # axon-relay safety guard: auto-fallback to the sequential path in the
    # known-crash config (f32 vmapped probe compiles; see common.py)
    args.vmap_seeds = guard_vmap_seeds(args, len(seeds), args.dtype)
    normal_ds = args.datasets or C(
        "experiment.normal_datasets", ["CUB", "HandWritten", "PIE", "Scene"]
    )
    conflict_ds = args.datasets or C(
        "experiment.conflict_datasets", ["CUB", "HandWritten", "PIE", "Scene"]
    )

    t_start = time.time()
    rows = {}

    _profile_stack = None
    if args.profile:
        import contextlib

        from ..core.logging import trace

        _profile_stack = contextlib.ExitStack()
        _profile_stack.enter_context(trace("uq_sweep"))

    def _close_profile():
        # called from finally: a crashed sweep still flushes the trace —
        # the crash case is exactly when you want the profile
        if _profile_stack is not None:
            _profile_stack.close()
            print("profiler trace written to logs/traces/uq_sweep", flush=True)

    # ---- crash-resilient rows checkpoint (--rows-file) ----
    import json
    from pathlib import Path

    from ..models.fusions import INTERMEDIATE_FUSIONS

    ifusions = list(args.intermediate_fusion or [])
    unknown = [f for f in ifusions if f not in INTERMEDIATE_FUSIONS]
    if unknown:
        parser.error(f"unknown --intermediate-fusion {unknown}; "
                     f"supported: {INTERMEDIATE_FUSIONS}")
    if args.include_intermediate and "concat" not in ifusions:
        ifusions.insert(0, "concat")

    n_models = 6 + len(ifusions)

    def _cell_complete(cond_name, ds_name):
        return all(
            len(rows.get(s, {}).get(cond_name, {}).get(ds_name, {})) >= n_models
            for s in seeds
        )

    if args.rows_file and Path(args.rows_file).exists():
        saved = json.loads(Path(args.rows_file).read_text())
        rows = {int(s): conds for s, conds in saved.items()}
        n_cells = sum(
            1 for c in ("Normal", "Conflict", "Noise")
            for d in (normal_ds if c == "Normal" else conflict_ds)
            if _cell_complete(c, d)
        )
        print(f"--rows-file: resuming; {n_cells} completed cell(s) found",
              flush=True)

    def _save_rows():
        if not args.rows_file:
            return
        # a cell marked complete must have durable checkpoints (its rows
        # carry the checkpoint paths) — flush pending async saves first
        from ..core.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
        tmp = Path(args.rows_file).with_suffix(".tmp")
        tmp.write_text(json.dumps(rows))
        tmp.replace(args.rows_file)

    # ---- 1-deep artifacts pipeline (one-program cells) ----
    # A deferred artifacts phase (device->host fetch + checkpoints) runs in
    # a background thread WHILE the next cell executes on the device: on a
    # relay-attached chip the fetch is a minutes-scale pure-transfer wait
    # with the device idle. At most ONE artifacts thread is outstanding
    # (transfers stay serialized; rows-file writes stay ordered).
    import threading

    _pending: list = []

    def _flush_pending():
        if not _pending:
            return
        t, err = _pending.pop()
        t.join()
        if err:
            raise err[0]

    def _defer_artifacts(finish, cond_name, ds_name, rows_by_seed):
        err: list = []

        def work():
            try:
                finish()
                for s in seeds:
                    rows[s][cond_name][ds_name] = rows_by_seed[s]
                _save_rows()
            except BaseException as e:  # re-raised at the next flush
                err.append(e)

        t = threading.Thread(target=work, name="cell-artifacts", daemon=True)
        t.start()
        _pending.append((t, err))

    try:
        if args.vmap_seeds or args.one_program_cells:
            cell_runner = (run_condition_onejit if args.one_program_cells
                           else run_condition_vmapped)
            for seed in seeds:
                rows.setdefault(seed, {})
                for c in args.conditions:
                    rows[seed].setdefault(c, {})
            # "Noise" condition (addNoise on test rows, sigma from
            # data.conflict.sigma) — the reference's config knob
            # (configs/config.yaml:13-18) that its drivers never sweep
            for cond_name, ds_list, is_conflict, is_noise in [
                ("Normal", normal_ds, False, False),
                ("Conflict", conflict_ds, True, False),
                ("Noise", conflict_ds, False, True),  # Gaussian-noise UQ variant
            ]:
                if cond_name not in args.conditions:
                    continue
                for ds_name in ds_list:
                    if args.rows_file and _cell_complete(cond_name, ds_name):
                        print(f"  [{ds_name}/{cond_name}] already complete "
                              f"(--rows-file), skipping", flush=True)
                        continue
                    rows_by_seed = {s: {} for s in seeds}
                    kw = dict(
                        C=C, seeds=seeds, dataset_name=ds_name, conflict=is_conflict,
                        quick=args.quick, jax=jax, jnp=jnp, np=np, builders=builders,
                        rows_by_seed=rows_by_seed, fused_dmvae=not args.no_fused_dmvae,
                        noise=is_noise, mesh=mesh,
                        intermediate_fusions=ifusions,
                        dtype=None if args.dtype == "float32" else args.dtype,
                    )
                    if args.one_program_cells:
                        finish = cell_runner(**kw, defer_artifacts=True)
                        _flush_pending()  # previous cell's transfer done
                        _defer_artifacts(finish, cond_name, ds_name, rows_by_seed)
                    else:
                        cell_runner(**kw)
                        for s in seeds:
                            rows[s][cond_name][ds_name] = rows_by_seed[s]
                        _save_rows()
            _flush_pending()
        else:
            for seed in seeds:
                rows.setdefault(seed, {})
                for cond_name, ds_list, is_conflict, is_noise in [
                    ("Normal", normal_ds, False, False),
                    ("Conflict", conflict_ds, True, False),
                    ("Noise", conflict_ds, False, True),
                ]:
                    if cond_name not in args.conditions:
                        continue
                    rows[seed].setdefault(cond_name, {})
                    for ds_name in ds_list:
                        if (args.rows_file
                                and len(rows[seed][cond_name].get(ds_name, {})) >= n_models):
                            print(f"  [{ds_name}/{cond_name}/seed{seed}] already "
                                  f"complete (--rows-file), skipping", flush=True)
                            continue
                        rows[seed][cond_name][ds_name] = {}
                        run_condition(
                            C=C, seed=seed, dataset_name=ds_name, conflict=is_conflict,
                            noise=is_noise, quick=args.quick, jax=jax, jnp=jnp, np=np,
                            builders=builders, rows_out=rows[seed][cond_name][ds_name],
                            fused_dmvae=not args.no_fused_dmvae, mesh=mesh,
                            intermediate_fusions=ifusions,
                            dtype=None if args.dtype == "float32" else args.dtype,
                            backbone=args.backbone,
                            probe_engine=args.probe_engine,
                        )
                        _save_rows()


    finally:
        _close_profile()

    df = None
    if not args.skip_report:
        report = C("logging.datasets_excel_path", "logs/dataset_analysis.xlsx")
        if args.backbone == "dssl":
            # never let a dssl-backbone sweep overwrite the canonical
            # dmvae-backbone report
            from pathlib import Path as _P

            p = _P(report)
            report = str(p.with_name(f"dssl_{p.name}"))
        df = write_sweep_report(rows, report)
    from ..core.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # async saves must be durable before we declare done
    print(f"sweep done in {time.time() - t_start:.1f}s")
    return df


def write_sweep_report(rows, excel_path):
    """Flatten nested sweep rows and write the 3-sheet report.

    Shared by the in-process sweep above and the dataset-parallel
    orchestrator (sweep_parallel.py), so a merged multi-process sweep
    produces byte-identical reports to a sequential one. Mirrors the
    reference's grouped-Excel export (run.py:329-343).
    """
    from ..eval.analysis import build_metrics_dataframe_datasets
    from .common import main_columns, write_report

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
        {
            "main_grouped": df_main_grouped,
            "all_results": df,
            "grouped_results": df_grouped,
        },
        excel_path,
    )
    from pathlib import Path

    from ..core.artifacts import artifact_path
    from ..eval.uq_plots import write_uq_plots

    plots = write_uq_plots(
        rows, artifact_path(Path(excel_path).parent / "uq_plots")
    )
    if plots:
        print(f"  wrote {len(plots)} UQ figures -> "
              f"{Path(plots[0]).parent}", flush=True)
    return df


if __name__ == "__main__":
    main()
