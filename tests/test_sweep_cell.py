"""One-program sweep cell (core/sweep_cell.py): parity with the separate
train()/evaluate path, the stateless guard, mesh instance-dp, and the
--one-program-cells CLI route.

The cell program must be the SAME math as the sequential harness — only
program boundaries move — so these tests compare the fused cell's metrics
against fits run one-by-one with identical RNG streams. Tolerance is a few
e-5: XLA fuses/reorders reductions differently across program boundaries
(documented in the module docstring); bitwise equality is not promised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentagled_multimodal_fusion_tpu.core.sweep_cell import (
    CellJob,
    cell_rows,
    run_cell,
)
from disentagled_multimodal_fusion_tpu.core.tasks import (
    build_dmvae_task,
    build_late_fusion_task,
    build_probe_task,
    embed_dataset,
)
from disentagled_multimodal_fusion_tpu.core.train import train
from disentagled_multimodal_fusion_tpu.data.synthetic import make_simple_plus_splits
from disentagled_multimodal_fusion_tpu.eval.analysis import (
    evaluate_subjective_model_with_shared,
)

EPOCHS = 4
BATCH = 128


@pytest.fixture(scope="module")
def synth():
    ds, (xs_tr, y_tr), (xs_va, y_va) = make_simple_plus_splits(
        n_samples=900, rho=0.6, shared_class_frac=0.6, seed=0,
        class_sep_shared=1.5, class_sep_private=1.3, noise_std=0.4,
        hetero_noise=False, conflict_frac=0.1, conflict_strength=0.3,
        nonlinear_shared=False, d_spurious=4,
    )
    return (
        tuple(jnp.asarray(x) for x in xs_tr), jnp.asarray(y_tr),
        tuple(jnp.asarray(x) for x in xs_va), jnp.asarray(y_va),
    )


def _stack(params_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def _build_cell(synth, seeds, mesh=None):
    xs_tr, y_tr, xs_te, y_te = synth
    S = len(seeds)
    n_train = int(xs_tr[0].shape[0])
    keys = [jax.random.PRNGKey(1000 + s) for s in seeds]

    dm = [
        build_dmvae_task(
            rng=jax.random.fold_in(k, 0), xs_sample=xs_tr, output_dim=[20, 20],
            embed_dim=8, hidden_dim=128, a=1e-5, lr=1e-3, num_epochs=EPOCHS,
            fused_modalities=True,
        )
        for k in keys
    ]
    model, _, bb_loss_fn, bb_opt, _ = dm[0]

    def mk_probe(k):
        return build_probe_task(
            rng=k, num_modalities=2, num_classes=3, input_dim=8,
            hidden_dim=(32,), lr=3e-3, dropout=0.1, annealing_start=10,
            aggregation="cml", fused=1.0, num_epochs=EPOCHS,
        )

    def mk_lf(k):
        return build_late_fusion_task(
            rng=k, output_dims=[20, 20], num_classes=3, hidden_dim=(32,),
            dropout=0.1, lr=3e-3, annealing_start=10, aggregation="cml",
            fused=1.0,
        )

    jobs = []
    for j, (name, builder, kind, shared_layout) in enumerate([
        ("probe_cml", mk_probe, "probe", True),
        ("lf_cml", mk_lf, "raw", True),
    ]):
        tasks = [builder(jax.random.fold_in(k, 10 + j)) for k in keys]
        jobs.append(CellJob(
            name=name, task=tasks[0],
            params_stack=_stack([t.params for t in tasks]),
            rngs=jnp.stack([jax.random.fold_in(k, 100 + j) for k in keys]),
            kind=kind, epochs=EPOCHS, shared_layout=shared_layout,
        ))

    stack = lambda f: jnp.stack([f(k) for k in keys])  # noqa: E731
    result = run_cell(
        backbone_model=model,
        bb_params_stack=_stack([t[1] for t in dm]),
        bb_loss_fn=bb_loss_fn, bb_optimizer=bb_opt, bb_epochs=EPOCHS,
        bb_rngs=stack(lambda k: jax.random.fold_in(k, 1)),
        jobs=jobs,
        xs_tr=tuple(jnp.broadcast_to(x, (S, *x.shape)) for x in xs_tr),
        xs_te=tuple(jnp.broadcast_to(x, (S, *x.shape)) for x in xs_te),
        y_tr=jnp.broadcast_to(y_tr, (S, *y_tr.shape)),
        y_te=jnp.broadcast_to(y_te, (S, *y_te.shape)),
        n_train=n_train, batch_size=BATCH, mesh=mesh,
    )
    return model, dm, jobs, result, keys


def test_cell_matches_separate_fits(synth):
    """The fused cell reproduces per-fit train()+evaluate numbers."""
    xs_tr, y_tr, xs_te, y_te = synth
    seeds = [0, 1]
    model, dm, jobs, result, keys = _build_cell(synth, seeds)
    rows = cell_rows(jobs, result, seeds)

    n_train = int(xs_tr[0].shape[0])
    for si, seed in enumerate(seeds):
        k = keys[si]
        # backbone, trained stand-alone with the identical stream
        _, params0, bb_loss_fn, bb_opt, _ = dm[si]
        bb = train(
            rng=jax.random.fold_in(k, 1), params=params0, loss_fn=bb_loss_fn,
            data={"xs": xs_tr}, n_train=n_train, optimizer=bb_opt,
            epochs=EPOCHS, batch_size=BATCH, donate=False,
        )
        np.testing.assert_allclose(
            np.asarray(result.backbone_train_loss)[si],
            np.asarray(bb.train_loss), rtol=5e-5, atol=1e-6,
        )
        zc_tr, zp_tr = embed_dataset(model, bb.params, xs_tr)
        zc_te, zp_te = embed_dataset(model, bb.params, xs_te)
        datamap = {
            "probe": ({"zc": zc_tr, "zp": zp_tr, "y": y_tr},
                      {"zc": zc_te, "zp": zp_te, "y": y_te}),
            "raw": ({"xs": xs_tr, "y": y_tr}, {"xs": xs_te, "y": y_te}),
        }
        for j, job in enumerate(jobs):
            tr_d, te_d = datamap[job.kind]
            task = job.task if si == 0 else None
            # rebuild the per-seed task for its init params
            if si == 0:
                params_j = jax.tree.map(lambda a: a[0], job.params_stack)
            else:
                params_j = jax.tree.map(lambda a: a[si], job.params_stack)
            r = train(
                rng=jax.random.fold_in(k, 100 + j), params=params_j,
                loss_fn=job.task.loss_fn, data=tr_d, n_train=n_train,
                optimizer=job.task.optimizer, epochs=EPOCHS, batch_size=BATCH,
                val_fn=job.task.val_fn, val_data=te_d, donate=False,
            )
            info = evaluate_subjective_model_with_shared(job.task, r.params, te_d)
            got = rows[seed][job.name]
            assert got["fused"]["accuracy"] == pytest.approx(
                info["fused"]["accuracy"], abs=1e-6
            )
            np.testing.assert_allclose(
                got["fused"]["evidence_mean"], info["fused"]["evidence_mean"],
                rtol=2e-4,
            )
            np.testing.assert_allclose(
                got["fused"]["ece"], info["fused"]["ece"], rtol=2e-4, atol=1e-6
            )
            # shared-layout schema intact: shared block + the remaining views
            assert "shared" in got
            assert len(got["per_view"]) == len(info["per_view"])
            np.testing.assert_allclose(
                np.asarray(result.jobs[job.name]["val_acc"])[si],
                np.asarray(r.val_acc), rtol=1e-5, atol=1e-6,
            )


def test_cell_rejects_stateful_heads(synth):
    """BatchNorm-carrying heads must be refused loudly."""
    xs_tr, y_tr, xs_te, y_te = synth
    job = CellJob(
        name="x", task=None, params_stack=None, rngs=None,
        kind="raw", epochs=1, shared_layout=False,
    )

    class FakeTask:
        model_state = {"batch_stats": 1}

    job = job._replace(task=FakeTask())
    with pytest.raises(ValueError, match="stateless"):
        run_cell(
            backbone_model=None, bb_params_stack=None, bb_loss_fn=None,
            bb_optimizer=None, bb_epochs=1,
            bb_rngs=jnp.stack([jax.random.PRNGKey(0)]), jobs=[job],
            xs_tr=None, xs_te=None, y_tr=None, y_te=None,
            n_train=8, batch_size=4,
        )


def test_cell_mesh_instance_dp(synth):
    """mesh=... shards the seed axis; numbers match the unsharded run."""
    from disentagled_multimodal_fusion_tpu.parallel.mesh import make_mesh

    xs_tr, y_tr, xs_te, y_te = synth
    seeds = [0, 1]
    _, _, jobs, res_plain, _ = _build_cell(synth, seeds)
    mesh = make_mesh(n_devices=2, model_parallel=1)
    _, _, jobs_m, res_mesh, _ = _build_cell(synth, seeds, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res_plain.backbone_train_loss),
        np.asarray(res_mesh.backbone_train_loss), rtol=1e-5, atol=1e-7,
    )
    for job in jobs:
        np.testing.assert_allclose(
            np.asarray(res_plain.jobs[job.name]["val_acc"]),
            np.asarray(res_mesh.jobs[job.name]["val_acc"]),
            rtol=1e-5, atol=1e-7,
        )
    with pytest.raises(ValueError, match="must divide"):
        _build_cell(synth, [0, 1, 2], mesh=mesh)


def test_onejit_runner_matches_vmapped_runner():
    """run_condition_onejit reproduces run_condition_vmapped's rows on a
    real .mat cell (CUB quick; documented few-e-5 tolerance)."""
    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_disentangled_probe_task as b_dis,
        build_dmvae_task as b_dm,
        build_late_fusion_task as b_lf,
        build_probe_task as b_pr,
        embed_dataset as emb,
    )
    from disentagled_multimodal_fusion_tpu.runners.common import (
        load_config,
        make_getter,
    )
    from disentagled_multimodal_fusion_tpu.runners.run import (
        run_condition_onejit,
        run_condition_vmapped,
    )

    C = make_getter(load_config("config.yaml"))
    builders = (b_dm, b_pr, b_dis, b_lf, emb)
    rows_one = {0: {}}
    run_condition_onejit(
        C=C, seeds=[0], dataset_name="CUB", conflict=False, quick=True,
        jax=jax, jnp=jnp, np=np, builders=builders, rows_by_seed=rows_one,
    )
    rows_vm = {0: {}}
    run_condition_vmapped(
        C=C, seeds=[0], dataset_name="CUB", conflict=False, quick=True,
        jax=jax, jnp=jnp, np=np, builders=builders, rows_by_seed=rows_vm,
    )
    assert set(rows_one[0]) == set(rows_vm[0])
    for name in rows_one[0]:
        a, b = rows_one[0][name], rows_vm[0][name]
        assert a["fused"]["accuracy"] == pytest.approx(
            b["fused"]["accuracy"], abs=1e-6), name
        np.testing.assert_allclose(
            a["fused"]["evidence_mean"], b["fused"]["evidence_mean"],
            rtol=5e-4, err_msg=name,
        )
        assert ("shared" in a) == ("shared" in b), name


def test_one_program_cells_cli_smoke():
    """--one-program-cells flag wiring: a quick 1-seed CUB sweep end-to-end
    through main() produces the full 6-model report."""
    from disentagled_multimodal_fusion_tpu.runners.run import main as run_main

    df = run_main(["--quick", "--seeds", "0", "--datasets", "CUB",
                   "--conditions", "Normal", "--one-program-cells"])
    assert df is not None and len(df) == 6
    assert set(df["model"]) == {
        "dmvae_dis", "dmvae_cml", "dmvae_joint",
        "dbf_fusion", "cml_fusion", "avg_fusion",
    }
