"""One-program sweep cell: an entire (dataset, condition) cell as ONE jit.

The reference runs each cell as ~7 separate Lightning fits plus a streaming
evaluation per model (run.py:179-326) — thousands of Python-dispatched
steps. Round-4 profiling (docs/PERF.md §4) showed that even our
scan-per-epoch harness leaves the probe fits dispatch-bound at ~18% of the
HBM floor: the per-fit program launches, the embed pass, the six eval
dispatches, and the host syncs between them dominate what's left of the
sweep wall-clock.

This module removes ALL of it. One XLA program per (dataset, condition)
computes, per seed (vmapped over the stacked seed axis):

    backbone fit (scan-per-epoch)
      -> frozen-backbone embeddings (train + test)
        -> every head fit (probes on embeddings, late fusions on raw views)
          -> every head's full evaluation pytree (eval.analysis._eval_all)

so a 5-seed x 7-model cell that used to be ~40 dispatches with host round
trips in between becomes ONE dispatch and ONE host transfer. The math is
bit-identical to the --vmap-seeds path: the same make_train_program
programs run on the same RNG streams (core.train folds 0x5CA1AB1E into
every train key; replicated here), the same embed apply, the same
evidences/aggregation closures, the same _eval_all metrics — only the
program boundaries moved.

Not supported (falls back to the sequential/vmapped paths): stateful
models (BatchNorm feature encoders — LUMA), the Pallas probe megakernel,
and the DisentangledSSL backbone (different data contract). The .mat UQ
sweep — the reference's headline protocol — is fully stateless and is
exactly the target.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax

from ..eval.analysis import _eval_all
from .train import OptimizerConfig, _cached_program, make_train_program


class CellJob(NamedTuple):
    """One head fit inside the cell program.

    ``task`` is the seed-0 EvidentialTask template: its loss/val/evidences
    closures are value-memoized (core.tasks._memoized), so every seed of a
    config shares the identical closure objects — which is what lets the
    cell program cache hit across conditions.
    """

    name: str
    task: Any               # EvidentialTask template
    params_stack: Any       # (S, ...) stacked initial params
    rngs: jax.Array         # (S, 2) train keys (pre-fold)
    kind: str               # 'probe' (embeddings) | 'raw' (views)
    epochs: int
    # Evaluation layout: run.py:246-249 dispatches by MODEL NAME, not by the
    # task's own has_shared — LateFusion is deliberately evaluated with the
    # [shared, views...] layout (its view 0 labeled "shared"), a reference
    # quirk kept for column parity. Carried explicitly here.
    shared_layout: bool


class CellResult(NamedTuple):
    backbone_params: Any    # (S, ...) trained backbone params
    backbone_train_loss: jax.Array  # (S, E)
    jobs: dict              # name -> dict(metrics=..., params=..., histories)


def _fold_train_keys(rngs: jax.Array) -> jax.Array:
    # core.train.train/train_many fold this constant into every train key
    # before running the program; replicate for bit-identical streams.
    return jax.vmap(lambda k: jax.random.fold_in(k, 0x5CA1AB1E))(rngs)


def run_cell(
    *,
    backbone_model,
    bb_params_stack,
    bb_loss_fn: Callable,
    bb_optimizer: OptimizerConfig,
    bb_epochs: int,
    bb_rngs: jax.Array,
    jobs: Sequence[CellJob],
    xs_tr,
    xs_te,
    y_tr,
    y_te,
    n_train: int,
    batch_size: int,
    mesh: Any = None,
) -> CellResult:
    """Run the whole cell (all seeds, all models) as one jitted program.

    All array inputs carry a leading S (seed) axis; ``mesh`` (optional)
    shards that instance axis over the mesh 'data' axis, train_many-style
    (zero collectives — each device runs its seeds' full cell locally).
    """
    for job in jobs:
        if job.task.model_state is not None:
            raise ValueError(
                f"one-program cell requires stateless heads; {job.name} "
                f"carries BatchNorm state — use the sequential/vmapped path"
            )

    S = bb_rngs.shape[0]
    job_names = tuple(j.name for j in jobs)

    def cell_one_seed(bb_params, bb_rng, job_params, job_rngs,
                      xs_tr, xs_te, y_tr, y_te):
        # ---- backbone fit (same program train()/train_many() build) ----
        bb_prog = make_train_program(
            loss_fn=bb_loss_fn, n_train=n_train, optimizer=bb_optimizer,
            epochs=bb_epochs, batch_size=batch_size, drop_last=False,
            shuffle=True, val_fn=None, has_state=False,
        )
        bb_res = bb_prog(bb_params, bb_rng, {"xs": xs_tr}, None, None)

        # ---- frozen-backbone embeddings (the one embed_dataset) ----------
        from .tasks import embed_dataset

        zc_tr, zp_tr = embed_dataset(backbone_model, bb_res.params, xs_tr)
        zc_te, zp_te = embed_dataset(backbone_model, bb_res.params, xs_te)
        data = {
            "probe": (
                {"zc": zc_tr, "zp": zp_tr, "y": y_tr},
                {"zc": zc_te, "zp": zp_te, "y": y_te},
            ),
            "raw": (
                {"xs": xs_tr, "y": y_tr},
                {"xs": xs_te, "y": y_te},
            ),
        }

        # ---- every head fit + its full evaluation ----
        outs = {}
        for job, jp, jr in zip(jobs, job_params, job_rngs):
            tr_d, te_d = data[job.kind]
            prog = make_train_program(
                loss_fn=job.task.loss_fn, n_train=n_train,
                optimizer=job.task.optimizer, epochs=job.epochs,
                batch_size=batch_size, drop_last=False, shuffle=True,
                val_fn=job.task.val_fn, has_state=False,
            )
            r = prog(jp, jr, tr_d, te_d, None)
            ev = job.task.evidences_fn(r.params, te_d)
            fused = job.task.aggregation(ev)
            outs[job.name] = {
                "metrics": _eval_all(ev, fused, y_te, job.task.num_classes),
                "params": r.params,
                "train_loss": r.train_loss,
                "val_loss": r.val_loss,
                "val_acc": r.val_acc,
                "final_lr": r.final_lr,
            }
        return bb_res.params, bb_res.train_loss, outs

    def build():
        return jax.jit(jax.vmap(cell_one_seed))

    run = _cached_program(
        ("cell", bb_loss_fn, bb_optimizer, bb_epochs, n_train, batch_size,
         job_names,
         tuple((j.task.loss_fn, j.task.val_fn, j.task.evidences_fn,
                j.task.optimizer, j.epochs, j.kind) for j in jobs)),
        build,
    )

    bb_rngs = _fold_train_keys(bb_rngs)
    job_params = tuple(j.params_stack for j in jobs)
    job_rngs = tuple(_fold_train_keys(j.rngs) for j in jobs)
    args = (bb_params_stack, bb_rngs, job_params, job_rngs,
            xs_tr, xs_te, y_tr, y_te)

    if mesh is not None:
        from ..parallel.mesh import shard_instances

        n_dp = mesh.shape["data"]
        if S % n_dp != 0:
            raise ValueError(
                f"one-program cell (mesh=...): seed count {S} must divide "
                f"by the mesh 'data' axis ({n_dp}); pad the seed list or "
                f"shrink the mesh"
            )
        args = shard_instances(args, mesh)

    bb_params_out, bb_loss, outs = run(*args)
    return CellResult(bb_params_out, bb_loss, outs)


def cell_rows(
    jobs: Sequence[CellJob],
    result: CellResult,
    seeds: Sequence[int],
) -> dict:
    """Fetch + format the cell result into per-seed metric dicts.

    Returns {seed: {model_name: nested sample_info}} with the exact schema
    of eval.analysis.evaluate_subjective_model[_with_shared] — one
    device_get for the whole cell.
    """
    from ..eval.analysis import format_eval_result

    fetched = jax.device_get({j.name: result.jobs[j.name]["metrics"] for j in jobs})
    rows = {int(s): {} for s in seeds}
    for job in jobs:
        v = int(fetched[job.name]["blocks"]["accuracy"].shape[1])
        for si, seed in enumerate(seeds):
            dev = jax.tree.map(lambda a: a[si], fetched[job.name])
            rows[int(seed)][job.name] = format_eval_result(
                dev, v, job.shared_layout
            )
    return rows
