"""Multi-process cluster worker for tests/test_multiprocess.py.

Launched N times (one subprocess per simulated host) with the production
env-var cluster config (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID) so the exact code path a real TPU-pod launcher drives —
``core.setup.configure()`` -> ``parallel.distributed.initialize()`` — is
what joins the cluster. Each process then runs the full production stack
over the GLOBAL mesh:

  A. ``core.train.train``       — dp+tp DMVAE training step
  B. ``core.train.train_many``  — instance-dp seeds sweep
  C. ``core.serve``             — row-dp ServingEngine on the trained backbone
  D. ``process_rows`` + ``jax.make_array_from_process_local_data`` —
     the documented huge-corpus feeding path (each host materializes only
     its own rows)

and prints one ``MPRESULT {json}`` line. The pytest launcher runs
:func:`run_legs` single-process on a same-shape mesh and asserts the
numbers match — multi-host execution must be numerically the same SPMD
program, just partitioned over processes.

The reference has no counterpart (SURVEY.md §2.3: every pl.Trainer is
single-process); this is the framework's own multi-host (DCN) capability
being executed in its real multi-process regime.
"""

from __future__ import annotations

import json


def _fetch(mesh, x):
    """Gather a (possibly non-addressable) global array to a host value."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    return np.asarray(
        jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
    )


def run_legs(mesh):
    """Run legs A-D on ``mesh``; returns a JSON-serializable result dict.

    Pure w.r.t. process count: all inputs are deterministic in seeds, so a
    single-process run on a same-shape mesh must produce the same numbers.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from disentagled_multimodal_fusion_tpu.core.serve import (
        ServingEngine,
        build_inference_fn,
    )
    from disentagled_multimodal_fusion_tpu.core.tasks import (
        build_dmvae_task,
        build_probe_task,
    )
    from disentagled_multimodal_fusion_tpu.core.train import train, train_many
    from disentagled_multimodal_fusion_tpu.parallel.distributed import (
        process_rows,
    )

    out = {}
    n_dp = mesh.shape["data"]

    # ---- leg A: dp+tp full training via train(mesh=...) ----
    hidden = 16  # divisible by the 'model' axis
    dims = (12, 8)
    batch = 4 * n_dp
    n_rows = 2 * batch
    xs = tuple(
        jnp.asarray(np.random.default_rng(i).random((n_rows, d), np.float32))
        for i, d in enumerate(dims)
    )
    model, params, loss_fn, opt, bstats = build_dmvae_task(
        rng=jax.random.PRNGKey(0), xs_sample=xs, output_dim=dims, a=1e-5,
        hidden_dim=hidden, embed_dim=4, lr=1e-3, num_epochs=3,
        fused_modalities=True,
    )
    res = train(
        rng=jax.random.PRNGKey(1), params=params, loss_fn=loss_fn,
        data={"xs": xs}, n_train=n_rows, optimizer=opt, epochs=3,
        batch_size=batch, model_state=bstats, mesh=mesh, tp_hidden_dim=hidden,
        donate=False,
    )
    out["train_loss"] = [float(x) for x in _fetch(mesh, res.train_loss)]

    # ---- leg B: instance-dp seeds sweep via train_many(mesh=...) ----
    S = 2 * n_dp
    B, N, D, C = 16, 2, 4, 3
    rng = np.random.default_rng(7)
    data = {
        "zc": jnp.asarray(rng.standard_normal((S, B, D)).astype(np.float32)),
        "zp": jnp.asarray(rng.standard_normal((S, B, N, D)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, C, (S, B))),
    }
    tasks = [
        build_probe_task(
            rng=jax.random.PRNGKey(10 + s), num_modalities=N, num_classes=C,
            input_dim=D, hidden_dim=(8,), lr=3e-3, dropout=0.0,
            annealing_start=5, aggregation="cml", fused=1.0, num_epochs=2,
        )
        for s in range(S)
    ]
    res_m = train_many(
        rngs=jnp.stack([jax.random.PRNGKey(100 + s) for s in range(S)]),
        params_stack=jax.tree.map(lambda *x: jnp.stack(x), *[t.params for t in tasks]),
        loss_fn=tasks[0].loss_fn, data_stack=data, n_train=B,
        optimizer=tasks[0].optimizer, epochs=2, batch_size=8,
        val_fn=tasks[0].val_fn, val_data_stack=data, mesh=mesh,
    )
    out["many_val_acc"] = [
        round(float(a), 6) for a in _fetch(mesh, res_m.val_acc)[:, -1]
    ]
    out["many_train_loss"] = [
        round(float(a), 6) for a in _fetch(mesh, res_m.train_loss)[:, -1]
    ]

    # ---- leg C: row-dp serving on the trained leg-A backbone ----
    probe = build_probe_task(
        rng=jax.random.PRNGKey(3), num_modalities=len(dims), num_classes=C,
        input_dim=4, hidden_dim=(8,), lr=3e-3, dropout=0.0, aggregation="cml",
    )
    engine = ServingEngine(
        build_inference_fn(
            probe, probe.params, backbone=model, backbone_params=res.params,
            mesh=mesh,
        ),
        buckets=(n_dp,),
        divisor=n_dp,
    )
    served = engine(tuple(np.asarray(x)[: 2 * n_dp + 1] for x in xs))
    out["serve_pred"] = [int(p) for p in _fetch(mesh, served["pred"])]
    out["serve_probs_sum"] = round(float(_fetch(mesh, served["probs"]).sum()), 5)
    out["serve_epistemic"] = [
        round(float(e), 6) for e in _fetch(mesh, served["epistemic"])
    ]

    # ---- leg D: host-local corpus feeding (each host loads ONLY its rows) ----
    n = 8 * n_dp
    full = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    sl = process_rows(n)
    sh = NamedSharding(mesh, P("data"))
    garr = jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(full[sl]), global_shape=full.shape
    )
    mean = jax.jit(
        lambda x: jnp.mean(x), out_shardings=NamedSharding(mesh, P())
    )(garr)
    out["corpus_mean"] = float(mean)
    out["corpus_mean_expected"] = float(full.mean())
    return out


def main():
    from disentagled_multimodal_fusion_tpu.core.setup import configure

    # The production boot path: configure() joins the cluster from the
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    # before any backend use.
    configure()

    import jax

    from disentagled_multimodal_fusion_tpu.parallel.distributed import (
        global_mesh,
        initialize,
    )

    # Idempotence: a second initialize() must detect the live cluster.
    assert initialize() == (jax.process_count() > 1)

    mesh = global_mesh(model_parallel=2)
    out = run_legs(mesh)
    out["process_id"] = jax.process_index()
    out["process_count"] = jax.process_count()
    out["n_global_devices"] = len(jax.devices())
    out["n_local_devices"] = len(jax.local_devices())
    out["mesh_shape"] = dict(
        zip(mesh.axis_names, (int(s) for s in mesh.devices.shape))
    )
    print("MPRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
