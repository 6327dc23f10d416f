"""Serving CLI: restore a sweep checkpoint, bench + export the inference path.

The reference has no serving/deployment entrypoint at all (training ends at
Lightning ``.test()``, run.py:179-326). This runner turns any trained
checkpoint from the .mat sweep into a production inference program
(core/serve.py): the frozen DMVAE backbone and the evidential head fused
into one XLA program per batch bucket, measured for latency/throughput on
the current device, and optionally AOT-serialized via ``jax.export`` so a
serving host can replay it without this package's model code.

Examples:
  # latency/throughput profile of a trained probe on the real chip
  python -m disentagled_multimodal_fusion_tpu.runners.serve \
      --model dmvae_cml --dataset HandWritten --seed 0

  # no checkpoint needed for a pure program-speed profile
  python -m disentagled_multimodal_fusion_tpu.runners.serve \
      --model cml_fusion --dataset HandWritten --random-init

  # bake per-bucket artifacts for a fleet
  python -m disentagled_multimodal_fusion_tpu.runners.serve \
      --model dmvae_cml --dataset HandWritten --seed 0 \
      --export-dir serving_artifacts/ --buckets 1 8 64
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from ..core.setup import configure

MODELS = ["dmvae_dis", "dmvae_cml", "dmvae_joint", "dbf_fusion", "cml_fusion", "avg_fusion"]


def _load(args, C):
    """Rebuild the task for a .mat-sweep checkpoint (run.py layout; same
    systematic naming contract as runners/evaluate.py) and return
    (infer_fn, xs_sample). With --random-init, skips restore: init params
    measure the same program (serving speed is weight-independent)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.checkpoint import restore_checkpoint
    from ..core.serve import build_inference_fn
    from .evaluate import _restore_state
    from ..core.tasks import (
        build_disentangled_probe_task,
        build_dmvae_task,
        build_late_fusion_task,
        build_probe_task,
    )
    from ..data.multiview import DATASET_REGISTRY

    seed, name = args.seed, args.model
    np.random.seed(seed)
    dataset = DATASET_REGISTRY[args.dataset]()
    views, _ = dataset.arrays()
    # tile the corpus rows up to the largest bucket so every bucket
    # measures its labeled batch size even past the dataset length
    need = max(args.buckets)
    tile = -(-need // len(views[0]))
    xs = tuple(
        jnp.asarray(np.concatenate([v] * tile, axis=0)[:need]) for v in views
    )
    dims = [int(d[0]) for d in dataset.dims]
    probe_hidden = tuple(C("probes.model_hidden_dim", (128,)))
    lr = C("optim.dataset_lr", {}).get(args.dataset, 3e-3)

    if name.startswith("dmvae_"):
        backbone, p0, _, _, bstats0 = build_dmvae_task(
            rng=jax.random.PRNGKey(0), xs_sample=xs, output_dim=dims,
            a=C("dmvae.a", 1e-5), hidden_dim=C("dmvae.hidden_dim", 512),
            embed_dim=C("dmvae.embed_dim", 200),
            fused_modalities=not args.no_fused_dmvae,
        )
        bb_ckpt = (
            args.dmvae_checkpoint
            or f"checkpoints/dmvae_dataset{args.dataset}_seed{seed}_a1e-05_normal"
        )
        bb_params = p0 if args.random_init else restore_checkpoint(bb_ckpt, p0)
        bb_state = bstats0 if args.random_init else _restore_state(bb_ckpt, bstats0)
        kw = dict(
            rng=jax.random.PRNGKey(0), num_modalities=len(dims),
            num_classes=dataset.num_classes,
            input_dim=C("probes.input_dim", 200), hidden_dim=probe_hidden,
            lr=lr, dropout=C("probes.dropout_p", 0.1),
        )
        if name == "dmvae_dis":
            task = build_disentangled_probe_task(**kw)
        else:
            task = build_probe_task(**kw, aggregation=name.split("_")[1])
    else:
        backbone = bb_params = bb_state = None
        task = build_late_fusion_task(
            rng=jax.random.PRNGKey(0), output_dims=dims,
            num_classes=dataset.num_classes, hidden_dim=probe_hidden,
            dropout=C("probes.dropout_p", 0.1), lr=lr,
            aggregation=name.split("_")[0],
        )

    params, model_state = task.params, task.model_state
    if not args.random_init:
        ckpt = args.checkpoint or (
            f"checkpoints/{name}_fusion_ds{args.dataset}_seed{seed}"
        )
        params = restore_checkpoint(ckpt, task.params)
        model_state = _restore_state(ckpt, task.model_state)

    infer = build_inference_fn(
        task, params, model_state=model_state,
        backbone=backbone, backbone_params=bb_params, backbone_state=bb_state,
    )
    return infer, xs


def _bench_bucket(infer, xs, b, reps):
    """Median wall-clock of the compiled program at bucket size b."""
    import jax

    xsb = tuple(x[:b] for x in xs)
    out = jax.block_until_ready(infer(xsb))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(infer(xsb))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return {
        "bucket": b,
        "latency_ms": round(med * 1e3, 4),
        "rows_per_s": round(b / med, 1),
        "p10_ms": round(times[max(0, len(times) // 10)] * 1e3, 4),
        "num_outputs": len(out),
    }


def _make_engine(infer, xs, args):
    """One warmed ServingEngine shared by --daemon and --http-port (warmup
    compiles/executes the whole bucket ladder — pay it once)."""
    from ..core.serve import ServingEngine

    engine = ServingEngine(infer, buckets=sorted(args.buckets))
    engine.warmup(xs)
    return engine


def _bench_daemon(engine, xs, args):
    """Sustained concurrent-client load through the micro-batching daemon
    (core/daemon.py): --daemon-clients threads issue back-to-back requests
    of random size in [1, --daemon-max-rows] for --daemon-seconds; reports
    end-to-end (queue + batch + device + slice) latency percentiles and
    sustained rows/s. The interesting contrast with the per-bucket numbers
    above: the daemon coalesces rider requests, so sustained throughput
    tracks the LARGEST bucket's rows/s while each client still sees
    single-request latency."""
    import threading

    import numpy as np

    from ..core.daemon import ServingDaemon

    # clients slice request rows out of the corpus: keep it numpy so the
    # slicing is free (eager device slicing compiles per distinct shape)
    xs = tuple(np.asarray(x) for x in xs)
    stop = time.perf_counter() + args.daemon_seconds
    done_rows = [0] * args.daemon_clients

    def client(cid):
        rng = np.random.RandomState(cid)
        while time.perf_counter() < stop:
            n = int(rng.randint(1, args.daemon_max_rows + 1))
            daemon.infer(tuple(x[:n] for x in xs))
            done_rows[cid] += n

    with ServingDaemon(engine, max_delay_ms=args.daemon_delay_ms) as daemon:
        t0 = time.perf_counter()
        ts = [threading.Thread(target=client, args=(i,))
              for i in range(args.daemon_clients)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        elapsed = time.perf_counter() - t0
        st = daemon.stats()
    st.update(
        clients=args.daemon_clients,
        max_delay_ms=args.daemon_delay_ms,
        seconds=round(elapsed, 2),
        sustained_rows_per_s=round(sum(done_rows) / elapsed, 1),
        sustained_requests_per_s=round(st["requests"] / elapsed, 1),
    )
    return st


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--model", choices=MODELS, required=True)
    parser.add_argument("--dataset", required=True, help=".mat registry name")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint", default=None,
                        help="override the systematic head checkpoint path")
    parser.add_argument("--dmvae-checkpoint", default=None)
    parser.add_argument("--no-fused-dmvae", action="store_true",
                        help="checkpoint was trained with the unfused "
                             "per-modality DMVAE (run.py --no-fused-dmvae)")
    parser.add_argument("--random-init", action="store_true",
                        help="skip checkpoint restore (program-speed profile)")
    parser.add_argument("--buckets", type=int, nargs="+",
                        default=[1, 8, 64, 256])
    parser.add_argument("--reps", type=int, default=30)
    parser.add_argument("--export-dir", default=None,
                        help="write one jax.export artifact per bucket here")
    parser.add_argument("--daemon", action="store_true",
                        help="also run the micro-batching daemon load test "
                             "(concurrent clients through core/daemon.py; "
                             "sustained throughput + tail latency)")
    parser.add_argument("--daemon-clients", type=int, default=8)
    parser.add_argument("--daemon-seconds", type=float, default=10.0)
    parser.add_argument("--daemon-max-rows", type=int, default=64,
                        help="each client request draws its row count "
                             "uniformly from [1, this]")
    parser.add_argument("--daemon-delay-ms", type=float, default=2.0,
                        help="daemon flush deadline (see core/daemon.py)")
    parser.add_argument("--http-port", type=int, default=None,
                        help="after the bench, serve the model over HTTP "
                             "until interrupted (core/http_front.py: "
                             "POST /v1/infer, GET /v1/stats, /healthz; "
                             "requests micro-batch through the daemon)")
    parser.add_argument("--http-host", default="127.0.0.1")
    args = parser.parse_args(argv)

    configure()
    import jax

    from .common import load_config, make_getter

    C = make_getter(load_config("config.yaml"))
    infer, xs = _load(args, C)

    rows = [_bench_bucket(infer, xs, b, args.reps) for b in sorted(args.buckets)]
    engine = (_make_engine(infer, xs, args)
              if (args.daemon or args.http_port is not None) else None)
    daemon_stats = _bench_daemon(engine, xs, args) if args.daemon else None

    exported = []
    if args.export_dir:
        from ..core.serve import export_inference

        outdir = Path(args.export_dir)
        outdir.mkdir(parents=True, exist_ok=True)
        for b in sorted(args.buckets):
            path = outdir / (
                f"{args.model}_{args.dataset}_seed{args.seed}_b{b}.stablehlo"
            )
            export_inference(infer, tuple(x[:b] for x in xs), str(path))
            exported.append(str(path))

    report = {
        "model": args.model,
        "dataset": args.dataset,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "random_init": bool(args.random_init),
        "buckets": rows,
        "daemon": daemon_stats,
        "exported": exported,
    }
    print(json.dumps(report, indent=1))

    if args.http_port is not None:
        from ..core.daemon import ServingDaemon
        from ..core.http_front import serve_forever

        with ServingDaemon(engine, max_delay_ms=args.daemon_delay_ms) as daemon:
            serve_forever(daemon, host=args.http_host, port=args.http_port)
    return report


if __name__ == "__main__":
    main()
