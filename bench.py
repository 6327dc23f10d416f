"""Benchmark: HandWritten DMVAE training epoch wall-clock vs the PyTorch
reference, with a FLOP/MFU framing and bf16 + vmapped-seed variants.

Prints ONE JSON line:
  {"metric": "handwritten_dmvae_epoch_ms", "value": <ms/epoch (ours, f32)>,
   "unit": "ms", "vs_baseline": <torch_ms / ours>,
   "flops_per_epoch": N, "flops_per_sec": N, "bf16_epoch_ms": N,
   "vmapped": {"seeds": 5, "epoch_ms_per_seed": N, "flops_per_sec": N},
   "compile_s": {"f32": N, "bf16": N},
   "probe_epoch_ms": N,
   "probe_vmapped": {"seeds": 25, "epoch_ms_per_seed": N, "speedup_vs_single": N},
   "probe_megakernel_epoch_ms": N | null,
   "note": "..."}

Protocol (BASELINE.md): the reference publishes no numbers, so the baseline
is measured here — a plain-torch replica of the reference's DMVAE hot loop
(models/dmvae.py:128-188 math, Adam, batch 100) on this host's CPU (the
reference runs CPU/1-GPU; this image has torch-cpu). Ours is the jitted
scan-per-epoch program on the default JAX backend (TPU under the driver).

FLOPs come from XLA's own cost model (compiled.cost_analysis()['flops'] of
the full 100-epoch program, divided by epochs), so they count exactly what
executes — fwd+bwd+optimizer.

Where the time actually goes (measured on v5e-1, 2026-08-16): the workload
is HBM-BANDWIDTH-BOUND on parameter/optimizer traffic, not compute- or
dispatch-bound. The DMVAE has 8.3M f32 params (33.3 MB); each of the 16
steps/epoch moves ~11x that (params fwd+bwd+Adam read, grads, m/v state
read+write) ~= 366 MB/step -> at v5e's ~819 GB/s the roofline is 7.16
ms/epoch, and the measured program runs at 7.2 ms/epoch — ~99% of the
memory floor. Consequences, all verified by measurement: (a) a Pallas
megakernel cannot beat XLA here (SURVEY §7's "Pallas where fusion pays"
plank is closed by this roofline, not by more kernels); (b) bf16 matmuls
barely move the number (traffic is f32 state, not matmul bytes); (c) the
vmapped 5-seed variant scales ~linearly in time (5x params -> 5x traffic)
— its value is sweep orchestration in ONE program, not per-seed speedup;
(d) MXU utilisation (flops_per_sec vs ~49 TF/s f32 peak) is ~0.05% BY
DESIGN of the reference's KB-scale-MLP workload, so the vs_baseline
speedup must not be read as compute efficiency.

Config: HandWritten 80/20 split (seed 0), embed 200, hidden 512, a=1e-5,
batch 100 — BASELINE.json config #1. Both sides time full epochs over the
1600-row train split. JAX timing excludes compilation (program run twice,
second run timed); torch gets a 1-epoch warmup.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


EPOCHS_JAX = 100
BATCH = 100
HIDDEN = 512
EMBED = 200
A = 1e-5
LR = 1e-4
VMAP_SEEDS = 5


def load_data():
    from disentagled_multimodal_fusion_tpu.data.multiview import HandWritten

    ds = HandWritten()
    views, labels = ds.arrays()
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(ds))
    n_tr = int(0.8 * len(ds))
    tr = idx[:n_tr]
    return [v[tr] for v in views], [int(d[0]) for d in ds.dims]


def _compile_with_flops(jitted_fn, *args):
    """AOT-compile once; return (callable, flops, compile_seconds).

    The compiled executable is reused for the timed runs so the program is
    only compiled once per variant; flops come from XLA's own cost model
    (0.0 if the backend doesn't expose it, callable falls back to the jit).
    """
    t0 = time.perf_counter()
    try:
        compiled = jitted_fn.lower(*args).compile()
        t_compile = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return compiled, float(ca.get("flops", 0.0)), t_compile
    except Exception as e:  # relay/backends may not expose cost analysis
        _log(f"AOT compile/cost_analysis unavailable: {e}")
        return jitted_fn, 0.0, time.perf_counter() - t0


def bench_jax(xs_np, dims, fused_modalities: bool = True, dtype=None):
    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()
    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import build_dmvae_task
    from disentagled_multimodal_fusion_tpu.core.train import make_train_program

    _log(f"jax backend: {jax.default_backend()} {jax.devices()}")
    xs = tuple(jnp.asarray(x) for x in xs_np)
    key = jax.random.PRNGKey(0)
    model, params0, loss_fn, opt, _bstats = build_dmvae_task(
        rng=key, xs_sample=xs, output_dim=dims, a=A, hidden_dim=HIDDEN,
        embed_dim=EMBED, lr=LR, num_epochs=EPOCHS_JAX,
        fused_modalities=fused_modalities, dtype=dtype,
    )
    program = make_train_program(
        loss_fn=loss_fn, n_train=xs[0].shape[0], optimizer=opt,
        epochs=EPOCHS_JAX, batch_size=BATCH, drop_last=False, shuffle=True,
        val_fn=None, has_state=False,
    )
    run = jax.jit(lambda p, r: program(p, r, {"xs": xs}, None, None))
    run, flops, t_compile = _compile_with_flops(run, params0, key)

    res = run(params0, key)  # warmup (transfers, lazy init)
    jax.block_until_ready(res.params)
    t0 = time.perf_counter()
    res = run(params0, key)
    jax.block_until_ready(res.params)
    t_run = time.perf_counter() - t0
    _log(
        f"jax (fused={fused_modalities}, dtype={dtype or 'float32'}): "
        f"{EPOCHS_JAX} epochs in {t_run:.3f}s (compile {t_compile:.1f}s); "
        f"final loss {float(res.train_loss[-1]):.4f}; "
        f"program flops {flops:.3e}"
    )
    return t_run / EPOCHS_JAX * 1000.0, flops / EPOCHS_JAX, t_compile


def bench_jax_vmapped(xs_np, dims):
    """5 seeds as ONE vmapped program (the --vmap-seeds product mode)."""
    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()
    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import build_dmvae_task
    from disentagled_multimodal_fusion_tpu.core.train import make_train_program

    xs = tuple(jnp.asarray(x) for x in xs_np)
    tasks = [
        build_dmvae_task(
            rng=jax.random.PRNGKey(s), xs_sample=xs, output_dim=dims, a=A,
            hidden_dim=HIDDEN, embed_dim=EMBED, lr=LR, num_epochs=EPOCHS_JAX,
            fused_modalities=True,
        )
        for s in range(VMAP_SEEDS)
    ]
    params_stack = jax.tree.map(lambda *x: jnp.stack(x), *[t[1] for t in tasks])
    rngs = jnp.stack([jax.random.PRNGKey(100 + s) for s in range(VMAP_SEEDS)])
    program = make_train_program(
        loss_fn=tasks[0][2], n_train=xs[0].shape[0], optimizer=tasks[0][3],
        epochs=EPOCHS_JAX, batch_size=BATCH, drop_last=False, shuffle=True,
        val_fn=None, has_state=False,
    )
    # data shared across seeds (broadcast), params/rngs stacked
    run = jax.jit(jax.vmap(lambda p, r: program(p, r, {"xs": xs}, None, None)))
    run, flops, t_compile = _compile_with_flops(run, params_stack, rngs)
    res = run(params_stack, rngs)  # warmup
    jax.block_until_ready(res.params)
    t0 = time.perf_counter()
    res = run(params_stack, rngs)
    jax.block_until_ready(res.params)
    t_run = time.perf_counter() - t0
    _log(
        f"jax vmapped x{VMAP_SEEDS}: {EPOCHS_JAX} epochs in {t_run:.3f}s "
        f"(compile {t_compile:.1f}s); flops {flops:.3e}"
    )
    return t_run / EPOCHS_JAX * 1000.0, flops / EPOCHS_JAX


def bench_jax_probe(n_rows=1600, n_mod=6, embed=EMBED, num_classes=10,
                    vmap_seeds=25):
    """Probe-fit bench: the dispatch-bound regime (docs/PERF.md §4).

    The DMVAE headline number is HBM-bound, so it says nothing about the
    probe fits that dominate sweep wall-clock count-wise (6 per cell).
    Those are dispatch/latency-bound, and vmapping across seeds is where
    the measured ~2x per-seed win lives — this tracks both points:
    a single probe fit and a vmapped x25 fit on synthetic embeddings with
    the HandWritten probe shapes (1+6 heads, hidden 128, input 200).
    Returns (single_ms_per_epoch, vmapped_ms_per_epoch_per_seed).
    """
    from disentagled_multimodal_fusion_tpu.core.setup import configure

    configure()
    import jax
    import jax.numpy as jnp

    from disentagled_multimodal_fusion_tpu.core.tasks import build_probe_task
    from disentagled_multimodal_fusion_tpu.core.train import make_train_program

    key = jax.random.PRNGKey(0)
    zc = jax.random.normal(key, (n_rows, embed))
    zp = jax.random.normal(jax.random.PRNGKey(1), (n_rows, n_mod, embed))
    y = jax.random.randint(jax.random.PRNGKey(2), (n_rows,), 0, num_classes)
    data = {"zc": zc, "zp": zp, "y": y}

    def task_for(seed):
        return build_probe_task(
            rng=jax.random.PRNGKey(seed), num_modalities=n_mod,
            num_classes=num_classes, input_dim=embed, hidden_dim=(128,),
            lr=3e-3, dropout=0.1, annealing_start=50, aggregation="cml",
            num_epochs=EPOCHS_JAX,
        )

    t0 = task_for(0)
    program = make_train_program(
        loss_fn=t0.loss_fn, n_train=n_rows, optimizer=t0.optimizer,
        epochs=EPOCHS_JAX, batch_size=BATCH, drop_last=False, shuffle=True,
        val_fn=None, has_state=False,
    )

    def timed(run, *args):
        run, _, _ = _compile_with_flops(run, *args)
        res = run(*args)
        jax.block_until_ready(res.params)
        t = time.perf_counter()
        res = run(*args)
        jax.block_until_ready(res.params)
        return time.perf_counter() - t

    single = jax.jit(lambda p, r: program(p, r, data, None, None))
    t_single = timed(single, t0.params, key)

    params_stack = jax.tree.map(
        lambda *x: jnp.stack(x), *[task_for(s).params for s in range(vmap_seeds)]
    )
    rngs = jnp.stack([jax.random.PRNGKey(100 + s) for s in range(vmap_seeds)])
    vm = jax.jit(jax.vmap(lambda p, r: program(p, r, data, None, None)))
    t_vm = timed(vm, params_stack, rngs)

    single_ms = t_single / EPOCHS_JAX * 1000.0
    vm_ms_seed = t_vm / EPOCHS_JAX * 1000.0 / vmap_seeds
    _log(
        f"probe fit: {single_ms:.3f} ms/epoch single; vmapped x{vmap_seeds}: "
        f"{vm_ms_seed:.3f} ms/epoch/seed ({single_ms / vm_ms_seed:.2f}x)"
    )

    # Whole-epoch Pallas megakernel on the SAME fit (--probe-engine
    # megakernel): tracked so the docs/PERF.md "XLA wins" measurement has a
    # per-round receipt. TPU-only — the CPU path runs the kernel in
    # interpret mode, which is a correctness harness, not a timing one.
    mk_ms = None
    if jax.default_backend() == "tpu":
        try:
            from disentagled_multimodal_fusion_tpu.core.megakernel import (
                make_probe_megakernel_program,
            )

            mk_program = make_probe_megakernel_program(
                desc=t0.megakernel, n_train=n_rows, optimizer=t0.optimizer,
                epochs=EPOCHS_JAX, batch_size=BATCH, drop_last=False,
                shuffle=True, val_fn=None,
            )
            mk = jax.jit(lambda p, r: mk_program(p, r, data, None, None))
            mk_ms = timed(mk, t0.params, key) / EPOCHS_JAX * 1000.0
            _log(f"probe fit (megakernel): {mk_ms:.3f} ms/epoch")
        except Exception as e:  # pragma: no cover - hardware-path guard
            _log(f"probe megakernel bench skipped: {type(e).__name__}: {e}")
    return single_ms, vm_ms_seed, mk_ms


def bench_torch(xs_np, dims) -> float:
    """Plain-torch replica of the reference DMVAE train epoch (CPU)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    n_mod = len(dims)

    def mlp(i, h, o):
        return nn.Sequential(nn.Linear(i, h), nn.ReLU(), nn.Linear(h, h), nn.ReLU(), nn.Linear(h, o))

    encoders = nn.ModuleList([mlp(d, HIDDEN, 4 * EMBED) for d in dims])
    decoders = nn.ModuleList([mlp(2 * EMBED, HIDDEN, d) for d in dims])
    all_params = list(encoders.parameters()) + list(decoders.parameters())
    opt = torch.optim.Adam(all_params, lr=LR)
    xs = [torch.tensor(x) for x in xs_np]
    n = xs[0].shape[0]

    def poe(mus, logvars, t=1.5):
        mus = torch.stack(mus + [torch.zeros_like(mus[0])])
        logvars = torch.stack(logvars + [torch.zeros_like(logvars[0])])
        prec = torch.exp(-logvars) / t
        var = 1.0 / (prec.sum(0) + 1e-8)
        return var * (prec * mus).sum(0), torch.log(var)

    def kl(mu, lv):
        return -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=1)

    def epoch():
        perm = torch.randperm(n)
        for s in range(0, n, BATCH):
            b = perm[s : s + BATCH]
            xb = [x[b] for x in xs]
            stats = [enc(x).chunk(4, dim=1) for enc, x in zip(encoders, xb)]
            mu_s = [st[0] for st in stats]
            lv_s = [st[1] for st in stats]
            z_p = [st[2] + torch.randn_like(st[2]) * torch.exp(0.5 * st[3]) for st in stats]
            z_s_uni = [m + torch.randn_like(m) * torch.exp(0.5 * l) for m, l in zip(mu_s, lv_s)]
            mu_poe, lv_poe = poe(mu_s, lv_s)
            z_s = mu_poe + torch.randn_like(mu_poe) * torch.exp(0.5 * lv_poe)
            rec_j = sum(
                F.mse_loss(decoders[i](torch.cat([z_p[i], z_s], 1)), xb[i])
                for i in range(n_mod)
            )
            rec_c, pairs = 0.0, 0
            for i in range(n_mod):
                for j in range(n_mod):
                    if i == j:
                        continue
                    rec_c = rec_c + F.mse_loss(
                        decoders[i](torch.cat([z_p[i], z_s_uni[j]], 1)), xb[i]
                    )
                    pairs += 1
            rec_c = rec_c / pairs
            kl_p = sum(kl(st[2], st[3]) for st in stats).mean()
            kl_poe = kl(mu_poe, lv_poe).mean()
            kl_uni = sum(kl(m, l) for m, l in zip(mu_s, lv_s)).mean()
            loss = rec_j + A * (kl_p + n_mod * kl_poe) + rec_c + A * kl_uni
            opt.zero_grad()
            loss.backward()
            opt.step()

    epoch()  # warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        epoch()
    per_epoch = (time.perf_counter() - t0) / reps
    _log(f"torch: {per_epoch * 1000:.1f} ms/epoch (cpu, {reps} reps)")
    return per_epoch * 1000.0


def bench_onejit_cell() -> dict | None:
    """Time one full (HandWritten, Normal) 5-seed one-program sweep cell
    through the REAL CLI (run.py --one-program-cells): backbone fit ->
    embeddings -> 6 head fits -> 6 full evaluations, vmapped over seeds,
    as ONE XLA program (core/sweep_cell.py). Measures the product path in
    a subprocess (artifacts to a temp dir) and parses the runner's own
    timing lines. Compile is served by the persistent cache
    (core/setup.py) when warm. Returns None on any failure — the field is
    informative, not the headline."""
    import os
    import re
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory(prefix="dmf_bench_cell_") as tmp:
        env = dict(os.environ, DMF_ARTIFACT_ROOT=tmp)
        try:
            proc = subprocess.run(
                [sys.executable, "-m",
                 "disentagled_multimodal_fusion_tpu.runners.run",
                 "--datasets", "HandWritten", "--conditions", "Normal",
                 "--seeds", "1", "2", "3", "4", "5",
                 "--one-program-cells", "--skip-report",
                 "--rows-file", f"{tmp}/rows.json"],
                capture_output=True, text=True, timeout=1200, env=env,
            )
        except subprocess.TimeoutExpired:
            _log("onejit cell bench timed out")
            return None
    if proc.returncode != 0:
        _log(f"onejit cell bench failed rc={proc.returncode}: "
             f"{proc.stdout[-500:]}{proc.stderr[-500:]}")
        return None
    m_run = re.search(r"executed in ([0-9.]+)s", proc.stdout)
    m_all = re.search(r"cell done in ([0-9.]+)s \(run [0-9.]+s, "
                      r"artifacts ([0-9.]+)s\)", proc.stdout)
    if not (m_run and m_all):
        _log(f"onejit cell bench: timing lines not found in: {proc.stdout[-400:]}")
        return None
    out = {
        "seeds": 5, "fits": 7,
        "execute_s": float(m_run.group(1)),
        "artifacts_s": float(m_all.group(2)),
        "total_s": float(m_all.group(1)),
    }
    _log(f"one-program cell (HandWritten, 5 seeds x 7 fits): "
         f"execute {out['execute_s']:.1f}s, artifacts {out['artifacts_s']:.1f}s")
    return out


def _wait_for_backend(max_tries: int | None = None, sleep_s: int | None = None) -> None:
    """Survive a transient TPU-relay outage at bench time.

    The axon relay occasionally restarts; worse, its plugin registration
    happens at interpreter startup (sitecustomize), so once it has failed
    in this process no in-process retry can recover. On a failed backend
    probe, sleep and re-exec this script (fresh interpreter = fresh
    registration), bounded by DMF_BENCH_BACKEND_TRIES. Window defaults to
    20 tries x 90 s (~30 min) — relay outages observed here run hours, so
    a short window fails exactly when the retry matters most; the wait
    only happens when the immediate alternative is a certain failure.
    """
    import os

    if max_tries is None:
        max_tries = int(os.environ.get("DMF_BENCH_BACKEND_MAX_TRIES", "20"))
    if sleep_s is None:
        sleep_s = int(os.environ.get("DMF_BENCH_BACKEND_SLEEP", "90"))
    tries = int(os.environ.get("DMF_BENCH_BACKEND_TRIES", "0"))
    try:
        from disentagled_multimodal_fusion_tpu.core.setup import configure

        configure()
        import jax

        jax.devices()
        return
    except Exception as e:  # noqa: BLE001 — any backend-init failure retries
        if tries + 1 >= max_tries:
            if os.environ.get("DMF_BENCH_NO_CPU_FALLBACK"):
                _log(f"backend unavailable after {max_tries} tries: {e}")
                raise
            # Last resort: a clearly-labeled CPU measurement beats an empty
            # benchmark artifact. The JSON carries backend+degraded fields so
            # the number can never be mistaken for a TPU result.
            _log(f"backend unavailable after {max_tries} tries: {e}; "
                 "falling back to a DEGRADED CPU measurement")
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["DMF_BENCH_CPU_FALLBACK"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        _log(f"backend probe failed (try {tries + 1}/{max_tries}): {e}; re-exec in {sleep_s}s")
        time.sleep(sleep_s)
        os.environ["DMF_BENCH_BACKEND_TRIES"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import os

    _wait_for_backend()
    cpu_fallback = bool(os.environ.get("DMF_BENCH_CPU_FALLBACK"))
    if cpu_fallback:
        # keep the degraded run to ~minutes: 10 epochs still amortizes the
        # per-epoch cost (timing already excludes compilation)
        globals()["EPOCHS_JAX"] = int(os.environ.get("DMF_BENCH_CPU_EPOCHS", "10"))
        _log(f"CPU FALLBACK MODE: {EPOCHS_JAX} epochs; the reported value is "
             "a host-CPU number, NOT TPU performance")
    xs_np, dims = load_data()
    _log(f"HandWritten train split: {xs_np[0].shape[0]} rows, dims {dims}")
    ours_ms, flops_epoch, f32_compile_s = bench_jax(xs_np, dims)
    bf16_ms, _, bf16_compile_s = bench_jax(xs_np, dims, dtype="bfloat16")
    vmap_ms, vmap_flops = bench_jax_vmapped(xs_np, dims)
    probe_ms, probe_vm_ms, probe_mk_ms = bench_jax_probe()
    onejit_cell = None if cpu_fallback else bench_onejit_cell()
    # sample host load BEFORE and AFTER the torch baseline: the 1-min
    # loadavg is backward-looking, so the pre-sample reflects the jax
    # benches and only the post-sample can see load that started during
    # the multi-minute torch run. Flag on the max of the two.
    load_pre = os.getloadavg()[0]
    torch_ms = bench_torch(xs_np, dims)
    load1 = max(load_pre, os.getloadavg()[0])
    import jax

    out = {
        "metric": "handwritten_dmvae_epoch_ms",
        "backend": jax.default_backend(),
        "value": round(ours_ms, 3),
        "unit": "ms",
        "vs_baseline": round(torch_ms / ours_ms, 2),
        "flops_per_epoch": flops_epoch,
        "flops_per_sec": round(flops_epoch / (ours_ms / 1000.0), 3) if ours_ms else None,
        "bf16_epoch_ms": round(bf16_ms, 3),
        # Compile cost of the two main programs (timing above excludes it).
        # The f32-"highest" program is ~100x slower to compile than bf16
        # (197 s vs 1.7 s first-touch on the v5e relay — docs/PERF.md §6);
        # the persistent XLA cache (core/setup.py) makes re-compiles
        # cross-process ~seconds, so a small f32_compile_s here means the
        # cache hit and 197-s-scale means first touch in a fresh VM/cache.
        "compile_s": {"f32": round(f32_compile_s, 1), "bf16": round(bf16_compile_s, 1)},
        "vmapped": {
            "seeds": VMAP_SEEDS,
            "epoch_ms_per_seed": round(vmap_ms / VMAP_SEEDS, 3),
            "flops_per_sec": round(vmap_flops / (vmap_ms / 1000.0), 3) if vmap_ms else None,
        },
        # the dispatch-bound regime (docs/PERF.md §4): probe fits are where
        # vmapping pays per-seed, unlike the HBM-bound DMVAE above
        "probe_epoch_ms": round(probe_ms, 3),
        "probe_vmapped": {
            "seeds": 25,
            "epoch_ms_per_seed": round(probe_vm_ms, 3),
            "speedup_vs_single": round(probe_ms / probe_vm_ms, 2) if probe_vm_ms else None,
        },
        # whole-epoch Pallas kernel on the same fit (docs/PERF.md "Probe
        # megakernel"): measured to LOSE to the XLA step-scan — tracked
        # here as the receipt; null off-TPU or if lowering fails
        "probe_megakernel_epoch_ms": (
            round(probe_mk_ms, 3) if probe_mk_ms else None
        ),
        # round-5 sweep engine: a whole (dataset, condition) 5-seed x
        # 7-fit cell as ONE XLA program (core/sweep_cell.py), measured
        # through the real CLI; null if the subprocess fails
        "one_program_cell": onejit_cell,
        "note": (
            "headline value uses the parity-first default "
            "(jax_default_matmul_precision=high: 3-pass bf16 synthesis — "
            "the EDL stack is numerically knife-edged under the TPU "
            "DEFAULT 1-pass bf16, and 'high' restores per-seed torch "
            "tracking on the PIE knife-edge at ~30% less step time "
            "than full f32 emulation; see core/setup.py). The HBM "
            "roofline is 7.16 ms/epoch (33.3MB params x ~11 moves/step x "
            "16 steps at 819 GB/s); the bf16_epoch_ms variant runs at "
            "~roofline, so the precision premium is the measured price of "
            "bit-parity, not an implementation gap"
        ),
    }
    # the torch baseline runs live on the host CPU, so background load
    # (e.g. a parity campaign) inflates it and with it vs_baseline. Flag
    # rather than fudge: bench's own single process accounts for ~1.0 of
    # 1-minute load on this single-core host; anything well above that
    # means the baseline was contended.
    out["host_load_1m"] = round(load1, 2)
    if load1 > 1.75:
        out["baseline_contended"] = (
            f"host 1-min load {load1:.2f} during the torch baseline — "
            f"another process was competing for the CPU, so vs_baseline "
            f"is inflated; the clean-host torch baseline is ~4300 ms/epoch "
            f"(BENCH_r02.json, vs_baseline ~474x)"
        )
    if cpu_fallback:
        out["degraded"] = (
            f"TPU backend unavailable after retries; measured on host CPU at "
            f"{EPOCHS_JAX} epochs — NOT comparable to TPU rounds (see "
            f"BENCH_r02.json for the last TPU measurement)"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
