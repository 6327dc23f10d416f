"""TPU spot-check for the DMVAE-backbone parity campaign.

The backbone parity cells (tools/parity_dmvae.py, results/
parity_check_dmvae_<ds>.json) run their JAX side on CPU so the single-core
host can keep the torch replica and the JAX fit sequential. This tool
closes the remaining backend question: it re-runs ONLY our JAX backbone
fit on the real TPU (the shipped parity-first defaults: f32 state,
matmul precision "high") for the same (dataset, seed) cells and compares
the per-epoch loss trajectory against the archived CPU-side trajectory.

Because both runs are the SAME program (same init PRNGKey, same shuffle
stream, same batch law), agreement here is a float-precision statement
about backends, not a seed-noise statement — gaps should be orders of
magnitude below the torch-vs-jax seed envelopes in the parity JSONs.

Run (TPU, a few seconds per seed after compile):
  python tools/parity_dmvae_tpu.py --dataset HandWritten --seeds 0 1 2 3 4
Appends a "tpu_spotcheck" block to results/parity_check_dmvae_<ds>.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from disentagled_multimodal_fusion_tpu.core.setup import configure


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="HandWritten")
    parser.add_argument("--seeds", type=int, nargs="*", default=None,
                        help="default: every seed archived in the JSON")
    args = parser.parse_args()

    path = Path("results") / f"parity_check_dmvae_{args.dataset.lower()}.json"
    archived = json.loads(path.read_text())
    seeds = args.seeds if args.seeds else archived["per_seed"]["seeds"]
    epochs = archived["meta"].get("backbone_epochs", 100)

    configure()
    import jax
    import jax.numpy as jnp

    from parity_dmvae import jax_dmvae_fit  # noqa: E402 (same tools/ dir)
    from disentagled_multimodal_fusion_tpu.data.multiview import DATASET_REGISTRY

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})", flush=True)

    ds = DATASET_REGISTRY[args.dataset]()
    views, _ = ds.arrays()
    dims = [v.shape[1] for v in views]

    spot = {"backend": backend, "seeds": [], "max_abs_epoch_gap": [],
            "final_loss_gap": [], "emb_note": "loss trajectory only"}
    for seed in seeds:
        if seed not in archived["per_seed"]["seeds"]:
            print(f"[seed {seed}] not in archive, skipping", flush=True)
            continue
        k = archived["per_seed"]["seeds"].index(seed)
        cpu_losses = np.array(archived["per_seed"]["jax_loss"][k])

        rng_np = np.random.default_rng(seed)
        idx = rng_np.permutation(len(ds))
        n_tr = int(0.8 * len(ds))
        views_tr = [v[idx[:n_tr]] for v in views]
        views_te = [v[idx[n_tr:]] for v in views]
        xs_tr = tuple(jnp.asarray(v) for v in views_tr)
        xs_te = tuple(jnp.asarray(v) for v in views_te)

        t0 = time.time()
        tpu_losses, _, _ = jax_dmvae_fit(
            xs_tr, xs_te, dims, seed, epochs=epochs,
        )
        tpu_losses = np.array(tpu_losses)
        gap = np.abs(tpu_losses - cpu_losses[: len(tpu_losses)])
        spot["seeds"].append(seed)
        spot["max_abs_epoch_gap"].append(float(gap.max()))
        spot["final_loss_gap"].append(float(gap[-1]))
        print(
            f"[seed {seed}] {backend} vs archived-cpu: max epoch gap "
            f"{gap.max():.2e}, final gap {gap[-1]:.2e} "
            f"(final loss {tpu_losses[-1]:.6f}; {time.time() - t0:.0f}s)",
            flush=True,
        )

    spot["summary"] = {
        "max_abs_epoch_gap": float(max(spot["max_abs_epoch_gap"])),
        "torch_vs_jax_final_gap_for_scale":
            archived["summary"]["final_loss"]["gap"],
    }
    archived["tpu_spotcheck"] = spot
    path.write_text(json.dumps(archived, indent=1))
    print(f"wrote tpu_spotcheck -> {path}", flush=True)
    print(json.dumps(spot["summary"], indent=1), flush=True)


if __name__ == "__main__":
    main()
