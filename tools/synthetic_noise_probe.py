"""One-off diagnostic: is the synthetic cml_fusion parity gap (ours below
torch on 5/5 seeds, 10 pts on seeds 2/4) systematic, or inside the task's
own init-RNG noise?

For data seeds {2, 4} (identical splits both sides):
  * torch replica (reference's own loss code) fit with 3 different
    torch.manual_seed values
  * ours fit with 3 different init/train PRNGKeys

If the within-side spread is ~10 pts, the parity gap is init noise on a
chaotic 3-class task; if both sides are tight and separated, it is real.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from disentagled_multimodal_fusion_tpu.core.setup import configure

configure()

import jax
import jax.numpy as jnp

from tools.parity_check import torch_heads_fit  # noqa: E402
from disentagled_multimodal_fusion_tpu.core.tasks import build_late_fusion_task
from disentagled_multimodal_fusion_tpu.core.train import train
from disentagled_multimodal_fusion_tpu.data.synthetic import make_simple_plus_splits
from disentagled_multimodal_fusion_tpu.eval.analysis import evaluate_subjective_model


def main():
    epochs, batch, lr, annealing = 200, 128, 3e-4, 10
    for data_seed in (2, 4):
        _, (v_tr, ytr), (v_te, yte) = make_simple_plus_splits(
            batch_size=128, seed=data_seed, rho=0.5, shared_class_frac=0.5,
        )
        views_tr, views_te = list(v_tr), list(v_te)
        y_np_tr, y_np_te = np.asarray(ytr), np.asarray(yte)
        dims = [v.shape[1] for v in views_tr]
        xs_tr = tuple(jnp.asarray(v) for v in views_tr)
        xs_te = tuple(jnp.asarray(v) for v in views_te)
        lf_tr = {"xs": xs_tr, "y": jnp.asarray(y_np_tr)}
        lf_te = {"xs": xs_te, "y": jnp.asarray(y_np_te)}

        taccs = []
        for tseed in (data_seed, data_seed + 1000, data_seed + 2000):
            t0 = time.time()
            m = torch_heads_fit(
                views_tr, y_np_tr, views_te, y_np_te, 3,
                lr=lr, annealing_start=annealing, epochs=epochs, batch=batch,
                hidden=128, dropout=0.1, optimizer="adam", schedule="plateau",
                plateau_patience=10, seed=tseed, agg="cml", fused=0,
                drop_last=True,
            )
            taccs.append(m["accuracy"])
            print(f"[data {data_seed}] torch init-seed {tseed}: "
                  f"acc {m['accuracy']:.4f} ({time.time()-t0:.0f}s)", flush=True)

        oaccs = []
        for kseed in (data_seed, data_seed + 1000, data_seed + 2000):
            t0 = time.time()
            task = build_late_fusion_task(
                rng=jax.random.PRNGKey(kseed), output_dims=dims, num_classes=3,
                hidden_dim=(128,), dropout=0.1, lr=lr,
                annealing_start=annealing, aggregation="cml", fused=0.0,
            )
            res = train(
                rng=jax.random.PRNGKey(kseed + 300), params=task.params,
                loss_fn=task.loss_fn, data=lf_tr, n_train=len(y_np_tr),
                optimizer=task.optimizer, epochs=epochs, batch_size=batch,
                drop_last=True, val_fn=task.val_fn, val_data=lf_te,
            )
            info = evaluate_subjective_model(task, res.params, lf_te)
            oaccs.append(float(info["fused"]["accuracy"]))
            print(f"[data {data_seed}] ours init-key {kseed}: "
                  f"acc {oaccs[-1]:.4f} ({time.time()-t0:.0f}s)", flush=True)

        print(f"[data {data_seed}] torch spread {min(taccs):.3f}-{max(taccs):.3f}"
              f" | ours spread {min(oaccs):.3f}-{max(oaccs):.3f}", flush=True)


if __name__ == "__main__":
    main()
