#!/bin/bash
# Round-3b parity refresh after the torch-harness annealing-order fix
# (tools/parity_check.py: annealing_step now increments AFTER the val
# pass, matching Lightning's hook order — val loop runs inside the train
# epoch, before on_train_epoch_end or baselines.py:104). Affects only the
# plateau-scheduled cells (dmvae_dis, dbf/cml/avg_fusion): their torch
# val-loss annealing coefficient was shifted one epoch early, which on
# knife-edge cells (synthetic dep50) masked a real LR-freeze behavior our
# framework reproduces. Cosine cells (dmvae_cml/joint) are bit-identical
# under either order; re-running everything keeps one lineage per file.
cd "$(dirname "$0")/.." || exit 1
export JAX_PLATFORMS=cpu

for ds in HandWritten CUB Scene PIE; do
  low=$(echo "$ds" | tr '[:upper:]' '[:lower:]')
  echo "=== parity canonical $ds $(date) ==="
  python tools/parity_check.py --dataset "$ds" --seeds 0 1 2 3 4 \
    --out "results/parity_check_${low}.json" 2>&1 | tail -8
done

echo "=== parity ext: CUB probes x15 $(date) ==="
python tools/parity_check.py --dataset CUB --seeds 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 \
  --models dmvae_dis dmvae_cml dmvae_joint \
  --out results/parity_check_cub_ext15.json 2>&1 | tail -6

echo "=== parity ext: HandWritten probes x15 $(date) ==="
python tools/parity_check.py --dataset HandWritten --seeds 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 \
  --models dmvae_dis dmvae_cml dmvae_joint \
  --out results/parity_check_handwritten_ext15.json 2>&1 | tail -6

echo "=== round-3b parity refresh done $(date) ==="
