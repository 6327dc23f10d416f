#!/bin/bash
# Round-3 DMVAE-backbone parity campaign (VERDICT r2 item 1): 4 datasets x
# 5 seeds, sequential (the host has ONE cpu core — see memory notes).
# JAX side on CPU to keep the TPU free for interactive work; a TPU
# spot-check cell is re-run separately afterwards.
cd "$(dirname "$0")/.." || exit 1
export JAX_PLATFORMS=cpu
for ds in CUB PIE HandWritten Scene; do
  echo "=== parity_dmvae $ds $(date) ==="
  python tools/parity_dmvae.py --dataset "$ds" --seeds 0 1 2 3 4 \
    2>&1 | tail -40
done
echo "=== all done $(date) ==="
