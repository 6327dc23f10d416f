#!/bin/bash
# Round-3 CPU-bound parity queue, run AFTER tools/run_parity_dmvae.sh
# finishes (one CPU core: everything sequential).
#   1. DSSL backbone parity (VERDICT r2 item 4): 3 dep cells x 5 seeds.
#   2. Seed-extension of the above-1%-band cells (VERDICT r2 item 2):
#      PIE dmvae_cml/joint, CUB probes, HandWritten probes to 15 seeds
#      with paired per-seed deltas (separate _ext15 artifacts; the
#      canonical 5-seed 6-model matrices stay untouched).
cd "$(dirname "$0")/.." || exit 1
export JAX_PLATFORMS=cpu

echo "=== parity_dssl $(date) ==="
python tools/parity_dssl.py --deps 0 50 100 --seeds 0 1 2 3 4 2>&1 | tail -30

echo "=== parity ext: PIE cml/joint x15 $(date) ==="
python tools/parity_check.py --dataset PIE --seeds 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 \
  --models dmvae_cml dmvae_joint --out results/parity_check_pie_ext15.json 2>&1 | tail -15

echo "=== parity ext: CUB probes x15 $(date) ==="
python tools/parity_check.py --dataset CUB --seeds 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 \
  --models dmvae_dis dmvae_cml dmvae_joint --out results/parity_check_cub_ext15.json 2>&1 | tail -15

echo "=== parity ext: HandWritten probes x15 $(date) ==="
python tools/parity_check.py --dataset HandWritten --seeds 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 \
  --models dmvae_dis dmvae_cml dmvae_joint --out results/parity_check_handwritten_ext15.json 2>&1 | tail -15

echo "=== luma collapse torch-side $(date) ==="
python tools/luma_collapse_torch.py --epochs 100 --probe-epochs 200 2>&1 | grep -v Retry | tail -25

echo "=== round-3 parity queue done $(date) ==="
