#!/bin/sh
# Sequential parity sweep over the cells VERDICT.md round-1 asked for:
# CUB/PIE/Scene full six-model protocol at 5 seeds + one synthetic dep cell.
# Sequential because the torch side is CPU-bound and this host has 1 core.
set -x
cd /root/repo
python tools/parity_check.py --dataset CUB --seeds 0 1 2 3 4 \
  > results/parity_cub.log 2>&1
python tools/parity_check.py --dataset PIE --seeds 0 1 2 3 4 \
  > results/parity_pie.log 2>&1
python tools/parity_check.py --dataset Scene --seeds 0 1 2 3 4 \
  > results/parity_scene.log 2>&1
python tools/parity_check.py --dataset synthetic --dep 50 --seeds 0 1 2 3 4 \
  > results/parity_synthetic.log 2>&1
echo DONE_ALL_CELLS
