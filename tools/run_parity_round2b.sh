#!/bin/sh
# Round-2 follow-up pipeline: the synthetic parity cell (crashed on a TPU
# relay hiccup first time), ours-side re-validation of the .mat cells under
# the f32-highest default (--reuse-torch), and the PIE sensitivity study.
set -x
cd /root/repo
python tools/parity_check.py --dataset synthetic --dep 50 --seeds 0 1 2 3 4 \
  > results/parity_synthetic.log 2>&1
python tools/parity_check.py --dataset PIE --seeds 0 1 2 3 4 --reuse-torch \
  > results/parity_pie_f32.log 2>&1
python tools/parity_check.py --dataset CUB --seeds 0 1 2 3 4 --reuse-torch \
  > results/parity_cub_f32.log 2>&1
python tools/parity_check.py --dataset HandWritten --seeds 0 1 2 3 4 --reuse-torch \
  > results/parity_handwritten_f32.log 2>&1
python tools/pie_study.py > results/pie_study.log 2>&1
echo DONE_ROUND2B
