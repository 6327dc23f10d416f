"""CLI for the fake-LUMA fixture corpus (data/luma.py::make_fake_luma).

Writes a tiny compiled-format LUMA corpus (real wavs + tsv + image pickle
+ metadata.yaml) so run_luma / test_luma / compile_luma featurization can
be driven end-to-end in an offline image. Example:

  python tools/make_fake_luma.py data/luma_compiled --classes 6 \
      --train-per-class 40 --test-per-class 10
  python -m disentagled_multimodal_fusion_tpu.runners.run_luma --quick \
      --data-path data/luma_compiled
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="output directory for the compiled corpus")
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--train-per-class", type=int, default=6)
    p.add_argument("--test-per-class", type=int, default=2)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ood-classes", type=int, default=0,
                   help="extra held-out classes beyond --classes (the real "
                        "corpus's 42 ID + 8 OOD layout); enables --ood-eval")
    args = p.parse_args()

    from disentagled_multimodal_fusion_tpu.data.luma import make_fake_luma

    root = make_fake_luma(
        args.root, n_classes=args.classes,
        train_per_class=args.train_per_class,
        test_per_class=args.test_per_class,
        sample_rate=args.sample_rate, seed=args.seed,
        ood_classes=args.ood_classes,
    )
    print(f"fake LUMA corpus at {root}")


if __name__ == "__main__":
    main()
