"""LUMA preprocessing orchestrator.

Reference semantics: compile_luma.py:1-350. The reference's pipeline is:
(1) NLTK wordnet check, (2) git-clone bezirganyan/LUMA into external/,
(3) verify the HuggingFace raw download, (4) emit
configs/luma_compile_config.yaml, (5) run the upstream compile_dataset.py
via subprocess with a fallback ``create_simplified_dataset`` that
symlinks/copies raw files into the compiled layout.

This environment is zero-egress, so network steps (1)-(3) become presence
checks with actionable messages; step (5)'s fallback layout builder is
implemented natively; and a NEW offline featurization stage (the TPU-first
replacement for per-sample decode in __getitem__) produces
features_{train,test}.npz using the C++ featurizer where available.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import yaml


def check_raw_data(raw_dir: Path) -> bool:
    """Presence check for the raw LUMA download (compile_luma.py:95-119)."""
    needed = {
        "audio datalist": raw_dir / "audio" / "datalist.csv",
        "text tsv": raw_dir / "text_data.tsv",
        "image pickle": raw_dir / "edm_images.pickle",
    }
    ok = True
    for name, p in needed.items():
        if p.exists():
            print(f"  [ok] {name}: {p}")
        else:
            print(f"  [missing] {name}: {p}")
            ok = False
    return ok


def create_config_file(raw_dir: Path, out_dir: Path, cfg_path: Path) -> None:
    """Emit the compile-config YAML (schema: compile_luma.py:122-172)."""
    cfg = {
        "data_path": str(raw_dir),
        "output_path": str(out_dir),
        "train_samples_per_class": 500,
        "test_samples_per_class": 100,
        "modalities": {"audio": True, "image": True, "text": True},
        "ood": {"add_ood": False, "ratio": 0.0},
        "noise": {"add_noise_train": False, "add_noise_test": False},
        "label_noise": {"add_noise_train": False, "add_noise_test": False, "ratio": 0.0},
        "audio": {
            "audio_data_path": str(raw_dir / "audio"),
            "audio_csv_path": str(raw_dir / "audio" / "datalist.csv"),
            "sample_noise": {"add_noise_train": False, "add_noise_test": False},
            "label_switch_prob": 0.0,
            "diversity": {"compactness": 0},
        },
        "text": {
            "text_tsv_path": str(raw_dir / "text_data.tsv"),
            "sample_noise": {"add_noise_train": False, "add_noise_test": False},
            "label_switch_prob": 0.0,
            "diversity": {"compactness": 0},
        },
        "image": {
            "image_data_path": str(raw_dir / "edm_images.pickle"),
            "sample_noise": {"add_noise_train": False, "add_noise_test": False},
            "label_switch_prob": 0.0,
            "diversity": {"compactness": 0},
        },
    }
    cfg_path.parent.mkdir(parents=True, exist_ok=True)
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    print(f"  wrote {cfg_path}")


def create_simplified_dataset(raw_dir: Path, out_dir: Path) -> None:
    """Fallback compiled layout (compile_luma.py:175-313): symlink the audio
    tree (absolute-path fallback in the CSV), copy tsv/pickle, write
    metadata.yaml."""
    out_dir.mkdir(parents=True, exist_ok=True)
    audio_src = raw_dir / "audio"
    audio_dst = out_dir / "audio"
    if audio_src.exists() and not audio_dst.exists():
        try:
            audio_dst.symlink_to(audio_src.resolve(), target_is_directory=True)
        except OSError:
            shutil.copytree(audio_src, audio_dst)

    src_csv = audio_src / "datalist.csv"
    if src_csv.exists():
        shutil.copy(src_csv, out_dir / "audio_datalist.csv")
    for name in ["text_data.tsv", "edm_images.pickle"]:
        src = raw_dir / name
        if src.exists():
            shutil.copy(src, out_dir / name)

    (out_dir / "metadata.yaml").write_text(
        yaml.safe_dump({
            "num_classes": 42,
            "num_ood_classes": 8,
            "train_samples_per_class": 500,
            "test_samples_per_class": 100,
            "source": "create_simplified_dataset",
        })
    )
    print(f"  compiled layout at {out_dir}")


def featurize(out_dir: Path, replicate_image_bug: bool = False) -> None:
    """Offline featurization (NEW vs the reference — see data/luma.py)."""
    from ..data.luma import LUMADataset

    for split in ["train", "test"]:
        ds = LUMADataset(str(out_dir), split, replicate_image_bug=replicate_image_bug)
        (xs, y) = ds.featurize()
        print(
            f"  featurized {split}: audio {xs[0].shape}, text {xs[1].shape}, "
            f"image {xs[2].shape}, {len(y)} labels"
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--raw-dir", type=str, default="data/luma_raw")
    parser.add_argument("--out-dir", type=str, default="data/luma_compiled")
    parser.add_argument("--config-out", type=str,
                        default="disentagled_multimodal_fusion_tpu/configs/luma_compile_config.yaml")
    parser.add_argument("--skip-featurize", action="store_true")
    parser.add_argument("--replicate-image-bug", action="store_true")
    args = parser.parse_args(argv)

    raw_dir, out_dir = Path(args.raw_dir), Path(args.out_dir)
    print("[1/4] raw data check (zero-egress: the HF download / LUMA clone "
          "steps of the reference cannot run here; place the raw corpus at "
          f"{raw_dir})")
    if not check_raw_data(raw_dir):
        # Maybe the compiled layout already exists (e.g. the test fixture).
        if (out_dir / "audio_datalist.csv").exists():
            print("  raw data missing but compiled layout present — continuing")
            if not args.skip_featurize:
                print("[4/4] offline featurization")
                featurize(out_dir, args.replicate_image_bug)
            return 0
        print("  aborting: no raw or compiled data found")
        return 1
    print("[2/4] compile config")
    create_config_file(raw_dir, out_dir, Path(args.config_out))
    print("[3/4] compiled layout")
    create_simplified_dataset(raw_dir, out_dir)
    if not args.skip_featurize:
        print("[4/4] offline featurization")
        featurize(out_dir, args.replicate_image_bug)
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
