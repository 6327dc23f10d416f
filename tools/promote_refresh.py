"""Promote refreshed parity cells into a canonical results file.

Long parity campaigns re-measure a subset of a canonical file's model
cells (e.g. the plateau-scheduled cells after the torch-harness
annealing-order fix — see tools/run_parity_round3b.sh and the
HARNESS-LINEAGE NOTE in ROADMAP.md). They land in gitignored staging
files (results/parity_check_*_refresh.json, incremental per-seed
writes). This tool copies completed cells from the staging file into
the canonical file and recomputes its summary, so promotion is
mechanical and a partial campaign can never be half-promoted: a cell is
only copied when its per-seed count matches the canonical file's
exactly (over-complete cells error too — a count mismatch in either
direction means the campaign didn't match the canonical protocol).

Staging files are normally gitignored; near a session boundary a
partial snapshot MAY be force-added so an interrupted campaign's seeds
survive (then resumed with parity_check.py --resume). After promotion,
remove the snapshot from tracking (git rm --cached) — the promoted
canonical file is the durable artifact.

Usage:
  python tools/promote_refresh.py \
      results/parity_check_handwritten_dis_ext15_refresh.json \
      results/parity_check_handwritten_ext15.json [--models dmvae_dis]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from parity_check import summarize  # noqa: E402


def seed_count(cell):
    return min(len(cell["torch"]), len(cell["ours"]))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("staging", help="refresh JSON (source)")
    parser.add_argument("canonical", help="canonical JSON (destination)")
    parser.add_argument(
        "--models", nargs="*", default=None,
        help="subset of staging cells to promote (default: all)",
    )
    parser.add_argument(
        "--expect-seeds", type=int, default=None,
        help="required per-seed count (default: inferred from the "
             "canonical file's own cells)",
    )
    args = parser.parse_args()

    staging_doc = json.loads(Path(args.staging).read_text())
    staging = staging_doc["per_seed"]
    canon_path = Path(args.canonical)
    canon = json.loads(canon_path.read_text())
    per_seed = canon["per_seed"]

    # campaigns since the recorded-args block carry their command line;
    # when both files have one, the protocol identity (dataset/epochs/
    # seed list) must match — a differing campaign must not be promoted
    s_args, c_args = staging_doc.get("args"), canon.get("args")
    if s_args and c_args:
        for k in ("dataset", "epochs", "dep", "seeds"):
            if s_args.get(k) != c_args.get(k):
                raise SystemExit(
                    f"protocol mismatch: staging {k}={s_args.get(k)!r} vs "
                    f"canonical {k}={c_args.get(k)!r} — refusing to promote"
                )

    if args.expect_seeds is not None:
        want = args.expect_seeds
    else:
        want = max(seed_count(c) for c in per_seed.values())
    names = args.models or sorted(staging)
    promoted = []
    for name in names:
        if name not in staging:
            raise SystemExit(f"{name}: not in {args.staging}")
        cell = staging[name]
        n = seed_count(cell)
        if n != want or len(cell["torch"]) != len(cell["ours"]):
            raise SystemExit(
                f"{name}: campaign seed count {n} != expected {want} — "
                f"refusing to promote a {'partial' if n < want else 'mismatched'} "
                f"cell (an over-complete cell means the staging campaign "
                f"ran a different seed list than the canonical file)"
            )
        old = canon["summary"].get(name, {})
        per_seed[name] = {"torch": list(cell["torch"]),
                          "ours": list(cell["ours"])}
        promoted.append((name, old))

    canon["summary"] = summarize(per_seed)
    canon_path.write_text(json.dumps(canon, indent=1))
    for name, old in promoted:
        new = canon["summary"][name]
        old_gap = old.get("accuracy_gap")
        print(
            f"promoted {name}: acc gap "
            f"{'n/a' if old_gap is None else f'{old_gap:.4f}'} -> "
            f"{new['accuracy_gap']:.4f} "
            f"(torch seed std {new['accuracy_torch_seed_std']:.4f}), "
            f"ece gap {new['ece_gap']:.4f}"
        )
    print(f"wrote {canon_path}")


if __name__ == "__main__":
    main()
