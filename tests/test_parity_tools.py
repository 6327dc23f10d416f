"""Tests for the parity-campaign orchestration tools.

Covers the crash-resume loader in tools/parity_check.py (incremental
per-seed writes -> --resume skips completed seeds, truncates a
partially-written one) and tools/promote_refresh.py (mechanical
promotion of refreshed cells into a canonical file: complete cells are
copied and the summary recomputed; partial cells are refused). Pure
file-level logic — no model fits, no jax.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

from parity_check import check_resume_args, load_resume, summarize  # noqa: E402

METRIC_ROW = {
    "accuracy": 0.9, "ece": 0.1, "epistemic_mean": 0.3, "aleatoric_mean": 1.2,
}


def _rows(n, acc=0.9):
    return [dict(METRIC_ROW, accuracy=acc + 0.001 * i) for i in range(n)]


def _cell(n_torch, n_ours=None, acc=0.9):
    return {"torch": _rows(n_torch, acc),
            "ours": _rows(n_ours if n_ours is not None else n_torch, acc)}


def test_load_resume_missing_file(tmp_path):
    out, start = load_resume(tmp_path / "nope.json")
    assert out == {} and start == 0


def test_load_resume_truncates_partial_seed(tmp_path):
    # model a finished 3 seeds, model b only 2 (interrupted mid-seed 2):
    # only the first 2 seeds count as complete, and a's third is dropped
    dest = tmp_path / "campaign.json"
    per_seed = {"a": _cell(3), "b": _cell(2)}
    dest.write_text(json.dumps(
        {"per_seed": per_seed, "summary": summarize(per_seed)}))
    out, start = load_resume(dest)
    assert start == 2
    assert {len(c["torch"]) for c in out.values()} == {2}
    assert {len(c["ours"]) for c in out.values()} == {2}


def test_load_resume_half_written_sides(tmp_path):
    # torch side written, ours side interrupted before recording
    dest = tmp_path / "campaign.json"
    per_seed = {"a": _cell(3, n_ours=2)}
    dest.write_text(json.dumps({"per_seed": per_seed, "summary": {}}))
    out, start = load_resume(dest)
    assert start == 2
    assert len(out["a"]["torch"]) == len(out["a"]["ours"]) == 2


def test_check_resume_args_matching_ok(tmp_path):
    dest = tmp_path / "c.json"
    ra = {"dataset": "PIE", "seeds": [0, 1], "models": None, "epochs": 200}
    dest.write_text(json.dumps({"args": ra, "per_seed": {}}))
    check_resume_args(dest, dict(ra))  # no raise


def test_check_resume_args_mismatch_errors(tmp_path):
    dest = tmp_path / "c.json"
    dest.write_text(json.dumps({
        "args": {"dataset": "PIE", "seeds": [0, 1], "models": None,
                 "epochs": 200},
        "per_seed": {}}))
    with pytest.raises(SystemExit, match="misalign"):
        check_resume_args(dest, {"dataset": "PIE", "seeds": [0, 1, 2],
                                 "models": None, "epochs": 200})


def test_check_resume_args_legacy_file_warns_only(tmp_path, capsys):
    dest = tmp_path / "c.json"
    dest.write_text(json.dumps({"per_seed": {}}))  # pre-args-block file
    check_resume_args(dest, {"dataset": "PIE", "seeds": [0]})
    assert "predates" in capsys.readouterr().out


def _run_promote(*argv):
    return subprocess.run(
        [sys.executable, str(TOOLS / "promote_refresh.py"), *argv],
        capture_output=True, text=True,
    )


def test_promote_replaces_cell_and_recomputes_summary(tmp_path):
    canon = tmp_path / "canonical.json"
    staging = tmp_path / "refresh.json"
    canon_cells = {"dis": _cell(5, acc=0.5), "cml": _cell(5, acc=0.7)}
    canon.write_text(json.dumps(
        {"per_seed": canon_cells, "summary": summarize(canon_cells)}))
    fresh = {"dis": _cell(5, acc=0.8)}
    staging.write_text(json.dumps(
        {"per_seed": fresh, "summary": summarize(fresh)}))

    res = _run_promote(str(staging), str(canon))
    assert res.returncode == 0, res.stderr
    after = json.loads(canon.read_text())
    # dis replaced by the refreshed values, cml untouched
    assert after["per_seed"]["dis"] == fresh["dis"]
    assert after["per_seed"]["cml"] == canon_cells["cml"]
    # summary recomputed over the merged per_seed
    assert after["summary"] == summarize(after["per_seed"])
    assert "promoted dis" in res.stdout


def test_promote_refuses_partial_campaign(tmp_path):
    canon = tmp_path / "canonical.json"
    staging = tmp_path / "refresh.json"
    canon_cells = {"dis": _cell(5)}
    canon.write_text(json.dumps(
        {"per_seed": canon_cells, "summary": summarize(canon_cells)}))
    staging.write_text(json.dumps({"per_seed": {"dis": _cell(3)}}))

    before = canon.read_text()
    res = _run_promote(str(staging), str(canon))
    assert res.returncode != 0
    assert "partial" in res.stderr
    assert canon.read_text() == before  # untouched on refusal


def test_promote_refuses_overcomplete_campaign(tmp_path):
    # a staging cell with MORE seeds than the canonical file means the
    # campaign ran a different seed list — must error, never truncate
    canon = tmp_path / "canonical.json"
    staging = tmp_path / "refresh.json"
    canon_cells = {"dis": _cell(5)}
    canon.write_text(json.dumps(
        {"per_seed": canon_cells, "summary": summarize(canon_cells)}))
    staging.write_text(json.dumps({"per_seed": {"dis": _cell(7)}}))

    before = canon.read_text()
    res = _run_promote(str(staging), str(canon))
    assert res.returncode != 0
    assert "mismatched" in res.stderr
    assert canon.read_text() == before


def test_promote_expect_seeds_zero_is_not_unset(tmp_path):
    # --expect-seeds 0 must be honoured as 0, not fall back to inference
    canon = tmp_path / "canonical.json"
    staging = tmp_path / "refresh.json"
    cells = {"dis": _cell(2)}
    canon.write_text(json.dumps(
        {"per_seed": cells, "summary": summarize(cells)}))
    staging.write_text(json.dumps({"per_seed": cells}))
    res = _run_promote(str(staging), str(canon), "--expect-seeds", "0")
    assert res.returncode != 0  # 2 seeds != expected 0


def test_promote_refuses_protocol_mismatch(tmp_path):
    # both files carry a recorded-args block with differing seed lists
    canon = tmp_path / "canonical.json"
    staging = tmp_path / "refresh.json"
    cells = {"dis": _cell(2)}
    canon.write_text(json.dumps({
        "args": {"dataset": "PIE", "seeds": [0, 1], "epochs": 200},
        "per_seed": cells, "summary": summarize(cells)}))
    staging.write_text(json.dumps({
        "args": {"dataset": "PIE", "seeds": [3, 4], "epochs": 200},
        "per_seed": cells}))
    res = _run_promote(str(staging), str(canon))
    assert res.returncode != 0 and "protocol mismatch" in res.stderr


def test_promote_unknown_model_refused(tmp_path):
    canon = tmp_path / "canonical.json"
    staging = tmp_path / "refresh.json"
    cells = {"dis": _cell(2)}
    canon.write_text(json.dumps(
        {"per_seed": cells, "summary": summarize(cells)}))
    staging.write_text(json.dumps({"per_seed": cells}))
    res = _run_promote(str(staging), str(canon), "--models", "nope")
    assert res.returncode != 0 and "not in" in res.stderr
