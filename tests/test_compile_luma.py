"""Compile orchestration (runners/compile_luma.py): step sequencing matches
the reference (compile_luma.py:316-346) with each network step cleanly
gated — upstream subprocess path taken when a repo with compile_dataset.py
exists, simplified fallback otherwise, offline skips for clone/wordnet."""

import json
import sys
from pathlib import Path

from disentagled_multimodal_fusion_tpu.runners import compile_luma as cl


def _make_raw(tmp_path: Path) -> Path:
    raw = tmp_path / "raw"
    (raw / "audio").mkdir(parents=True)
    (raw / "audio" / "datalist.csv").write_text("filepath,label\n")
    (raw / "text_data.tsv").write_text("text\tlabel\n")
    (raw / "edm_images.pickle").write_bytes(b"\x80\x04N.")  # pickled None
    return raw


def test_offline_skips_network_steps(capsys):
    assert cl.check_luma_repo(online=False, repo_dir=Path("/nonexistent/LUMA")) is None
    out = capsys.readouterr().out
    assert "[skip]" in out and "no network" in out


def test_upstream_subprocess_path(tmp_path, capsys):
    """A repo with compile_dataset.py is invoked via subprocess with
    `-c <config>` (reference compile_luma.py:200-206)."""
    repo = tmp_path / "LUMA"
    repo.mkdir()
    marker = tmp_path / "marker.json"
    (repo / "compile_dataset.py").write_text(
        "import json, sys\n"
        "cfg = sys.argv[sys.argv.index('-c') + 1]\n"
        f"json.dump({{'cfg': cfg, 'argv': sys.argv[1:]}}, open({str(marker)!r}, 'w'))\n"
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("data_path: x\n")
    assert cl.run_upstream_compile(repo, cfg)
    rec = json.loads(marker.read_text())
    assert rec["cfg"] == str(cfg.resolve())

    # failing upstream script -> False (caller falls back)
    (repo / "compile_dataset.py").write_text("import sys; sys.exit(3)\n")
    assert not cl.run_upstream_compile(repo, cfg)
    # absent script -> False
    assert not cl.run_upstream_compile(tmp_path / "empty", cfg)


def test_main_upstream_then_fallback(tmp_path, monkeypatch, capsys):
    """main() prefers the upstream compile; a broken upstream falls back to
    create_simplified_dataset; fully offline it skips clone cleanly."""
    raw = _make_raw(tmp_path)
    out_dir = tmp_path / "compiled"
    repo = tmp_path / "LUMA"
    repo.mkdir()
    touched = tmp_path / "touched"
    (repo / "compile_dataset.py").write_text(
        f"open({str(touched)!r}, 'w').write('ran')\n"
    )
    rc = cl.main([
        "--raw-dir", str(raw), "--out-dir", str(out_dir),
        "--config-out", str(tmp_path / "cfg.yaml"),
        "--offline", "--luma-repo", str(repo), "--skip-featurize",
    ])
    assert rc == 0
    assert touched.read_text() == "ran"
    text = capsys.readouterr().out
    assert "upstream compile_dataset.py succeeded" in text
    # upstream succeeded -> simplified layout NOT built
    assert not (out_dir / "metadata.yaml").exists()

    # broken upstream -> fallback layout is built
    (repo / "compile_dataset.py").write_text("import sys; sys.exit(9)\n")
    rc = cl.main([
        "--raw-dir", str(raw), "--out-dir", str(out_dir),
        "--config-out", str(tmp_path / "cfg.yaml"),
        "--offline", "--luma-repo", str(repo), "--skip-featurize",
    ])
    assert rc == 0
    assert (out_dir / "metadata.yaml").exists()
    assert (out_dir / "audio_datalist.csv").exists()
