"""Shared runner plumbing: YAML config access, reporting, device upload.

The ``C()`` dot-path getter reproduces the reference's config semantics
(run.py:29-36): a missing/broken YAML key silently falls back to the
code-level default.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np
import pandas as pd
import yaml

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
CONFIG_DIR = REPO_ROOT / "disentagled_multimodal_fusion_tpu" / "configs"


def load_config(name: str) -> dict:
    path = CONFIG_DIR / name
    if not path.exists():
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def make_getter(cfg: dict):
    """Dot-path getter with default: C('probes.dropout_p', 0.1)."""

    def C(path: str, default=None):
        cur = cfg
        for p in path.split("."):
            if not isinstance(cur, dict) or p not in cur:
                return default
            cur = cur[p]
        return cur

    return C


def cell_seed(seed: int, dataset_name: str, conflict: bool) -> int:
    """Process-stable integer seed for one (seed, dataset, condition) cell.

    Uses zlib.crc32, NOT Python's hash(): str hashing is salted per process
    (PYTHONHASHSEED), which made model-init/shuffle PRNGKeys differ between
    invocations of the same cell in round 1. Splits/injections were always
    fine (np.random.seed); this pins the training RNG too.
    """
    import zlib

    return seed * 1000 + zlib.crc32(dataset_name.encode()) % 997 + (500 if conflict else 0)


def add_mesh_args(parser) -> None:
    """--data-parallel/--model-parallel flags shared by the drivers."""
    parser.add_argument(
        "--data-parallel", type=int, default=1, metavar="N",
        help="shard work over N devices along the mesh 'data' axis "
             "(dataset rows for single fits, the seed/instance axis for "
             "--vmap-seeds)",
    )
    parser.add_argument(
        "--model-parallel", type=int, default=1, metavar="N",
        help="tensor-parallel hidden-dim cut over N devices (mesh 'model' axis)",
    )


def build_runner_mesh(data_parallel: int = 1, model_parallel: int = 1):
    """Mesh for the runner flags; None when no parallelism requested.

    Joins the multi-host cluster first when the standard JAX coordinator
    env vars are present (parallel.distributed.initialize — a no-op for
    the plain single-process case), so the same CLI works on one chip, a
    single slice, or a multi-host pod.
    """
    from ..parallel.distributed import initialize

    multihost = initialize()
    if data_parallel <= 1 and model_parallel <= 1 and not multihost:
        return None
    import jax

    from ..parallel.distributed import global_mesh
    from ..parallel.mesh import make_mesh

    if multihost:
        # all devices across all hosts; 'model' groups stay intra-host
        mesh = global_mesh(model_parallel=model_parallel)
    else:
        n = data_parallel * model_parallel
        avail = len(jax.devices())
        if n > avail:
            raise SystemExit(
                f"--data-parallel x --model-parallel = {n} devices requested, "
                f"but only {avail} visible (set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N for CPU tests)"
            )
        mesh = make_mesh(n_devices=n, model_parallel=model_parallel)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"over {mesh.devices.size} {jax.devices()[0].platform} device(s)"
          + (f", {jax.process_count()} processes" if multihost else ""),
          flush=True)
    return mesh


def vmap_seeds_unsafe(n_seeds: int, dtype=None):
    """Known-lethal config on this image's axon TPU relay — returns a
    reason string when (backend, precision, seed count) is in the blast
    radius, None otherwise.

    Round-2 reproducer (RESULTS.md / ROADMAP item 0), re-confirmed round 3
    (2026-08-17, /tmp/vmap_repro.log): `run.py --vmap-seeds
    --force-vmap-seeds --datasets HandWritten --conditions Normal` — the
    5-seed vmapped DMVAE and the dmvae_dis probe complete, then the
    dmvae_cml (AdamW+cosine shared+private) vmapped program kills the
    relay worker ("TPU worker process crashed or restarted"). Single-seed
    programs, bf16 vmapped programs, and CPU virtual meshes all compile
    and run the same code fine — the failure is specific to the relay,
    not to the program, so the product guard (runners auto-fall back to
    the sequential path with a loud warning; override with
    --force-vmap-seeds) is scoped to exactly this backend.

    Isolation (round 3, /tmp/cml_only.log): the 5-seed vmapped dmvae_cml
    program run ALONE in a fresh process — random embeddings, nothing
    else compiled first — still kills the relay. The crash is
    program-specific, not cumulative, so segmenting the sweep into
    smaller compile units cannot route around it; auto-fallback (or the
    bf16 vmapped path) is the only safe product behavior here.
    """
    if dtype not in (None, "float32"):
        return None  # bf16 vmapped programs compile fine on the relay
    if n_seeds < 2:
        return None
    try:
        import jax
        from jax._src import xla_bridge as xb

        if jax.default_backend() == "tpu" and "axon" in xb.backends():
            return (
                f"compiling {n_seeds}-seed vmapped probe programs under the "
                "f32 parity-first precision default deterministically "
                "crashes the axon TPU relay (round-2 reproducer: "
                "run.py --vmap-seeds --datasets HandWritten)"
            )
    except Exception:
        pass  # private-module layout changed; don't block the run
    return None


def guard_vmap_seeds(args, n_seeds: int, dtype=None) -> bool:
    """Apply vmap_seeds_unsafe to a runner's parsed args: returns the
    effective vmap-seeds setting, warning loudly on auto-fallback."""
    if not getattr(args, "vmap_seeds", False):
        return False
    reason = vmap_seeds_unsafe(n_seeds, dtype)
    if reason is None:
        return True
    if getattr(args, "force_vmap_seeds", False):
        print(f"WARNING: --force-vmap-seeds overrides a known-bad config: "
              f"{reason}", flush=True)
        return True
    print(
        f"WARNING: --vmap-seeds disabled, falling back to sequential "
        f"per-seed training: {reason}. Use --dtype bfloat16 for a vmapped "
        f"run on this backend, or --force-vmap-seeds to override.",
        flush=True,
    )
    return False


def add_force_vmap_flag(parser) -> None:
    parser.add_argument(
        "--force-vmap-seeds", action="store_true",
        help="skip the axon-relay safety guard and run --vmap-seeds even "
             "in the known-crash config (see runners/common.py:"
             "vmap_seeds_unsafe)",
    )


def to_device(arrays):
    """Upload a pytree of numpy arrays to the default device once."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda a: jnp.asarray(a), arrays)


def write_report(dfs: Dict[str, pd.DataFrame], excel_path: str) -> None:
    """Write the multi-sheet report: pandas/openpyxl when available
    (reference: run.py:340-343), else the vendored dependency-free xlsx
    writer (utils/xlsx.py) — plus CSV sheets alongside either way."""
    from ..core.artifacts import artifact_path

    path = artifact_path(excel_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        with pd.ExcelWriter(path) as writer:
            for sheet, df in dfs.items():
                df.to_excel(writer, sheet_name=sheet, index=False)
        print(f"wrote {path}")
    except (ImportError, ModuleNotFoundError):
        from disentagled_multimodal_fusion_tpu.utils.xlsx import write_xlsx

        write_xlsx(path, dfs)
        print(f"wrote {path} (vendored xlsx writer)")
    for sheet, df in dfs.items():
        csv = path.with_name(f"{path.stem}_{sheet}.csv")
        df.to_csv(csv, index=False)
        print(f"wrote {csv}")


MAIN_COLUMNS_TAIL = [
    "view_0_evidence_mean", "view_1_evidence_mean", "shared_evidence_mean",
    "fused_evidence_mean",
    "view_0_aleatoric_mean", "view_1_aleatoric_mean", "shared_aleatoric_mean",
    "fused_aleatoric_mean",
    "view_0_epistemic_mean", "view_1_epistemic_mean", "shared_epistemic_mean",
    "fused_epistemic_mean",
    "view_0_accuracy", "view_1_accuracy", "shared_accuracy", "fused_accuracy",
    # additive vs the reference's main sheet: the north-star tracks ECE
    "fused_ece",
]


def main_columns(df: pd.DataFrame, id_cols) -> pd.DataFrame:
    cols = list(id_cols) + [c for c in MAIN_COLUMNS_TAIL if c in df.columns]
    return df[cols]
