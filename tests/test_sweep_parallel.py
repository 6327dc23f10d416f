"""Unit tests for the dataset-parallel sweep orchestrator.

The subprocess-spawning path is exercised end-to-end by the archived
validation run (see RESULTS.md); these pin the pure orchestration logic:
partitioning, env templating, and the rows merge that feeds the shared
report writer.
"""

import json

from disentagled_multimodal_fusion_tpu.runners.sweep_parallel import (
    _expand_env,
    merge_rows,
    partition,
)


def test_partition_round_robin_covers_all():
    items = ["CUB", "HandWritten", "PIE", "Scene"]
    parts = partition(items, 3)
    assert sorted(sum(parts, [])) == sorted(items)
    # no empty parts even when procs > datasets
    assert all(parts_i for parts_i in partition(items, 8))
    assert sorted(sum(partition(items, 8), [])) == sorted(items)
    # 1 proc degenerates to the sequential sweep order
    assert partition(items, 1) == [items]


def test_expand_env_substitutes_rank():
    env = _expand_env(
        ["TPU_VISIBLE_CHIPS={rank}", "NRANKS={nranks}", "PLAIN=x"], 2, 4
    )
    assert env == {"TPU_VISIBLE_CHIPS": "2", "NRANKS": "4", "PLAIN": "x"}


def test_merge_rows_disjoint_datasets(tmp_path):
    # two workers, disjoint dataset partitions, same seeds/conditions —
    # the merge must interleave without clobbering either side
    w0 = {"0": {"Normal": {"CUB": {"m1": {"a": 1}}},
                "Conflict": {"CUB": {"m1": {"a": 2}}}}}
    w1 = {"0": {"Normal": {"PIE": {"m1": {"a": 3}}},
                "Conflict": {"PIE": {"m1": {"a": 4}}}}}
    p0 = tmp_path / "w0.json"
    p1 = tmp_path / "w1.json"
    p0.write_text(json.dumps(w0))
    p1.write_text(json.dumps(w1))
    rows = merge_rows([str(p0), str(p1)])
    assert set(rows) == {0}  # seed keys become ints (run.py resume contract)
    assert rows[0]["Normal"] == {"CUB": {"m1": {"a": 1}}, "PIE": {"m1": {"a": 3}}}
    assert rows[0]["Conflict"]["PIE"]["m1"]["a"] == 4
