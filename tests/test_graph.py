"""engine.graph.min_label_components — exact connected components with
log-round convergence and a loud (never silent) round-budget failure.

Round-5 regression target: the old inline 20-round min-propagation loop in
q_dedup_clusters fell through silently on components of diameter > 20,
returning part-merged cluster ids the shallow driver fixture could never
catch."""

from __future__ import annotations

import pytest

from engine.graph import min_label_components


def _path_pairs(spark, n: int, prefix: str = "n"):
    ids = [f"{prefix}{i:03d}" for i in range(n)]
    return spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], "d1 string, d2 string"
    )


def test_path_graph_deeper_than_old_round_cap(spark):
    """31-node path (diameter 30 > the old 20-round cap) converges — and in
    <= 8 rounds, pinning the pointer-jumping O(log diameter) claim."""
    out = min_label_components(_path_pairs(spark, 31), max_rounds=8).collect()
    assert len(out) == 31
    assert {r["cluster_id"] for r in out} == {"n000"}
    assert sorted(r["doc_id"] for r in out) == [f"n{i:03d}" for i in range(31)]


def test_components_split_and_duplicate_edges(spark):
    """Two components + duplicate/reversed edges: exact min labels, one row
    per vertex, vertices without edges absent."""
    rows = [
        ("a2", "a1"), ("a1", "a0"), ("a1", "a2"),  # path, dup + reversed
        ("b9", "b8"),
    ]
    pairs = spark.createDataFrame(rows, "d1 string, d2 string")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in min_label_components(pairs).collect()
    }
    assert got == {"a0": "a0", "a1": "a0", "a2": "a0", "b8": "b8", "b9": "b8"}


def test_round_exhaustion_raises_not_silent(spark):
    """Exhausting max_rounds must RAISE — the silent fall-through was the
    one reachable wrong-answer path at corpus scale."""
    with pytest.raises(RuntimeError, match="no convergence"):
        min_label_components(_path_pairs(spark, 64), max_rounds=2)


def test_empty_edge_set(spark):
    pairs = spark.createDataFrame([], "d1 string, d2 string")
    assert min_label_components(pairs).count() == 0
