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


# ---------------------------------------------------------------------------
# pagerank_mu — integer-micro-unit PageRank pinned bit-exact against a
# sequential pure-Python twin (the rows-only driver check carries no value
# comparison, so THIS pin is the operator's exactness gate)
# ---------------------------------------------------------------------------


def _pagerank_py(pairs, iters=12, total_mu=10**12, d_num=85, d_den=100):
    """Sequential twin of engine.graph.pagerank_mu: same integer floors,
    same teleport base, dict arithmetic instead of shuffle joins."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    if n == 0:
        return {}
    r0 = total_mu // n
    base = ((d_den - d_num) * total_mu) // (d_den * n)
    rank = {v: r0 for v in adj}
    for _ in range(iters):
        nxt = {v: base for v in adj}
        for u, nbrs in adj.items():
            c = (d_num * rank[u]) // (d_den * len(nbrs))
            for v in nbrs:
                nxt[v] += c
        rank = nxt
    return rank


def _assert_pagerank_matches(spark, edges, **kw):
    from engine.graph import pagerank_mu

    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {
        r["node"]: r["rank_mu"] for r in pagerank_mu(pairs, **kw).collect()
    }
    assert got == _pagerank_py(edges, **kw)


def test_pagerank_exact_vs_sequential_twin(spark):
    """Star + triangle + path + bridge, duplicate and reversed edges:
    every node's int64 rank equals the sequential twin EXACTLY (integer
    mass transfers are order-independent, so distributed == sequential
    bit-for-bit — the cross-engine discipline the float version of
    PageRank cannot offer)."""
    edges = [
        # star: 0 hub of 1..4
        (0, 1), (0, 2), (0, 3), (0, 4),
        # triangle 5-6-7
        (5, 6), (6, 7), (7, 5),
        # path 8-9-10 bridged to the star via (4, 8)
        (8, 9), (9, 10), (4, 8),
        # duplicate + reversed spellings must not double edges
        (1, 0), (5, 6),
    ]
    _assert_pagerank_matches(spark, edges)


def test_pagerank_hub_outranks_leaves(spark):
    from engine.graph import pagerank_mu

    edges = [(0, i) for i in range(1, 6)]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r["node"]: r["rank_mu"] for r in pagerank_mu(pairs).collect()}
    assert got[0] > max(got[i] for i in range(1, 6))
    # symmetric leaves tie exactly
    assert len({got[i] for i in range(1, 6)}) == 1


def test_pagerank_empty_and_bad_iters(spark):
    import pytest as _pt

    from engine.graph import pagerank_mu

    empty = spark.createDataFrame([], "d1 long, d2 long")
    assert pagerank_mu(empty).count() == 0
    with _pt.raises(ValueError, match="iters"):
        pagerank_mu(empty, iters=0)
