"""Plan-shape census of EVERY queries() entry — the whole-surface
complement to tests/test_plans.py's per-query asserts.

For each query, parses the executed-plan sketch and counts the shapes
that matter at 100 TB: hash exchanges, parquet scans, broadcast vs
shuffled vs nested-loop joins, cartesian products, Python evaluation
nodes (row-wise EvalPython vs Arrow MapInPandas/FlatMapGroupsInPandas),
window operators, and cache reads. Writes one JSON record per query to
BENCH/plan_audit.json so a reviewer can grep the census instead of
trusting per-query docstrings, and prints a summary table.

Global invariants the census enforces (exit 1 on violation; also pinned
in tests/test_plans.py::test_whole_surface_plan_census):
  - NO CartesianProduct anywhere on the surface;
  - NO row-wise Python (BatchEvalPython) anywhere — Python appears only
    as Arrow-vectorized MapInPandas/FlatMapGroupsInPandas, and only in
    the known kernel queries (ALLOWED_ARROW);
  - BroadcastNestedLoopJoin only where a deliberate tiny-side cross
    join is documented (ALLOWED_BNLJ — 1-row census cross-joins and the
    4-row LSH band replication).

Usage: python tools/plan_audit.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Arrow-kernel queries: sequential/pairwise-by-definition algorithms the
# SURVEY documents as the deliberate Python surface (each is
# shuffle-count plan-asserted individually in tests/test_plans.py)
ALLOWED_ARROW = {
    "mann_kendall", "fft_top_periods", "lttb_downsample",
    "lttb_two_stage", "heavy_hitters", "pca_top_component",
    "pagerank_sim", "dedup_clusters", "dedup_keep", "shesd_outliers",
    "spectral_entropy", "dtw_pairs", "bocpd", "dedup_cluster_sizes",
}

# deliberate tiny-side cross joins: 1-row global census broadcasts and
# the 4-row LSH band replication (queries that build on the LSH chain
# inherit its band cross-join)
ALLOWED_BNLJ = {
    "corr_to_global", "psi_drift", "ks_drift", "pack_efficiency",
    "token_budget_sample", "activity_gini", "unigram_logprob",
    "bigram_logprob", "tfidf_top_terms", "vocab_coverage",
    "chi2_type_hour", "pmi_collocations", "heavy_hitters",
    "first_digit_profile", "word_entropy", "gopher_repetition",
    "minhash_signatures", "lsh_candidates", "ngram_jaccard",
    "dedup_clusters", "dedup_keep", "embedding_near_dups",
    "winnow_pairs", "source_mix_rebalance", "pot_exceedances",
    "anomaly_contribution", "triangle_count", "source_dup_matrix",
    "kfold_leakage",
    "decontaminate", "pagerank_sim", "lang_source_cube", "zipf_fit",
    "markov_entropy", "session_type_lift", "zipf_deviants",
    "corr_pairs", "dtw_pairs", "fano_factor", "xcorr_pairs",
    "error_burn", "dedup_cluster_sizes", "type_corr_pairs",
    "mann_kendall", "seasonality_strength", "pettitt_change",
    "detector_ensemble", "lead_lag_ccf", "concurrency_sweep",
    "burstiness", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_lloyd_topk",
    "embedding_topk", "ks_drift", "median_decompose", "hybrid_rrf",
    "bm25_topk", "sax_motifs", "sax_discords", "vocab_typo_pairs",
}


def census(plan: str) -> dict:
    return {
        "hash_exchanges": plan.count("Exchange hashpartitioning"),
        "scans": plan.count("Scan parquet"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "row_python": plan.count("BatchEvalPython"),
        "arrow_python": (
            plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("ArrowEvalPython")
        ),
        "windows": plan.count("Window ["),
        "cache_reads": plan.count("InMemoryTableScan"),
        "sorts": plan.count("Sort ["),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/plan_audit.json"

    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf_dir)

    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(app_name="plan-audit")
    rows, violations = {}, []
    for name, fn in entrymod.queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        c = census(plan)
        rows[name] = c
        if c["cartesian"]:
            violations.append(f"{name}: CartesianProduct")
        if c["row_python"]:
            violations.append(f"{name}: row-wise BatchEvalPython")
        if c["arrow_python"] and name not in ALLOWED_ARROW:
            violations.append(f"{name}: undocumented Arrow kernel")
        if c["bnlj"] and name not in ALLOWED_BNLJ:
            violations.append(f"{name}: undocumented BroadcastNestedLoopJoin")
        print(
            f"{name:28s} x={c['hash_exchanges']:2d} scan={c['scans']:2d} "
            f"bhj={c['bhj']} smj={c['smj']} bnlj={c['bnlj']} "
            f"py={c['row_python']}/{c['arrow_python']}"
        )

    rec = {
        "sf_dir": sf_dir,
        "n_queries": len(rows),
        "violations": violations,
        "queries": rows,
    }
    Path(out).write_text(json.dumps(rec, indent=1, sort_keys=True) + "\n")
    print(f"\nwrote {out}; {len(violations)} violations")
    for v in violations:
        print("VIOLATION:", v)
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
