"""jobs/corpus_report.py: the corpus health card — layers match the
oracle-gated operators they compose, the re-agg layers are consistent
with their per-doc sources, and the report is durable."""

from __future__ import annotations

import json
import os


def test_corpus_report_layers_match_gated_operators(spark, tmp_path):
    from jobs.corpus_report import run_corpus_report

    import __spark_entry__ as ops

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "report")
    report = run_corpus_report(spark, sf, out)

    queries = ops.queries()

    # pass-through layers are the gated operators verbatim
    for layer, qname in [
        ("sources", "source_length_profile"),
        ("lang_mix", "lang_source_cube"),
        ("templates", "boilerplate_prefixes"),
        ("dup_clusters", "dedup_cluster_sizes"),
        ("containment", "containment_pairs"),
        ("cross_source", "source_js_divergence"),
        ("fold_leakage", "kfold_leakage"),
    ]:
        got = spark.read.parquet(os.path.join(out, layer)).count()
        want = queries[qname](spark, sf).count()
        assert got == want, (layer, got, want)
        assert report["layers"][layer]["rows"] == want

    # corpus_card: one row; totals equal the source profile re-agg and
    # the law fits match the operators
    card = spark.read.parquet(os.path.join(out, "corpus_card")).collect()
    assert len(card) == 1
    card = card[0].asDict()
    prof = queries["source_length_profile"](spark, sf).collect()
    assert card["n_sources"] == len(prof)
    assert card["n_docs"] == sum(r["n_docs"] for r in prof)
    assert card["n_tokens"] == sum(r["tok_sum"] for r in prof)
    zipf = queries["zipf_fit"](spark, sf).collect()[0]
    assert card["zipf_slope"] == zipf["slope"]
    heaps = queries["heaps_fit"](spark, sf).collect()[0]
    assert card["heaps_beta"] == heaps["beta"]

    # quality layer: per-source failure counts sum to the per-doc flags
    qual = spark.read.parquet(os.path.join(out, "quality")).collect()
    flags = queries["gopher_quality_filter"](spark, sf).collect()
    assert sum(r["n_docs"] for r in qual) == len(flags)
    assert sum(r["n_fail"] for r in qual) == sum(
        0 if r["keep"] else 1 for r in flags
    )

    # pii layer totals equal the per-doc scan
    pii_rows = spark.read.parquet(os.path.join(out, "pii")).collect()
    scan = queries["pii_scan"](spark, sf).collect()
    assert sum(r["n_email"] for r in pii_rows) == sum(
        r["n_email"] for r in scan
    )
    assert sum(r["n_docs_with_pii"] for r in pii_rows) == len(scan)

    # durable report with the card inlined
    with open(os.path.join(out, "report.json")) as f:
        persisted = json.load(f)
    assert persisted["layers"] == report["layers"]
    assert persisted["corpus_card"]["n_docs"] == card["n_docs"]
    assert persisted["seconds"] > 0


def test_corpus_report_skip(spark, tmp_path):
    from jobs.corpus_report import run_corpus_report

    out = str(tmp_path / "skip")
    report = run_corpus_report(
        spark,
        "/root/testdata/sf0.001",
        out,
        skip={"containment", "pii", "fold_leakage"},
    )
    assert "containment" not in report["layers"]
    assert not os.path.exists(os.path.join(out, "containment"))
    assert "sources" in report["layers"]
