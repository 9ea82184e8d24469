"""Drivable corpus health card: the read-only scorecard a data curator
runs BEFORE deciding what jobs/corpus_pipeline.py should do to a corpus.

This is the DOCUMENTS-side counterpart of jobs/analyze.py (which cards
the events corpus): one spark-submit over a directory containing
documents.parquet, writing each diagnostic layer as parquet plus a JSON
report with the headline numbers inlined. Like every other job it adds
NO second implementation to drift: each layer calls (or re-aggregates
the OUTPUT of) the same oracle-gated `__spark_entry__` operators the
driver gate hash-checks.

Layers:
  corpus_card     one row: Zipf frequency-law slope (q_zipf_fit) ×
                  Heaps vocabulary-growth exponent (q_heaps_fit) ×
                  doc/token totals re-aggregated from
                  q_source_length_profile — the three corpus-scale
                  composition laws side by side
  sources         q_source_length_profile — per-source length card
  lang_mix        q_lang_source_cube — language × source census
  templates       q_boilerplate_prefixes — per-source repeated heads
  dup_clusters    q_dedup_cluster_sizes — near-dup cluster census
  containment     q_containment_pairs — subset dups Jaccard misses
  cross_source    q_source_js_divergence — distribution-level mirrors
  quality         per-source Gopher rule failure shares re-aggregated
                  from q_gopher_quality_filter ⋈ the (doc, source)
                  projection (broadcast flags into the projection —
                  the kfold_leakage endpoint-lookup plan)
  pii             per-source PII match totals, same re-agg shape over
                  q_pii_scan
  fold_leakage    q_kfold_leakage — near-dup pairs straddling folds

Scale shape: every layer is a gated operator (individually
plan-asserted) or a tiny re-agg of one's bounded output; the job's cost
is the N independent corpus scans, the documented battery trade
(jobs/analyze.py) — run fewer via --skip.

Run:
    python jobs/corpus_report.py --input /root/testdata/sf0.01 \
        --output /tmp/corpus_report
    spark-submit --py-files dist/engine.zip jobs/corpus_report.py ...

Output layout:
    <output>/<layer>/           parquet per layer (list above)
    <output>/report.json        headline numbers + rows/seconds per layer
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def run_corpus_report(
    spark, input_dir: str, output_dir: str, skip: set | None = None
) -> dict:
    import __spark_entry__ as ops

    skip = skip or set()
    t0 = time.monotonic()
    queries = ops.queries()
    os.makedirs(output_dir, exist_ok=True)
    report: dict = {"input": input_dir, "layers": {}}

    def _layer(name: str, df) -> None:
        if name in skip:
            return
        t = time.monotonic()
        path = os.path.join(output_dir, name)
        df.write.mode("errorifexists").parquet(path)
        report["layers"][name] = {
            "rows": spark.read.parquet(path).count(),
            "seconds": round(time.monotonic() - t, 3),
        }

    # one-row corpus card: the three composition laws plus totals,
    # totals re-aggregated from the gated per-source length profile
    totals = (
        queries["source_length_profile"](spark, input_dir)
        .agg(
            F.count("*").cast("long").alias("n_sources"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("tok_sum").cast("long").alias("n_tokens"),
        )
    )
    card = (
        totals.crossJoin(
            F.broadcast(
                queries["zipf_fit"](spark, input_dir).select(
                    "vocab",
                    F.col("slope").alias("zipf_slope"),
                    F.col("intercept").alias("zipf_intercept"),
                )
            )
        ).crossJoin(
            F.broadcast(
                queries["heaps_fit"](spark, input_dir).select(
                    F.col("beta").alias("heaps_beta"),
                    F.col("ln_k").alias("heaps_ln_k"),
                )
            )
        )
    )
    _layer("corpus_card", card)

    _layer("sources", queries["source_length_profile"](spark, input_dir))
    _layer("lang_mix", queries["lang_source_cube"](spark, input_dir))
    _layer("templates", queries["boilerplate_prefixes"](spark, input_dir))
    _layer("dup_clusters", queries["dedup_cluster_sizes"](spark, input_dir))
    _layer("containment", queries["containment_pairs"](spark, input_dir))
    _layer(
        "cross_source", queries["source_js_divergence"](spark, input_dir)
    )

    # per-source quality/pii shares: the per-doc gated outputs join the
    # (doc_id, source) projection on the doc_id equi-key and re-agg to a
    # source-sized result — integer counts only. No broadcast hint: both
    # sides are docs-sized (one row per document), so at 100 TB a broadcast
    # of either side OOMs the driver/executors (ADVICE r06 medium); a
    # shuffled equi-join is the scale-correct shape and the re-agg output
    # stays source-sized either way.
    src = ops._t(spark, input_dir, "documents").select("doc_id", "source")
    if "quality" not in skip:
        flags = queries["gopher_quality_filter"](spark, input_dir).select(
            "doc_id", F.col("keep").cast("long").alias("_keep")
        )
        q = (
            src.join(flags, "doc_id")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("_keep").cast("long").alias("n_keep"),
            )
            .withColumn("n_fail", F.col("n_docs") - F.col("n_keep"))
            .orderBy("source")
        )
        _layer("quality", q)
    if "pii" not in skip:
        pii = queries["pii_scan"](spark, input_dir)
        p = (
            src.join(pii, "doc_id")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs_with_pii"),
                F.sum("n_email").cast("long").alias("n_email"),
                F.sum("n_phone").cast("long").alias("n_phone"),
                F.sum("n_ipv4").cast("long").alias("n_ipv4"),
            )
            .orderBy("source")
        )
        _layer("pii", p)

    _layer("fold_leakage", queries["kfold_leakage"](spark, input_dir))

    # inline the one-row card into the JSON so the report is readable
    # without parquet tooling
    if "corpus_card" not in skip:
        row = (
            spark.read.parquet(os.path.join(output_dir, "corpus_card"))
            .collect()[0]
            .asDict()
        )
        report["corpus_card"] = row
    report["seconds"] = round(time.monotonic() - t0, 3)
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True,
                    help="dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--skip", default="",
                    help="comma-separated layer names to skip")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from engine.session import get_spark

    kw = {"app_name": "corpus_report"}
    if args.master:
        kw["master"] = args.master
    spark = get_spark(**kw)
    report = run_corpus_report(
        spark,
        args.input,
        args.output,
        skip={s for s in args.skip.split(",") if s},
    )
    print(json.dumps({"layers": report["layers"]}))


if __name__ == "__main__":
    main()
