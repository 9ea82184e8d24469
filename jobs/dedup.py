"""Drivable corpus dedup: MinHash-LSH candidates -> exact n-gram Jaccard
verify -> connected components -> broadcast anti-join keep-filter, end to
end from one spark-submit, writing the kept corpus + a JSON report.

This is the LLM-training-data shape of the engine's dedup family
(SURVEY.md LLM-pipeline table) made operational, the way jobs/rollup.py
operationalizes the tier pipeline: the same plan-asserted operators the
driver gate checks (`__spark_entry__.q_dedup_*` — the queries ARE the
operator library; this CLI adds no second implementation to drift), with
`--mode exact` as the hash-groupBy fast path when only byte-identical
dedup is wanted.

Run:
    python jobs/dedup.py --input <dir with documents.parquet> \
        --output /tmp/dedup_out [--mode minhash|exact]
    spark-submit --py-files dist/engine.zip jobs/dedup.py ...

Output layout:
    <output>/kept/          parquet of surviving documents (all columns)
    <output>/report.json    {mode, docs_in, docs_kept, docs_dropped,
                             clusters (minhash mode), seconds}
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


def run_dedup(spark, input_dir: str, output_dir: str,
              mode: str = "minhash") -> dict:
    import __spark_entry__ as ops

    t0 = time.monotonic()
    docs = ops._t(spark, input_dir, "documents")
    n_in = docs.count()

    if mode == "exact":
        # byte-identical dedup: keep the min doc_id per content hash
        keep_ids = (
            docs.select("doc_id", F.md5("text").alias("_h"))
            .groupBy("_h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        n_clusters = None
    elif mode == "minhash":
        keep_ids = ops.q_dedup_keep(spark, input_dir).select("doc_id")
        n_clusters = (
            ops.q_dedup_clusters(spark, input_dir)
            .select("cluster_id")
            .distinct()
            .count()
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    kept = docs.join(F.broadcast(keep_ids), "doc_id", "left_semi")
    kept_path = os.path.join(output_dir, "kept")
    kept.write.mode("errorifexists").parquet(kept_path)
    n_kept = spark.read.parquet(kept_path).count()

    report = {
        "mode": mode,
        "docs_in": int(n_in),
        "docs_kept": int(n_kept),
        "docs_dropped": int(n_in - n_kept),
        "clusters": n_clusters,
        "seconds": round(time.monotonic() - t0, 3),
    }
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", default="minhash",
                    choices=["minhash", "exact"])
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from engine.session import get_spark

    spark = get_spark(app_name="dedup-job", master=args.master)
    report = run_dedup(spark, args.input, args.output, mode=args.mode)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
