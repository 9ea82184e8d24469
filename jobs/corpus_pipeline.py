"""Drivable end-to-end training-corpus pipeline: quality filter ->
near-dup dedup -> benchmark decontamination -> passage chunking ->
context-window packing, from one spark-submit, writing each stage as a
parquet checkpoint plus a JSON report.

This composes the engine's LLM-data operators (SURVEY.md LLM-pipeline
table) the way a real pre-training data run chains them — and, like
jobs/dedup.py and jobs/rollup.py, it adds NO second implementation to
drift: every stage calls the same oracle-gated `__spark_entry__`
operators the driver gate hash-checks, pointed at the previous stage's
checkpoint directory (the operators read `<dir>/documents.parquet`, so
a stage boundary is just a directory). Materializing each stage is the
same commit-then-advance discipline as the rollup tiers: a killed run
resumes by pointing --input at the last completed stage.

Stages (each skippable):
  1. quality   q_quality_score thresholds: keep docs with
               n_toks >= --min-toks and stop_ratio <= --max-stop-ratio
  2. dedup     q_dedup_keep (MinHash-LSH candidates -> exact Jaccard
               verify -> connected components -> keep min doc_id)
  3. decon     q_decontaminate: drop the eval split itself AND train
               docs sharing >= --decon-min-shared word-3-grams with it
  3b. rebalance (opt-in) source-mix rebalancing toward the equal token
               share: deterministic hash downsample of over-represented
               sources at the _mix_rates acceptance rates
  4. chunk     q_chunk_documents sliding-window passages, re-keyed as
               a documents table (chunk-granularity corpus)
  4b. chunkdedup  passage-level dedup over the chunk corpus: keep the
               FIRST occurrence (min chunk-corpus doc_id — the same
               lexicographic (parent, chunk) witness q_chunk_dup_groups
               reports) of every md5-identical passage, dropping the
               boilerplate repeats whole-doc dedup cannot see
               (RefinedWeb's line-dedup stage at chunk granularity)
  5. pack      q_pack_sequences + q_pack_efficiency over the chunk
               corpus: the GPT-style concat-then-split layout + fill QA

Run:
    python jobs/corpus_pipeline.py --input <dir with documents.parquet> \
        --output /tmp/corpus_out
    spark-submit --py-files dist/engine.zip jobs/corpus_pipeline.py ...

Output layout:
    <output>/s1_quality/documents.parquet    surviving docs
    <output>/s2_dedup/documents.parquet
    <output>/s3_decon/documents.parquet
    <output>/s4_chunks/documents.parquet     chunk-granularity corpus
    <output>/pack_assignments/               doc -> window ranges
    <output>/pack_windows/                   per-window fill QA
    <output>/report.json                     per-stage counts + seconds
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

# Chunk re-keying: chunk corpus doc_id = parent*CHUNK_KEY_SPAN + chunk_id.
# q_chunk_documents bounds chunks per doc by n_tok/stride; 10^6 spans any
# in-domain document (86400-token design max / 64-token stride ~ 1350).
CHUNK_KEY_SPAN = 1_000_000


def _write_docs(df, out_dir: str) -> str:
    """Checkpoint a documents relation as <out_dir>/documents.parquet."""
    os.makedirs(out_dir, exist_ok=True)
    df.write.mode("errorifexists").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    return out_dir


def run_pipeline(
    spark,
    input_dir: str,
    output_dir: str,
    min_toks: int = 8,
    max_stop_ratio: float = 0.5,
    decon_min_shared: int = 4,
    stages: tuple = (
        "quality", "dedup", "decon", "chunk", "chunkdedup", "pack"
    ),
) -> dict:
    import __spark_entry__ as ops

    t0 = time.monotonic()
    report: dict = {"stages": [], "params": {
        "min_toks": min_toks,
        "max_stop_ratio": max_stop_ratio,
        "decon_min_shared": decon_min_shared,
    }}
    cur = input_dir
    n_cur = ops._t(spark, cur, "documents").count()
    report["docs_in"] = int(n_cur)

    def _advance(name: str, keep_ids, out_name: str) -> None:
        nonlocal cur, n_cur
        ts = time.monotonic()
        docs = ops._t(spark, cur, "documents")
        kept = docs.join(F.broadcast(keep_ids), "doc_id", "left_semi")
        nxt = _write_docs(kept, os.path.join(output_dir, out_name))
        n_out = ops._t(spark, nxt, "documents").count()
        report["stages"].append({
            "stage": name, "docs_in": int(n_cur), "docs_out": int(n_out),
            "seconds": round(time.monotonic() - ts, 3),
        })
        cur, n_cur = nxt, n_out

    if "quality" in stages:
        q = ops.q_quality_score(spark, cur)
        keep = q.where(
            (F.col("n_toks") >= min_toks)
            & (F.col("stop_ratio") <= max_stop_ratio)
        ).select("doc_id")
        _advance("quality", keep, "s1_quality")

    if "dedup" in stages:
        keep = ops.q_dedup_keep(spark, cur).select("doc_id")
        _advance("dedup", keep, "s2_dedup")

    if "decon" in stages:
        docs = ops._t(spark, cur, "documents")
        contaminated = (
            ops.q_decontaminate(spark, cur)
            .where(F.col("n_shared") >= decon_min_shared)
            .select("doc_id")
        )
        keep = (
            docs.select("doc_id")
            .where(F.col("doc_id") % 10 != 7)  # drop the eval split itself
            .join(F.broadcast(contaminated), "doc_id", "left_anti")
        )
        _advance("decon", keep, "s3_decon")

    if "rebalance" in stages:
        # Opt-in (not in the default stage list): downsample over-
        # represented sources toward the equal token share using the SAME
        # gated scaffolds q_source_mix_rebalance aggregates — membership
        # is a pure function of doc_id, so a resumed run re-draws the
        # identical kept set.
        rates = ops._mix_rates(spark, cur)
        keep = ops._mix_kept_docs(spark, cur, rates).select("doc_id")
        _advance("rebalance", keep, "s3b_rebalance")

    if "chunk" in stages:
        ts = time.monotonic()
        chunks = ops.q_chunk_documents(spark, cur)
        parents = ops._t(spark, cur, "documents").select(
            "doc_id", "lang", "source"
        )
        chunk_docs = (
            chunks.join(parents, "doc_id")
            .select(
                (F.col("doc_id") * CHUNK_KEY_SPAN + F.col("chunk_id"))
                .cast("long")
                .alias("doc_id"),
                F.col("chunk_text").alias("text"),
                "lang",
                "source",
                F.length("chunk_text").cast("long").alias("n_chars"),
            )
        )
        nxt = _write_docs(chunk_docs, os.path.join(output_dir, "s4_chunks"))
        n_out = ops._t(spark, nxt, "documents").count()
        report["stages"].append({
            "stage": "chunk", "docs_in": int(n_cur), "docs_out": int(n_out),
            "seconds": round(time.monotonic() - ts, 3),
        })
        cur, n_cur = nxt, n_out

    if "chunkdedup" in stages:
        # exact passage dedup on the chunk corpus: keep the FIRST
        # occurrence (min doc_id) of every md5-identical passage — the
        # same lexicographic (parent, chunk) witness q_chunk_dup_groups
        # reports, because the chunk-corpus key is
        # parent*CHUNK_KEY_SPAN + chunk_id. Unlike the id-keyed stages,
        # the keep set here is corpus-sized, so no broadcast semi-join:
        # ONE hash exchange on the content hash and a first-row window
        # does the filter in place.
        ts = time.monotonic()
        from pyspark.sql import Window

        docs = ops._t(spark, cur, "documents")
        rw = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        kept = (
            docs.withColumn("_rn", F.row_number().over(rw))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        nxt = _write_docs(kept, os.path.join(output_dir, "s4b_chunkdedup"))
        n_out = ops._t(spark, nxt, "documents").count()
        report["stages"].append({
            "stage": "chunkdedup", "docs_in": int(n_cur),
            "docs_out": int(n_out),
            "seconds": round(time.monotonic() - ts, 3),
        })
        cur, n_cur = nxt, n_out

    if "pack" in stages:
        ts = time.monotonic()
        ops.q_pack_sequences(spark, cur).write.mode("errorifexists").parquet(
            os.path.join(output_dir, "pack_assignments")
        )
        eff = ops.q_pack_efficiency(spark, cur)
        eff.write.mode("errorifexists").parquet(
            os.path.join(output_dir, "pack_windows")
        )
        agg = eff.agg(
            F.count("*").alias("n_windows"),
            F.sum("tokens").alias("total_tokens"),
            F.min("fill").alias("min_fill"),
        ).collect()[0]
        report["pack"] = {
            "n_windows": int(agg["n_windows"] or 0),
            "total_tokens": int(agg["total_tokens"] or 0),
            "min_fill": float(agg["min_fill"]) if agg["min_fill"] is not None else None,
            "seconds": round(time.monotonic() - ts, 3),
        }

    report["docs_out"] = int(n_cur)
    report["seconds"] = round(time.monotonic() - t0, 3)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-toks", type=int, default=8)
    ap.add_argument("--max-stop-ratio", type=float, default=0.5)
    ap.add_argument("--decon-min-shared", type=int, default=4)
    ap.add_argument(
        "--stages",
        default="quality,dedup,decon,chunk,chunkdedup,pack",
        help="comma list from quality,dedup,decon,rebalance,chunk,"
        "chunkdedup,pack (rebalance is opt-in — not run by default)",
    )
    args = ap.parse_args()

    from engine.session import get_spark

    spark = get_spark(app_name="corpus-pipeline")
    report = run_pipeline(
        spark,
        args.input,
        args.output,
        min_toks=args.min_toks,
        max_stop_ratio=args.max_stop_ratio,
        decon_min_shared=args.decon_min_shared,
        stages=tuple(s.strip() for s in args.stages.split(",") if s.strip()),
    )
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()
