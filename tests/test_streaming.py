"""Structured Streaming shell tests: micro-batch rollup with lineage dedupe
+ watermark/window aggregate (engine/streaming.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from engine.io import ParquetManifestFormat, synth_tokens
from engine.lineage import read_lineage
from engine.streaming import start_rollup_stream, windowed_event_counts


def test_stream_rollup_two_drops(spark, tmp_path):
    """Two file drops -> two micro-batches -> two epochs of committed
    tiers; a replayed stream (same checkpoint) processes nothing new."""
    inbox = str(tmp_path / "inbox")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)

    synth_tokens(spark, 8, seed=1, n_tok=256).write.parquet(f"{inbox}/drop1")
    # file source scans nested dirs? use flat files: write into inbox root
    # via separate subdir-then-move is overkill; point the stream at the
    # parquet leaf dirs instead
    q = start_rollup_stream(
        spark, f"{inbox}/*", wh, ckpt, available_now=True, compress=False
    )
    q.awaitTermination(300)
    lin1 = read_lineage(spark, wh)
    epochs1 = {r["checkpoint_epoch"] for r in lin1.select("checkpoint_epoch").distinct().collect()}
    assert len(epochs1) >= 1
    fmt = ParquetManifestFormat(spark, wh)
    rows1 = fmt.read("rollup_1m").count()
    assert rows1 > 0

    # second drop -> new batch id -> new epoch, old partitions untouched
    synth_tokens(spark, 8, seed=2, n_tok=256).write.parquet(f"{inbox}/drop2")
    q = start_rollup_stream(
        spark, f"{inbox}/*", wh, ckpt, available_now=True, compress=False
    )
    q.awaitTermination(300)
    epochs2 = {r["checkpoint_epoch"] for r in read_lineage(spark, wh).select("checkpoint_epoch").distinct().collect()}
    assert len(epochs2) == len(epochs1) + 1

    # accumulation (merge_docs): batch 2 reuses batch 1's doc_ids' partitions
    # (same doc numbering), yet batch-1 rows must survive in the current tier
    # view — the merge carried them over. Here the doc sets are identical, so
    # the carried set is empty and rows simply reflect the latest batch; the
    # disjoint-docs accumulation case is test_stream_accumulates_disjoint_docs.
    rows2 = fmt.read("rollup_1m").count()
    assert rows2 >= rows1

    # replay with the same checkpoint: nothing new to process
    q = start_rollup_stream(
        spark, f"{inbox}/*", wh, ckpt, available_now=True, compress=False
    )
    q.awaitTermination(300)
    epochs3 = {r["checkpoint_epoch"] for r in read_lineage(spark, wh).select("checkpoint_epoch").distinct().collect()}
    assert epochs3 == epochs2


def test_stream_accumulates_disjoint_docs(spark, tmp_path):
    """Two micro-batches with DISJOINT doc sets: the current tier must hold
    the union (merge-append), not just the latest batch — regression for the
    partition-eviction bug (round-2 ADVICE)."""
    inbox = str(tmp_path / "inbox")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)

    d1 = synth_tokens(spark, 5, seed=1, n_tok=128)
    d2 = synth_tokens(spark, 5, seed=2, n_tok=128).withColumn(
        "doc_id", F.concat(F.lit("b_"), F.col("doc_id"))
    )
    d1.write.parquet(f"{inbox}/drop1")
    q = start_rollup_stream(spark, f"{inbox}/*", wh, ckpt,
                            available_now=True, compress=False)
    q.awaitTermination(300)
    d2.write.parquet(f"{inbox}/drop2")
    q = start_rollup_stream(spark, f"{inbox}/*", wh, ckpt,
                            available_now=True, compress=False)
    q.awaitTermination(300)

    fmt = ParquetManifestFormat(spark, wh)
    got = {
        r["doc_id"]
        for r in fmt.read("rollup_1m").select("doc_id").distinct().collect()
    }
    want = {r["doc_id"] for r in d1.unionByName(d2).select("doc_id").collect()}
    assert got == want


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    """The streaming window aggregate (availableNow over a file stream)
    must equal the same aggregate computed in batch."""
    src = str(tmp_path / "events")
    ev = (
        spark.range(500)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 7).alias("ts"),
            F.pmod(F.col("id"), F.lit(10)).alias("user_id"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("value"),
        )
    )
    ev.write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id bigint, value double"
    ).parquet(src)
    agg = windowed_event_counts(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["user_id"]): (r["cnt"], r["vmin"], r["vmax"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    batch = (
        ev.groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"), F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .select(F.col("w.start").alias("ws"), "user_id", "cnt", "vmin", "vmax")
    )
    want = {
        (r["ws"], r["user_id"]): (r["cnt"], r["vmin"], r["vmax"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
