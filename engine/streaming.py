"""Structured Streaming ingest (SURVEY.md §2.10 made concrete).

The north rule is batch-incremental — lineage (L1-L3) is the state story —
so streaming mode is a thin shell: a file-source stream of token parquet
drops, where every micro-batch runs the SAME rollup pipeline through
``foreachBatch`` with ``checkpoint_epoch = batch_id``. That gives:

  - exactly-once tiers: Structured Streaming's checkpoint dedupes batch
    replays at the source; within a batch, the lineage protocol dedupes
    partition recomputation (a replayed batch_id finds its lineage rows and
    skips everything);
  - the stream and batch paths share 100% of the operator code — no
    second implementation to drift.

For event-time analytics over a true event stream (watermarks, sliding
windows), see ``windowed_event_counts`` below — the standard
watermark + window form, kept UDF-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.schema import TOKENS_SCHEMA


def stream_tokens(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of token parquet drops (new files = new data)."""
    return (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def start_rollup_stream(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **rollup_kwargs,
):
    """Micro-batch rollup: each batch runs the full tier cascade with
    epoch = batch_id (lineage-deduped, kill-safe — see module docstring)."""
    from jobs.rollup import run_rollup

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # merge_docs: accumulate across micro-batches — a batch must never
        # evict earlier batches' docs from shared part_hash partitions
        rollup_kwargs.setdefault("merge_docs", True)
        run_rollup(
            spark, batch_df, warehouse, epoch=int(batch_id), **rollup_kwargs
        )

    writer = (
        stream_tokens(spark, input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time tumbling/sliding aggregate with late-data watermark —
    the §2.10 mapping (tumbling/sliding = window(); late data =
    withWatermark). Pure built-ins."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum("value").alias("vsum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id", "cnt", "vmin", "vmax", "vsum",
        )
    )
