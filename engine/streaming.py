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


def stateful_detect_stream(
    events_stream: DataFrame,
    w: int = 30,
    k: float = 3.0,
) -> DataFrame:
    """Custom stateful streaming operator (§2.10): the trailing-window
    anomaly detector (R1-R4 semantics: inclusive window w, min_periods=w,
    ddof=1, score = |v-ma|/sd, strict > k) running CONTINUOUSLY across
    micro-batches via ``applyInPandasWithState``.

    State per user = the last w-1 values (the window tail), so an event
    early in batch N+1 is scored against a window that reaches back into
    batch N — a batch-at-a-time recompute cannot do this without re-reading
    history. The kernel is vectorized NumPy over Arrow batches (cumulative
    sums, no per-row Python); state stays O(w) per key and survives
    restarts through the streaming state store.

    Within a batch, rows are ordered by (ts, event_id); correctness across
    batches assumes event time is non-decreasing batch-over-batch (the
    file-drop ingest pattern). Late data needs a watermark + buffer
    variant, out of scope per SURVEY.md §2.10.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, event_id long, value double, score double, is_anom boolean"
    )
    state_schema = "tail array<double>"

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        tail = np.array(state.get[0], dtype=np.float64) if state.exists else np.empty(0)
        # applyInPandasWithState delivers ONE KEY's batch rows as MULTIPLE
        # Arrow chunks with no global order guarantee (chunk size follows
        # arrow.maxRecordsPerBatch). Sorting each chunk independently
        # (round-2 bug, ADVICE r02) mis-windows any batch larger than one
        # chunk — so concatenate all chunks, sort ONCE, run the kernel once.
        chunks = [pdf for pdf in pdf_iter]
        if not chunks:
            state.update((tail.tolist(),))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        vals = pdf["value"].to_numpy(dtype=np.float64)
        buf = np.concatenate([tail, vals])
        n0 = buf.size - vals.size
        c1 = np.concatenate([[0.0], np.cumsum(buf)])
        c2 = np.concatenate([[0.0], np.cumsum(buf * buf)])
        pos = np.arange(n0, buf.size)  # absolute index of each new point
        full = pos + 1 >= w
        lo = np.where(full, pos + 1 - w, 0)
        s = c1[pos + 1] - c1[lo]
        ss = c2[pos + 1] - c2[lo]
        ma = s / w
        var = np.maximum(ss - s * s / w, 0.0) / (w - 1)
        sd = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.abs(vals - ma) / sd
        score = np.where(full & (sd > 0), score, np.nan)
        out = pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "value": vals,
                "score": score,
                "is_anom": np.nan_to_num(score, nan=0.0) > k,
            }
        )
        tail = buf[-(w - 1):] if w > 1 else np.empty(0)
        state.update((tail.tolist(),))
        yield out

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


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
