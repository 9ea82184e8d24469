"""The build path (SURVEY.md §3.1): raw tokens -> detect -> 1m -> 1h -> 1d,
with per-partition lineage commits and kill-safe resume.

Run (sandbox):
    python jobs/rollup.py --tokens /tmp/tokens --warehouse /tmp/wh --epoch 1
Run (cluster):
    spark-submit --py-files engine.zip jobs/rollup.py --tokens <iceberg-or-path> ...

Resume: re-running the same command after a kill skips every partition with
a lineage row for (tier, epoch) and recomputes only the rest — see the state
machine in engine/lineage.py. `--stop-after-tier` exists purely to let the
fault-injection test simulate a mid-job kill.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from engine.io import ParquetManifestFormat, scan_tokens, synth_tokens
from engine.lineage import lineage_record, pending_partitions
from engine.rollup import cascade, rollup_from_points
from engine.schema import (
    DEFAULT_K,
    DEFAULT_N_BUCKETS,
    DEFAULT_WINDOW,
    ROLLUP_SCHEMA,
    TIER_ORDER,
)
from pyspark.sql import types as T

# Read schema for tier tables incl. the part_hash partition column (int, as
# partition-value inference types it) — passed to fmt.read so the cascade
# scans skip parquet footer schema inference.
_ROLLUP_READ = T.StructType(
    ROLLUP_SCHEMA.fields + [T.StructField("part_hash", T.IntegerType(), True)]
)
from engine.series import explode_series, gap_fill
from engine.session import get_spark
from engine.skew import with_part_hash
from engine.stats import detect


def run_rollup(
    spark,
    tokens_df,
    warehouse: str,
    epoch: int,
    w: int = DEFAULT_WINDOW,
    k: float = DEFAULT_K,
    policy: str = "ffill",
    n_buckets: int = DEFAULT_N_BUCKETS,
    tiers: list[str] | None = None,
    stop_after_tier: str | None = None,
    input_snapshot_id: int = 0,
    compress: bool = True,
    stats_mode: str = "long",
    merge_docs: bool = False,
    pipeline: str = "fused",
    arrow_batch_rows: int | None = None,
    arrow_batch_bytes: int = 2 << 20,
) -> dict:
    """Run (or resume) the full cascade for one checkpoint epoch.

    ``pipeline`` picks the 1m-tier physical strategy (identical results,
    pinned by tests/test_fused.py):
      - 'fused' (default, the scale path): one narrow mapInPandas pass over
        the raw doc rows — gap-fill, stats, detect, bucket aggregates and
        compression in a single Arrow kernel; NO shuffle or sort of raw
        points (engine/fused.py). The only exchange is the part_hash
        repartition of the ~60x smaller rollup output for the write.
        ``arrow_batch_rows`` bounds the Arrow batch in DOC rows (a row is a
        whole series; 2048 x 8192 tokens ~ 64 MB per batch).
      - 'exploded': posexplode -> doc_id-windowed Catalyst stats -> groupBy
        (engine/series.py + stats.py + rollup.py) — the semantic reference,
        and the path for int32-extreme domains via stats_mode='decimal'
        (the fused kernel fails loudly outside its exact-int64 domain).

    ``arrow_batch_rows=None`` (default) sizes the fused path's Arrow batch
    by BYTES (``arrow_batch_bytes``, default 2 MB) instead of rows — cache
    blocking: the flat kernel makes ~15 vectorized passes over each batch,
    so a batch that fits L2/L3 keeps those passes out of DRAM and the
    job's memory traffic collapses to ~2 passes (scan + emit). On hosts
    where memory bandwidth, not CPU, is the ceiling (any host, at enough
    cores), this is what lets the narrow plan keep scaling with cores
    (see BENCH/BASELINE.md). The row count derives from max(n_tok) via
    parquet aggregate pushdown — footer statistics, no data scan.

    ``merge_docs=True`` gives ACCUMULATE semantics for incremental ingest
    (streaming micro-batches): rows already in a touched partition are
    carried over (copy-on-write merge, the Iceberg MERGE shape) instead of
    being evicted by the partition overwrite, except rows for doc_ids
    re-ingested by this batch — which makes a dirty-crash replay idempotent.
    Assumes doc-level ingest granularity (a doc arrives whole in one batch).
    Default False = REPLACE semantics (recompute of a static input).

    Returns per-tier metrics {tier: {partitions, out_rows, seconds}} (L3).
    """
    fmt = ParquetManifestFormat(spark, warehouse)
    tiers = tiers or TIER_ORDER
    metrics: dict = {}

    # This job retunes session confs for wide-array rows; snapshot them so a
    # shared session (bench queries, streaming operators, later exploded
    # runs) gets its own settings back afterwards (ADVICE r02).
    _tuned = [
        "spark.sql.parquet.columnarReaderBatchSize",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.execution.arrow.maxRecordsPerBatch",
    ]
    _saved = {c: spark.conf.get(c, None) for c in _tuned}

    # Token rows are WIDE (one row = a whole series array). The vectorized
    # parquet reader sizes batches in ROWS (default 4096 = ~134 MB of column
    # vectors at 8192-token docs), so 32 concurrent tasks OOM a sane heap.
    # 128 rows ~ 4 MB per batch at 8192 tokens, 44 MB at the 86400 design
    # max — bounded regardless of parallelism.
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")

    if arrow_batch_rows is None and pipeline == "fused":
        arrow_batch_rows = _cache_blocked_rows(
            spark, tokens_df, arrow_batch_bytes
        )

    try:
        _run_tiers(
            spark, fmt, tokens_df, warehouse, epoch, w, k, policy, n_buckets,
            tiers, stop_after_tier, input_snapshot_id, compress, stats_mode,
            merge_docs, pipeline, arrow_batch_rows, metrics,
        )
    finally:
        for c, v in _saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)
    return metrics


def _cache_blocked_rows(spark, tokens_df, batch_bytes: int) -> int:
    """Doc rows per Arrow batch so one batch's float64 series stay cache-
    resident for the flat kernel's passes: batch_bytes / (8 * max n_tok).

    max(n_tok) comes from parquet FOOTER statistics — read driver-side with
    pyarrow when the input is a parquet fileset (df.inputFiles; a pure
    metadata pass, ~ms for 64 files), else via a Spark aggregate with
    parquet aggregate pushdown (still footer-only, but the job costs
    ~0.2 s of scheduling). Falls back to the 4096 synth bulk length if the
    column is missing or both paths error. Batch sizing only — the fused
    kernel's output is batch-size-invariant (tests/test_fused.py)."""
    max_tok = 4096
    if "n_tok" in tokens_df.columns:
        footer_max = _footer_max_n_tok(tokens_df)
        if footer_max is not None:
            return int(
                min(8192, max(16, batch_bytes // (8 * max(footer_max, 1))))
            )
        saved = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
        try:
            spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
            from pyspark.sql import functions as _F

            row = tokens_df.agg(_F.max("n_tok")).collect()[0]
            if row[0] is not None:
                max_tok = int(row[0])
        except Exception:
            pass
        finally:
            spark.conf.set("spark.sql.parquet.aggregatePushdown", saved)
    return int(min(8192, max(16, batch_bytes // (8 * max(max_tok, 1)))))


def _footer_max_n_tok(tokens_df) -> int | None:
    """max(n_tok) straight from parquet row-group statistics on the driver
    — no Spark job. None when the input is not a plain parquet fileset or
    any row group lacks n_tok min/max stats (caller falls back to the
    pushdown aggregate). The stats max is exact for int64 columns, and the
    unfiltered file-level max is the same bound the caller's unfiltered
    aggregate would compute."""
    try:
        files = tokens_df.inputFiles()
    except Exception:
        return None
    if not files or not all(f.split("?", 1)[0].endswith(".parquet") for f in files):
        return None
    import pyarrow.parquet as pq

    mx = 0
    try:
        for f in files:
            # file:///p, file:/p -> /p; non-file URIs were filtered above
            path = "/" + f[5:].lstrip("/") if f.startswith("file:") else f
            md = pq.ParquetFile(path).metadata
            idx = md.schema.to_arrow_schema().get_field_index("n_tok")
            if idx < 0:
                return None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mx = max(mx, int(st.max))
    except Exception:
        return None
    return mx if mx > 0 else None


def _build_1m(spark, toks, w, k, policy, compress, stats_mode, pipeline,
              arrow_batch_rows):
    """The 1m-tier physical strategy (docstring of run_rollup). Factored out
    so the fused-guard auto-fallback can rebuild the plan with
    pipeline='exploded', stats_mode='decimal'."""
    if pipeline == "fused":
        # scale path: narrow Arrow pass, zero raw-point shuffle
        # (engine/fused.py). Batch sizing is in DOC rows here.
        from engine.fused import fused_rollup_1m

        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(int(arrow_batch_rows)),
        )
        # With no exchange, parallelism == scan splits. The default
        # 128 MB maxPartitionBytes packs a small-table scan into a
        # handful of splits and idles the other cores; 16 MB keeps
        # every core fed. (On a 100 TB cluster input the default
        # already yields far more splits than cores — this only
        # matters when input/cores < ~128 MB.)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
        return fused_rollup_1m(toks, w, k, policy, compress)
    if pipeline == "exploded":
        # One doc_id-keyed shuffle serves explode -> gap-fill ->
        # stats -> rollup (window key == groupBy prefix, §3.1).
        points = gap_fill(explode_series(toks), policy)
        flagged = detect(points, w, k, stats_mode)
        if compress:
            # fused A1+C1+C2: one Python pass computes aggregates AND
            # payloads — avoids executing the window pipeline twice
            # (engine/compression.py::rollup_1m_with_payloads)
            from engine.compression import rollup_1m_with_payloads

            return rollup_1m_with_payloads(flagged, "1m")
        return rollup_from_points(flagged, "1m").withColumn(
            "ts_dod", F.lit(None).cast("binary")
        ).withColumn("v_gorilla", F.lit(None).cast("binary"))
    raise ValueError(f"pipeline must be 'fused' or 'exploded', got {pipeline!r}")


# Commits at or below this many rows have their L3 stats computed driver-
# side with pyarrow (out_rows straight from footer num_rows, in_rows = sum
# of the one ``cnt`` column) instead of a Spark job — the job itself costs
# ~0.25 s of scheduling/listing regardless of data size, which dominates
# when the commit is small (every cascade tier at bench scale). The row
# count comes from parquet FOOTERS (a metadata read, the same thing Spark
# planning does), so routing costs no data I/O; below the cutover the
# driver materializes only the int64 cnt column (4 M rows = 32 MB, bounded
# regardless of how wide the tier schema is). The cutover is data-sized,
# not core-count-sized (the broadcast-threshold shape): a 100 TB tier
# commit exceeds any sane threshold and takes the distributed job.
_STATS_DRIVER_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_STATS_DRIVER_MAX_ROWS", str(4_000_000))
)


def _written_stats(spark, fmt, table: str, out_snapshot: int) -> list[dict]:
    """Round 7 (guide §1/§6): the L3 stats job scans the snap dir this
    commit just wrote — directly, with an explicit 2-column schema — instead
    of ``fmt.read`` of the whole current view. That drops (a) the manifest
    union/basePath planning, (b) parquet schema inference (footer reads for
    all 12 columns), and (c) the scan of partitions untouched by this
    commit; the job reads only the ``cnt`` column of the new files. An
    Observation on the write itself was measured SLOWER (~0.9 s fixed
    per-query planning/codegen for 2x64 conditional aggregates vs ~0.2 s
    for this pruned job), so the separate-job shape stays.

    When the whole commit is small (<= _STATS_DRIVER_MAX_ROWS rows, counted
    from parquet footers) the same two numbers come from a driver-side
    pyarrow pass over the snap dir's files instead — exactly the files the
    distributed job would scan, so the two paths are interchangeable
    (pinned by
    tests/test_resume.py::test_written_stats_driver_matches_spark_job).

    Every partition written by this commit lives under the new snap dir
    (overwrite_partitions replaces whole partitions), so the re-read is
    exactly the committed data for the pending set."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    data_dir = os.path.join(fmt.warehouse, table, f"snap-{out_snapshot}")
    files_by_part: dict[int, list[str]] = {}
    for name in os.listdir(data_dir):
        if not name.startswith("part_hash="):
            continue
        pdir = os.path.join(data_dir, name)
        files_by_part[int(name.split("=", 1)[1])] = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
    all_paths = [p for fs in files_by_part.values() for p in fs]
    # footer opens and (below the cutover) the one-column reads both release
    # the GIL in pyarrow — a small thread pool turns 64 sequential ~1-2 ms
    # opens into a few ms total
    with ThreadPoolExecutor(min(16, max(1, len(all_paths)))) as ex:
        handles = dict(zip(all_paths, ex.map(pq.ParquetFile, all_paths)))
        total_rows = sum(h.metadata.num_rows for h in handles.values())
        if total_rows <= _STATS_DRIVER_MAX_ROWS:
            import pyarrow.compute as pc

            def _one(item: tuple[int, list[str]]) -> dict:
                p, fs = item
                out_rows = 0
                in_rows = 0
                for path in fs:
                    t = handles[path].read(columns=["cnt"])
                    out_rows += handles[path].metadata.num_rows
                    in_rows += int(pc.sum(t["cnt"]).as_py() or 0)
                return {"part_hash": p, "out_rows": out_rows, "in_rows": in_rows}

            return list(ex.map(_one, files_by_part.items()))
    df = (
        spark.read.schema("cnt long, part_hash long")
        .option("basePath", data_dir)
        .parquet(data_dir)
    )
    from engine.lineage import partition_stats_from_rollup

    return partition_stats_from_rollup(df)


def _pending_only(stats: list[dict], pending_set: list[int]) -> list[dict]:
    """Merge mode can write carried rows for touched-but-already-committed
    partitions into the new snap dir; lineage rows are appended only for
    PENDING partitions, exactly like the r6 ``isin(pending_set)`` re-read."""
    pend = set(pending_set)
    return [s for s in stats if s["part_hash"] in pend]


def _run_tiers(
    spark, fmt, tokens_df, warehouse, epoch, w, k, policy, n_buckets,
    tiers, stop_after_tier, input_snapshot_id, compress, stats_mode,
    merge_docs, pipeline, arrow_batch_rows, metrics,
) -> None:
    for tier in tiers:
        t_start = time.monotonic()
        pending = pending_partitions(warehouse, tier, epoch, n_buckets)
        if not pending:
            metrics[tier] = {"partitions": 0, "out_rows": 0, "seconds": 0.0, "skipped": True}
            continue
        pending_set = [int(p) for p in pending]
        if tier == "1m":
            # Resume filter applied BEFORE the heavy work: part_hash is a
            # pure function of doc_id, so pruning the token table up front
            # skips explode/gap-fill/stats for committed partitions entirely
            # (on Iceberg with bucket(N, doc_id) this is partition pruning).
            toks = with_part_hash(tokens_df, n_buckets)
            if len(pending_set) < n_buckets:
                toks = toks.where(F.col("part_hash").isin(pending_set))
            toks_pruned = toks.drop("part_hash")

            def _mk_1m(p, sm):
                df = with_part_hash(
                    _build_1m(spark, toks_pruned, w, k, policy, compress,
                              sm, p, arrow_batch_rows),
                    n_buckets,
                )
                if merge_docs and fmt.current_snapshot("rollup_1m") > 0:
                    # touched set from the (cheap, column-pruned) token batch
                    # — never by executing the heavy stats pipeline twice
                    touched = [
                        int(r["part_hash"])
                        for r in with_part_hash(tokens_df, n_buckets)
                        .select("part_hash").distinct().collect()
                    ]
                    batch_docs = tokens_df.select("doc_id").distinct()
                    carried = (
                        fmt.read("rollup_1m")
                        .where(F.col("part_hash").isin(touched))
                        .join(batch_docs, "doc_id", "left_anti")
                    )
                    df = df.unionByName(carried)
                return df

            tier_df = _mk_1m(pipeline, stats_mode)
            used_pipeline = pipeline
            snapshot_for_lineage = input_snapshot_id
        else:
            finer = TIER_ORDER[TIER_ORDER.index(tier) - 1]
            fine_snapshot = fmt.current_snapshot(f"rollup_{finer}")
            # part_hash partition pruning on the fine-tier scan; pinned
            # read schema skips footer inference (round 7, engine/io.py)
            fine_df = fmt.read(f"rollup_{finer}", schema=_ROLLUP_READ).where(
                F.col("part_hash").isin(pending_set)
            )
            coarse = cascade(
                fine_df.drop("part_hash", "ts_dod", "v_gorilla"), finer, tier
            ).withColumn("ts_dod", F.lit(None).cast("binary")).withColumn(
                "v_gorilla", F.lit(None).cast("binary")
            )
            tier_df = with_part_hash(coarse, n_buckets)
            used_pipeline = "cascade"
            snapshot_for_lineage = fine_snapshot

        # (A) data commit — atomic manifest swap inside; the returned
        # snapshot id goes into lineage so epoch-E readers can time-travel
        # to exactly this commit after later epochs overwrite the partitions
        t_write = time.monotonic()
        try:
            out_snapshot = fmt.overwrite_partitions(
                tier_df, f"rollup_{tier}", rebalance=True
            )
        except Exception as e:
            # The fused kernel FAILS LOUDLY outside its exact-int64 domain
            # (engine/fused.py::_check_guard) — surfacing here, at the first
            # action. An unattended 100 TB job should DEGRADE, not die, on
            # one int32-extreme source: rebuild this tier on the exploded
            # pipeline with the decimal stats carrier (bit-exact semantics,
            # engine/stats.py) and retry once. The lineage row records the
            # degraded strategy so operators can see it.
            if not (tier == "1m" and pipeline == "fused"
                    and "exact int64 domain exceeded" in str(e)):
                raise
            print(
                "rollup: fused guard tripped "
                "-> falling back to exploded/decimal for tier 1m "
                f"(epoch {epoch}): {str(e).splitlines()[0][:200]}",
                file=sys.stderr,
            )
            # point-stream batches again, not doc-row batches
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", "100000"
            )
            used_pipeline = "exploded-decimal-fallback"
            tier_df = _mk_1m("exploded", "decimal")
            out_snapshot = fmt.overwrite_partitions(
                tier_df, f"rollup_{tier}", rebalance=True
            )
        write_s = time.monotonic() - t_write
        # (L3) per-partition counts from a pruned direct read of the snap
        # dir this commit wrote (see _written_stats — round 7).
        t_stats = time.monotonic()
        stats = _pending_only(
            _written_stats(spark, fmt, f"rollup_{tier}", out_snapshot),
            pending_set,
        )
        # Partitions attempted but empty (no doc hashes into them at this
        # input size) are COMPLETE, not pending — record them with 0 rows or
        # resume would recompute them forever.
        seen = {s["part_hash"] for s in stats}
        stats += [
            {"part_hash": p, "out_rows": 0, "in_rows": 0}
            for p in pending_set
            if p not in seen
        ]
        stats_s = time.monotonic() - t_stats
        # (B) lineage commit — readers now see these partitions
        t_commit = time.monotonic()
        lineage_record(
            warehouse, tier, stats, snapshot_for_lineage, epoch,
            output_snapshot_id=out_snapshot, pipeline=used_pipeline,
        )
        commit_s = time.monotonic() - t_commit

        total_s = time.monotonic() - t_start
        metrics[tier] = {
            "partitions": len(stats),
            "out_rows": int(sum(s["out_rows"] for s in stats)),
            "seconds": round(total_s, 3),
            "skipped": False,
            "pipeline": used_pipeline,
            # Amdahl accounting for the scaling bench: 'write_s' is the
            # parallel compute+write action (the only phase whose wall
            # should shrink with cores/executors); 'fixed_s' is everything
            # latency-bound — pending-partition read, the tiny per-tier
            # stats re-read job, and the serial lineage/manifest commits —
            # a per-tier cost that is constant in input size and cores.
            "write_s": round(write_s, 3),
            "fixed_s": round(total_s - write_s, 3),
            "stats_s": round(stats_s, 3),
            "commit_s": round(commit_s, 3),
        }
        if stop_after_tier == tier:
            break


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", help="path to token parquet (or use --synth-docs)")
    ap.add_argument("--synth-docs", type=int, help="generate N synthetic docs instead")
    ap.add_argument("--synth-len", type=int, default=None)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--w", type=int, default=DEFAULT_WINDOW)
    ap.add_argument("--k", type=float, default=DEFAULT_K)
    ap.add_argument("--policy", default="ffill")
    ap.add_argument("--n-buckets", type=int, default=DEFAULT_N_BUCKETS)
    ap.add_argument("--tiers", default=",".join(TIER_ORDER))
    ap.add_argument("--stop-after-tier", default=None)
    ap.add_argument("--no-compress", action="store_true",
                    help="skip C1/C2 payloads on the 1m tier")
    ap.add_argument("--stats-mode", default="long", choices=["long", "decimal"],
                    help="integer carrier for exact rolling stats; 'decimal' "
                         "for int32-extreme domains (see engine/stats.py)")
    ap.add_argument("--pipeline", default="fused", choices=["fused", "exploded"],
                    help="1m-tier strategy: fused narrow Arrow pass (scale "
                         "path) or exploded Catalyst windows (reference path)")
    ap.add_argument("--arrow-batch-rows", type=int, default=None,
                    help="Arrow batch size in DOC rows for the fused path "
                         "(default: cache-blocked from --arrow-batch-bytes)")
    ap.add_argument("--arrow-batch-bytes", type=int, default=2 << 20,
                    help="target bytes of series data per Arrow batch")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="rollup-job", master=args.master)
    if args.synth_docs:
        tokens = synth_tokens(spark, args.synth_docs, n_tok=args.synth_len)
    elif args.tokens:
        tokens = scan_tokens(spark, args.tokens)
    else:
        ap.error("one of --tokens / --synth-docs is required")
    metrics = run_rollup(
        spark,
        tokens,
        args.warehouse,
        args.epoch,
        w=args.w,
        k=args.k,
        policy=args.policy,
        n_buckets=args.n_buckets,
        tiers=args.tiers.split(","),
        stop_after_tier=args.stop_after_tier,
        compress=not args.no_compress,
        stats_mode=args.stats_mode,
        pipeline=args.pipeline,
        arrow_batch_rows=args.arrow_batch_rows,
        arrow_batch_bytes=args.arrow_batch_bytes,
    )
    for tier, m in metrics.items():
        print(f"tier={tier} {m}")


if __name__ == "__main__":
    main()
