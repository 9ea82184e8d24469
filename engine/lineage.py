"""L1-L3: per-partition lineage + resume (SURVEY.md §2.7; BASELINE.json:6
"per-partition lineage rows (input snapshot-id, partition hash, row counts,
checkpoint epoch) so a killed job resumes from the last committed tier
without recomputation").

Commit protocol — the state machine (SURVEY.md §7 step 2):

    for each tier, for one checkpoint_epoch:
      state DONE(p)    : lineage holds a row (tier, p, epoch)
      state DIRTY(p)   : data for partition p may exist in the tier table
                         but no lineage row -> treated as not done
      transition       : [compute pending partitions] ->
                         [fmt.overwrite_partitions(data)]   (A)
                         [append lineage rows]              (B)

    Readers trust ONLY lineage (Q2). A crash between (A) and (B) leaves
    DIRTY partitions: the resume run recomputes them and (A) OVERWRITES —
    idempotent because overwrite replaces the whole partition. A crash
    before (A) changes nothing. Therefore: resume == clean run, byte-for-
    byte (fault-injection test in tests/test_resume.py).

Lineage storage is an append-only parquet directory: each commit writes one
immutable file via pyarrow (driver-side, rows are tiny — one per partition),
so no Spark job and no read-modify-write race. On a real cluster this table
would be an Iceberg append; the contract is identical.

Row-count semantics: out_rows = rows written to the partition; in_rows =
sum(cnt) over those rows = non-null raw points covered by the partition —
chosen so it is computable from the output aggregate itself without a second
scan over the (100 TB) input.
"""

from __future__ import annotations

import glob
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.schema import DEFAULT_N_BUCKETS

LINEAGE_DIR = "lineage"

_ARROW_SCHEMA = pa.schema(
    [
        ("tier", pa.string()),
        ("part_hash", pa.int64()),
        ("input_snapshot_id", pa.int64()),
        ("output_snapshot_id", pa.int64()),
        ("in_rows", pa.int64()),
        ("out_rows", pa.int64()),
        ("checkpoint_epoch", pa.int64()),
        ("committed_at", pa.timestamp("us", tz="UTC")),
        ("pipeline", pa.string()),
    ]
)


def _lineage_path(warehouse: str) -> str:
    return os.path.join(warehouse, LINEAGE_DIR)


def lineage_record(
    warehouse: str,
    tier: str,
    partition_stats: list[dict],
    input_snapshot_id: int,
    checkpoint_epoch: int,
    output_snapshot_id: int = -1,
    pipeline: str = "",
) -> int:
    """L1: append one lineage row per committed partition (AFTER the data
    commit — see the module-docstring state machine). Atomic: parquet file
    is written to a temp name then renamed.

    ``output_snapshot_id`` is the tier-table snapshot produced by the data
    commit (A). Recording it makes the epoch -> snapshot mapping durable: a
    reader serving epoch E time-travels to each partition's own output
    snapshot, so a later epoch overwriting the same part_hash partitions can
    never leak into an epoch-E query (engine/query.py::tier_fallback).
    -1 = unknown (legacy writer); readers then fall back to the current
    snapshot.

    ``pipeline`` records the physical strategy that produced the rows
    ("fused", "exploded", "exploded-decimal-fallback", "cascade", ...) so
    an auto-degraded epoch (the fused guard tripping on an int32-extreme
    source, jobs/rollup.py) is visible to operators. "" = unrecorded."""
    d = _lineage_path(warehouse)
    os.makedirs(d, exist_ok=True)
    now = int(time.time() * 1_000_000)
    table = pa.table(
        {
            "tier": [tier] * len(partition_stats),
            "part_hash": [int(s["part_hash"]) for s in partition_stats],
            "input_snapshot_id": [int(input_snapshot_id)] * len(partition_stats),
            "output_snapshot_id": [int(output_snapshot_id)] * len(partition_stats),
            "in_rows": [int(s["in_rows"]) for s in partition_stats],
            "out_rows": [int(s["out_rows"]) for s in partition_stats],
            "checkpoint_epoch": [int(checkpoint_epoch)] * len(partition_stats),
            "committed_at": pa.array([now] * len(partition_stats), pa.timestamp("us", tz="UTC")),
            "pipeline": [pipeline] * len(partition_stats),
        },
        schema=_ARROW_SCHEMA,
    )
    tmp = os.path.join(d, f".commit-{uuid.uuid4().hex}.tmp")
    final = os.path.join(d, f"commit-{tier}-{checkpoint_epoch}-{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return len(partition_stats)


def committed_partitions(warehouse: str, tier: str, checkpoint_epoch: int) -> set[int]:
    """L2 driver-side: the DONE set for (tier, epoch). The lineage table is
    tiny (one row per partition-commit), so reading it on the driver is the
    cheap path; the Spark-side anti-join variant is resume_filter()."""
    return set(committed_partition_snapshots(warehouse, tier, checkpoint_epoch))


def committed_partition_snapshots(
    warehouse: str, tier: str, checkpoint_epoch: int
) -> dict[int, int]:
    """L2: committed part_hash -> output snapshot id for (tier, epoch).

    A partition committed more than once inside one epoch (dirty-crash
    recompute) keeps the LATEST output snapshot. -1 means the writer
    predates output-snapshot recording (readers use the current snapshot)."""
    d = _lineage_path(warehouse)
    files = glob.glob(os.path.join(d, "commit-*.parquet"))
    done: dict[int, int] = {}
    for f in files:
        t = pq.read_table(f)
        for row in t.to_pylist():
            if row["tier"] == tier and row["checkpoint_epoch"] == checkpoint_epoch:
                p = int(row["part_hash"])
                snap = int(row.get("output_snapshot_id", -1))
                done[p] = max(done.get(p, -1), snap)
    return done


def pending_partitions(
    warehouse: str,
    tier: str,
    checkpoint_epoch: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> list[int]:
    """L2: work units not yet committed. The work-unit universe is the
    static bucket range 0..n_buckets-1 (K1 hashing), so no input scan is
    needed to plan a resume."""
    done = committed_partitions(warehouse, tier, checkpoint_epoch)
    return [p for p in range(n_buckets) if p not in done]


def read_lineage(spark: SparkSession, warehouse: str) -> DataFrame:
    """The lineage table as a DataFrame (for Q2 and metrics queries)."""
    d = _lineage_path(warehouse)
    if not glob.glob(os.path.join(d, "commit-*.parquet")):
        from engine.schema import LINEAGE_SCHEMA

        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return spark.read.parquet(d)


def resume_filter(work_units: DataFrame, lineage: DataFrame, tier: str, checkpoint_epoch: int) -> DataFrame:
    """L2 Spark-side form: anti-join work units (any df with part_hash)
    against committed lineage rows. Used when the work-unit list itself is
    distributed; the driver-side set-difference above is the common path."""
    done = lineage.where(
        (F.col("tier") == tier) & (F.col("checkpoint_epoch") == checkpoint_epoch)
    ).select("part_hash")
    return work_units.join(F.broadcast(done), "part_hash", "left_anti")


def partition_stats_from_rollup(rollup_df: DataFrame) -> list[dict]:
    """L3: per-partition row counts from the tier output (one tiny agg job,
    no second pass over the raw input — see module docstring)."""
    rows = (
        rollup_df.groupBy("part_hash")
        .agg(
            F.count("*").alias("out_rows"),
            F.sum("cnt").alias("in_rows"),
        )
        .collect()
    )
    return [
        {
            "part_hash": r["part_hash"],
            "out_rows": r["out_rows"],
            "in_rows": r["in_rows"] or 0,
        }
        for r in rows
    ]
