"""Q1-Q4: the downsample read path (SURVEY.md §2.8; BASELINE.json:6
"answers downsample queries (resolution pick, tier fallback, anomaly-flag
filter) as pure DataFrame/SQL operators with no per-row Python").

Everything here returns an UNEXECUTED DataFrame — the caller picks the
action. No Python kernels anywhere on this path, with one deliberate
exception: serve_raw_points (Q5) decodes compression payloads through the
vectorized Arrow decoders after Catalyst has pruned the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import ParquetManifestFormat, scan_tier
from engine.lineage import committed_partition_snapshots
from engine.rollup import cascade
from engine.schema import DEFAULT_N_BUCKETS, TIER_ORDER, TIER_SECONDS


def resolution_pick(resolution_seconds: int) -> str:
    """Q1: coarsest tier whose bucket width still DIVIDES the requested
    resolution, so served buckets always align with the requested grid
    (e.g. 5400 s -> '1m', not '1h': 3600 does not divide 5400) — driver-side
    dict lookup, no data touched. If no tier divides (resolutions finer than
    60 s or off-grid), we return '1m' and the caller decides whether to
    serve raw points instead."""
    best = "1m"
    for tier in TIER_ORDER:  # finest -> coarsest
        if resolution_seconds % TIER_SECONDS[tier] == 0:
            best = tier
    return best


def anomaly_filter(rollup: DataFrame) -> DataFrame:
    """Q3: only buckets containing at least one flagged point."""
    return rollup.where(F.col("anom_cnt") > 0)


def range_filter(rollup: DataFrame, tier: str, t0: int | None, t1: int | None) -> DataFrame:
    """Q4: positional time-range slice [t0, t1) in raw steps. The predicate
    is on the bucket column — sargable, so it prunes row groups (and, with
    bucket-range partitioning on a cluster, whole partitions)."""
    b = TIER_SECONDS[tier]
    out = rollup
    if t0 is not None:
        out = out.where(F.col("bucket") >= t0 // b)
    if t1 is not None:
        out = out.where(F.col("bucket") <= (t1 - 1) // b)
    return out


def tier_fallback(
    spark: SparkSession,
    fmt: ParquetManifestFormat,
    tier: str,
    checkpoint_epoch: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Q2: serve a tier from committed partitions, filling holes on the fly
    by cascading the next finer committed tier.

    The committed set comes from lineage (the only source of truth — data
    files without lineage rows are invisible, see engine/lineage.py state
    machine). Each partition is read AT ITS OWN recorded output snapshot
    (lineage carries output_snapshot_id), so querying epoch E after a later
    epoch has overwritten the same part_hash partitions still serves
    epoch-E data — the epoch -> snapshot mapping is durable, not "whatever
    is current". The lineage table is tiny: the partition sets are computed
    driver-side and pushed into IN-list filters, which prune part_hash
    partitions on the scan.
    """

    def _scan_committed(t: str, snap_by_part: dict[int, int]) -> DataFrame:
        """Union of per-snapshot scans, each pruned to the partitions that
        lineage pinned to that snapshot (snapshot -1 = legacy row, current)."""
        by_snap: dict[int, list[int]] = {}
        for p, s in snap_by_part.items():
            by_snap.setdefault(s, []).append(int(p))
        pieces = []
        for s in sorted(by_snap):
            df = scan_tier(fmt, t, None if s < 0 else s)
            pieces.append(df.where(F.col("part_hash").isin(by_snap[s])))
        out = pieces[0]
        for df in pieces[1:]:
            out = out.unionByName(df)
        return out

    done = committed_partition_snapshots(fmt.warehouse, tier, checkpoint_epoch)
    holes = [p for p in range(n_buckets) if p not in done]
    parts: list[DataFrame] = []
    if done:
        parts.append(_scan_committed(tier, done))
    if holes:
        idx = TIER_ORDER.index(tier)
        if idx == 0:
            raise ValueError(
                f"tier {tier} has uncommitted partitions {holes[:5]}... and no finer tier to fall back to"
            )
        finer = TIER_ORDER[idx - 1]
        finer_done = committed_partition_snapshots(fmt.warehouse, finer, checkpoint_epoch)
        missing = [p for p in holes if p not in finer_done]
        if missing:
            raise ValueError(
                f"partitions {missing[:5]}... committed in neither {tier} nor {finer}"
            )
        fine_df = _scan_committed(finer, {p: finer_done[p] for p in holes})
        on_the_fly = cascade(fine_df.drop("part_hash"), finer, tier)
        from engine.skew import with_part_hash

        parts.append(with_part_hash(on_the_fly, n_buckets))
    if not parts:
        raise ValueError(f"tier {tier}: nothing committed for epoch {checkpoint_epoch}")
    out = parts[0]
    for p in parts[1:]:
        # on-the-fly cascades carry no ts_dod/v_gorilla payload columns —
        # they backfill as NULL (frames cannot be merged by re-aggregation)
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def serve_raw_points(
    rollup_1m: DataFrame,
    t0: int | None = None,
    t1: int | None = None,
    doc_ids: list[str] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """Q5 (round 4): serve RAW points from the 1m tier's compression
    payloads — the finer-than-any-tier read path (resolution_pick returns
    '1m' for off-grid resolutions "and the caller decides whether to serve
    raw points instead"; this is that path, without re-reading the 100 TB
    token table).

    Bucket pruning happens FIRST on the sargable bucket column (row-group /
    partition pruning, as range_filter), then only the surviving payloads
    are decoded — through the vectorized transposed decoders
    (engine/compression.py::*_decompress_many, round 4), which run faster
    than the encoders, so the decode stage can never be the bottleneck of
    a read that the write path could sustain. Output: one row per non-null
    raw point (doc_id, t, v), t in raw steps. The exact in-bucket [t0, t1)
    trim is applied after decode on the exploded rows.

    ``on_error='null'`` quarantines corrupt payloads instead of failing
    the scan (their buckets simply yield no rows; audit them via
    decompress_columns(df, on_error='null') — see its docstring).
    """
    from engine.compression import decompress_columns

    df = range_filter(rollup_1m, "1m", t0, t1)
    if doc_ids:
        df = df.where(F.col("doc_id").isin(doc_ids))
    decoded = decompress_columns(
        df.where(F.col("cnt") > 0), on_error=on_error
    ).select(
        "doc_id", F.arrays_zip("ts_points", "v_points").alias("pts")
    )
    out = decoded.select(
        "doc_id",
        F.explode("pts").alias("p"),
    ).select(
        "doc_id",
        F.col("p.ts_points").alias("t"),
        F.col("p.v_points").alias("v"),
    )
    if t0 is not None:
        out = out.where(F.col("t") >= t0)
    if t1 is not None:
        out = out.where(F.col("t") < t1)
    return out


def downsample(
    spark: SparkSession,
    fmt: ParquetManifestFormat,
    checkpoint_epoch: int,
    doc_ids: list[str] | None = None,
    t0: int | None = None,
    t1: int | None = None,
    resolution_seconds: int = 3600,
    anomalies_only: bool = False,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Q1+Q2+Q3+Q4 composed: the engine's flagship read query."""
    tier = resolution_pick(resolution_seconds)
    df = tier_fallback(spark, fmt, tier, checkpoint_epoch, n_buckets)
    df = range_filter(df, tier, t0, t1)
    if doc_ids:
        df = df.where(F.col("doc_id").isin(doc_ids))
    if anomalies_only:
        df = anomaly_filter(df)
    return df.select(
        "doc_id", "bucket", "bucket_ts", "cnt", "vmin", "vmax", "vsum",
        "vmean", "anom_cnt", "first_v", "last_v",
    )
