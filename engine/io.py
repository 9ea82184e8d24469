"""S1-S4: sources and sinks (SURVEY.md §2.2).

TableFormat (SURVEY.md §7 risk register): on a real cluster the tiers live in
Iceberg (`df.writeTo(t).overwritePartitions()`, time-travel via
`option('snapshot-id', ...)`). This sandbox has no Iceberg jar and no
network, so :class:`ParquetManifestFormat` supplies the same four-method
contract over parquet + a JSON manifest that carries snapshot semantics:

  - every commit gets a monotone snapshot id;
  - a snapshot maps each partition (part_hash) to the data directory that
    last overwrote it, so overwrite-by-partition and read-at-snapshot behave
    like Iceberg partition overwrites + time travel;
  - manifest replace is atomic (os.replace), and data directories are
    immutable once written — a reader never sees a half-written snapshot.

Swapping in Iceberg on a cluster touches only this module.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.schema import TOKENS_SCHEMA, assert_tokens_schema
from engine.skew import with_part_hash


def scan_tokens(spark: SparkSession, path: str) -> DataFrame:
    """S1: read the token table and fail fast on schema drift (B:15).

    Reads the file's OWN schema (parquet footer only — cheap) and validates
    it; imposing TOKENS_SCHEMA on the reader would silently coerce or mask a
    drifted file instead of failing fast (caught by the round-1 verify run).
    """
    df = spark.read.parquet(path)
    assert_tokens_schema(df)
    return df


# ---------------------------------------------------------------------------
# S4: deterministic synthetic token table (FIXTURES.md F1).
#
# Every column is a pure function of the row id — xxhash64, never rand(seed)
# (seeded rand is partition-count-dependent; hash-of-id is not), so the same
# (n_docs, seed) always yields byte-identical data at any parallelism.
# ---------------------------------------------------------------------------

_SOURCES = ["cc", "cc", "cc", "cc", "cc", "cc", "cc", "wiki", "books", "code", "news"]
_EDGE_LENGTHS = [0, 1, 29, 30, 97, 512]  # w=30 edge cases (FIXTURES.md F1)


def synth_tokens(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_tok: int | None = None,
    gap_pct: int = 3,
    spike_per_mille: int = 2,
) -> DataFrame:
    """S4: generate the B:15 token table, deterministic at any parallelism.

    ``n_tok=None`` mixes edge lengths with a 4096 bulk (parity tests);
    a fixed ``n_tok`` makes uniform-length bench inputs. Values are
    U(0,50000) via hash-of-(id,t); ~``gap_pct``% slots are null (gaps);
    ~``spike_per_mille``/1000 positions get +10σ spikes (≈ +144000) so
    detect() has true positives (FIXTURES.md F1).
    """

    def h(*cols):
        return F.xxhash64(*cols, F.lit(seed))

    base = spark.range(n_docs).withColumnRenamed("id", "i")
    if n_tok is None:
        # ~30% edge lengths, rest 4096.
        pick = F.pmod(h(F.col("i"), F.lit("len")), F.lit(100))
        length = F.when(pick < 5, F.lit(_EDGE_LENGTHS[0]))
        for j, el in enumerate(_EDGE_LENGTHS[1:], start=1):
            length = length.when(pick < 5 * (j + 1), F.lit(el))
        length = length.otherwise(F.lit(4096))
    else:
        length = F.lit(int(n_tok))

    i = F.col("i")

    def token_at(t):
        val = F.pmod(h(i, t, F.lit("v")), F.lit(50000)).cast("int")
        spike = F.pmod(h(i, t, F.lit("spike")), F.lit(1000)) < spike_per_mille
        gap = F.pmod(h(i, t, F.lit("gap")), F.lit(100)) < gap_pct
        return F.when(gap, F.lit(None).cast("int")).otherwise(
            F.when(spike, val + F.lit(144340)).otherwise(val)
        )

    # sequence(0, -1) would yield [0, -1] (Spark infers a negative step), so
    # length==0 must short-circuit to an explicit empty array.
    tokens = F.when(length == 0, F.array().cast("array<int>")).otherwise(
        F.transform(F.sequence(F.lit(0), length - 1), token_at)
    )

    out = base.select(
        F.format_string("doc_%08d", F.col("i").cast("int")).alias("doc_id"),
        tokens.alias("tokens"),
        length.cast("int").alias("n_tok"),
        F.element_at(
            F.array(*[F.lit(s) for s in _SOURCES]),
            (F.pmod(h(i, F.lit("src")), F.lit(len(_SOURCES))) + 1).cast("int"),
        ).alias("source"),
    )
    return out


# ---------------------------------------------------------------------------
# S2/S3: TableFormat shim.
# ---------------------------------------------------------------------------


class ParquetManifestFormat:
    """Sandbox stand-in for Iceberg partition overwrites + time travel."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.warehouse, table, "manifest.json")

    def _load(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"current": 0, "snapshots": {"0": {"partitions": {}}}}
        with open(p) as f:
            return json.load(f)

    def _store(self, table: str, manifest: dict) -> None:
        d = os.path.join(self.warehouse, table)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))  # atomic commit point

    # -- the 4-method contract (SURVEY.md §7) -------------------------------
    def current_snapshot(self, table: str) -> int:
        return int(self._load(table)["current"])

    def snapshot_ids(self, table: str) -> set[int]:
        """All snapshot ids still present in the manifest (time-travelable).
        Iceberg's ``table.snapshots()`` metadata listing — lets callers
        verify a pin BEFORE asking expire_snapshots to preserve it."""
        return {int(s) for s in self._load(table)["snapshots"]}

    def overwrite_partitions(
        self,
        df: DataFrame,
        table: str,
        n_buckets: int | None = None,
        sort_within=None,
        rebalance: bool = False,
    ) -> int:
        """S2: atomically replace exactly the partitions present in *df*.

        *df* must carry a ``part_hash`` column (K1). Data lands in an
        immutable per-snapshot directory first; the manifest swap is the
        commit point, exactly the Iceberg commit ordering the lineage
        protocol (L1) relies on.

        ``sort_within`` (a Column expression or list of them) clusters
        rows inside each task's file AFTER the part_hash co-location
        shuffle — the Iceberg write sort-order / Delta OPTIMIZE ZORDER
        hook (engine/zorder.py builds the Morton key). A pure expression
        sort: nothing is materialized into the written schema, and the
        snapshot/manifest protocol is unchanged — row ORDER inside
        immutable files is the only difference.
        """
        if "part_hash" not in df.columns:
            raise ValueError("overwrite_partitions requires a part_hash column (K1)")
        manifest = self._load(table)
        snap_id = int(manifest["current"]) + 1
        data_dir = os.path.join(self.warehouse, table, f"snap-{snap_id}")
        # Co-locate each part_hash into one task before the dynamic-partition
        # write: otherwise every task opens a writer per partition value
        # (tasks x N_BUCKETS tiny files). One shuffle of already-aggregated
        # rows buys one file per partition — at 100 TB this is the difference
        # between N_BUCKETS files and N_BUCKETS x shuffle_partitions.
        #
        # ``rebalance=True`` (round 7, guide §6 "REBALANCE hint before the
        # write"): same part_hash clustering, but AQE sizes the task count
        # from the data — a tiny cascade tier collapses to one or two write
        # tasks instead of N_BUCKETS near-empty ones, and an oversized
        # partition is skew-split into several bounded files (the Iceberg
        # write.distribution-mode=hash shape). Off for callers that chain
        # sortWithinPartitions (z-order compaction): a coalesced task holds
        # several part_hash values and the writer's partition-sort would
        # reorder across them.
        from engine.schema import DEFAULT_N_BUCKETS

        if rebalance and sort_within is None:
            df = df.hint("rebalance", "part_hash")
        else:
            df = df.repartition(int(n_buckets or DEFAULT_N_BUCKETS), "part_hash")
        if sort_within is not None:
            cols = sort_within if isinstance(sort_within, list) else [sort_within]
            df = df.sortWithinPartitions(*cols)
        df.write.partitionBy("part_hash").mode("errorifexists").parquet(data_dir)
        written = [
            int(name.split("=", 1)[1])
            for name in os.listdir(data_dir)
            if name.startswith("part_hash=")
        ]
        parts = dict(manifest["snapshots"][str(manifest["current"])]["partitions"])
        for h in written:
            parts[str(h)] = data_dir
        manifest["snapshots"][str(snap_id)] = {
            "partitions": parts,
            "committed_at_unix": time.time(),
        }
        manifest["current"] = snap_id
        self._store(table, manifest)
        return snap_id

    def drop_partitions(self, table: str, part_hashes: list[int]) -> int:
        """Metadata-only commit removing partitions from the CURRENT view
        (Iceberg dropPartition shape — used by retention expiry). No data
        file is touched: prior snapshots still reference the dirs, so time
        travel to before the drop still serves the rows."""
        manifest = self._load(table)
        snap_id = int(manifest["current"]) + 1
        parts = dict(manifest["snapshots"][str(manifest["current"])]["partitions"])
        for h in part_hashes:
            parts.pop(str(int(h)), None)
        manifest["snapshots"][str(snap_id)] = {
            "partitions": parts,
            "committed_at_unix": time.time(),
        }
        manifest["current"] = snap_id
        self._store(table, manifest)
        return snap_id

    def read_at(self, table: str, snapshot_id: int, schema=None) -> DataFrame:
        """S3: time-travel read of one snapshot.

        ``schema`` (round 7, optional): a pinned read schema INCLUDING the
        ``part_hash`` partition column. Skips parquet footer schema
        inference (~0.1-0.15 s of driver latency per read on a 64-partition
        table); callers that know the tier layout (jobs/rollup's cascade
        reads) pass it, everyone else keeps fail-fast inference.

        A snapshot's live partitions generally span several immutable
        ``snap-N`` data directories (each incremental commit rewrote only a
        subset). Spark's partition discovery cannot infer ``part_hash``
        through the non-partition ``snap-N`` level when paths mix snap dirs
        (CONFLICTING_DIRECTORY_STRUCTURES), so each snap dir is read with
        itself as ``basePath`` and the reads are unioned — a union of
        scan nodes, one per historical commit that still owns live
        partitions (bounded by commit count, exactly like an Iceberg
        manifest listing one file set per surviving snapshot)."""
        manifest = self._load(table)
        snap = manifest["snapshots"].get(str(snapshot_id))
        if snap is None:
            raise ValueError(f"{table}: no snapshot {snapshot_id}")
        by_dir: dict[str, list[int]] = {}
        for h, d in snap["partitions"].items():
            by_dir.setdefault(d, []).append(int(h))
        if not by_dir:
            raise ValueError(f"{table}@{snapshot_id} is empty")
        dfs = []
        for d in sorted(by_dir):
            paths = [os.path.join(d, f"part_hash={h}") for h in sorted(by_dir[d])]
            reader = self.spark.read
            if schema is not None:
                reader = reader.schema(schema)
            dfs.append(reader.option("basePath", d).parquet(*paths))
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    def snapshot_dirs(self, table: str, snapshot_id: int | None = None) -> dict:
        """data-dir -> [part_hash...] for a snapshot (default current).
        Every distinct dir is one union branch in read_at — the small-file /
        scan-fan-out metric jobs/compact.py collapses."""
        manifest = self._load(table)
        sid = snapshot_id if snapshot_id is not None else int(manifest["current"])
        snap = manifest["snapshots"].get(str(sid))
        if snap is None:
            raise ValueError(f"{table}: no snapshot {sid}")
        by_dir: dict[str, list[int]] = {}
        for h, d in snap["partitions"].items():
            by_dir.setdefault(d, []).append(int(h))
        return by_dir

    def expire_snapshots(
        self,
        table: str,
        keep_last: int = 2,
        keep_snapshot_ids: set[int] | None = None,
    ) -> dict:
        """Iceberg ``expire_snapshots`` + ``remove_orphan_files`` shape:
        drop snapshot ENTRIES older than the retained set, then physically
        delete ``snap-N`` data dirs referenced by NO surviving snapshot.

        Retained set = the ``keep_last`` highest snapshot ids, plus the
        current snapshot, plus any explicitly pinned ids (pass the lineage
        epochs' output_snapshot_ids to keep those epochs time-travelable).
        A dir stays on disk while ANY surviving snapshot references it —
        incremental commits routinely point new snapshots at old dirs for
        untouched partitions, so dir age alone never decides deletion.

        Crash-safe: the manifest rewrite is the atomic commit; dirs are
        deleted only afterwards, and a re-run deletes any orphan left by a
        crash mid-deletion (orphan = snap-* dir not referenced by any
        surviving snapshot). Time travel to an expired snapshot raises —
        exactly the Iceberg contract.
        """
        import shutil

        manifest = self._load(table)
        snaps = manifest["snapshots"]
        ids = sorted(int(s) for s in snaps)
        keep = set(ids[-max(keep_last, 1):])
        keep.add(int(manifest["current"]))
        for sid in keep_snapshot_ids or ():
            if str(int(sid)) in snaps:
                keep.add(int(sid))
        expired = [i for i in ids if i not in keep]
        manifest["snapshots"] = {str(i): snaps[str(i)] for i in ids if i in keep}
        self._store(table, manifest)  # commit point
        # Liveness by BASENAME, not path string: manifests record data_dir
        # as spelled at write time (absolute/relative/trailing-slash/symlink
        # spellings vary run-to-run), and snap-N always lives directly under
        # the table dir — a string compare against a differently-spelled
        # --warehouse would see every live dir as orphan and delete data the
        # current snapshot still references.
        live_names = {
            os.path.basename(os.path.normpath(d))
            for s in manifest["snapshots"].values()
            for d in s["partitions"].values()
        }
        tdir = os.path.join(self.warehouse, table)
        removed = []
        for name in os.listdir(tdir):
            p = os.path.join(tdir, name)
            if name.startswith("snap-") and os.path.isdir(p) and name not in live_names:
                shutil.rmtree(p)
                removed.append(name)
        return {
            "expired_snapshots": expired,
            "kept_snapshots": sorted(keep & set(ids)),
            "removed_dirs": sorted(removed),
        }

    def read(self, table: str, schema=None) -> DataFrame:
        return self.read_at(table, self.current_snapshot(table), schema=schema)


def write_tier(
    fmt: ParquetManifestFormat, df: DataFrame, tier: str, n_buckets: int | None = None
) -> int:
    """S2 wrapper: attach part_hash if absent and commit one rollup tier."""
    if "part_hash" not in df.columns:
        from engine.schema import DEFAULT_N_BUCKETS

        df = with_part_hash(df, n_buckets or DEFAULT_N_BUCKETS)
    return fmt.overwrite_partitions(df, f"rollup_{tier}", n_buckets)


def scan_tier(
    fmt: ParquetManifestFormat, tier: str, snapshot_id: int | None = None
) -> DataFrame:
    """S3 wrapper."""
    table = f"rollup_{tier}"
    if snapshot_id is None:
        return fmt.read(table)
    return fmt.read_at(table, snapshot_id)


# ---------------------------------------------------------------------------
# S1 for schema-less ingest formats (JSONL / CSV).
#
# Parquet carries its schema in the footer, so scan_tokens validates for
# free. JSON and CSV carry none: the reader is given an explicit
# format-native schema with mode=FAILFAST (malformed lines and type
# mismatches raise instead of becoming nulls), and because JSON integers
# are int64, one validation pass asserts every token fits int32 BEFORE the
# downcast — a silent wrap here would corrupt series values. That pass is
# a real scan; it is the honest price of a footer-less format and runs
# once at ingest, not per query.
# ---------------------------------------------------------------------------

_TOKENS_JSONL_READ = (
    "doc_id string, tokens array<long>, n_tok long, source string"
)
_TOKENS_CSV_READ = "doc_id string, tokens string, n_tok int, source string"
_CSV_NULL_TOKEN = "NA"  # in-array gap sentinel inside the joined string


def _downcast_validated(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    lim = 2**31 - 1
    bad = df.where(
        F.exists(
            "tokens", lambda x: x.isNotNull() & ((x > lim) | (x < -lim - 1))
        )
        | (F.col("n_tok") > lim)
        | (F.col("n_tok") < 0)
    )
    sample = bad.select("doc_id").limit(1).collect()
    if sample:
        raise ValueError(
            f"token ingest: value outside int32 at doc_id="
            f"{sample[0]['doc_id']!r} (tokens are pinned array<int32>)"
        )
    out = df.select(
        F.col("doc_id").cast("string"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int").alias("n_tok"),
        F.col("source").cast("string"),
    )
    assert_tokens_schema(out)
    return out


def scan_tokens_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S1 over JSON-lines: explicit schema + FAILFAST, then the int32
    validation pass and downcast to the pinned TOKENS_SCHEMA."""
    df = (
        spark.read.schema(_TOKENS_JSONL_READ)
        .option("mode", "FAILFAST")
        .json(path)
    )
    return _downcast_validated(df)


def scan_tokens_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 over CSV: tokens travel as one space-joined field with
    _CSV_NULL_TOKEN marking in-array gaps ('' = empty array); explicit
    schema + FAILFAST + header, then the shared validation/downcast."""
    from pyspark.sql import functions as F

    df = (
        spark.read.schema(_TOKENS_CSV_READ)
        .option("mode", "FAILFAST")
        .option("header", "true")
        .csv(path)
    )
    toks = F.when(F.col("tokens").isNull() | (F.col("tokens") == ""),
                  F.expr("cast(array() as array<long>)")).otherwise(
        F.expr(
            f"transform(split(tokens, ' '), "
            f"x -> CASE WHEN x = '{_CSV_NULL_TOKEN}' THEN NULL "
            f"ELSE cast(x AS long) END)"
        )
    )
    return _downcast_validated(
        df.select("doc_id", toks.alias("tokens"), F.col("n_tok").cast("long"), "source")
    )


def scan_tokens_orc(spark: SparkSession, path: str) -> DataFrame:
    """S1 over ORC: like parquet, ORC carries a typed schema in the file
    (footer), so the fail-fast contract is the scan_tokens one — read the
    file's OWN schema and validate it (imposing TOKENS_SCHEMA would mask
    drift); no downcast pass needed, array<int> is ORC-native."""
    df = spark.read.orc(path)
    assert_tokens_schema(df)
    return df


def write_tokens_orc(df: DataFrame, path: str) -> None:
    """Inverse of scan_tokens_orc (type-preserving, no string encoding)."""
    df.write.mode("errorifexists").orc(path)


def write_tokens_jsonl(df: DataFrame, path: str) -> None:
    """Inverse of scan_tokens_jsonl (nulls inside arrays survive JSON)."""
    df.write.mode("errorifexists").json(path)


def write_tokens_csv(df: DataFrame, path: str) -> None:
    """Inverse of scan_tokens_csv: gaps become _CSV_NULL_TOKEN."""
    from pyspark.sql import functions as F

    df.select(
        "doc_id",
        F.array_join(F.col("tokens").cast("array<string>"), " ", _CSV_NULL_TOKEN).alias("tokens"),
        "n_tok",
        "source",
    ).write.mode("errorifexists").option("header", "true").csv(path)
