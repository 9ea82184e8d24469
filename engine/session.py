"""SparkSession factory with the K3 tuning profile (SURVEY.md §2.6).

All engine jobs and tests go through :func:`get_spark` so the conf profile is
recorded in one place and the bench can report it (BASELINE.md protocol #4).

Scale notes (designed for a 1000-executor cluster, tested on local[N]):
  - AQE on (default in Spark 4.x, pinned anyway) + skew-join splitting +
    partition coalescing: runtime re-planning replaces hand-tuned shuffle
    partition counts at 100 TB.
  - ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
    coalesces below it. On a real cluster set it ~2-3x total cores.
  - Arrow execution on: C1-C3 compression kernels move rows executor->Python
    as Arrow batches, never pickled rows (BASELINE.json:15 "no per-row
    Python").
  - Session timezone pinned UTC so bucket_ts is deterministic everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Python workers churn large NumPy temporaries every Arrow batch. With
# glibc defaults every buffer >32 MB is mmap'd and unmapped per call, so
# each batch re-faults hundreds of MB of fresh pages per worker — measured
# 10-40x kernel-time inflation on this hypervisor (first-touch ~0.1-1 ms a
# page under load; the cost shows up as 'steal'). Raising the mmap/trim
# thresholds keeps the arena hot: buffers are faulted once per worker
# lifetime and recycled. Same 49M-token compress stage: 61 s -> 5.4 s.
# Also the right setting for long-running production executors.
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(2 * 1024**3),
    "MALLOC_TRIM_THRESHOLD_": str(2 * 1024**3),
    "MALLOC_TOP_PAD_": str(256 * 1024**2),
}


def get_spark(
    app_name: str = "ts-rollup-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster it is left unset so spark-submit supplies it.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # must be in THIS process's env before the JVM launches: local-mode and
    # local-cluster python workers fork from daemons that inherit it
    for k, v in _MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Round 7 (guide §2.2): AQE's coalescing floor. The default 1 MB
        # floor lets a small-relative-to-the-cluster shuffle (e.g. ~30 MB
        # over 32 cores) coalesce below core count, serializing the window/
        # agg stage behind it — measured ~20% on the sf1.0 window family.
        # The floor only binds when totalShuffleBytes/parallelism < 1 MB;
        # at production scale the per-partition target is far above either
        # value, so this is inert there (parameterised via env regardless).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        # Round 7: REBALANCE-mode tier writes (engine/io.py) size their
        # tasks from this. 8 MB keeps a hundreds-of-MB local write on all
        # cores while a KB-sized cascade tier still collapses to one task;
        # on a production cluster set SPARK_GRAFT_ADVISORY_PARTITION=256m
        # (guide §9) so shuffle partitions land in the 100 MB-1 GB band.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "8m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Round 7 (guide §1/§6): below this many paths, file listing stays
        # on the driver (its built-in thread pool) instead of being
        # dispatched as a distributed listing JOB whose fixed scheduling
        # cost (~0.15 s) dwarfs listing a manifest read's <= n_buckets
        # leaf dirs. The default 32 predates driver-side parallel listing;
        # a distributed job only pays off at many thousands of paths —
        # production tables here expose at most n_buckets partition dirs
        # per snap dir (engine/io.py read_at), far below 1024.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LISTING_JOB_THRESHOLD", "1024"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Cap Arrow batch size so grouped-map compression kernels (C1-C3)
        # never materialize unbounded pandas frames per call (SURVEY.md §4
        # spill row): a (doc_id, bucket) group is <= 86400 points anyway.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # real clusters: executors aren't forked from this process, so ship the
    # allocator profile explicitly
    for k, v in _MALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
