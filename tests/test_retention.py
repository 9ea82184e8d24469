"""Retention expiry (engine/retention.py): per-tier trailing windows,
metadata-only drops, straddler-only rewrites, time travel intact."""

from __future__ import annotations

from engine.io import ParquetManifestFormat, synth_tokens
from engine.retention import apply_retention, expired_cutoff_bucket
from jobs.rollup import run_rollup


def test_cutoff_bucket_math():
    # 1m buckets cover [b*60, (b+1)*60); expired iff end <= now - retain
    assert expired_cutoff_bucket("1m", now_t=4096, retain_seconds=1800) == 38
    assert expired_cutoff_bucket("1m", now_t=120, retain_seconds=60) == 1
    assert expired_cutoff_bucket("1m", now_t=119, retain_seconds=60) == 0
    assert expired_cutoff_bucket("1h", now_t=86400, retain_seconds=3600) == 23
    # retention window longer than history -> nothing expires
    assert expired_cutoff_bucket("1d", now_t=4096, retain_seconds=10**9) == 0


def test_retention_expires_and_preserves_history(spark, tmp_path):
    wh = str(tmp_path / "ret")
    tokens = synth_tokens(spark, 40, seed=42)  # mixed lengths incl. 4096
    run_rollup(spark, tokens, wh, epoch=1)
    fmt = ParquetManifestFormat(spark, wh)

    before_1m = fmt.read("rollup_1m").select("doc_id", "bucket", "vsum", "part_hash")
    before_rows = {(r["doc_id"], r["bucket"], r["vsum"]) for r in before_1m.collect()}
    before_1h = {(r["doc_id"], r["bucket"]) for r in fmt.read("rollup_1h").select("doc_id", "bucket").collect()}
    snap_before = fmt.current_snapshot("rollup_1m")

    policy = {"1m": 1800}  # keep the last 30 minutes of the 1m tier only
    m = apply_retention(fmt, policy, now_t=4096)
    cutoff = m["1m"]["cutoff_bucket"]
    assert cutoff == 38
    assert m["1m"]["rows_dropped"] > 0
    # at least one of the two expiry paths must have fired on this fixture
    assert m["1m"]["dropped_partitions"] + m["1m"]["rewritten_partitions"] > 0

    after = {
        (r["doc_id"], r["bucket"], r["vsum"])
        for r in fmt.read("rollup_1m").select("doc_id", "bucket", "vsum").collect()
    }
    want = {t for t in before_rows if t[1] >= cutoff}
    assert after == want  # exactly the retained window, nothing else touched

    # coarser tier not in the policy is untouched
    assert {
        (r["doc_id"], r["bucket"])
        for r in fmt.read("rollup_1h").select("doc_id", "bucket").collect()
    } == before_1h

    # time travel: the pre-retention snapshot still serves the expired rows
    old = {
        (r["doc_id"], r["bucket"], r["vsum"])
        for r in fmt.read_at("rollup_1m", snap_before)
        .select("doc_id", "bucket", "vsum").collect()
    }
    assert old == before_rows

    # idempotent: a second pass with the same clock drops nothing more
    m2 = apply_retention(fmt, policy, now_t=4096)
    assert m2["1m"]["rows_dropped"] == 0
    assert m2["1m"]["dropped_partitions"] == 0 and m2["1m"]["rewritten_partitions"] == 0


def test_retention_cli_resume_and_time_travel(spark, tmp_path):
    """jobs/retention.py end-to-end: drop + straddler rewrite through the
    CLI surface, expiry recorded in lineage, same-epoch re-run is a no-op,
    and time travel to the pre-expiry snapshot still serves expired rows."""
    from pyspark.sql import functions as F

    from engine.lineage import read_lineage
    from jobs.retention import parse_duration, run_retention

    assert parse_duration("7d") == 7 * 86400
    assert parse_duration("30m") == 1800
    assert parse_duration("3600") == 3600

    wh = str(tmp_path / "retcli")
    run_rollup(spark, synth_tokens(spark, 40, seed=42), wh, epoch=1)
    fmt = ParquetManifestFormat(spark, wh)
    pre_rows = {
        (r["doc_id"], r["bucket"])
        for r in fmt.read("rollup_1m").select("doc_id", "bucket").collect()
    }
    snap_pre = fmt.current_snapshot("rollup_1m")

    m = run_retention(spark, wh, {"1m": parse_duration("30m")}, now_t=4096, epoch=7)
    assert not m["1m"]["skipped"]
    assert m["1m"]["rows_dropped"] > 0
    assert m["1m"]["post_snapshot"] > m["1m"]["pre_snapshot"] == snap_pre

    cutoff = m["1m"]["cutoff_bucket"]
    kept = {
        (r["doc_id"], r["bucket"])
        for r in fmt.read("rollup_1m").select("doc_id", "bucket").collect()
    }
    assert kept == {(d, b) for d, b in pre_rows if b >= cutoff}

    # expiry commit is durable lineage
    lin = read_lineage(spark, wh).where("tier = 'expire_1m'")
    assert lin.where("checkpoint_epoch = 7").count() > 0
    assert lin.agg(F.sum("in_rows")).collect()[0][0] == m["1m"]["rows_dropped"]

    # same-epoch re-run: resume short-circuit, no new snapshot
    snap_after = fmt.current_snapshot("rollup_1m")
    m2 = run_retention(spark, wh, {"1m": parse_duration("30m")}, now_t=4096, epoch=7)
    assert m2["1m"] == {"skipped": True}
    assert fmt.current_snapshot("rollup_1m") == snap_after

    # time travel to before the expiry still serves every pre-expiry row
    old = {
        (r["doc_id"], r["bucket"])
        for r in fmt.read_at("rollup_1m", snap_pre).select("doc_id", "bucket").collect()
    }
    assert old == pre_rows
