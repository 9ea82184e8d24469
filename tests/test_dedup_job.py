"""jobs/dedup.py: drivable corpus dedup — keep-set correctness vs the
oracle-gated operators, exact mode on crafted duplicates, CLI smoke."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_dedup_job_minhash_matches_gated_operator(spark, tmp_path):
    from jobs.dedup import run_dedup

    import __spark_entry__ as ops

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "out")
    report = run_dedup(spark, sf, out, mode="minhash")
    kept = spark.read.parquet(os.path.join(out, "kept"))
    want = {r["doc_id"] for r in ops.q_dedup_keep(spark, sf).collect()}
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == want
    assert report["docs_in"] == 500
    assert report["docs_kept"] == len(want)
    assert report["docs_dropped"] == 500 - len(want)
    # kept output preserves ALL document columns
    assert set(kept.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert os.path.exists(os.path.join(out, "report.json"))


def test_dedup_job_exact_mode_drops_byte_dupes(spark, tmp_path):
    from jobs.dedup import run_dedup

    src = str(tmp_path / "corpus")
    os.makedirs(src)
    rows = [
        (1, "alpha beta gamma", "en", "a", 16),
        (2, "alpha beta gamma", "en", "b", 16),  # byte dup of 1
        (3, "delta epsilon", "en", "a", 13),
        (4, "alpha beta gamma ", "en", "a", 17),  # NOT a dup (trailing sp)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(src, "documents.parquet"))

    out = str(tmp_path / "out_exact")
    report = run_dedup(spark, src, out, mode="exact")
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "kept")).collect()
    }
    assert kept == {1, 3, 4}
    assert report["docs_dropped"] == 1 and report["clusters"] is None


def test_dedup_job_cli_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "cli_out")
    cmd = [sys.executable, os.path.join(repo, "jobs", "dedup.py"),
           "--input", "/root/testdata/sf0.001", "--output", out,
           "--mode", "exact", "--master", "local[2]"]
    r = subprocess.run(cmd, cwd=repo, capture_output=True, text=True,
                       env=dict(os.environ, SPARK_DRIVER_MEMORY="2g"),
                       timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["docs_in"] == 500 and report["docs_kept"] <= 500
    assert os.path.exists(os.path.join(out, "report.json"))
