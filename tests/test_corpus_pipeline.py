"""jobs/corpus_pipeline.py: the composed quality->dedup->decon->chunk->
pack corpus job — stage outputs must equal the oracle-gated operators
applied to each checkpoint dir (no second implementation), plus packing
invariants and a CLI smoke."""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"


def test_pipeline_stages_match_gated_operators(spark, tmp_path):
    import __spark_entry__ as ops
    from jobs.corpus_pipeline import run_pipeline

    out = str(tmp_path / "out")
    report = run_pipeline(spark, SF, out)

    # stage counts are monotone non-increasing through the DOC stages
    # (chunk re-keys to chunk granularity, so it and everything after it
    # live on a different count axis)
    doc_stages = [
        s for s in report["stages"]
        if s["stage"] not in ("chunk", "chunkdedup")
    ]
    ns = [report["docs_in"]] + [s["docs_out"] for s in doc_stages]
    assert all(a >= b for a, b in zip(ns, ns[1:])), ns
    # chunkdedup only ever drops chunks
    cd = [s for s in report["stages"] if s["stage"] == "chunkdedup"]
    assert cd and cd[0]["docs_out"] <= cd[0]["docs_in"], cd
    for s in report["stages"]:
        assert s["docs_in"] >= 0 and s["docs_out"] >= 0

    # stage 1 == the quality predicate applied directly
    q = ops.q_quality_score(spark, SF)
    want1 = {
        r["doc_id"]
        for r in q.where("n_toks >= 8 AND stop_ratio <= 0.5")
        .select("doc_id")
        .collect()
    }
    got1 = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(out, "s1_quality", "documents.parquet")
        ).select("doc_id").collect()
    }
    assert got1 == want1

    # stage 2 == q_dedup_keep evaluated ON the stage-1 checkpoint
    want2 = {
        r["doc_id"]
        for r in ops.q_dedup_keep(spark, os.path.join(out, "s1_quality"))
        .select("doc_id")
        .collect()
    }
    got2 = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(out, "s2_dedup", "documents.parquet")
        ).select("doc_id").collect()
    }
    assert got2 == want2

    # stage 3 dropped the eval split entirely
    s3 = spark.read.parquet(os.path.join(out, "s3_decon", "documents.parquet"))
    assert s3.where("doc_id % 10 = 7").count() == 0
    # ... and every dropped non-eval doc is contaminated >= threshold
    dropped = want2 - {r["doc_id"] for r in s3.select("doc_id").collect()}
    contaminated = {
        r["doc_id"]
        for r in ops.q_decontaminate(spark, os.path.join(out, "s2_dedup"))
        .where("n_shared >= 4")
        .collect()
    }
    non_eval_dropped = {d for d in dropped if d % 10 != 7}
    assert non_eval_dropped == {d for d in contaminated if d % 10 != 7}

    # chunk corpus: unique re-keyed ids, text is real chunk text
    chunks = spark.read.parquet(
        os.path.join(out, "s4_chunks", "documents.parquet")
    )
    n_chunks = chunks.count()
    assert chunks.select("doc_id").distinct().count() == n_chunks
    assert set(chunks.columns) == {"doc_id", "text", "lang", "source", "n_chars"}

    # packing invariants: every interior window is exactly full
    win = spark.read.parquet(os.path.join(out, "pack_windows"))
    n_win = win.count()
    assert report["pack"]["n_windows"] == n_win
    if n_win > 1:
        interior = win.where(
            win.seq_id < win.agg({"seq_id": "max"}).collect()[0][0]
        )
        bad = interior.where("fill != 1.0").count()
        assert bad == 0
    # total packed tokens == total chunk-corpus tokens
    total = report["pack"]["total_tokens"]
    import pyspark.sql.functions as F

    want_total = chunks.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0]["t"] or 0
    assert total == want_total

    assert os.path.exists(os.path.join(out, "report.json"))
    with open(os.path.join(out, "report.json")) as f:
        assert json.load(f)["docs_out"] == report["docs_out"]


def test_pipeline_stage_subset_and_resume_shape(spark, tmp_path):
    """--stages quality,pack must run only those stages, reading pack
    directly off the quality checkpoint (the resume-by-pointing-at-the-
    last-stage contract)."""
    from jobs.corpus_pipeline import run_pipeline

    out = str(tmp_path / "out_subset")
    report = run_pipeline(spark, SF, out, stages=("quality", "pack"))
    assert [s["stage"] for s in report["stages"]] == ["quality"]
    assert os.path.exists(os.path.join(out, "pack_windows"))
    assert not os.path.exists(os.path.join(out, "s2_dedup"))


def test_pipeline_cli_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "cli_out")
    cmd = [
        sys.executable,
        os.path.join(repo, "jobs", "corpus_pipeline.py"),
        "--input", SF, "--output", out, "--stages", "quality,pack",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, env=env, cwd=repo
    )
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["docs_in"] == 500
    assert report["pack"]["n_windows"] >= 1


def test_rebalance_stage_matches_census(spark, tmp_path):
    """The opt-in rebalance stage's kept set must reproduce EXACTLY the
    per-source docs_kept/tok_kept census q_source_mix_rebalance reports
    (same scaffolds — no second implementation to drift), and the kept
    set must be a pure function of doc_id (re-run == identical)."""
    import __spark_entry__ as ops
    from pyspark.sql import functions as F
    from jobs.corpus_pipeline import run_pipeline

    out = str(tmp_path / "reb")
    report = run_pipeline(spark, SF, out, stages=("rebalance",))
    assert [s["stage"] for s in report["stages"]] == ["rebalance"]

    kept = ops._t(spark, os.path.join(out, "s3b_rebalance"), "documents")
    got = {
        (r["source"], r["n"], r["tok"])
        for r in kept.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.size(F.split("text", " ")).cast("long")).alias("tok"),
        )
        .collect()
    }
    want = {
        (r["source"], r["docs_kept"], r["tok_kept"])
        for r in ops.q_source_mix_rebalance(spark, SF).collect()
        if r["docs_kept"] > 0
    }
    assert got == want

    out2 = str(tmp_path / "reb2")
    run_pipeline(spark, SF, out2, stages=("rebalance",))
    k2 = ops._t(spark, os.path.join(out2, "s3b_rebalance"), "documents")
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in k2.select("doc_id").collect())


def test_chunkdedup_stage_matches_census_and_witnesses(spark, tmp_path):
    """The passage-dedup stage must (a) keep exactly one occurrence per
    distinct passage text — so the kept count equals the distinct-md5
    count of the chunk checkpoint — and (b) keep q_chunk_dup_groups'
    first witness for every duplicated passage: the census runs on the
    PRE-chunk checkpoint, and each (first_doc, first_chunk) maps to
    chunk-corpus key first_doc*CHUNK_KEY_SPAN + first_chunk, which must
    survive."""
    import __spark_entry__ as ops
    from jobs.corpus_pipeline import CHUNK_KEY_SPAN, run_pipeline

    out = str(tmp_path / "out")
    run_pipeline(
        spark, SF, out, stages=("chunk", "chunkdedup")
    )

    chunks = spark.read.parquet(
        os.path.join(out, "s4_chunks", "documents.parquet")
    )
    kept = spark.read.parquet(
        os.path.join(out, "s4b_chunkdedup", "documents.parquet")
    )
    n_distinct = chunks.select("text").distinct().count()
    assert kept.count() == n_distinct
    # one row per distinct text, and every kept text is present once
    assert kept.select("text").distinct().count() == n_distinct

    census = ops.q_chunk_dup_groups(spark, SF).collect()
    assert census, "fixture must contain duplicated passages"
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    for r in census:
        assert r["first_doc"] * CHUNK_KEY_SPAN + r["first_chunk"] in kept_ids
