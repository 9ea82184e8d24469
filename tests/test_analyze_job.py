"""jobs/analyze.py: drivable detector battery — layer outputs match the
oracle-gated operators they compose, diagnostics cover every user, and
the report is durable."""

from __future__ import annotations

import json
import os


def test_analyze_job_layers_match_gated_operators(spark, tmp_path):
    from jobs.analyze import run_analyze

    import __spark_entry__ as ops

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "out")
    report = run_analyze(spark, sf, out, min_votes=2)

    queries = ops.queries()

    # event_flags == ensemble rows with votes >= 2, all columns intact
    flags = spark.read.parquet(os.path.join(out, "event_flags"))
    want = queries["detector_ensemble"](spark, sf).where("votes >= 2")
    assert set(flags.columns) == set(want.columns)
    got_ids = {r["event_id"] for r in flags.select("event_id").collect()}
    want_ids = {r["event_id"] for r in want.select("event_id").collect()}
    assert got_ids == want_ids
    assert report["layers"]["event_flags"]["rows"] == len(want_ids)

    # episodes == q_anomaly_runs verbatim
    eps = spark.read.parquet(os.path.join(out, "episodes"))
    assert eps.count() == queries["anomaly_runs"](spark, sf).count()

    # diagnostics: one row per user in the corpus, no collided columns
    diag = spark.read.parquet(os.path.join(out, "series_diagnostics"))
    n_users = (
        spark.read.parquet(os.path.join(sf, "events.parquet"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert diag.count() == n_users
    assert diag.select("user_id").distinct().count() == n_users
    for col in ("burstiness", "mk_z", "runs_z", "lb_q", "pe_norm",
                "exp_ks_d", "coverage", "n_anoms", "slope_day",
                "mobility", "n_flat", "longest_flat_run", "vr",
                "hurst", "vmr", "record_ratio", "corr_global",
                "rho_global", "corr_vol_val", "weekend_z",
                "burn_ratio", "burning"):
        assert col in diag.columns, col
    # a user with zero flagged events reads 0, not NULL
    assert diag.where("n_anoms IS NULL").count() == 0

    # spot-check one diagnostic against its source operator
    want_b = {
        r["user_id"]: r["burstiness"]
        for r in queries["burstiness"](spark, sf).collect()
    }
    got_b = {
        r["user_id"]: r["burstiness"]
        for r in diag.select("user_id", "burstiness").collect()
    }
    assert got_b == want_b

    # type_tails = the per-type EVT card (hill + extremal index + GPD)
    tails = spark.read.parquet(os.path.join(out, "type_tails"))
    assert tails.count() == queries["hill_tail_index"](spark, sf).count()
    for col in ("alpha", "theta", "xi", "sigma", "thr_cents"):
        assert col in tails.columns, col

    # synchrony_pairs = q_xcorr_pairs verbatim (K²/2 lead-lag edges)
    sync = spark.read.parquet(os.path.join(out, "synchrony_pairs"))
    assert sync.count() == queries["xcorr_pairs"](spark, sf).count()
    for col in ("user_a", "user_b", "best_lag", "best_corr", "corr0"):
        assert col in sync.columns, col

    with open(os.path.join(out, "report.json")) as f:
        persisted = json.load(f)
    assert persisted["layers"] == report["layers"]
    assert persisted["seconds"] > 0


def test_analyze_job_skip_diagnostics(spark, tmp_path):
    from jobs.analyze import run_analyze

    out = str(tmp_path / "out_skip")
    report = run_analyze(
        spark, "/root/testdata/sf0.001", out, min_votes=4,
        skip_diagnostics=True,
    )
    assert "series_diagnostics" not in report["layers"]
    assert not os.path.exists(os.path.join(out, "series_diagnostics"))
    # min_votes=4 demands unanimity — a subset of the 2-vote consensus
    assert report["layers"]["event_flags"]["rows"] >= 0
