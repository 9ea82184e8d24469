"""Drivable anomaly-analysis battery: per-event ensemble flags ->
episode view -> per-series health diagnostics -> per-type tail census,
from one spark-submit, writing each layer as parquet plus a JSON report.

This is the DETECTION counterpart of jobs/corpus_pipeline.py: the
operational run an on-call engineer points at an events directory to get
(1) which events to page on, (2) how the alerts cluster into episodes,
(3) which series are statistically healthy enough for which detector
family to even apply, and (4) whether each event type's value
distribution is heavy-tailed enough that mean-based thresholds are
meaningless. Like the other jobs it adds NO second implementation to
drift: every layer calls the same oracle-gated `__spark_entry__`
operators the driver gate hash-checks.

Layers:
  flags        q_detector_ensemble filtered to votes >= --min-votes
               (2-of-4 consensus by default)
  episodes     q_anomaly_runs — consecutive-flag islands per user
  diagnostics  one row per user_id joining twenty-one per-series
               one-row statistics (burstiness, Sen/OLS trend,
               Mann-Kendall, runs test, Ljung-Box, permutation
               entropy, Hjorth, exponential-gap KS, gap coverage,
               flatline plateaus, variance ratio, AR(1) φ + half-life,
               Hurst exponent, Fano factor, record ratio, Pearson +
               Spearman fleet synchrony, load↔magnitude coupling,
               weekday/weekend Welch z, error-budget burn, anomaly
               episodes); each input is ONE corpus
               scan reduced to a
               users-sized frame BEFORE the join, so the join layer
               moves per-user rows, never events
  tails        the per-type EVT card: Hill tail index (is the tail
               tractable) + Ferro-Segers extremal index (must I
               decluster) + method-of-moments GPD fit (the fit)
  synchrony    directed influence edges among the top-K active users
               (q_xcorr_pairs): best lag, corr at best lag, lag-0 corr

Scale shape: the flags/episodes layers are the event-sized outputs and
stay partitioned by user; the diagnostics join is users-sized (orders of
magnitude below the corpus) so join strategy is immaterial; at 100 TB
the cost is the N independent corpus scans, which is the documented
trade of a battery run (each diagnostic is individually plan-asserted
to its one-exchange shape; run fewer via --skip-diagnostics).

Run:
    python jobs/analyze.py --input /root/testdata/sf0.01 \
        --output /tmp/analyze_out [--min-votes 2]
    spark-submit --py-files dist/engine.zip jobs/analyze.py ...

Output layout:
    <output>/event_flags/          flagged events (votes >= min_votes)
    <output>/episodes/             per-user episode summary
    <output>/series_diagnostics/   one row per user_id
    <output>/type_tails/           per-type Hill tail index
    <output>/synchrony_pairs/      top-K pair lead-lag edges
    <output>/report.json           row counts + seconds per layer
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

# (query, columns to keep, renames) — selected to avoid the cross-query
# name collisions (`n`, `z`, `n_gaps`, `mean_gap_s`) in the joined frame
_DIAG_SPECS = [
    ("burstiness", ["n_gaps", "mean_gap_s", "burstiness"], {}),
    ("trend_slope", ["slope_day", "r2"], {}),
    ("mann_kendall", ["z", "sen_slope_day", "trend"], {"z": "mk_z"}),
    ("runs_test", ["z", "runs"], {"z": "runs_z"}),
    ("ljung_box", ["lb_q", "reject_5pct"], {"reject_5pct": "lb_reject"}),
    ("permutation_entropy", ["pe_norm"], {}),
    ("hjorth_params", ["activity", "mobility", "complexity"], {}),
    ("exp_gap_fit", ["ks_d"], {"ks_d": "exp_ks_d"}),
    ("gap_profile", ["coverage", "longest_gap_min"], {}),
    ("flatline_runs", ["n_flat", "longest_run"],
     {"longest_run": "longest_flat_run"}),
    ("variance_ratio", ["vr"], {}),
    ("ar1_halflife", ["phi", "halflife_steps"], {}),
    ("hurst_rs", ["hurst"], {}),
    ("fano_factor", ["vmr"], {}),
    ("record_stats", ["record_ratio"], {}),
    # fleet synchrony, both estimators: a large Pearson-vs-Spearman gap
    # is itself diagnostic (a single shared burst minute, not sustained
    # co-movement, is carrying the Pearson number)
    ("corr_to_global", ["corr_global"], {}),
    ("spearman_to_global", ["rho_global"], {}),
    ("value_volume_corr", ["corr_vol_val"], {}),
    ("weekend_shift", ["welch_z"], {"welch_z": "weekend_z"}),
    ("error_burn", ["burn_ratio", "burning"], {}),
    ("anomaly_runs", ["n_anoms", "n_episodes", "max_run"], {}),
]


def run_analyze(
    spark,
    input_dir: str,
    output_dir: str,
    min_votes: int = 2,
    skip_diagnostics: bool = False,
) -> dict:
    import __spark_entry__ as ops

    t0 = time.monotonic()
    queries = ops.queries()
    os.makedirs(output_dir, exist_ok=True)
    report: dict = {"min_votes": min_votes, "layers": {}}

    def _layer(name: str, df) -> None:
        t = time.monotonic()
        path = os.path.join(output_dir, name)
        df.write.mode("errorifexists").parquet(path)
        report["layers"][name] = {
            "rows": spark.read.parquet(path).count(),
            "seconds": round(time.monotonic() - t, 3),
        }

    _layer(
        "event_flags",
        queries["detector_ensemble"](spark, input_dir).where(
            F.col("votes") >= min_votes
        ),
    )
    _layer("episodes", queries["anomaly_runs"](spark, input_dir))

    if not skip_diagnostics:
        diag = None
        for qname, cols, renames in _DIAG_SPECS:
            frame = queries[qname](spark, input_dir).select("user_id", *cols)
            for old, new in renames.items():
                frame = frame.withColumnRenamed(old, new)
            diag = frame if diag is None else diag.join(
                frame, "user_id", "full_outer"
            )
        # a user with zero flagged events has no anomaly_runs row
        diag = diag.fillna(
            0, subset=["n_anoms", "n_episodes", "max_run"]
        ).orderBy("user_id")
        _layer("series_diagnostics", diag)

    # per-type EVT card: tail weight (hill) + cluster dependence
    # (extremal index) + the GPD fit — three per-type one-row frames,
    # joined on the 5-key type (immaterial at this cardinality)
    evt = (
        queries["hill_tail_index"](spark, input_dir)
        .join(
            queries["extremal_index"](spark, input_dir).select(
                "event_type", "thr_cents", "n_exceed", "theta"
            ),
            "event_type",
            "full_outer",
        )
        .join(
            queries["gpd_fit"](spark, input_dir).select(
                "event_type", "xi", "sigma"
            ),
            "event_type",
            "full_outer",
        )
        .orderBy("event_type")
    )
    _layer("type_tails", evt)

    # directed influence edges among the top-K active users: best lag +
    # corr at best lag + lag-0 corr per pair (who leads whom) — K²/2
    # rows, the coordination card beside the per-series diagnostics
    _layer("synchrony_pairs", queries["xcorr_pairs"](spark, input_dir))

    report["seconds"] = round(time.monotonic() - t0, 3)
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True,
                    help="dir containing events.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-votes", type=int, default=2)
    ap.add_argument("--skip-diagnostics", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from engine.session import get_spark

    spark = get_spark(app_name="analyze-job", master=args.master)
    report = run_analyze(
        spark,
        args.input,
        args.output,
        min_votes=args.min_votes,
        skip_diagnostics=args.skip_diagnostics,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
