"""Round-7 measurement harness (guide §1): per-query noop-isolated timing +
``explain("formatted")`` capture for any subset of ``queries()``, plus a
tier-metrics breakdown of the token pipeline. Does NOT touch the frozen
bench.py — cite these numbers in OPTIMIZATION_r07.md.

Usage:
  python tools/bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries rolling_mean,anomaly_score --runs 3 \
      --plans-dir plans/r07 --plans-suffix _before
  python tools/bench_extra.py --pipeline            # tier breakdown only
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HEADLINE = [
    "rolling_mean",
    "anomaly_score",
    "detect",
    "rollup_minute",
    "cascade_hour",
    "pricing_summary",
    "top_customers",
    "rank_orders",
    "order_gaps",
    "doc_fingerprint",
    "quality_score",
    "embedding_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--queries", default=",".join(HEADLINE),
                    help="comma list, or 'headline'")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None,
                    help="dump explain('formatted') per query here")
    ap.add_argument("--plans-suffix", default="_before")
    ap.add_argument("--pipeline", action="store_true",
                    help="also run the token pipeline with tier metrics")
    ap.add_argument("--pipeline-docs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "6000")))
    ap.add_argument("--pipeline-len", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_LEN", "8192")))
    ap.add_argument("--out", default=None, help="write JSON result here")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from engine.session import get_spark
    from engine.util import median

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    qs = entrymod.queries()
    names = HEADLINE if args.queries == "headline" else [
        q for q in args.queries.split(",") if q
    ]

    result: dict = {"sf_dir": args.sf_dir, "cores": cpus, "runs": args.runs}

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    timings: dict[str, list[float]] = {}
    if names and names != [""]:
        # untimed warmup pass (codegen + page cache), as bench.py does
        for name in names:
            df = qs[name](spark, args.sf_dir)
            if args.plans_dir:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                Path(args.plans_dir, f"{name}{args.plans_suffix}.txt").write_text(
                    buf.getvalue())
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            force(df)
        for _ in range(args.runs):
            for name in names:
                spark.sparkContext.setJobDescription(f"timed:{name}")
                t0 = time.monotonic()
                force(qs[name](spark, args.sf_dir))
                timings.setdefault(name, []).append(
                    round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        result["queries_runs"] = timings
        result["queries"] = {
            n: round(median(rs), 3) for n, rs in timings.items()
        }

    if args.pipeline:
        from engine.io import scan_tokens, synth_tokens
        from jobs.rollup import run_rollup

        docs, length = args.pipeline_docs, args.pipeline_len
        tok_path = f"/tmp/bench_tokens-{docs}x{length}"
        if not os.path.exists(os.path.join(tok_path, "_SUCCESS")):
            synth_tokens(spark, docs, n_tok=length).repartition(64).write.mode(
                "overwrite").parquet(tok_path)
        tokens = scan_tokens(spark, tok_path)
        shutil.rmtree("/tmp/bench_wh_warm", ignore_errors=True)
        run_rollup(spark, tokens, "/tmp/bench_wh_warm", epoch=1, compress=True)
        shutil.rmtree("/tmp/bench_wh_warm", ignore_errors=True)
        pipe_runs, tier_metrics = [], []
        for _ in range(args.runs):
            wh = "/tmp/bench_wh_extra"
            shutil.rmtree(wh, ignore_errors=True)
            t0 = time.monotonic()
            m = run_rollup(spark, tokens, wh, epoch=1, compress=True)
            pipe_runs.append(round(time.monotonic() - t0, 3))
            tier_metrics.append(m)
            shutil.rmtree(wh, ignore_errors=True)
        result["token_pipeline_runs"] = pipe_runs
        result["token_pipeline"] = round(median(pipe_runs), 3)
        result["tier_metrics"] = tier_metrics

    line = json.dumps(result)
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    print(line, flush=True)


if __name__ == "__main__":
    main()
