"""One-off GC/heap diagnosis for the pipeline bench variance (round 2).

Usage: SPARK_DRIVER_MEMORY=16g python tools/diag_gc.py --runs 2 \
           --java-opts "-XX:+UseParallelGC" --tag pgc16
Prints one flushed JSON line per run with wall, per-tier seconds, GC
seconds, JVM CPU seconds, and host steal — enough to attribute wall-time
swings to GC vs contention vs IO.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", default="/tmp/bench_pipeline/tokens-6000x8192")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--java-opts", default="")
    ap.add_argument("--tag", default="diag")
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from engine.io import scan_tokens
    from engine.session import get_spark
    from jobs.bench_pipeline import _host_steal, _jvm_metrics
    from jobs.rollup import run_rollup

    extra = {"spark.ui.showConsoleProgress": "false"}
    opts = f"-Xlog:gc:file=/tmp/gc-{args.tag}.log:time,uptime"
    if args.java_opts:
        opts = args.java_opts + " " + opts
    extra["spark.driver.extraJavaOptions"] = opts
    spark = get_spark(
        app_name=f"diag-{args.tag}", master=args.master,
        shuffle_partitions=args.shuffle_partitions, extra_conf=extra,
    )
    tokens = scan_tokens(spark, args.tokens)
    for i in range(args.runs):
        wh = f"/tmp/diag_wh_{args.tag}_{i}"
        shutil.rmtree(wh, ignore_errors=True)
        m0, s0 = _jvm_metrics(spark), _host_steal()
        t0 = time.monotonic()
        tiers = run_rollup(spark, tokens, wh, epoch=1, compress=args.compress)
        wall = time.monotonic() - t0
        m1, s1 = _jvm_metrics(spark), _host_steal()
        print(json.dumps({
            "tag": args.tag, "run": i, "wall": round(wall, 1),
            "tiers": {t: m["seconds"] for t, m in tiers.items()},
            "gc_s": round((m1["gc_ms"] - m0["gc_ms"]) / 1000, 1),
            "jvm_cpu_s": round(m1["jvm_cpu_s"] - m0["jvm_cpu_s"], 1),
            "steal_s": round(s1 - s0, 1),
        }), flush=True)
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
