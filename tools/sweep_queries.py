"""Timed sweep of every queries() entry (Spark side only).

Runs each query once untimed (codegen/scan warm) then N timed runs, and
writes per-query medians to BENCH/query_sweep_r<round>.json — the
per-operator complement to bench.py's fixed headline set: bench.py tracks
drift on a frozen set; this sweep catches a NEW operator landing with an
accidentally quadratic plan or a lost broadcast before it ever reaches a
headline. Counts rows (never collect) so driver transfer doesn't pollute
the timing.

Usage: python tools/sweep_queries.py [sf_dir] [runs] [out.json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH/query_sweep.json"

    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(app_name="query-sweep")
    res = {}
    for name, fn in entrymod.queries().items():
        fn(spark, sf_dir).count()  # warm: codegen + file index
        ts = []
        for _ in range(runs):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            ts.append(round(time.monotonic() - t0, 3))
        res[name] = {"median_s": statistics.median(ts), "runs": ts, "rows": n}
        print(f"{name:28s} {statistics.median(ts):7.3f}s rows={n}")

    rec = {
        "sf_dir": sf_dir,
        "runs_per_query": runs,
        "total_median_s": round(sum(v["median_s"] for v in res.values()), 2),
        "queries": res,
    }
    Path(out).write_text(json.dumps(rec, indent=1, sort_keys=True) + "\n")
    print("wrote", out, "total", rec["total_median_s"], "s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
