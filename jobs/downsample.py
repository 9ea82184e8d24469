"""Downsample query CLI (the read path, SURVEY.md §3.2).

    python jobs/downsample.py --warehouse /tmp/wh --epoch 1 \
        --resolution 3600 --t0 0 --t1 86400 --anomalies-only --limit 20
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from engine.io import ParquetManifestFormat
from engine.query import downsample
from engine.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--resolution", type=int, default=3600, help="seconds")
    ap.add_argument("--t0", type=int, default=None)
    ap.add_argument("--t1", type=int, default=None)
    ap.add_argument("--doc-ids", default=None, help="comma-separated")
    ap.add_argument("--anomalies-only", action="store_true")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="downsample", master=args.master)
    fmt = ParquetManifestFormat(spark, args.warehouse)
    df = downsample(
        spark,
        fmt,
        checkpoint_epoch=args.epoch,
        doc_ids=args.doc_ids.split(",") if args.doc_ids else None,
        t0=args.t0,
        t1=args.t1,
        resolution_seconds=args.resolution,
        anomalies_only=args.anomalies_only,
    )
    df.orderBy("doc_id", "bucket").show(args.limit, truncate=False)


if __name__ == "__main__":
    main()
