"""LTTB visualization downsampling (round 5).

Largest-Triangle-Three-Buckets — Steinarsson, "Downsampling Time Series for
Visual Representation" (MSc thesis, University of Iceland, 2013), the
standard perceptual downsampler (Grafana/InfluxDB "lttb"): keep the point
per bucket that maximizes the triangle area with the previously kept point
and the next bucket's centroid. Complements the M4 aggregate
(__spark_entry__.q_m4_downsample): M4 is pixel-exact for line rendering at
a fixed width and is pure SQL; LTTB picks a FIXED COUNT of real points and
is inherently sequential (each choice depends on the previous one), so it
is the engine's canonical applyInPandas operator — per-series state only,
Arrow-batched, never row-at-a-time Python.

Scale shape (100 TB): one hash exchange on the series key; per-group
memory is one series (the same bound as exact quantiles / session windows);
the inner loop is O(n_out) NumPy slices over the group, not O(n * n_out).
Series too long for one group should be pre-reduced by the M4 SQL pass
(e.g. M4 to ~10x n_out, then LTTB) — the documented two-stage plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lttb_indices(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices LTTB keeps for a series already sorted by x.

    Deterministic: ties in triangle area resolve to the earliest point
    (np.argmax takes the first maximum). Returns all indices when
    n <= n_out or n_out < 3 (the algorithm needs first + last + one
    bucket; below that, downsampling to fewer than 3 points has no
    triangle to maximize and the caller gets the full series).
    """
    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # Bucket boundaries over the interior points [1, n-1); first and last
    # points are always kept (the thesis's fixed anchors). ``every`` is
    # divided once, then multiplied — the same op order as the thesis
    # pseudocode, so floor() lands on identical floats.
    every = (n - 2) / (n_out - 2)
    bounds = 1 + np.floor(
        np.arange(n_out - 1, dtype=np.float64) * every
    ).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0  # previously selected index
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        # Next bucket centroid (the final anchor point for the last bucket).
        nlo, nhi = bounds[i + 1], (bounds[i + 2] if i + 2 < n_out - 1 else n)
        if i == n_out - 3:
            nlo, nhi = n - 1, n
        cx = x[nlo:nhi].mean()
        cy = y[nlo:nhi].mean()
        bx = x[lo:hi]
        by = y[lo:hi]
        area2 = np.abs(
            (x[a] - cx) * (by - y[a]) - (x[a] - bx) * (cy - y[a])
        )
        a = lo + int(np.argmax(area2))
        out[i + 1] = a
    return out


def lttb(
    df: DataFrame,
    n_out: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Downsample each key's series to at most ``n_out`` real points.

    Output schema is exactly (key, ts, value) with the INPUT column types
    (rows are a subset of input rows — LTTB never synthesizes points).
    Rows are ordered (key, ts) within each group; ties on ts break on
    value (stable mergesort) so the selection is deterministic regardless
    of upstream row order.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    fields = {f.name: f for f in df.schema.fields}
    for c in (key_col, ts_col, value_col):
        if c not in fields:
            raise ValueError(f"missing column {c!r}")
    out_schema = "  ,".join(
        f"`{c}` {fields[c].dataType.simpleString()}"
        for c in (key_col, ts_col, value_col)
    )
    is_ts = fields[ts_col].dataType.simpleString().startswith("timestamp")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [ts_col, value_col], kind="mergesort", ignore_index=True
        )
        t = pdf[ts_col]
        # Raw int64 epoch ticks; the stored unit (us vs ns) is irrelevant
        # because LTTB's argmax is invariant under any linear rescale of x
        # (a common factor multiplies every candidate triangle area).
        xs = (
            t.astype("int64").to_numpy() / 1e9
            if is_ts
            else t.to_numpy(dtype=np.float64)
        )
        idx = lttb_indices(xs, pdf[value_col].to_numpy(np.float64), n_out)
        return pdf.iloc[idx]

    return (
        df.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(run, out_schema)
    )

def m4_prereduce(
    df: DataFrame,
    nbuckets: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bypass_under: int | None = None,
) -> DataFrame:
    """M4 preselection (Jugel et al., "M4: A Visualization-Oriented Time
    Series Data Aggregation", PVLDB 7(10), 2014) as a pure-Catalyst row
    FILTER: per key and per equal-width time bucket, keep the first, last,
    min-value and max-value REAL rows — at most ``4 * nbuckets`` rows per
    key, whatever the series length. No Python, no new rows: the output
    is a subset of input rows with the input schema.

    ``bypass_under``: series with fewer than this many points pass
    through UNreduced (the per-key count gate lttb_two_stage uses to make
    the two-stage exact on every series below the kernel bound).

    Scale shape: ONE hash exchange (the key partition); the per-key
    extent window, the bucket windows (key, bucket) and the row_number
    sorts all reuse it — HashPartitioning(key) satisfies every clustered
    distribution whose keys contain ``key``. Ties on the bucket extremes
    resolve by the full (ts, value) / (value, ts) sort, so the selection
    is deterministic regardless of upstream row order (pinned in
    tests/test_downsample.py).
    """
    if nbuckets < 1:
        raise ValueError(f"nbuckets must be >= 1, got {nbuckets}")
    fields = {f.name: f for f in df.schema.fields}
    for c in (key_col, ts_col, value_col):
        if c not in fields:
            raise ValueError(f"missing column {c!r}")
    # bucketing needs only a monotone affine image of ts: numerics cast
    # straight to double; timestamp/timestamp_ntz go through epoch micros
    # (NTZ->LTZ is a constant session-tz offset — bucket-invariant)
    if fields[ts_col].dataType.simpleString().startswith("timestamp"):
        tcol = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
    else:
        tcol = F.col(ts_col).cast("double")
    wk = Window.partitionBy(key_col)
    base = (
        df.select(key_col, ts_col, value_col)
        .withColumn("_t", tcol)
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn("_lo", F.min("_t").over(wk))
        .withColumn("_hi", F.max("_t").over(wk))
    )
    # last point maps into bucket nbuckets-1 (t == _hi would floor to
    # nbuckets); a zero-extent series lands whole in bucket 0
    bucket = F.when(
        F.col("_hi") > F.col("_lo"),
        F.least(
            F.lit(nbuckets - 1).cast("long"),
            F.floor(
                (F.col("_t") - F.col("_lo"))
                * nbuckets
                / (F.col("_hi") - F.col("_lo"))
            ),
        ),
    ).otherwise(F.lit(0).cast("long"))
    base = base.withColumn("_b", bucket)

    def wb(*order):
        return Window.partitionBy(key_col, "_b").orderBy(*order)

    ts, val = F.col(ts_col), F.col(value_col)
    keep = (
        (F.row_number().over(wb(ts.asc(), val.asc())) == 1)        # first
        | (F.row_number().over(wb(ts.desc(), val.desc())) == 1)    # last
        | (F.row_number().over(wb(val.asc(), ts.asc())) == 1)      # min
        | (F.row_number().over(wb(val.desc(), ts.desc())) == 1)    # max
    )
    if bypass_under is not None:
        keep = (F.col("_n") < bypass_under) | keep
    # window expressions are not allowed in WHERE: project the flag first
    return (
        base.withColumn("_keep", keep)
        .where("_keep")
        .select(key_col, ts_col, value_col)
    )


def lttb_two_stage(
    df: DataFrame,
    n_out: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    prereduce: int = 10,
) -> DataFrame:
    """M4 -> LTTB two-stage downsample for over-long series — the composed
    operator the round-5 record documented (this module's header): stage 1
    is the pure-SQL M4 preselection to ``prereduce * n_out`` buckets,
    stage 2 the LTTB kernel on the surviving rows.

    Contract (pinned in tests/test_downsample.py):
    - per-group kernel input is <= ``4 * prereduce * n_out`` rows however
      long the series — the last unbounded per-group kernel input in the
      engine is gone;
    - series under that bound BYPASS stage 1 (per-key count gate), so the
      output is bit-identical to direct ``lttb()`` for them;
    - longer series get the standard M4 approximation: every bucket's
      time/value extremes survive to the kernel (pixel-exact envelope),
      interior non-extreme points may differ from direct LTTB;
    - output rows are always real input rows, ordered (key, ts), exactly
      ``min(n, n_out)`` per key, endpoints always kept.

    Plan: the M4 stage and the kernel regroup share the ONE key hash
    exchange (stage 1's note) — two-stage costs the same shuffle count as
    direct lttb(), plus window sorts.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    if prereduce < 1:
        raise ValueError(f"prereduce must be >= 1, got {prereduce}")
    cap = 4 * prereduce * n_out
    reduced = m4_prereduce(
        df, prereduce * n_out, key_col, ts_col, value_col, bypass_under=cap
    )
    return lttb(reduced, n_out, key_col, ts_col, value_col)
