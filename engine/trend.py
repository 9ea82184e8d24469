"""Mann-Kendall trend test + Sen's slope (round 5).

The classic nonparametric monotonic-trend pair (Mann 1945, Kendall 1975;
Sen 1968, "Estimates of the regression coefficient based on Kendall's
tau") — the standard "is this series drifting?" test used on exactly the
per-series metric streams this engine rolls up, and the robust complement
to the OLS `trend_slope` query (one wild point moves OLS; it moves at most
one pairwise slope here).

Semantics (per series, rows ordered by (ts, event_id) — the deterministic
order every window query in this engine uses, so simultaneous samples
contribute a well-defined pair orientation in BOTH engines):

  S        = sum over ordered pairs i<j of sign(c_j - c_i), on int64 cents
  var_num  = n(n-1)(2n+5) - SUM_ties t(t-1)(2t+5)   (exact int64; the
             classic tie-corrected variance is var_num/18)
  z        = (S-1)/sqrt(var_num/18)  if S>0   (continuity-corrected)
             (S+1)/sqrt(var_num/18)  if S<0
             0                        if S==0; NULL when var_num==0
  sen      = median over pairs with dt>0 of (dc/100) * 86400e6/dt_us
             (value units per day), equal-timestamp pairs excluded

Exactness contract: S, var_num and n are integers; z is a fixed spelling
of deterministic IEEE ops; the Sen median NEVER goes through an engine's
median() (interpolation spelling differs across engines in the last ulp) —
instead both sides rank the slope multiset by (slope, dc, dt) and average
the middle one/two elements as sum/count, which is bit-identical, so the
query emits UNROUNDED doubles and still hash-matches the DuckDB pairwise
oracle.

Scale shape (100 TB): one hash exchange on the series key (applyInPandas,
Arrow-batched — the LTTB precedent in engine/downsample.py); per-group
cost is the O(n^2) pair set that Sen's estimator is DEFINED over, kept as
two vectorized NumPy outer differences, with a hard MAX_MK_N guard that
names the documented pre-reduction path (collapse to per-minute/M4 first)
instead of silently allocating n^2 — a 10^6-point series is a user error
for this estimator, not a planning problem. (S alone has an O(n log n)
mergesort/Fenwick form; it is pointless while Sen is quadratic by
definition.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2-sided 5% normal critical value, pinned literal shared with the oracle.
MK_Z_CRIT = 1.959963985
# Pair-set guard: 8192 points -> 64M int64 pair cells, ~0.5 GiB transient.
MAX_MK_N = 8192

_OUT_SCHEMA = (
    "user_id long, n long, s_stat long, var_num long, "
    "z double, sen_slope_day double, trend string"
)


def _mk_one(c: np.ndarray, usec: np.ndarray) -> tuple:
    """Exact MK statistics for one series already in (ts, event_id) order."""
    n = len(c)
    iu, ju = np.triu_indices(n, 1)
    dc = c[ju] - c[iu]
    dt = usec[ju] - usec[iu]
    s = int(np.sign(dc).sum())
    _, t = np.unique(c, return_counts=True)
    t = t[t > 1].astype(np.int64)
    var_num = int(n) * (n - 1) * (2 * n + 5) - int(
        (t * (t - 1) * (2 * t + 5)).sum()
    )
    pos = dt > 0
    if pos.any():
        dcp, dtp = dc[pos], dt[pos]
        sl = dcp.astype(np.float64) / 100.0 * 86400000000.0 / dtp.astype(
            np.float64
        )
        order = np.lexsort((dtp, dcp, sl))
        m = len(sl)
        lo, hi = (m + 1) // 2 - 1, (m + 2) // 2 - 1
        picked = sl[order[lo]] if lo == hi else sl[order[lo]] + sl[order[hi]]
        sen = float(picked / (1.0 if lo == hi else 2.0))
    else:
        sen = None
    if var_num == 0:
        z = None
    elif s > 0:
        z = (s - 1) / np.sqrt(var_num / 18.0)
    elif s < 0:
        z = (s + 1) / np.sqrt(var_num / 18.0)
    else:
        z = 0.0
    if z is None:
        trend = None
    elif z > MK_Z_CRIT:
        trend = "increasing"
    elif z < -MK_Z_CRIT:
        trend = "decreasing"
    else:
        trend = "no trend"
    return n, s, var_num, z, sen, trend


def mann_kendall(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-key Mann-Kendall S/var/z/trend + Sen's slope (units/day)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["_usec", order_col], kind="mergesort", ignore_index=True
        )
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                columns=[
                    "user_id", "n", "s_stat", "var_num",
                    "z", "sen_slope_day", "trend",
                ]
            )
        if n > MAX_MK_N:
            raise ValueError(
                f"mann_kendall: series {pdf[key_col].iloc[0]!r} has {n} "
                f"points > MAX_MK_N={MAX_MK_N}; Sen's estimator is "
                "pairwise by definition — pre-reduce the series first "
                "(per-minute collapse / q_m4_downsample), as for LTTB"
            )
        row = _mk_one(
            pdf["_c"].to_numpy(np.int64), pdf["_usec"].to_numpy(np.int64)
        )
        return pd.DataFrame(
            [(pdf[key_col].iloc[0],) + row],
            columns=[
                "user_id", "n", "s_stat", "var_num",
                "z", "sen_slope_day", "trend",
            ],
        )

    return (
        df.select(
            F.col(key_col),
            F.col(order_col),
            # parquet ts is TIMESTAMP_NTZ; session TZ is pinned UTC
            # (engine/session.py), so the cast is a pure reinterpretation
            # and unix_micros == DuckDB epoch_us on the same value
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_usec"),
            F.round(F.col(value_col) * 100).cast("long").alias("_c"),
        )
        .groupBy(key_col)
        .applyInPandas(run, _OUT_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Seasonal-Hybrid ESD (S-H-ESD) top-k outliers
# ---------------------------------------------------------------------------

# Fixed iteration count: the engine emits the k strongest candidates with
# their ESD statistic; thresholding against a t-distribution critical value
# is a presentation-layer concern (no scipy in the runtime, and a pinned
# rational approximation of the t-quantile would risk the exactness
# contract for zero analytical value).
SHESD_K = 3
# Series shorter than this are skipped outright: median/MAD of a handful of
# points is not a defensible outlier test, and the floor keeps the oracle
# trivially identical (HAVING count(*) >= SHESD_MIN_N).
SHESD_MIN_N = 20

_SHESD_SCHEMA = (
    "user_id long, anom_rank int, event_id long, ts timestamp, "
    "esd_stat double"
)


def shesd_outliers(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    k: int = SHESD_K,
    min_n: int = SHESD_MIN_N,
) -> DataFrame:
    """Seasonal-Hybrid ESD outliers per series (Hochenbaum, Vallis &
    Kejariwal 2017, "Automatic Anomaly Detection in the Cloud Via
    Statistical Learning" — the Twitter AnomalyDetection algorithm;
    Rosner 1983 generalized ESD, with the 'hybrid' median/MAD
    robustification).

    Pinned semantics (integer-exact on both engines):
      1. c        = int64 cents; slot = hour-of-day (the engine's season,
                    as in seasonality_strength / seasonal_profile).
      2. sm2      = 2 * median(c) per (series, slot) — exact int64 (a
                    median of ints is an int or int+0.5).
      3. r2       = 2*c - sm2: the seasonally adjusted residual in
                    half-cents (int64).
      4. iterate i = 1..k over the remaining rows of each series:
           med4 = 2 * median(r2)        (int64, quarter-cent scale)
           dev4 = |2*r2 - med4|         (int64 per row)
           mad8 = 2 * median(dev4)      (int64)
           stop if mad8 == 0 (constant remainder: no defensible outlier)
           pick argmax dev4, ties by (ts, order) ascending; emit
           esd_stat = (2*dev4)/mad8 = |r - med|/MAD rounded HALF-UP in
           the integer domain: ((4e4*dev4 + mad8) // (2*mad8)) / 1e4;
           remove the picked row and continue.
      Series with fewer than min_n rows emit nothing.

    Scale shape (100 TB): one hash exchange on (series, slot) for the
    seasonal medians (percentile window, no join), one on the series key
    for the Arrow-batched kernel; per-group state is one int64 vector of
    the series' own length with k<=3 passes over it — the same bounded-
    series contract as mann_kendall, minus the O(n^2) pair set (this
    kernel is O(k * n log n)).
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "anom_rank", "event_id", "ts", "esd_stat"]
        n = len(pdf)
        if n < min_n:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(
            [ts_col, order_col], kind="mergesort", ignore_index=True
        )
        r2 = pdf["_r2"].to_numpy(np.int64)
        alive = np.ones(n, dtype=bool)
        out = []
        for rank in range(1, k + 1):
            vals = r2[alive]
            med4 = int(2 * np.median(vals))  # exact: |vals| << 2^52
            dev4 = np.abs(2 * vals - med4)
            mad8 = int(2 * np.median(dev4))
            if mad8 == 0:
                break
            # first max in (ts, order) ascending order == the SQL
            # tiebreak ORDER BY dev DESC, ts, order LIMIT 1
            j_alive = int(np.argmax(dev4))
            j = int(np.flatnonzero(alive)[j_alive])
            stat = ((40000 * int(dev4[j_alive]) + mad8) // (2 * mad8)) / 1e4
            out.append(
                (
                    int(pdf[key_col].iloc[0]),
                    rank,
                    int(pdf[order_col].iloc[j]),
                    pdf[ts_col].iloc[j],
                    stat,
                )
            )
            alive[j] = False
        return pd.DataFrame(out, columns=cols)

    from pyspark.sql import Window

    ws = Window.partitionBy(key_col, "_slot")
    base = df.select(
        F.col(key_col),
        F.col(order_col),
        F.col(ts_col),
        F.hour(ts_col).alias("_slot"),
        F.round(F.col(value_col) * 100).cast("long").alias("_c"),
    ).withColumn(
        "_sm2",
        (F.lit(2) * F.expr("percentile(_c, 0.5)").over(ws)).cast("long"),
    )
    resid = base.select(
        key_col,
        order_col,
        ts_col,
        (2 * F.col("_c") - F.col("_sm2")).alias("_r2"),
    )
    return resid.groupBy(key_col).applyInPandas(run, _SHESD_SCHEMA)
