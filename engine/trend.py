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
