"""Mann-Kendall + Sen's slope (engine/trend.py) — brute-force parity and
contracts. The third implementation here is scalar Python straight from
the definitions (double loop over pairs, statistics.median), independent
of BOTH the vectorized NumPy kernel and the DuckDB pairwise-join oracle."""

from __future__ import annotations

import statistics

import numpy as np
import pytest


def _brute(c, usec):
    n = len(c)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            d = c[j] - c[i]
            s += (d > 0) - (d < 0)
            dt = usec[j] - usec[i]
            if dt > 0:
                slopes.append(d / 100.0 * 86400000000.0 / dt)
    ties = {}
    for v in c:
        ties[v] = ties.get(v, 0) + 1
    tt = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_num = n * (n - 1) * (2 * n + 5) - tt
    sen = statistics.median(slopes) if slopes else None
    return s, var_num, sen


def test_mk_kernel_matches_bruteforce():
    from engine.trend import _mk_one

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 40))
        # coarse grid forces value ties; repeated usecs force dt==0 pairs
        c = rng.integers(-5, 6, n).astype(np.int64) * 25
        usec = np.sort(rng.integers(0, 8, n).astype(np.int64) * 43_200_000_000)
        got_n, s, var_num, z, sen, trend = _mk_one(c, usec)
        bs, bvar, bsen = _brute(c.tolist(), usec.tolist())
        assert (got_n, s, var_num) == (n, bs, bvar), trial
        if bsen is None:
            assert sen is None, trial
        else:
            # statistics.median averages the two middles as (a+b)/2 —
            # the same spelling as the kernel's rank-picked sum/count
            assert sen == pytest.approx(bsen, abs=1e-12), trial
        if var_num == 0:
            assert z is None and trend is None, trial
        elif s == 0:
            assert z == 0.0 and trend == "no trend", trial


def test_mk_trend_labels_and_z_sign():
    from engine.trend import MK_Z_CRIT, _mk_one

    up = np.arange(40, dtype=np.int64) * 100
    usec = np.arange(40, dtype=np.int64) * 60_000_000
    n, s, var_num, z, sen, trend = _mk_one(up, usec)
    assert s == 40 * 39 // 2 and trend == "increasing" and z > MK_Z_CRIT
    assert sen == pytest.approx(100 / 100.0 * 86400000000.0 / 60_000_000)
    n, s, var_num, z, sen, trend = _mk_one(up[::-1].copy(), usec)
    assert trend == "decreasing" and z < -MK_Z_CRIT and sen < 0
    flat = np.full(10, 700, dtype=np.int64)
    n, s, var_num, z, sen, trend = _mk_one(flat, usec[:10])
    assert s == 0 and var_num == 0 and z is None and trend is None
    assert sen == 0.0  # pairs exist, every slope is 0


def test_mk_operator_guard_and_small_groups(spark):
    from engine.trend import MAX_MK_N, mann_kendall

    df = spark.createDataFrame(
        [(1, i, f"2024-01-0{1 + i}T00:00:00", 1.0 * i) for i in range(3)]
        + [(2, 99, "2024-01-01T00:00:00", 5.0)],
        "user_id long, event_id long, ts_s string, value double",
    ).select(
        "user_id",
        "event_id",
        F_to_ts("ts_s").alias("ts"),
        "value",
    )
    rows = {r["user_id"]: r for r in mann_kendall(df).collect()}
    # singleton series are excluded, not emitted as NULL rows
    assert set(rows) == {1}
    assert rows[1]["n"] == 3 and rows[1]["s_stat"] == 3
    assert rows[1]["trend"] == "no trend"  # n=3 can't reach z=1.96

    big = spark.range(MAX_MK_N + 1).selectExpr(
        "1 as user_id",
        "id as event_id",
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) as ts",
        "cast(id as double) as value",
    )
    with pytest.raises(Exception, match="MAX_MK_N"):
        mann_kendall(big).collect()


def F_to_ts(col):
    from pyspark.sql import functions as F

    return F.to_timestamp(F.col(col).cast("string"))
