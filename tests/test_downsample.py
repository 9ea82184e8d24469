"""LTTB downsampler (engine/downsample.py) vs an independent scalar
reference, plus the Spark applyInPandas integration contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from engine.downsample import lttb, lttb_indices


def _lttb_reference(x, y, n_out):
    """Straight-from-the-thesis scalar implementation (Steinarsson 2013,
    Algorithm 4.2): explicit loops, no vectorization — an independent
    check on the NumPy kernel."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(np.floor(i * every)) + 1
        hi = int(np.floor((i + 1) * every)) + 1
        nlo = hi
        nhi = int(np.floor((i + 2) * every)) + 1
        if i == n_out - 3:
            nlo, nhi = n - 1, n
        nhi = min(nhi, n)
        cx = sum(x[nlo:nhi]) / (nhi - nlo)
        cy = sum(y[nlo:nhi]) / (nhi - nlo)
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (x[a] - cx) * (y[j] - y[a]) - (x[a] - x[j]) * (cy - y[a])
            )
            if area > best_area:
                best, best_area = j, area
        out.append(best)
        a = best
    out.append(n - 1)
    return out


@pytest.mark.parametrize("n,n_out", [(100, 10), (1000, 50), (57, 3), (500, 499)])
def test_kernel_matches_scalar_reference(n, n_out):
    rng = np.random.RandomState(42 + n + n_out)
    x = np.cumsum(rng.uniform(0.1, 5.0, n))
    y = rng.normal(0, 10, n).round(2)
    got = lttb_indices(x, y, n_out)
    want = _lttb_reference(list(x), list(y), n_out)
    assert list(got) == want


def test_kernel_identity_and_guard_cases():
    x = np.arange(10.0)
    y = np.ones(10)
    assert list(lttb_indices(x, y, 10)) == list(range(10))
    assert list(lttb_indices(x, y, 50)) == list(range(10))
    # flat series: areas all tie -> earliest candidate per bucket, still
    # exactly n_out points with both endpoints
    idx = lttb_indices(x, y, 5)
    assert len(idx) == 5 and idx[0] == 0 and idx[-1] == 9
    assert list(idx) == sorted(set(idx))


def test_spark_lttb_contract(spark):
    import pyspark.sql.functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_out = 25
    out = lttb(ev, n_out).cache()
    per_user = dict(
        out.groupBy("user_id").count().collect()
    )
    src_counts = dict(
        ev.groupBy("user_id").count().collect()
    )
    for u, c in per_user.items():
        assert c == min(src_counts[u], n_out), (u, c, src_counts[u])
    # every output row is a real input row
    assert (
        out.join(
            ev.select("user_id", "ts", "value"), ["user_id", "ts", "value"], "left_anti"
        ).count()
        == 0
    )
    # endpoints preserved per user
    ends = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .collect()
    )
    kept = {
        (r["user_id"], r["ts"]) for r in out.select("user_id", "ts").collect()
    }
    for r in ends:
        assert (r["user_id"], r["mn"]) in kept
        assert (r["user_id"], r["mx"]) in kept
    # schema contract: input types pass through
    in_types = {f.name: f.dataType for f in ev.schema.fields}
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (c, in_types[c]) for c in ("user_id", "ts", "value")
    ]
    # deterministic under a different upstream row order
    out2 = lttb(ev.orderBy(F.desc("event_id")), n_out)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


def test_spark_lttb_matches_kernel_per_group(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pdf = ev.toPandas()
    got = lttb(ev, 12).toPandas()
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "value"], kind="mergesort", ignore_index=True)
        xs = g["ts"].astype("int64").to_numpy() / 1e9
        idx = lttb_indices(xs, g["value"].to_numpy(np.float64), 12)
        want = g.iloc[idx][["user_id", "ts", "value"]].reset_index(drop=True)
        have = (
            got[got["user_id"] == u]
            .sort_values(["ts", "value"], kind="mergesort", ignore_index=True)[
                ["user_id", "ts", "value"]
            ]
        )
        pd.testing.assert_frame_equal(
            want.sort_values(["ts", "value"], ignore_index=True), have
        )


def test_lttb_rejects_bad_args(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="n_out"):
        lttb(ev, 2)
    with pytest.raises(ValueError, match="missing column"):
        lttb(ev, 10, value_col="nope")


def test_m4_prereduce_bounds_and_preserves_extremes(spark):
    """Stage-1 contract: per-key output <= 4 * nbuckets rows, every row a
    real input row, and every bucket's time/value extremes survive."""
    from engine.downsample import m4_prereduce

    rng = np.random.RandomState(7)
    n = 5000
    rows = [
        (1, float(i), float(v))
        for i, v in enumerate(rng.normal(0, 100, n).round(2))
    ]
    df = spark.createDataFrame(rows, "user_id int, ts double, value double")
    nb = 25
    red = m4_prereduce(df, nb, ts_col="ts").cache()
    cnt = red.count()
    assert 2 * nb <= cnt <= 4 * nb  # first/last may coincide with min/max
    assert red.join(df, ["user_id", "ts", "value"], "left_anti").count() == 0
    # global extremes (bucket extremes for their buckets) survive
    got = {(r["ts"], r["value"]) for r in red.collect()}
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    assert (pdf["ts"].min(), pdf.loc[pdf["ts"].idxmin(), "value"]) in got
    assert (pdf["ts"].max(), pdf.loc[pdf["ts"].idxmax(), "value"]) in got
    # per-bucket value extremes survive (recompute buckets independently)
    lo, hi = pdf["ts"].min(), pdf["ts"].max()
    pdf["_b"] = np.minimum(
        nb - 1, np.floor((pdf["ts"] - lo) * nb / (hi - lo)).astype(int)
    )
    for _, g in pdf.groupby("_b"):
        assert (g.loc[g["value"].idxmin(), "ts"], g["value"].min()) in got
        assert (g.loc[g["value"].idxmax(), "ts"], g["value"].max()) in got


def test_lttb_two_stage_exact_parity_under_kernel_bound(spark):
    """Series under the 4*prereduce*n_out kernel bound bypass the M4 stage:
    two-stage output is bit-identical to direct lttb() (sf0.001 events,
    ~67 points/user < 96 = bound at n_out=12, prereduce=2)."""
    from engine.downsample import lttb_two_stage

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert ev.groupBy("user_id").count().agg({"count": "max"}).collect()[0][0] < 96
    direct = lttb(ev, 12)
    two = lttb_two_stage(ev, 12, prereduce=2)
    assert direct.exceptAll(two).count() == 0
    assert two.exceptAll(direct).count() == 0


def test_lttb_two_stage_long_series_contract(spark):
    """Over the bound the M4 stage engages: exactly n_out real rows per
    key, endpoints kept, kernel input provably capped, deterministic
    under upstream row order."""
    import pyspark.sql.functions as F

    from engine.downsample import lttb_two_stage, m4_prereduce

    rng = np.random.RandomState(11)
    rows = [
        (u, float(i), float(v))
        for u in (1, 2)
        for i, v in enumerate(rng.normal(0, 50, 5000).round(2))
    ]
    df = spark.createDataFrame(rows, "user_id int, ts double, value double")
    n_out, pre = 20, 5
    cap = 4 * pre * n_out  # 400 < 5000 -> stage 1 engages
    red = m4_prereduce(df, pre * n_out, ts_col="ts", bypass_under=cap)
    per_key = dict(red.groupBy("user_id").count().collect())
    assert all(c <= cap for c in per_key.values()), per_key
    out = lttb_two_stage(df, n_out, ts_col="ts", prereduce=pre).cache()
    assert dict(out.groupBy("user_id").count().collect()) == {1: n_out, 2: n_out}
    assert out.join(df, ["user_id", "ts", "value"], "left_anti").count() == 0
    kept = {(r["user_id"], r["ts"]) for r in out.collect()}
    assert (1, 0.0) in kept and (1, 4999.0) in kept
    assert (2, 0.0) in kept and (2, 4999.0) in kept
    out2 = lttb_two_stage(
        df.orderBy(F.desc("value")), n_out, ts_col="ts", prereduce=pre
    )
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


def test_lttb_two_stage_single_shuffle(spark):
    """The M4 windows, the count gate, and the LTTB regroup all reuse the
    ONE key hash exchange — two-stage costs the same shuffle count as
    direct lttb()."""
    from engine.downsample import lttb_two_stage

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = lttb_two_stage(ev, 12)._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, f"expected 1 shuffle, got {n}:\n{plan[:2000]}"
