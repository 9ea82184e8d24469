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
