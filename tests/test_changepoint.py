"""engine/changepoint.py + q_bocpd: the truncated kernel is pinned
against an independent UNtruncated plain-Python reference recursion
(n <= R_MAX keeps truncation inactive), the physics pin requires an
injected level shift to spike p_change exactly at the shift, long-series
truncation stays a proper distribution, and the Spark operator is
deterministic with the documented constant-series exclusion."""

from __future__ import annotations

import numpy as np
import pytest

from engine.changepoint import R_MAX, bocpd, reference_bocpd


def test_kernel_matches_untruncated_reference():
    rng = np.random.default_rng(5)
    for _ in range(5):
        n = int(rng.integers(5, R_MAX))  # truncation never kicks in
        x = rng.normal(0, 1, n)
        mr, pc = bocpd(x)
        rmr, rpc = reference_bocpd(x)
        assert np.allclose(pc, np.array(rpc), rtol=1e-9, atol=1e-12)
        assert list(mr) == rmr


def test_level_shift_spikes_p_change():
    rng = np.random.default_rng(9)
    a = rng.normal(0.0, 0.3, 40)
    b = rng.normal(5.0, 0.3, 40)
    x = np.concatenate([a, b])
    mr, pc = bocpd(x)
    # the shift lands at index 40: p_change there must dominate every
    # steady-state step by an order of magnitude
    steady = np.concatenate([pc[5:40], pc[45:]])
    assert pc[40] > 0.5
    assert pc[40] > 10 * steady.max()
    # MAP run length resets across the shift and regrows
    assert mr[39] > 30
    assert mr[42] <= 3
    assert mr[-1] > 30


def test_truncation_long_series():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 5 * R_MAX)
    mr, pc = bocpd(x)
    assert len(mr) == len(pc) == 5 * R_MAX
    assert np.all(pc >= 0) and np.all(pc <= 1)
    assert np.all(mr >= 0) and np.all(mr <= R_MAX)
    assert np.all(np.isfinite(pc))


def test_constant_and_tiny_inputs():
    mr, pc = bocpd(np.zeros(10))
    assert len(mr) == 10 and np.all(np.isfinite(pc))
    mr, pc = bocpd(np.array([1.0]))
    assert len(mr) == 1


def test_q_bocpd_spark(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    df = E.q_bocpd(spark, sf)
    rows = df.collect()
    assert df.columns == ["user_id", "event_id", "map_run", "p_change"]
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    # every non-constant series emits one row per event
    assert 0 < len(rows) <= n_events
    assert all(0.0 <= r["p_change"] <= 1.0 for r in rows)
    assert all(0 <= r["map_run"] <= R_MAX for r in rows)
    # deterministic across runs
    again = {
        (r["user_id"], r["event_id"]): (r["map_run"], r["p_change"])
        for r in E.q_bocpd(spark, sf).collect()
    }
    assert again == {
        (r["user_id"], r["event_id"]): (r["map_run"], r["p_change"])
        for r in rows
    }
