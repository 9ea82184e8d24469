"""engine/dtw.py + q_dtw_pairs: the banded kernel is pinned against an
INDEPENDENT full-matrix reference DP (band >= n makes them identical by
construction), the metric axioms hold on fuzzed integer series, the
band is a true restriction (banded >= full), and the Spark operator
produces the K*(K-1)/2 exact pair rows deterministically."""

from __future__ import annotations

import numpy as np
import pytest

from engine.dtw import banded_dtw_l1, reference_dtw_l1


def test_kernel_matches_reference_full_band():
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 8, 40, 97):
        for _ in range(5):
            a = rng.integers(0, 50, n).astype(np.int64)
            b = rng.integers(0, 50, n).astype(np.int64)
            assert banded_dtw_l1(a, b, band=n) == reference_dtw_l1(a, b)


def test_metric_axioms():
    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(1, 60))
        a = rng.integers(0, 30, n).astype(np.int64)
        b = rng.integers(0, 30, n).astype(np.int64)
        assert banded_dtw_l1(a, a, band=5) == 0  # identity
        assert banded_dtw_l1(a, b, band=7) == banded_dtw_l1(
            b, a, band=7
        )  # symmetry (L1 cost + symmetric steps)
        assert banded_dtw_l1(a, b, band=3) >= 0


def test_band_is_a_restriction():
    # narrower bands can only raise the cost (fewer feasible paths)
    rng = np.random.default_rng(13)
    a = rng.integers(0, 40, 60).astype(np.int64)
    b = rng.integers(0, 40, 60).astype(np.int64)
    full = reference_dtw_l1(a, b)
    costs = [banded_dtw_l1(a, b, band) for band in (60, 20, 5, 1, 0)]
    assert costs[0] == full
    for wider, narrower in zip(costs, costs[1:]):
        assert narrower >= wider  # narrowing can only raise the cost
    assert costs[-1] == int(np.abs(a - b).sum())  # band 0 = diag-only


def test_known_warp_example():
    # identical shape shifted by one step warps to cost 0 except the
    # unavoidable boundary match; hand-checked DP
    a = np.array([0, 5, 0, 0], dtype=np.int64)
    b = np.array([0, 0, 5, 0], dtype=np.int64)
    assert reference_dtw_l1(a, b) == 0
    assert banded_dtw_l1(a, b, band=1) == 0
    # Euclidean-style no-warp (band 0) pays the full misalignment
    assert banded_dtw_l1(a, b, band=0) == 10


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        banded_dtw_l1(np.array([1]), np.array([1, 2]), band=3)


def test_q_dtw_pairs_spark(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    df = E.q_dtw_pairs(spark, sf)
    rows = df.collect()
    k = E.DTW_TOP_USERS
    assert len(rows) == k * (k - 1) // 2
    assert df.columns == ["u1", "u2", "n_minutes", "dtw_l1"]
    n_set = {r["n_minutes"] for r in rows}
    assert len(n_set) == 1  # every pair spans the same global grid
    assert all(r["dtw_l1"] >= 0 for r in rows)
    assert all(r["u1"] < r["u2"] for r in rows)
    # deterministic across runs (exact integer DP, fixed top-K)
    again = {
        (r["u1"], r["u2"]): r["dtw_l1"]
        for r in E.q_dtw_pairs(spark, sf).collect()
    }
    assert again == {(r["u1"], r["u2"]): r["dtw_l1"] for r in rows}
