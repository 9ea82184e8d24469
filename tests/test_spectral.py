"""engine/spectral.py: periodogram dominant-period detection — known-period
recovery, kernel determinism, and operator contracts."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_periodogram_recovers_injected_periods():
    from engine.spectral import periodogram_top

    n = 1440  # one day of minutes
    m = np.arange(n, dtype=np.int64)
    # two clean cycles: 60-minute (strong) + 180-minute (weaker)
    v = 5.0 * np.sin(2 * np.pi * m / 60) + 2.0 * np.sin(2 * np.pi * m / 180)
    rows = periodogram_top(m, v)
    assert rows[0][0] == 1 and abs(rows[0][1] - 60) < 60 / (n / 60)  # < 1 bin
    assert abs(rows[1][1] - 180) < 180 / (n / 180)
    assert rows[0][2] > rows[1][2] > 0
    # power shares of two pure tones dominate the spectrum
    assert rows[0][2] + rows[1][2] > 0.95

    # gaps filled with the mean must not invent a period
    keep = np.ones(n, dtype=bool)
    keep[np.arange(7, n, 11)] = False  # aperiodic-ish 9% gap pattern
    rows_g = periodogram_top(m[keep], v[keep])
    assert abs(rows_g[0][1] - 60) < 2.0

    # constant series -> no non-DC power -> empty
    assert periodogram_top(m, np.full(n, 3.3)) == []
    # too-short grid -> empty
    assert periodogram_top(m[:8], v[:8]) == []


def test_fft_top_periods_operator(spark):
    from engine.spectral import fft_top_periods

    # two users, different injected periods, built as real timestamped rows
    rows = []
    for uid, period in ((1, 30), (2, 120)):
        for i in range(720):
            rows.append(
                (
                    uid,
                    i,
                    f"2024-01-01 00:00:00",
                    float(np.sin(2 * np.pi * i / period)),
                    i * 60,
                )
            )
    df = (
        spark.createDataFrame(
            rows, "user_id long, event_id long, base string, value double, off long"
        )
        .select(
            "user_id",
            "event_id",
            F.expr("to_timestamp(base) + make_interval(0,0,0,0,0,0,off)").alias("ts"),
            "value",
        )
    )
    got = {}
    for r in fft_top_periods(df).collect():
        got.setdefault(r["user_id"], []).append(r)
    for uid, period in ((1, 30), (2, 120)):
        top = sorted(got[uid], key=lambda r: r["rank"])[0]
        assert abs(top["period_min"] - period) < 2.0, (uid, top)
        assert top["power_frac"] > 0.8
    # schema contract
    assert set(got[1][0].asDict()) == {"user_id", "rank", "period_min", "power_frac"}


def test_spectral_entropy_physics():
    """Pure tone -> near 0; white noise -> near 1; constant/short -> None;
    gap-filled tone stays low (mean fill adds no power at nonzero bins)."""
    from engine.spectral import spectral_entropy_value

    n = 1440
    m = np.arange(n, dtype=np.int64)
    tone = 5.0 * np.sin(2 * np.pi * m / 60)
    r = spectral_entropy_value(m, tone)
    assert r is not None and r[0] == n and r[1] == n // 2
    assert r[2] < 0.25, r

    rng = np.random.default_rng(7)
    noise = rng.normal(0.0, 1.0, n)
    rn = spectral_entropy_value(m, noise)
    assert rn is not None and rn[2] > 0.85, rn

    # ordering is the contract: tone is MUCH more ordered than noise
    assert r[2] < rn[2] - 0.5

    keep = np.ones(n, dtype=bool)
    keep[np.arange(7, n, 11)] = False
    rg = spectral_entropy_value(m[keep], tone[keep])
    assert rg is not None and rg[2] < 0.4, rg

    assert spectral_entropy_value(m, np.full(n, 3.3)) is None
    assert spectral_entropy_value(m[:8], tone[:8]) is None


def test_spectral_entropy_operator(spark):
    """Operator contract on real timestamped rows: the periodic user
    scores well below the noise user; schema/keying stable."""
    from engine.spectral import spectral_entropy

    rows = []
    rng = np.random.default_rng(11)
    for i in range(720):
        ts = f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00"
        rows.append((1, ts, 5.0 * float(np.sin(2 * np.pi * i / 60))))
        rows.append((2, ts, float(rng.normal(0.0, 1.0))))
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    got = {
        r["user_id"]: r for r in spectral_entropy(df).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["n_grid"] == 720 and got[1]["n_bins"] == 360
    assert got[1]["spec_entropy"] < 0.3
    assert got[2]["spec_entropy"] > 0.8
