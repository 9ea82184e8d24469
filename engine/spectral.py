"""Dominant-period detection per series via the periodogram (round 5).

The frequency-domain member of the per-series feature family: where
seasonal_profile / seasonality_strength score a KNOWN period (hour-of-day),
this op FINDS the dominant periods — the standard periodogram recipe
(Schuster 1898; the first step of every seasonality-discovery pipeline,
e.g. auto-period selection for STL/Prophet-style models).

Semantics per series:
  1. collapse samples to a regular per-minute grid (mean of the minute's
     values) — done IN SPARK (groupBy user, minute), so the kernel never
     sees raw-event volume;
  2. densify the grid over [first, last] minute, filling gaps with the
     series mean (gap-neutral: adds no power at any nonzero frequency);
  3. subtract the mean (kills DC), |rfft|^2 power spectrum;
  4. top-k bins by power, ties broken toward the lower bin
     (deterministic lexsort), reported as period_min = span/bin with the
     bin's share of total non-DC power.

Sequential FFT state makes this the applyInPandas family (LTTB /
mann_kendall precedent): Arrow-batched per-group NumPy, one hash exchange
on the series key. Per-group memory is the DENSE GRID length (time span /
1 minute), not the event count — a year-long series is a 525k-float
array regardless of raw volume; longer horizons should pre-aggregate to a
coarser grid first (the documented M4/rollup pre-reduction path).

No SQL twin exists for an FFT, so the driver check is rows-only
(SURVEY §2.4, like lttb_downsample); the physics is pinned in pytest by
injecting known periods into synthetic series and requiring recovery
within one bin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FFT_TOP_K = 3
_MIN_GRID = 16  # shorter grids have no meaningful spectrum


def periodogram_top(
    minutes: np.ndarray, vals: np.ndarray, k: int = FFT_TOP_K
) -> list[tuple[int, float, float]]:
    """[(rank, period_minutes, power_frac)] for one series' minute grid."""
    lo = int(minutes.min())
    n = int(minutes.max()) - lo + 1
    if n < _MIN_GRID:
        return []
    dense = np.full(n, np.nan)
    dense[minutes - lo] = vals
    mean = float(np.nanmean(dense))
    dense = np.where(np.isnan(dense), mean, dense) - mean
    spec = np.abs(np.fft.rfft(dense)) ** 2
    spec[0] = 0.0
    tot = float(spec.sum())
    if tot <= 0.0:
        return []
    order = np.lexsort((np.arange(len(spec)), -spec))
    out = []
    for r, b in enumerate(order[:k], start=1):
        if spec[b] <= 0.0:
            break
        out.append((r, n / float(b), float(spec[b] / tot)))
    return out


def fft_top_periods(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = FFT_TOP_K,
) -> DataFrame:
    """Per-key dominant periods (minutes) from the per-minute mean grid."""
    grid = (
        df.groupBy(
            F.col(key_col),
            F.expr(f"unix_timestamp({ts_col}) DIV 60").alias("_m"),
        )
        .agg(F.avg(value_col).alias("_v"))
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = periodogram_top(
            pdf["_m"].to_numpy(np.int64), pdf["_v"].to_numpy(np.float64), k
        )
        key = pdf[key_col].iloc[0]
        return pd.DataFrame(
            [(key, r, p, f) for r, p, f in rows],
            columns=[key_col, "rank", "period_min", "power_frac"],
        )

    return grid.groupBy(key_col).applyInPandas(
        run, f"{key_col} long, rank int, period_min double, power_frac double"
    )


def spectral_entropy_value(
    minutes: np.ndarray, vals: np.ndarray
) -> tuple[int, int, float] | None:
    """(n_grid, n_bins, normalized spectral entropy) for one series.

    Shannon entropy of the normalized non-DC periodogram, divided by
    ln(n_bins): 0 = all variance at one frequency (pure tone — a strongly
    periodic series), 1 = flat spectrum (white noise). The one-number
    frequency-domain complement to periodogram_top (WHICH period dominates)
    and to permutation entropy (time-domain ordinal complexity) — the
    standard EEG/vibration feature (Inouye et al. 1991). Zero-power bins
    contribute 0 (the p·ln p limit). None for short grids (< _MIN_GRID),
    constant series (no non-DC power), or a single usable bin."""
    lo = int(minutes.min())
    n = int(minutes.max()) - lo + 1
    if n < _MIN_GRID:
        return None
    dense = np.full(n, np.nan)
    dense[minutes - lo] = vals
    mean = float(np.nanmean(dense))
    dense = np.where(np.isnan(dense), mean, dense) - mean
    spec = np.abs(np.fft.rfft(dense)) ** 2
    spec = spec[1:]
    tot = float(spec.sum())
    if tot <= 0.0 or len(spec) < 2:
        return None
    p = spec[spec > 0.0] / tot
    h = float(-(p * np.log(p)).sum())
    return n, len(spec), h / float(np.log(float(len(spec))))


def spectral_entropy(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key normalized spectral entropy from the per-minute mean grid.

    Same 100 TB shape as fft_top_periods: the per-minute mean is reduced
    IN SPARK below the one series-key exchange (the kernel sees grid-sized
    groups, never raw-event volume); per-group memory is span-bounded."""
    grid = (
        df.groupBy(
            F.col(key_col),
            F.expr(f"unix_timestamp({ts_col}) DIV 60").alias("_m"),
        )
        .agg(F.avg(value_col).alias("_v"))
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        r = spectral_entropy_value(
            pdf["_m"].to_numpy(np.int64), pdf["_v"].to_numpy(np.float64)
        )
        key = pdf[key_col].iloc[0]
        rows = [] if r is None else [
            (key, r[0], r[1], round(r[2], 4))
        ]
        return pd.DataFrame(
            rows, columns=[key_col, "n_grid", "n_bins", "spec_entropy"]
        )

    return grid.groupBy(key_col).applyInPandas(
        run, f"{key_col} long, n_grid long, n_bins long, spec_entropy double"
    )
