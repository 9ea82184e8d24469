"""Banded dynamic-time-warping distance between minute-count series
(round 6).

DTW (Sakoe & Chiba 1978) is the series-similarity measure Pearson
correlation cannot express: two users doing the SAME thing shifted or
locally stretched in time correlate near zero but warp to a small DTW
cost. Beside q_corr_pairs (who moves with whom, synchronously) this
answers who moves with whom UP TO local time warping — mirror bots with
jitter, staged rollouts, replayed traffic.

Semantics (exact, integer end to end):
  - input series are the zero-filled minutely event counts of the top-K
    most active users over the GLOBAL minute span (corr_pairs' grid),
    so both series in a pair have identical length n;
  - local cost |a_i - b_j| (L1 on int64 counts), step pattern the
    classic symmetric (match / insert / delete), Sakoe-Chiba band
    |i - j| <= band — the standard O(n*band) DP;
  - all costs are int64, so the distance is EXACT (no float policy
    anywhere); determinism is free.

Scale shape: per-pair memory is two band-rows of the DP (O(band)), the
series themselves are span-bounded (a year = 525k int64s — the
documented fft/spectral grid budget; longer horizons pre-aggregate to a
coarser grid first). K*(K-1)/2 pairs evaluate independently inside one
Arrow batch stream.

No SQL twin exists for a DP recurrence, so the driver check is
rows-only (SURVEY §2.4, like fft_top_periods); exactness is pinned in
pytest against an independent full-matrix O(n^2) reference DP plus the
metric axioms (identity, symmetry) on fuzzed series.
"""

from __future__ import annotations

import numpy as np

_INF = np.int64(2**62)


def _pad(vals: np.ndarray, vlo: int, lo: int, hi: int) -> np.ndarray:
    """vals covers columns [vlo, vlo+len-1]; return the [lo, hi] slice
    INF-padded outside that coverage."""
    out = np.full(hi - lo + 1, _INF, dtype=np.int64)
    vhi = vlo + len(vals) - 1
    s, e = max(lo, vlo), min(hi, vhi)
    if s <= e:
        out[s - lo : e - lo + 1] = vals[s - vlo : e - vlo + 1]
    return out


def banded_dtw_l1(a: np.ndarray, b: np.ndarray, band: int) -> int:
    """Exact banded DTW with L1 local cost on int64 arrays.

    Two-row DP over the Sakoe-Chiba band; requires len(a) == len(b)
    (the dense-grid contract) so the band always contains a feasible
    path. Returns the int cost.
    """
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    n = len(a)
    if n != len(b):
        raise ValueError(f"series lengths differ: {n} != {len(b)}")
    if n == 0:
        return 0
    band = max(0, int(band))
    # band-local DP rows: prev covers columns [plo, plo+len(prev)-1];
    # storage and work are O(band) per row, never O(n)
    prev = np.empty(0, dtype=np.int64)
    plo = 0
    for i in range(n):
        lo = max(0, i - band)
        hi = min(n - 1, i + band)
        w = hi - lo + 1
        cost = np.abs(a[i] - b[lo : hi + 1])
        if i == 0:
            # first row: only horizontal moves from (0, lo..j-1)
            cur = np.cumsum(cost)
        else:
            # best NON-horizontAL predecessor per cell: min(prev[j],
            # prev[j-1]), INF-padded outside the previous row's band.
            # The horizontal recurrence cur[j] = cost[j] +
            # min(best[j], cur[j-1]) unrolls to the prefix form
            # cur[j] = C[j] + min_{k<=j}(best[k] - C[k-1]) with
            # C = cumsum(cost) — a running minimum, so the whole row
            # is a handful of vectorized band-width passes (a Python
            # scan made a 43k-minute grid take hours; this takes ms)
            up = _pad(prev, plo, lo, hi)
            diag = _pad(prev, plo, lo - 1, hi - 1)
            best = np.minimum(up, diag)
            csum = np.cumsum(cost)
            cshift = np.empty(w, dtype=np.int64)
            cshift[0] = 0
            cshift[1:] = csum[:-1]
            cur = csum + np.minimum.accumulate(best - cshift)
        prev, plo = cur, lo
    return int(prev[n - 1 - plo])


def reference_dtw_l1(a, b) -> int:
    """Independent full-matrix O(n*m) DTW used ONLY by tests to pin the
    banded kernel (band >= n makes them identical by construction)."""
    n, m = len(a), len(b)
    if n == 0 and m == 0:
        return 0
    big = float("inf")
    d = [[big] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(int(a[i - 1]) - int(b[j - 1]))
            d[i][j] = c + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
    return int(d[n][m])
