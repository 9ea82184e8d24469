"""Fused doc-level pipeline: gap-fill -> rolling stats -> detect -> 1m
rollup -> compression in ONE Arrow pass over the raw token table, with NO
shuffle of raw points.

Why this exists (round-2 scaling work): the exploded pipeline must shuffle
and sort every point (t-per-row) to feed the doc_id-partitioned windows —
at 196.6M points that exchange+sort saturates one machine's memory/disk
bandwidth and caps N->4N core scaling at ~0.5-0.7. But the B:15 input is
row-per-doc with the WHOLE series in one array: every per-series operator
(G1 gap-fill, R1-R4 stats/detect, A1 bucket rollup, C1/C2 compression) is a
pure function of one row. So the scale path maps each Arrow batch of doc
rows through vectorized NumPy kernels and emits finished rollup rows; the
only exchange left in the job is bucketing the ~60x smaller aggregate
output for the partitioned write. This is exactly the sanctioned shape —
"pyspark.sql DataFrame + vectorized pandas/Arrow UDFs (no per-row Python)
throughout" (BASELINE.json:15).

BIT-EXACTNESS: identical to the exploded path (pinned by
tests/test_fused.py, which asserts row-set equality against
rollup_from_points / rollup_1m_with_payloads on the parity fixture):
  - same exact integer window sums (int64 cumsum differences);
  - same final float sequence ma = double(s1)/w,
    sd = sqrt(double(num)/(w*(w-1))), score = |v - ma|/sd
    (engine/stats.py docstring);
  - same compression kernels (engine/compression.py — single
    implementation).
Overflow policy mirrors the 'long' stats carrier: the kernel checks
n * max(v)^2 < 2^62 per doc and FAILS LOUDLY, directing the caller to the
exploded pipeline with the decimal carrier (int32-extreme domains).

Arrow batch sizing: one row here is a whole series (n_tok values), so the
caller must size spark.sql.execution.arrow.maxRecordsPerBatch in ROWS OF
DOCS (jobs/rollup.py uses 2048 => ~64 MB per batch at 8192-token docs),
not the point-stream default.
"""

from __future__ import annotations

import numpy as np

from engine.schema import DEFAULT_K, DEFAULT_WINDOW, EPOCH0_EPOCH_SECONDS, TIER_SECONDS
from engine.series import GAP_POLICIES

_ROLLUP_COLS = [
    "doc_id", "bucket", "cnt", "vmin", "vmax", "vsum", "vmean",
    "anom_cnt", "first_v", "last_v", "ts_dod", "v_gorilla",
]
_ROLLUP_DDL = (
    "doc_id string, bucket long, cnt long, vmin int, vmax int, "
    "vsum long, vmean double, anom_cnt long, first_v int, "
    "last_v int, ts_dod binary, v_gorilla binary"
)


def _gap_fill_np(vf: np.ndarray, policy: str) -> np.ndarray:
    """Vectorized G1 over one series (float64, NaN = gap). Pinned semantics
    of engine/series.py; all three policies leave NaN only as a PREFIX."""
    valid = ~np.isnan(vf)
    if policy == "zero":
        return np.where(valid, vf, 0.0)
    n = vf.size
    prev = np.where(valid, np.arange(n), -1)
    np.maximum.accumulate(prev, out=prev)
    ff = np.where(prev >= 0, vf[np.maximum(prev, 0)], np.nan)
    if policy == "ffill":
        return ff
    # linear: interior gaps get exact integer floor interpolation; leading
    # stay NaN, trailing forward-fill (already in ff)
    nxt = np.where(valid, np.arange(n), n)
    nxt = np.minimum.accumulate(nxt[::-1])[::-1]
    out = ff
    interior = (~valid) & (prev >= 0) & (nxt < n)
    if interior.any():
        i = np.flatnonzero(interior)
        p, q = prev[i], nxt[i]
        pv = vf[p].astype(np.int64)
        qv = vf[q].astype(np.int64)
        num = pv * (q - i) + qv * (i - p)
        out[i] = np.floor_divide(num, q - p).astype(np.float64)
    return out


def _anom_flags(vf: np.ndarray, w: int, k: float) -> np.ndarray:
    """Vectorized R1-R4 over one gap-filled series -> boolean flags.

    Valid values are a contiguous suffix (gap-fill invariant), so the
    min-periods mask is simply 'window start >= first valid index'.
    """
    n = vf.size
    anom = np.zeros(n, dtype=bool)
    valid = ~np.isnan(vf)
    if not valid.any():
        return anom
    fv = int(np.argmax(valid))
    m = n - fv
    if m < w:
        return anom
    iv = vf[fv:].astype(np.int64)
    maxabs = int(np.max(np.abs(iv))) if m else 0
    # Two exact-int64 domain bounds (both must hold, both FAIL LOUDLY):
    #   m*max^2   >= cumsum c2 (and c1 when max>=1)        -> < 2^62
    #   (w*max)^2 >= both s1*s1 and w*s2 in num=w*s2-s1^2  -> < 2^63
    # The second was missing in round 2 (ADVICE r02 medium): w=30 with
    # |v|~3.9e8 passed the first bound yet s1^2 ~1.4e20 wrapped silently.
    if m * maxabs * maxabs >= 2**62 or (w * maxabs) ** 2 >= 2**63:
        raise ValueError(
            "fused kernel: exact int64 domain exceeded "
            f"(n={m}, w={w}, max|v|={maxabs}: need n*max^2 < 2^62 and "
            "(w*max)^2 < 2^63); rerun with pipeline='exploded' "
            "and stats_mode='decimal' (engine/stats.py)"
        )
    c1 = np.concatenate(([0], np.cumsum(iv)))
    c2 = np.concatenate(([0], np.cumsum(iv * iv)))
    s1 = c1[w:] - c1[:-w]
    s2 = c2[w:] - c2[:-w]
    num = w * s2 - s1 * s1
    ma = s1.astype(np.float64) / float(w)
    sd = np.sqrt(num.astype(np.float64) / float(w * (w - 1)))
    cur = iv[w - 1 :].astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        score = np.abs(cur - ma) / sd
    anom[fv + w - 1 :] = (sd > 0) & (score > float(k))
    return anom


def _doc_rollup_cols(
    vf: np.ndarray,
    anom: np.ndarray,
    b: int,
    compress: bool,
) -> tuple:
    """A1 (+C1/C2) over one gap-filled series -> per-bucket column arrays
    (every bucket in [0, ceil(n/b)) is emitted, cnt=0 buckets included —
    identical to the exploded groupBy, which sees the null points too).

    Returns typed NumPy columns, not row tuples: the batch assembler
    concatenates them into columnar pandas (nullable Int arrays), so the
    pandas -> Arrow trip back to the JVM never walks Python objects —
    measured 3-5 s/task of per-cell conversion at 200k output rows
    otherwise."""
    from engine.compression import dod_compress, gorilla_compress

    n = vf.size
    valid = ~np.isnan(vf)
    starts = np.arange(0, n, b)
    cnts = np.add.reduceat(valid.astype(np.int64), starts)
    sums = np.add.reduceat(np.where(valid, vf, 0.0).astype(np.int64), starts)
    vmins = np.minimum.reduceat(np.where(valid, vf, np.inf), starts)
    vmaxs = np.maximum.reduceat(np.where(valid, vf, -np.inf), starts)
    firsts = np.minimum.reduceat(np.where(valid, np.arange(n), n), starts)
    lasts = np.maximum.reduceat(np.where(valid, np.arange(n), -1), starts)
    anoms = np.add.reduceat(anom.astype(np.int64), starts)
    empty = cnts == 0
    # sums is exactly int; float64 division == Catalyst double(vsum)/cnt
    with np.errstate(divide="ignore", invalid="ignore"):
        vmeans = sums.astype(np.float64) / cnts.astype(np.float64)
    safe_first = np.where(empty, 0, np.minimum(firsts, n - 1)).astype(np.int64)
    safe_last = np.where(empty, 0, np.maximum(lasts, 0)).astype(np.int64)
    payloads_t: list | None = None
    payloads_v: list | None = None
    if compress:
        payloads_t, payloads_v = [], []
        for s in starts.tolist():
            e = min(s + b, n)
            tv = np.flatnonzero(valid[s:e]) + s
            payloads_t.append(dod_compress(tv))
            payloads_v.append(gorilla_compress(vf[tv].astype(np.int64)))
    return (
        np.arange(len(starts), dtype=np.int64),  # bucket
        cnts,
        np.where(empty, 0, vmins).astype(np.int64),
        np.where(empty, 0, vmaxs).astype(np.int64),
        sums,
        vmeans,
        anoms,
        # empty buckets gather a NaN — zero it before the int cast (the
        # value is masked out downstream; this only silences the cast)
        np.where(empty, 0.0, vf[safe_first]).astype(np.int64),
        np.where(empty, 0.0, vf[safe_last]).astype(np.int64),
        empty,
        payloads_t,
        payloads_v,
    )


def fused_rollup_1m(
    tokens_df,
    w: int = DEFAULT_WINDOW,
    k: float = DEFAULT_K,
    policy: str = "ffill",
    compress: bool = True,
    tier: str = "1m",
):
    """The shuffle-free 1m tier: token table -> finished rollup rows.

    mapInPandas over the raw rows — each doc is self-contained, so the
    operator is NARROW (no exchange, no sort). Returns the standard rollup
    schema incl. bucket_ts; payload columns are NULL when compress=False.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    if policy not in GAP_POLICIES:
        raise ValueError(f"unknown gap-fill policy {policy!r}; one of {GAP_POLICIES}")
    b = TIER_SECONDS[tier]
    w_, k_, policy_, compress_ = int(w), float(k), policy, bool(compress)

    def run_batches(batches):
        for pdf in batches:
            docs = pdf["doc_id"].tolist()
            toks = pdf["tokens"].tolist()
            doc_ids: list = []
            nb_per_doc: list = []
            cols: list[list] = [[] for _ in range(10)]
            pay_t: list = []
            pay_v: list = []
            for doc_id, arr in zip(docs, toks):
                if arr is None:
                    continue
                vf = np.asarray(arr, dtype=np.float64)
                if vf.size == 0:
                    continue
                vf = _gap_fill_np(vf, policy_)
                anom = _anom_flags(vf, w_, k_)
                out = _doc_rollup_cols(vf, anom, b, compress_)
                doc_ids.append(doc_id)
                nb_per_doc.append(out[0].size)
                for i in range(10):
                    cols[i].append(out[i])
                if compress_:
                    pay_t.extend(out[10])
                    pay_v.extend(out[11])
            if not doc_ids:
                continue
            bucket, cnt, vmin, vmax, vsum, vmean, anom_cnt, first_v, last_v, empty = (
                np.concatenate(c) for c in cols
            )

            def nullable(vals, mask, dtype):
                return pd.arrays.IntegerArray(vals.astype(dtype), mask.copy())

            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        np.array(doc_ids, dtype=object), nb_per_doc
                    ),
                    "bucket": bucket,
                    "cnt": cnt,
                    "vmin": nullable(vmin, empty, np.int32),
                    "vmax": nullable(vmax, empty, np.int32),
                    "vsum": nullable(vsum, empty, np.int64),
                    "vmean": np.where(empty, np.nan, vmean),
                    "anom_cnt": anom_cnt,
                    "first_v": nullable(first_v, empty, np.int32),
                    "last_v": nullable(last_v, empty, np.int32),
                    "ts_dod": pd.Series(pay_t, dtype=object)
                    if compress_
                    else pd.Series([None] * len(bucket), dtype=object),
                    "v_gorilla": pd.Series(pay_v, dtype=object)
                    if compress_
                    else pd.Series([None] * len(bucket), dtype=object),
                }
            )

    out = tokens_df.select("doc_id", "tokens").mapInPandas(run_batches, _ROLLUP_DDL)
    return out.withColumn(
        "bucket_ts",
        F.timestamp_seconds(F.lit(EPOCH0_EPOCH_SECONDS) + F.col("bucket") * F.lit(b)),
    ).select(
        "doc_id", "bucket", "bucket_ts", "cnt", "vmin", "vmax", "vsum",
        "vmean", "anom_cnt", "first_v", "last_v", "ts_dod", "v_gorilla",
    )
