"""R1-R4: rolling statistics + threshold anomaly detection (SURVEY.md §2.0).

PINNED SPEC (SURVEY.md §2.1 — the reference mount was empty, §0.1; this spec
is implemented twice, here and in engine/oracle.py, and the pytest gate
asserts per-row equality between the two):

    ma[i] = NULL                    if fewer than w non-null values in the
                                    trailing w-slot window (pandas
                                    rolling(w, min_periods=w).mean())
          = mean(v[i-w+1 .. i])     otherwise (trailing, not centered)
    sd[i] = same mask, std(..., ddof=1)  (sample std)
    score[i] = NULL                 if sd[i] NULL or sd[i] == 0 or v[i] NULL
             = |v[i] - ma[i]| / sd[i]
    is_anom[i] = score[i] > k       (strict >; NULL score -> false)
    detect(series) = sorted [t where is_anom[t]]

Everything is native window functions — no UDFs — so the hot path stays
inside whole-stage codegen (SURVEY.md §2.5 rule). The window partitions by
doc_id: high-cardinality, so skew lives in `source`, not here (§7 risk
register), and the same doc_id shuffle is shared with gap-fill and rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.schema import DEFAULT_K, DEFAULT_WINDOW


def _series_cum_window() -> Window:
    return (
        Window.partitionBy("doc_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )


def with_rolling_stats(
    points: DataFrame, w: int = DEFAULT_WINDOW, exact_mode: str = "long"
) -> DataFrame:
    """R1+R2: add ``ma`` and ``sd`` columns (NULL-masked head/partial windows).

    The min-periods mask is ``count(v) over frame == w``: at the series head
    the frame holds < w rows, and any remaining null v (unfilled leading gap)
    also lowers the count — exactly pandas rolling(w).mean()/std() semantics.

    BIT-EXACTNESS (the BASELINE.json:15 gate): sd is NOT stddev_samp.
    Spark's stddev_samp is a Welford/central-moment recurrence and pandas'
    rolling .std() is a sliding-sum kernel; the two drift by tens of ulps.
    Instead both the engine and the oracle compute the closed form over
    EXACT integer window sums (decimal here, Python bigints in the oracle):

        num = w * sum(v^2) - sum(v)^2        # exact integer, >= 0
        sd  = sqrt(double(num) / (w*(w-1)))  # identical 3-op float sequence
        ma  = double(sum(v)) / w

    Every float op is correctly rounded and executed in the same order on
    both sides, so results are bit-identical — and more accurate than either
    library kernel (<= 2 roundings + sqrt vs accumulated streaming error).
    decimal(10,0) -> products decimal(21,0) -> window sums decimal(31,0)
    never overflow for int32 tokens at w <= ~100. Still pure Catalyst window
    aggregates: no UDF, stays inside whole-stage codegen.
    """
    if w < 2:
        raise ValueError(f"window must be >= 2 for a sample std, got {w}")

    # O(n) PREFIX-SUM FORM, not a sliding frame. Spark re-aggregates a
    # ROWS BETWEEN -(w-1) AND CURRENT frame from scratch for every row
    # (O(n*w) buffer updates), whereas the UNBOUNDED PRECEDING frame is
    # incremental and lag() is O(1)/row. The trailing-w window sum is
    # recovered exactly as cum[i] - cum[i-w]: pure integer arithmetic, so
    # results stay bit-identical to the direct form and to the oracle.
    #
    # exact_mode picks the integer carrier for the cumulative sums:
    #   'long'    — fast path (JVM longs, whole-stage-codegen friendly).
    #               Exact while n_tok * max(v)^2 < 2^63; with real vocab ids
    #               (< 2^20) that allows ~8e6-point series, and with
    #               v < 2^18 (our synth) ~1.3e8 points. ANSI mode is ON, so
    #               an out-of-range input FAILS LOUDLY (ARITHMETIC_OVERFLOW)
    #               instead of silently wrapping — rerun with 'decimal'.
    #   'decimal' — decimal(38) carriers: exact for the full int32 x int32
    #               domain, ~10x slower (BigDecimal churn, measured).
    # Both paths produce bit-identical ma/sd (same integers, same final
    # float op sequence).
    if exact_mode not in ("long", "decimal"):
        raise ValueError(f"exact_mode must be 'long' or 'decimal', got {exact_mode!r}")
    cum = _series_cum_window()
    off = Window.partitionBy("doc_id").orderBy("t")
    if exact_mode == "long":
        vl = F.col("v").cast("long")
        zero = F.lit(0).cast("long")
        c1 = F.sum(vl).over(cum)
        c2 = F.sum(vl * vl).over(cum)
        s1 = F.coalesce(c1, zero) - F.coalesce(F.lag(c1, w).over(off), zero)
        s2 = F.coalesce(c2, zero) - F.coalesce(F.lag(c2, w).over(off), zero)
        # num = w*s2 - s1^2 <= 2*w^2*max(v)^2: fits long for |v| < ~2^26
        num = F.lit(w).cast("long") * s2 - s1 * s1
    else:
        vd = F.col("v").cast("decimal(10,0)")
        zero20 = F.lit(0).cast("decimal(20,0)")
        zero31 = F.lit(0).cast("decimal(31,0)")
        c1 = F.sum(vd).over(cum)
        c2 = F.sum(vd * vd).over(cum)
        s1 = F.coalesce(c1, zero20) - F.coalesce(F.lag(c1, w).over(off), zero20)
        s2 = F.coalesce(c2, zero31) - F.coalesce(F.lag(c2, w).over(off), zero31)
        num = (F.lit(w).cast("decimal(38,0)") * s2).cast("decimal(38,0)") - (
            s1.cast("decimal(19,0)") * s1.cast("decimal(19,0)")
        ).cast("decimal(38,0)")
    cc = F.count("v").over(cum)
    full = (cc - F.coalesce(F.lag(cc, w).over(off), F.lit(0))) == w
    ma = F.when(full, s1.cast("double") / F.lit(float(w)))
    sd = F.when(full, F.sqrt(num.cast("double") / F.lit(float(w * (w - 1)))))
    return points.withColumn("ma", ma).withColumn("sd", sd)


def with_anomaly_score(points_with_stats: DataFrame) -> DataFrame:
    """R3: score = |v - ma| / sd, NULL-safe (NULL when sd NULL/0 or v NULL)."""
    score = F.when(
        F.col("sd").isNotNull() & (F.col("sd") != 0) & F.col("v").isNotNull(),
        F.abs(F.col("v") - F.col("ma")) / F.col("sd"),
    )
    return points_with_stats.withColumn("score", score)


def with_detect_flag(scored: DataFrame, k: float = DEFAULT_K) -> DataFrame:
    """R4: is_anom = score > k (strict), NULL score -> false."""
    return scored.withColumn(
        "is_anom", F.coalesce(F.col("score") > F.lit(float(k)), F.lit(False))
    )


def detect(
    points: DataFrame,
    w: int = DEFAULT_WINDOW,
    k: float = DEFAULT_K,
    exact_mode: str = "long",
) -> DataFrame:
    """R1->R4 fused: points -> per-point stats + flag.

    One logical pass; Catalyst collapses the three withColumn stages into a
    single Window + Project over one doc_id-partitioned sort.
    """
    return with_detect_flag(
        with_anomaly_score(with_rolling_stats(points, w, exact_mode)), k
    )


def detect_indices(
    points: DataFrame,
    w: int = DEFAULT_WINDOW,
    k: float = DEFAULT_K,
    exact_mode: str = "long",
) -> DataFrame:
    """R4 list form: (doc_id, anomalies: array<long> sorted asc)."""
    flagged = detect(points, w, k, exact_mode)
    return flagged.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("is_anom"), F.col("t")))
        ).alias("anomalies")
    )
