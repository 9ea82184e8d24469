"""Distributed linear algebra over embedding columns (PCA leg).

One pattern: reduce the corpus to a DIMENSION-BOUNDED exact sufficient
statistic (here the int64 micro-unit Gram matrix + column sums + row
count), then solve the tiny dense problem driver-side — the standard
scalable PCA/SVD layout (a dim x dim Gram is a few KB whatever the corpus
size; only the statistic crosses the wire, never rows).

Exactness discipline (the label_centroids convention): each vector is
quantized to int64 micro-units once, every partial is an integer matrix
product, and integer sums are order-independent — so the distributed Gram
is bit-identical to a single numpy pass (pinned in tests/test_graph.py's
sibling, tests/test_quality.py). The ONLY floats appear driver-side in the
final dense eigensolve.

Why an Arrow kernel and not Catalyst: the per-row outer product is a
dim^2/2 fan-out (64 dims -> x2080 rows) that posexplode would materialize
through a shuffle; a mapInPandas partial keeps it inside one numpy matmul
per Arrow batch and emits ONE dim x dim partial per batch — the same
justification as the compression kernels (SURVEY.md §2.5). No per-row
Python anywhere.

Overflow budget: |q| <= scale * max|x|; a (i,j) accumulator grows as
n * (scale * max|x|)^2. At scale=10^6 and unit-ish embeddings that allows
~9e6 rows per PARTIAL and ~9e18 total only if summed in one step — the
final groupBy re-aggregates int64 partials, so for corpora beyond ~1e7
rows drop scale to 10^4 (documented scale rule; raising it is a one-arg
change) or add one more re-aggregation level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MU_SCALE = 10**6


def gram_stats_mu(
    df: DataFrame, col: str = "embedding", scale: int = MU_SCALE
) -> DataFrame:
    """Exact integer sufficient statistic for covariance/PCA: rows
    (i, j, g) = sum over vectors of q_i * q_j for i <= j (upper
    triangle), plus (i, -1, s_i) column sums and (-1, -1, n) the row
    count, with q = rint(x * scale) in int64.

    One mapInPandas pass emits a dim x dim partial per Arrow batch; the
    only exchange is the final (i, j)-keyed sum of those tiny partials.
    """
    import numpy as np
    import pandas as pd

    first = df.select(col).limit(1).collect()
    if not first:
        return df.sparkSession.createDataFrame(
            [], "i int, j int, g long"
        )
    dim = len(first[0][0])

    def _partials(batches):
        iu, ju = np.triu_indices(dim)
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[col].to_numpy())
            q = np.rint(m * scale).astype(np.int64)
            g = q.T @ q  # int64 matmul: exact, no BLAS float path
            s = q.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu, np.arange(dim), np.array([-1])]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [
                            ju,
                            np.full(dim, -1),
                            np.array([-1]),
                        ]
                    ).astype(np.int32),
                    "g": np.concatenate(
                        [g[iu, ju], s, np.array([len(pdf)])]
                    ).astype(np.int64),
                }
            )

    parts = df.select(col).mapInPandas(_partials, "i int, j int, g long")
    return parts.groupBy("i", "j").agg(
        F.sum("g").cast("long").alias("g")
    )


def pca_top_component(
    df: DataFrame, col: str = "embedding", scale: int = MU_SCALE
) -> DataFrame:
    """Top principal component of the (mean-centered) covariance, via the
    exact distributed Gram statistic + a driver-side dense eigensolve
    (dim x dim — O(dim^3) on a few-KB matrix). Sign fixed by making the
    largest-|loading| coordinate positive (eigenvectors are sign-
    ambiguous; the convention makes re-runs comparable). Returns
    (dim_idx, loading, explained_ratio) — explained_ratio is the top
    eigenvalue's share of total variance, constant across rows by
    construction (a one-number QA column, like pack_efficiency's fill)."""
    import numpy as np

    rows = gram_stats_mu(df, col, scale).collect()  # dim^2-bounded
    if not rows:
        return df.sparkSession.createDataFrame(
            [], "dim_idx long, loading double, explained_ratio double"
        )
    n = 0
    sums: dict[int, int] = {}
    gram: dict[tuple[int, int], int] = {}
    for r in rows:
        if r["i"] == -1:
            n = r["g"]
        elif r["j"] == -1:
            sums[r["i"]] = r["g"]
        else:
            gram[(r["i"], r["j"])] = r["g"]
    dim = max(sums) + 1
    G = np.zeros((dim, dim), dtype=np.float64)
    for (i, j), g in gram.items():
        G[i, j] = g
        G[j, i] = g
    s = np.array([sums[i] for i in range(dim)], dtype=np.float64)
    # covariance of the quantized micro-units, then back to input units
    C = (G / n - np.outer(s / n, s / n)) / (scale * scale)
    w, v = np.linalg.eigh(C)
    top = v[:, -1]
    top = top * np.sign(top[np.argmax(np.abs(top))] or 1.0)
    ratio = float(w[-1] / w.sum()) if w.sum() > 0 else 0.0
    out = [
        (int(i), float(top[i]), ratio) for i in range(dim)
    ]
    return df.sparkSession.createDataFrame(
        out, "dim_idx long, loading double, explained_ratio double"
    )
