"""Error-bound tests for the approximate operators: A4 HLL++ cardinality
(round-2 verdict task #8 — the one unverified §2 row) and ANN recall@10 vs
its exact brute-force twin (task #4)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_approx_distinct_error_bound(spark):
    """approx_count_distinct (A4) relative error < 2% vs exact distinct at
    the default rsd=0.05, on cardinalities bracketing the bench scales."""
    from engine.rollup import approx_distinct_docs

    for n in (500, 20_000):
        df = spark.range(n * 3).select(
            F.format_string("doc_%08d", (F.col("id") % n).cast("int")).alias("doc_id")
        )
        approx = approx_distinct_docs(df).collect()[0]["approx_docs"]
        assert abs(approx - n) / n < 0.02, (n, approx)


def test_ann_recall_vs_bruteforce(spark):
    """ANN-LSH top-10 must recover >= 80% of the exact cosine top-10 on the
    sf0.01 fixture (2 hash tables, ~32-vector target buckets, Hamming-2
    multi-probe — the recall floor the round-4 probe radius is sized for),
    and every returned cosine must match the exact ranking's value for
    that vec_id."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    exact = {r["vec_id"]: r["cos_sim"] for r in E.q_embedding_topk(spark, sf).collect()}
    ann = {r["vec_id"]: r["cos_sim"] for r in E.q_ann_lsh_topk(spark, sf).collect()}
    hits = set(exact) & set(ann)
    recall = len(hits) / len(exact)
    assert recall >= 0.8, (recall, sorted(exact), sorted(ann))
    for vid in hits:
        assert abs(exact[vid] - ann[vid]) < 1e-9


def test_ivf_recall_vs_bruteforce(spark):
    """IVF top-10 (8 cells, nprobe=3) must recover >= 50% of the exact
    cosine top-10 on the sf0.01 fixture, and every returned cosine must be
    the exact value for that vec_id. The floor sits below the LSH twin's
    0.8 deliberately: UNIFORM random vectors are IVF's adversarial case —
    there is no cluster structure for cells to capture, so true neighbours
    scatter across cells roughly uniformly and probing 3/8 of the cells
    recovers ~probed-fraction of them (measured: 0.6, deterministic — md5
    centroid seeds, fixed fixture; raising nprobe to 4 does not move it).
    On clustered production embeddings the neighbourhood concentrates in
    one or two cells and recall approaches 1 at the same probed fraction;
    the operator docstring carries the K/nprobe scale rule."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    exact = {r["vec_id"]: r["cos_sim"] for r in E.q_embedding_topk(spark, sf).collect()}
    ivf = {r["vec_id"]: r["cos_sim"] for r in E.q_ann_ivf_topk(spark, sf).collect()}
    hits = set(exact) & set(ivf)
    assert len(hits) / len(exact) >= 0.5, (sorted(exact), sorted(ivf))
    for vid in hits:
        assert abs(exact[vid] - ivf[vid]) < 1e-9


def test_dedup_clusters_are_consistent(spark):
    """Connected components of the verified near-dup graph: every edge's
    endpoints share a cluster_id, every cluster_id is the lexicographic
    min of its members (the deterministic representative), and every
    clustered doc appears in at least one qualifying pair."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    labels = {r["doc_id"]: r["cluster_id"]
              for r in E.q_dedup_clusters(spark, sf).collect()}
    pairs = [
        (r["d1"], r["d2"])
        for r in E._jaccard_pairs(spark, sf)
        .where(F.col("jaccard") >= E.DEDUP_MIN_JACCARD).collect()
    ]
    assert pairs and labels
    docs_in_pairs = {d for p in pairs for d in p}
    assert set(labels) == docs_in_pairs
    for a, b in pairs:
        assert labels[a] == labels[b], (a, b)
    by_cluster: dict = {}
    for d, c in labels.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_embedding_near_dup_pairs_recall_and_exactness(spark):
    """Corpus-wide embedding near-dup pairs: every reported pair's cosine
    is exact (matches the brute-force value) and >= the threshold; LSH
    candidate recall vs ALL true pairs is pinned at the deterministic
    fixture value (~0.3 at cos 0.4 — the fixture is random vectors, a hard
    angle for 2x4-plane LSH; at the production near-dup regime cos>=0.95
    the per-pair collision probability is ~0.88, see the operator
    docstring)."""
    import duckdb
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    got = {(r["d1"], r["d2"]): r["cos_sim"]
           for r in E.q_embedding_near_dups(spark, sf).collect()}
    # brute-force truth via numpy
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    M = np.array([r[1] for r in rows], dtype=np.float64)
    ids = [r[0] for r in rows]
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    true = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            c = round(float(S[a, b]), 4)
            if c >= E.EMB_NEARDUP_COS:
                true[(ids[a], ids[b])] = c
    assert true, "fixture should contain pairs at the demo threshold"
    for pair, c in got.items():
        assert pair in true and abs(true[pair] - c) < 1e-9, pair
    recall = len(got) / len(true)
    assert recall >= 0.25, (recall, len(got), len(true))


def test_stat_queries_match_numpy_reference(spark):
    """trend_slope / psi_drift / ks_drift vs straight-line NumPy
    re-implementations — a third implementation independent of BOTH the
    Spark plan and the DuckDB oracle SQL, so a shared conceptual bug in
    the twin pair can't hide. Tolerance 5e-4 (the queries round to 4 dp;
    NumPy aggregates in yet another float order)."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["c"] = (ev["value"] * 100).round().astype(np.int64)

    # --- trend_slope
    got = {
        r["user_id"]: r
        for r in E.q_trend_slope(spark, sf).collect()
    }
    for uid, g in ev.groupby("user_id"):
        # datetime64[s] is unit-safe: the parquet column is stored in
        # microseconds, so a raw int64 view would be 1e6-scaled
        x = g["ts"].to_numpy(dtype="datetime64[s]").astype(np.int64)
        x = (x - x.min()).astype(np.float64)
        y = g["c"].to_numpy(np.float64) / 100.0
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got[uid]
        assert abs(row["slope_day"] - slope * 86400) < 5e-4, uid
        assert abs(row["intercept"] - intercept) < 5e-4, uid
        assert abs(row["r2"] - r * r) < 5e-4, uid

    # --- psi_drift / ks_drift (shared binning)
    lo, hi = ev["c"].min(), ev["c"].max()
    psi_got = {r["event_type"]: r["psi"] for r in E.q_psi_drift(spark, sf).collect()}
    ks_got = {r["event_type"]: r["ks"] for r in E.q_ks_drift(spark, sf).collect()}
    for nbins, out in ((10, "psi"), (100, "ks")):
        bins = ((ev["c"] - lo) * nbins // (hi - lo + 1)).to_numpy()
        pooled = np.bincount(bins, minlength=nbins).astype(np.float64)
        for et, g in ev.groupby("event_type"):
            cnt = np.bincount(
                ((g["c"] - lo) * nbins // (hi - lo + 1)).to_numpy(),
                minlength=nbins,
            ).astype(np.float64)
            if out == "psi":
                p = (cnt + 1) / (cnt.sum() + nbins)
                q = (pooled + 1) / (pooled.sum() + nbins)
                want = float(np.sum((p - q) * np.log(p / q)))
                assert abs(psi_got[et] - want) < 5e-4, et
            else:
                d = np.abs(
                    np.cumsum(cnt) / cnt.sum() - np.cumsum(pooled) / pooled.sum()
                ).max()
                assert abs(ks_got[et] - d) < 5e-4, et


def test_pettitt_and_seasonality_match_numpy_reference(spark):
    """pettitt_change / seasonality_strength vs straight-from-definition
    NumPy re-implementations — Pettitt as the brute-force double sum
    U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j) (NOT the rank identity the
    engine/oracle pair share, so a bug in the doubled-midrank algebra
    cannot hide), and seasonality strength as literal per-hour residual
    sums of squares. Integer stats (k_stat, change_t) must match exactly;
    the float p-value/strength to 5e-4 (4-6 dp rounding + NumPy's own
    summation order)."""
    import math

    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["c"] = (ev["value"] * 100).round().astype(np.int64)

    pet = {r["user_id"]: r for r in E.q_pettitt_change(spark, sf).collect()}
    sea = {
        r["user_id"]: r
        for r in E.q_seasonality_strength(spark, sf).collect()
    }
    assert set(pet) == set(ev["user_id"].unique())
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        x = g["c"].to_numpy(np.float64)
        n = len(x)
        sgn = np.sign(x[:, None] - x[None, :])
        u = np.array(
            [sgn[: t + 1, t + 1 :].sum() for t in range(n - 1)]
        )
        au = np.abs(u)
        k = int(au.max())
        t_star = int(au.argmax()) + 1  # earliest-t tie-break == argmax
        row = pet[uid]
        assert row["k_stat"] == k, uid
        assert row["change_t"] == t_star, uid
        assert row["n"] == n, uid
        p = min(1.0, 2 * math.exp(-6 * k * k / (n**3 + n**2)))
        assert abs(row["p_approx"] - p) < 5e-4, uid

        # seasonality strength: literal one-way ANOVA decomposition
        hod = g["ts"].dt.hour.to_numpy()
        sst = float(((x - x.mean()) ** 2).sum())
        ssw = sum(
            float(((x[hod == h] - x[hod == h].mean()) ** 2).sum())
            for h in np.unique(hod)
        )
        srow = sea[uid]
        if sst > 0:
            assert abs(srow["seasonal_strength"] - (1 - ssw / sst)) < 5e-4, uid
        else:
            assert srow["seasonal_strength"] is None, uid
        means = {
            h: x[hod == h].mean() for h in np.unique(hod)
        }
        best = max(means.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        worst = min(means.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert srow["peak_hour"] == best, uid
        assert srow["trough_hour"] == worst, uid


def test_winsorize_and_corr_match_numpy_reference(spark):
    """winsorized_stats / corr_to_global vs literal NumPy: np.clip at
    np.percentile(linear) for the winsorized mean, np.corrcoef on the
    minutely count series — independent of both the Spark plan and the
    DuckDB oracle's decomposed integer forms."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["c"] = (ev["value"] * 100).round().astype(np.int64)
    ev["minute"] = ev["ts"].to_numpy(dtype="datetime64[s]").astype(np.int64) // 60

    win = {r["user_id"]: r for r in E.q_winsorized_stats(spark, sf).collect()}
    cor = {r["user_id"]: r for r in E.q_corr_to_global(spark, sf).collect()}

    gm = ev.groupby("minute").size()
    for uid, g in ev.groupby("user_id"):
        c = g["c"].to_numpy(np.float64)
        lo, hi = np.percentile(c, [5, 95], method="linear")
        row = win[uid]
        assert abs(row["p05"] - lo / 100) < 5e-4, uid
        assert abs(row["p95"] - hi / 100) < 5e-4, uid
        assert row["n_clipped"] == int(((c < lo) | (c > hi)).sum()), uid
        assert abs(row["wmean"] - np.clip(c, lo, hi).mean() / 100) < 5e-4, uid

        um = g.groupby("minute").size()
        x = um.to_numpy(np.float64)
        y = gm.loc[um.index].to_numpy(np.float64)
        row = cor[uid]
        assert row["n_minutes"] == len(x), uid
        if len(x) > 1 and x.std() > 0 and y.std() > 0:
            r = float(np.corrcoef(x, y)[0, 1])
            assert abs(row["corr_global"] - r) < 5e-4, uid
        else:
            assert row["corr_global"] is None, uid


def test_tfidf_and_benford_match_reference(spark):
    """tfidf_top_terms / first_digit_profile vs literal Python
    re-implementations (collections.Counter tf-idf; string-slice Benford
    digits) — independent of both twin engines' relational forms."""
    import math
    from collections import Counter

    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    tfs = {r.doc_id: Counter(r.text.split(" ")) for r in docs.itertuples()}
    dfc = Counter(t for tf in tfs.values() for t in tf)
    nd = float(len(docs))
    got = E.q_tfidf_top_terms(spark, sf).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(tfs)
    for doc_id, rows in by_doc.items():
        scored = sorted(
            (
                (-tf * math.log((nd + 1) / (dfc[t] + 1)), t)
                for t, tf in tfs[doc_id].items()
            )
        )[:3]
        assert [r["term"] for r in sorted(rows, key=lambda r: r["rn"])] == [
            t for _, t in scored
        ], doc_id
        for r in rows:
            assert r["tf"] == tfs[doc_id][r["term"]]
            assert r["df"] == dfc[r["term"]]
            want = r["tf"] * math.log((nd + 1) / (r["df"] + 1))
            assert abs(r["tfidf"] - want) < 5e-6, (doc_id, r["term"])

    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["c"] = (ev["value"] * 100).round().astype(np.int64).abs()
    ev = ev[ev["c"] > 0]
    ev["digit"] = ev["c"].astype(str).str[0].astype(int)
    prof = E.q_first_digit_profile(spark, sf).collect()
    for r in prof:
        sub = ev[ev["event_type"] == r["event_type"]]
        n = len(sub)
        obs = int((sub["digit"] == r["digit"]).sum())
        exp = n * E.BENFORD_P[r["digit"] - 1]
        assert r["n"] == n and r["obs"] == obs, r
        assert abs(r["expected"] - exp) < 5e-4, r
        assert abs(r["chi2_term"] - (obs - exp) ** 2 / exp) < 5e-4, r


def test_concurrency_sweep_invariants_and_interval_probe(spark):
    """concurrency_sweep: global invariants (every session's +1 has a -1,
    so the final prefix is 0 and no prefix is negative) plus an
    independent interval-counting probe — at sampled change points the
    concurrency must equal the number of [start, end) session intervals
    (pandas-derived, 5-min-gap islands) covering that second."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    rows = E.q_concurrency_sweep(spark, sf).collect()
    assert rows[-1]["concurrency"] == 0
    assert min(r["concurrency"] for r in rows) >= 0
    assert max(r["concurrency"] for r in rows) >= 1

    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    sec = ev["ts"].to_numpy(dtype="datetime64[s]").astype(np.int64)
    # epoch() in the twins is fractional: break on true time diff > 300 s
    frac = ev["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) / 1e6
    uid = ev["user_id"].to_numpy()
    new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
    gap = np.concatenate([[True], np.diff(frac) > 300])
    sid = np.cumsum(new_user | gap)
    df = pd.DataFrame({"sid": sid, "sec": sec})
    g = df.groupby("sid")["sec"]
    starts, ends = g.min().to_numpy(), g.max().to_numpy() + 300
    for r in rows[:: max(1, len(rows) // 50)]:
        t = r["sec"]
        want = int(((starts <= t) & (t < ends)).sum())
        assert r["concurrency"] == want, (t, r["concurrency"], want)


def test_transitions_and_burstiness_match_numpy_reference(spark):
    """type_transitions / burstiness vs literal NumPy/Counter forms —
    transition probabilities from raw bigram counting, burstiness from
    np.std/np.mean of the gap array (population ddof=0, matching the
    multiplied-through closed form)."""
    from collections import Counter

    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )

    trans = Counter()
    for _, g in ev.groupby("user_id"):
        ts = g["event_type"].tolist()
        trans.update(zip(ts[:-1], ts[1:]))
    from_tot = Counter()
    for (a, _), c in trans.items():
        from_tot[a] += c
    got = E.q_type_transitions(spark, sf).collect()
    assert {(r["from_type"], r["to_type"]) for r in got} == set(trans)
    for r in got:
        key = (r["from_type"], r["to_type"])
        assert r["cnt"] == trans[key], key
        assert abs(r["prob"] - trans[key] / from_tot[key[0]]) < 5e-6, key

    burst = {r["user_id"]: r for r in E.q_burstiness(spark, sf).collect()}
    for uid, g in ev.groupby("user_id"):
        sec = g["ts"].to_numpy(dtype="datetime64[s]").astype(np.int64)
        d = np.diff(sec).astype(np.float64)
        if len(d) == 0:
            assert uid not in burst
            continue
        row = burst[uid]
        assert row["n_gaps"] == len(d)
        assert abs(row["mean_gap_s"] - d.mean()) < 5e-4, uid
        mu, sig = d.mean(), d.std()
        if len(d) >= 2 and sig + mu > 0:
            assert abs(row["burstiness"] - (sig - mu) / (sig + mu)) < 5e-4, uid
        else:
            assert row["burstiness"] is None, uid


def test_hampel_and_seasonal_naive_match_numpy_reference(spark):
    """hampel_filter / seasonal_naive_error vs straight-from-definition
    pandas/NumPy forms — the Hampel identifier as literal np.median over
    each trailing 15-window (NOT the sort_array/element_at spelling the
    engine/oracle pair share), the seasonal-naive base as a linear scan
    for the latest per-second max at least 86400 s older. Integer stats
    (is_spike, n_scored) must match exactly; the rounded floats to
    5e-4."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["c"] = (ev["value"] * 100).round().astype(np.int64)

    # --- hampel_filter
    got = {r["event_id"]: r for r in E.q_hampel_filter(spark, sf).collect()}
    assert len(got) == len(ev)
    w, k = E.HAMPEL_W, E.HAMPEL_K
    n_spikes = 0
    for _, g in ev.sort_values(["user_id", "ts", "event_id"]).groupby(
        "user_id"
    ):
        cs = g["c"].to_numpy()
        for i, eid in enumerate(g["event_id"]):
            row = got[eid]
            if i + 1 < w:
                assert row["rolling_med"] is None, eid
                assert row["is_spike"] is None, eid
                continue
            win = cs[i + 1 - w : i + 1]
            med = float(np.median(win))
            mad = float(np.median(np.abs(win - med)))
            assert abs(row["rolling_med"] - med / 100) < 5e-4, eid
            assert abs(row["rolling_mad"] - mad / 100) < 5e-4, eid
            want = int(abs(cs[i] - med) > k * mad)
            assert row["is_spike"] == want, eid
            n_spikes += want
    # the fixture must actually exercise both branches
    assert n_spikes > 0

    # --- seasonal_naive_error
    got = {
        r["user_id"]: r
        for r in E.q_seasonal_naive_error(spark, sf).collect()
    }
    assert got, "fixture spans <24h: seasonal-naive base never exists"
    ev["sec"] = ev["ts"].to_numpy(dtype="datetime64[s]").astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        p = g.groupby("sec")["c"].max().sort_index()
        secs, mx = p.index.to_numpy(), p.to_numpy()
        errs = []
        for i in range(len(secs)):
            j = np.searchsorted(secs, secs[i] - 86400, side="right") - 1
            if j >= 0:
                errs.append(mx[i] - mx[j])
        if not errs:
            assert uid not in got, uid
            continue
        e = np.asarray(errs, dtype=np.float64)
        row = got[uid]
        assert row["n_scored"] == len(e), uid
        assert abs(row["mae"] - np.abs(e).mean() / 100) < 5e-4, uid
        assert abs(row["bias"] - e.mean() / 100) < 5e-4, uid


def test_approx_quantiles_rank_error_bound(spark):
    """q_approx_quantiles (GK sketch, accuracy=10000) vs the exact
    per-type percentile: the returned value must sit within rank
    epsilon = 1e-4 of the requested quantile, checked by computing each
    estimate's true rank in the exact sorted values. (Value-distance is
    the wrong metric for a rank sketch; rank-distance is the GK
    guarantee.)"""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in E.q_approx_quantiles(spark, sf).collect()}
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["c"] = (ev["value"] * 100).round().astype(np.int64)
    for et, g in ev.groupby("event_type"):
        vals = np.sort(g["c"].to_numpy())
        n = len(vals)
        assert got[et]["n"] == n
        for q, col in ((0.50, "p50"), (0.95, "p95"), (0.99, "p99")):
            est_c = int(round(got[et][col] * 100))
            # rank band of the estimate in the exact multiset
            lo = np.searchsorted(vals, est_c, side="left")
            hi = np.searchsorted(vals, est_c, side="right") - 1
            target = q * (n - 1)
            # epsilon*n plus one element of slack for the discrete grid
            slack = 1e-4 * n + 1
            assert lo - slack <= target <= hi + slack, (et, col, lo, hi, target)


def test_winnowing_guarantee_and_sparsity(spark):
    """The SIGMOD'03 winnowing contract on crafted docs: two documents
    sharing a token run of length >= w+k-1 share at least one
    fingerprint; unrelated random-token docs (almost surely) don't; and
    the selected set is sparse (<< gram count). Also: short docs
    (< k tokens) emit nothing rather than erroring."""
    import random

    from __spark_entry__ import WINNOW_K, WINNOW_W, _winnow

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(5000)]
    shared = " ".join(rng.choice(vocab) for _ in range(WINNOW_W + WINNOW_K - 1))

    def rand_text(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    docs = [
        (0, rand_text(30) + " " + shared + " " + rand_text(30)),
        (1, rand_text(40) + " " + shared + " " + rand_text(20)),
        (2, rand_text(80)),
        (3, "a b c"),  # < k tokens -> no grams -> no rows
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {}
    for r in _winnow(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert 3 not in fps
    assert fps[0] & fps[1], "shared >= w+k-1 run must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    # sparsity: ~2/(w+1) of grams retained; allow generous slack
    n_grams0 = len(docs[0][1].split()) - WINNOW_K + 1
    assert len(fps[0]) < 0.75 * n_grams0


def test_hjorth_params_match_numpy_reference(spark):
    """hjorth_params vs literal np.var/np.diff forms — a third
    implementation independent of the shared int64 sufficient-statistic
    algebra, so a bug in the n·Σx²−(Σx)² spelling can't hide."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in E.q_hjorth_params(spark, sf).collect()}
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["c"] = (ev["value"] * 100).round().astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        x = g["c"].to_numpy(np.float64)
        d = np.diff(x)
        dd = np.diff(d)
        row = got[uid]
        assert row["n"] == len(x)
        vx, vd = np.var(x), np.var(d)
        assert abs(row["activity"] - vx / 1e4) < max(5e-4, 1e-9 * vx), uid
        if vx == 0:
            assert row["mobility"] is None
            continue
        mob = np.sqrt(vd / vx)
        assert abs(row["mobility"] - mob) < 5e-6 * max(1.0, mob), uid
        if vd == 0 or len(dd) == 0:
            assert row["complexity"] is None
            continue
        comp = np.sqrt(np.var(dd) / vd) / mob
        assert abs(row["complexity"] - comp) < 5e-6 * max(1.0, comp), uid


def test_activity_gini_matches_scalar_reference(spark):
    """activity_gini vs the textbook O(n log n) scalar Gini (sort, then
    G = (2Σi·x_i − (n+1)Σx)/(nΣx)) and vs the definitional mean-absolute-
    difference double loop on a small prefix — two independent forms."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    row = E.q_activity_gini(spark, sf).collect()[0]
    ev = pd.read_parquet(f"{sf}/events.parquet")
    x = np.sort(ev.groupby("user_id").size().to_numpy(np.int64))
    n, s = len(x), int(x.sum())
    assert row["n_users"] == n and row["n_events"] == s
    g_rank = (2 * int((np.arange(1, n + 1) * x).sum()) - (n + 1) * s) / (n * s)
    assert abs(row["gini"] - g_rank) < 5e-5
    # definitional: mean absolute difference / (2 * mean)
    mad = np.abs(x[:, None] - x[None, :]).mean()
    assert abs(g_rank - mad / (2 * x.mean())) < 1e-12


def test_winnow_pairs_detects_shared_span_via_operator_parts(spark):
    """winnow_pairs mechanics on crafted docs routed through the same
    Spark expressions: two docs sharing a long span pair up with
    shared_fps >= WINNOW_MIN_SHARED; unrelated docs don't pair; a
    fingerprint hotter than WINNOW_MAX_FP cannot create pairs."""
    import random

    from __spark_entry__ import (
        WINNOW_MAX_FP,
        WINNOW_MIN_SHARED,
        _winnow,
    )
    from pyspark.sql import Window as W

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(4000)]
    span = " ".join(rng.choice(vocab) for _ in range(20))
    boiler = " ".join(rng.choice(vocab) for _ in range(8))

    docs = [(0, span + " " + " ".join(rng.choice(vocab) for _ in range(25))),
            (1, " ".join(rng.choice(vocab) for _ in range(25)) + " " + span)]
    # WINNOW_MAX_FP+1 docs that share ONLY the boilerplate snippet
    for i in range(2, 2 + WINNOW_MAX_FP + 1):
        docs.append((i, boiler + " " + " ".join(rng.choice(vocab) for _ in range(30))))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    fp = _winnow(df)
    w = W.partitionBy("fp")
    kept = fp.select("doc_id", "fp", F.count("*").over(w).alias("df")).where(
        F.col("df") <= WINNOW_MAX_FP
    )
    a = kept.select(F.col("doc_id").alias("d1"), "fp")
    b = kept.select(F.col("doc_id").alias("d2"), "fp")
    pairs = {
        (r["d1"], r["d2"]): r["shared"]
        for r in a.join(b, "fp")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= WINNOW_MIN_SHARED)
        .collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= WINNOW_MIN_SHARED
    # the boilerplate-only docs must NOT appear in any pair: their only
    # shared fingerprints exceed the hotness cap
    flat = {d for p in pairs for d in p}
    assert flat == {0, 1}, pairs


def test_label_centroids_match_numpy_reference(spark):
    """label_centroids vs np.mean over the stacked per-label matrix."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {
        (r["label"], r["dim"]): r
        for r in E.q_label_centroids(spark, sf).collect()
    }
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    for label, g in emb.groupby("label"):
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        means = m.mean(axis=0)
        for d in range(m.shape[1]):
            row = got[(label, d)]
            assert row["n"] == len(g)
            assert abs(row["mean"] - means[d]) < 6e-5, (label, d)
    assert len(got) == emb["label"].nunique() * m.shape[1]


def test_gap_profile_matches_numpy_reference(spark):
    """gap_profile vs a literal np.unique/np.diff minute-grid scan."""
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in E.q_gap_profile(spark, sf).collect()}
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["m"] = ev["ts"].to_numpy(dtype="datetime64[s]").astype(np.int64) // 60
    for uid, g in ev.groupby("user_id"):
        m = np.unique(g["m"].to_numpy())
        d = np.diff(m)
        row = got[uid]
        assert row["present_min"] == len(m)
        span = int(m.max() - m.min() + 1)
        assert row["span_min"] == span
        assert row["missing_min"] == span - len(m)
        assert row["n_gaps"] == int((d > 1).sum())
        assert row["longest_gap_min"] == (int(d.max() - 1) if (d > 1).any() else 0)
        assert abs(row["coverage"] - len(m) / span) < 5e-5


def _write_clustered_embeddings(spark, path, k=8, per=50, dim=16, seed=3):
    """Synthetic CLUSTERED embeddings fixture (the r5 verdict's ask: the
    uniform fixture is IVF's adversarial case and was carrying the recall
    caveat). k Gaussian clusters, noise sigma 0.05 around unit-ish
    centers; vec_id 0 (the query by convention) is a member of cluster 0,
    so its true top-10 concentrates in one or two cells."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1.0, (k, dim))
    rows = []
    vid = 0
    for c in range(k):
        for _ in range(per):
            v = centers[c] + rng.normal(0, 0.05, dim)
            rows.append((vid, c, v.astype(np.float32).tolist()))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    spark.createDataFrame(
        pdf, "vec_id long, label int, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def test_ivf_lloyd_recall_on_clustered_fixture(spark, tmp_path):
    """Lloyd-refined IVF on a CLUSTERED fixture: recall@10 >= 0.9 at
    nprobe 3/8 (measured 1.0 — the query's neighbourhood lives in one
    refined cell), every returned cosine exact vs brute force. Also
    records that the refinement never degrades the seed-centroid variant
    on this fixture."""
    import __spark_entry__ as E

    sf = str(tmp_path / "clustered")
    _write_clustered_embeddings(spark, sf)
    exact = {r["vec_id"]: r["cos_sim"] for r in E.q_embedding_topk(spark, sf).collect()}
    lloyd = {r["vec_id"]: r["cos_sim"] for r in E.q_ann_ivf_lloyd_topk(spark, sf).collect()}
    seedv = {r["vec_id"]: r["cos_sim"] for r in E.q_ann_ivf_topk(spark, sf).collect()}
    assert len(exact) == 10
    recall_lloyd = len(set(exact) & set(lloyd)) / len(exact)
    recall_seed = len(set(exact) & set(seedv)) / len(exact)
    assert recall_lloyd >= 0.9, (recall_lloyd, sorted(exact), sorted(lloyd))
    assert recall_lloyd >= recall_seed, (recall_lloyd, recall_seed)
    for vid in set(exact) & set(lloyd):
        assert abs(exact[vid] - lloyd[vid]) < 1e-9


def test_ivf_lloyd_recall_vs_bruteforce_uniform(spark):
    """Lloyd IVF on the uniform sf0.01 fixture: the same >= 0.5 floor as
    the seed-centroid variant (uniform data has no structure for Lloyd to
    find; the clustered fixture above is where refinement shows), cosines
    exact."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    exact = {r["vec_id"]: r["cos_sim"] for r in E.q_embedding_topk(spark, sf).collect()}
    ivf = {r["vec_id"]: r["cos_sim"] for r in E.q_ann_ivf_lloyd_topk(spark, sf).collect()}
    hits = set(exact) & set(ivf)
    assert len(hits) / len(exact) >= 0.5, (sorted(exact), sorted(ivf))
    for vid in hits:
        assert abs(exact[vid] - ivf[vid]) < 1e-9


def test_pii_scan_counts_match_graft_closed_form(spark):
    """pii_scan on sf0.001: the deterministic graft (see _pii_augmented)
    plants exactly 1 email (+1 when doc_id % 3 == 0), 1 phone, 1 IPv4
    per doc and the corpus itself contains none, so the detector's
    per-doc counts have a closed form — any deviation is a regex or
    augmentation bug, not data noise."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    for r in E.q_pii_scan(spark, sf).collect():
        want_email = 2 if r["doc_id"] % 3 == 0 else 1
        assert r["n_email"] == want_email, r
        assert r["n_phone"] == 1, r
        assert r["n_ipv4"] == 1, r


def test_pii_redact_leaves_no_residual_matches(spark):
    """After redaction, zero residual hits for ANY of the three patterns
    (the invariant the scrub stage exists for), and every placeholder
    appears: n_email emails -> [EMAIL] etc. Counted with regexp_count on
    the REDACTED text, i.e. the operator's own output contract rather
    than its implementation."""
    import __spark_entry__ as E
    from __spark_entry__ import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        _pii_augmented,
        _t,
    )

    sf = "/root/testdata/sf0.001"
    d = _t(spark, sf, "documents")
    aug = _pii_augmented(d)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL, "[EMAIL]"), PII_IPV4, "[IP]"
        ),
        PII_PHONE,
        "[PHONE]",
    )
    out = d.select(
        "doc_id",
        F.regexp_count(red, F.lit(PII_EMAIL)).alias("res_email"),
        F.regexp_count(red, F.lit(PII_PHONE)).alias("res_phone"),
        F.regexp_count(red, F.lit(PII_IPV4)).alias("res_ipv4"),
        F.regexp_count(red, F.lit(r"\[EMAIL\]")).alias("ph_email"),
        F.regexp_count(red, F.lit(r"\[IP\]")).alias("ph_ip"),
        F.regexp_count(red, F.lit(r"\[PHONE\]")).alias("ph_phone"),
    ).collect()
    assert len(out) > 0
    for r in out:
        assert (r["res_email"], r["res_phone"], r["res_ipv4"]) == (0, 0, 0), r
        assert r["ph_email"] == (2 if r["doc_id"] % 3 == 0 else 1), r
        assert r["ph_ip"] == 1 and r["ph_phone"] == 1, r


def test_gram_stats_exact_vs_numpy(spark):
    """The distributed int64 Gram statistic must equal a single numpy
    pass BIT-FOR-BIT (integer partials are order-independent — the
    exactness claim the driver's rows-only check can't carry)."""
    import numpy as np

    from engine.linalg import MU_SCALE, gram_stats_mu

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    rows = {
        (r["i"], r["j"]): r["g"]
        for r in gram_stats_mu(emb).collect()
    }
    m = np.stack([r["embedding"] for r in emb.collect()])
    q = np.rint(m * MU_SCALE).astype(np.int64)
    want_g = q.T @ q
    want_s = q.sum(axis=0)
    dim = q.shape[1]
    assert rows[(-1, -1)] == len(m)
    for i in range(dim):
        assert rows[(i, -1)] == want_s[i], i
        for j in range(i, dim):
            assert rows[(i, j)] == want_g[i, j], (i, j)


def test_pca_component_matches_numpy(spark):
    """The driver-side eigensolve over the exact Gram must recover
    numpy's full-precision top principal component (|cosine| >= 0.999 —
    quantization at 1e-6 is the only slack) with a matching explained-
    variance share, sign-fixed, one row per dimension."""
    import numpy as np

    from engine.linalg import pca_top_component

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = pca_top_component(emb).collect()
    v = np.array([r["loading"] for r in sorted(got, key=lambda r: r["dim_idx"])])
    m = np.stack([r["embedding"] for r in emb.collect()]).astype(np.float64)
    c = np.cov(m, rowvar=False, bias=True)
    w_np, v_np = np.linalg.eigh(c)
    top = v_np[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.999, cos
    assert abs(got[0]["explained_ratio"] - w_np[-1] / w_np.sum()) < 1e-3
    assert len({r["explained_ratio"] for r in got}) == 1
    # sign convention: largest-|loading| coordinate is positive
    assert v[np.argmax(np.abs(v))] > 0


def test_pca_empty_input(spark):
    from engine.linalg import pca_top_component

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert pca_top_component(empty).count() == 0


def test_heavy_hitters_mg_guarantee_on_skewed_vocab(spark, tmp_path):
    """The Misra-Gries candidate pass must lose NO true heavy hitter even
    when the vocabulary (2000+ words) dwarfs the HH_K=200 counter budget —
    the regime the fixed sf corpora (31-word vocab) never reach. Builds a
    deterministic skewed multiset with 10 clear heavy words, one word
    sitting EXACTLY on the cnt*HH_K == n boundary (>= keeps it), and a
    ~2000-word tail; spreads it over 8 parquet partitions so per-partition
    summaries actually decrement and merge. The operator's exact recount
    must reproduce the brute-force answer verbatim."""
    import pandas as pd

    import __spark_entry__ as E

    rng = np.random.default_rng(4455)
    toks: list[str] = []
    toks += [f"hot{i}" for i in range(10) for _ in range(150)]  # 1500
    # fill the tail so the total lands exactly on 20000 tokens
    tail = 20000 - 1500 - 100
    toks += [f"rare{i % 2000}" for i in range(tail)]  # ~9 each
    toks += ["edge"] * 100  # 100 * HH_K == 20000 == n -> boundary, kept
    assert len(toks) == 20000
    rng.shuffle(toks)
    docs = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": [" ".join(toks[i * 100 : (i + 1) * 100]) for i in range(200)],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "src0"
    docs["n_chars"] = docs["text"].str.len()
    sf = str(tmp_path / "hh")
    spark.createDataFrame(docs).repartition(8).write.parquet(
        f"{sf}/documents.parquet"
    )

    got = {
        (r["word"], r["cnt"]) for r in E.q_heavy_hitters(spark, sf).collect()
    }
    counts = pd.Series(toks).value_counts()
    want = {
        (w, int(c)) for w, c in counts.items() if c * E.HH_K >= len(toks)
    }
    assert want == got
    assert ("edge", 100) in got  # the exact-boundary word survives
    assert len(got) == 11


def test_xcorr_pairs_detects_planted_lead_lag(spark, tmp_path):
    """Physics pin for q_xcorr_pairs (oracle equality proves the engines
    AGREE, not that the semantics detect a lead): user `follow` replays
    user `lead`'s burst minutes shifted +2, so for the (follow, lead)
    pair — a=follow, b=lead, corr_L = corr(a_t, b_{t+L}) — the maximum
    sits at L = -2 (b LEADS a by 2 minutes), near-perfect, and strictly
    above the misaligned lag-0 correlation. A third `noise` user makes
    the top-K selection non-trivial."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as E

    burst_minutes = [5, 17, 33, 51, 74, 98, 120, 150, 181, 207]
    t0 = np.datetime64("2024-05-01T00:00:00", "us")
    rows = []
    eid = 0
    for m in burst_minutes:
        for k in range(5):
            rows.append(("lead", t0 + np.timedelta64(m * 60_000_000 + k, "us"), eid))
            eid += 1
            rows.append(
                ("follow", t0 + np.timedelta64((m + 2) * 60_000_000 + k, "us"), eid)
            )
            eid += 1
    for m in range(0, 240, 7):
        rows.append(("noise", t0 + np.timedelta64(m * 60_000_000, "us"), eid))
        eid += 1
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    ev["event_type"] = "click"
    ev["value"] = 1.0
    sf = str(tmp_path / "xcorr")
    spark.createDataFrame(ev).write.parquet(f"{sf}/events.parquet")

    out = {
        (r["user_a"], r["user_b"]): r
        for r in E.q_xcorr_pairs(spark, sf).collect()
    }
    assert set(out) == {
        ("follow", "lead"), ("follow", "noise"), ("lead", "noise"),
    }
    r = out[("follow", "lead")]
    assert r["best_lag"] == -2, dict(r.asDict())
    assert r["best_corr"] > 0.9, dict(r.asDict())
    assert r["corr0"] is None or r["best_corr"] > r["corr0"], dict(r.asDict())


def test_spearman_robust_where_pearson_burst_dominated(spark, tmp_path):
    """Physics pin for q_spearman_to_global's motivation: user `burst`
    shares ONE massive minute with the fleet and is otherwise
    independent of it — the single shared burst pins the PEARSON
    fleet-synchrony estimate high, while on ranks that minute is just
    "the largest" so Spearman reads the (absent) typical-minute
    co-movement. Asserts the documented gap: corr_global > 0.9,
    rho_global < 0.6, on the same series."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as E

    rng = np.random.default_rng(7)
    t0 = np.datetime64("2024-06-01T00:00:00", "us")
    rows = []
    eid = 0

    def add(user, minute, n):
        nonlocal eid
        for k in range(n):
            rows.append(
                (user, t0 + np.timedelta64(minute * 60_000_000 + k, "us"), eid)
            )
            eid += 1

    # fleet background: 4 users with independent pseudo-random loads
    for u in range(4):
        for m in range(120):
            add(f"bg{u}", m, int(rng.integers(1, 8)))
    # burst user: flat 2 events/minute (no co-movement with the fleet),
    # except one shared enormous minute where everyone spikes
    for m in range(0, 120, 2):
        add("burst", m, 2)
    add("burst", 60, 400)
    for u in range(4):
        add(f"bg{u}", 60, 400)

    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    ev["event_type"] = "click"
    ev["value"] = 1.0
    sf = str(tmp_path / "burst")
    spark.createDataFrame(ev).write.parquet(f"{sf}/events.parquet")

    pearson = {
        r["user_id"]: r["corr_global"]
        for r in E.q_corr_to_global(spark, sf).collect()
    }
    rho = {
        r["user_id"]: r["rho_global"]
        for r in E.q_spearman_to_global(spark, sf).collect()
    }
    assert pearson["burst"] > 0.9, pearson
    assert rho["burst"] < 0.6, rho
    assert pearson["burst"] - rho["burst"] > 0.4, (pearson, rho)


def test_containment_catches_subset_dup_jaccard_misses(spark, tmp_path):
    """Physics pin for q_containment_pairs' reason to exist: doc 0 is a
    40-word passage pasted WHOLE into doc 1's 400 unique words. Its
    shingles are a subset of doc 1's, so containment reads 1.0 — while
    exact n-gram Jaccard is ~0.1, far below DEDUP_MIN_JACCARD, so the
    minhash/LSH dedup chain structurally cannot keep this pair. Also
    pins the df-cap: a third doc repeating only corpus-boilerplate
    shingles shared by every doc produces NO pair."""
    import pandas as pd

    import __spark_entry__ as E

    passage = " ".join(f"quoted{i}" for i in range(42))
    host = passage + " " + " ".join(f"body{i}" for i in range(400))
    docs = pd.DataFrame(
        {
            "doc_id": ["d0", "d1"],
            "text": [passage, host],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "src0"
    docs["n_chars"] = docs["text"].str.len()
    sf = str(tmp_path / "contain")
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")

    pairs = {
        (r["d1"], r["d2"]): r for r in E.q_containment_pairs(spark, sf).collect()
    }
    assert ("d0", "d1") in pairs, pairs
    r = pairs[("d0", "d1")]
    assert r["containment"] == 1.0, dict(r.asDict())
    # the same pair is invisible to the Jaccard dedup chain
    jac = {
        (x["d1"], x["d2"]): x["jaccard"]
        for x in E._jaccard_pairs(spark, sf).collect()
    }
    j = jac.get(("d0", "d1"))
    assert j is None or j < E.DEDUP_MIN_JACCARD, jac


def test_distinct_cascade_merge_invariance_and_error_bound(spark):
    """distinct_user_cascade (engine/rollup.py): (1) the minute->hour
    sketch UNION yields the identical estimate to sketching each hour
    directly (register-maxima algebra is merge-tree invariant — the
    property that makes the cascade correct); (2) every hour's estimate
    is within 5% of exact COUNT DISTINCT (lg_k=12 ~ 1.6% rsd)."""
    from pyspark.sql import functions as F

    from engine.rollup import distinct_user_cascade

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {
        (r["event_type"], r["hour"]): r
        for r in distinct_user_cascade(ev).collect()
    }

    hour = F.expr("unix_timestamp(ts) DIV 3600")
    direct = {
        (r["event_type"], r["hour"]): r["est"]
        for r in ev.groupBy("event_type", hour.alias("hour"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).cast("long").alias("est")
        )
        .collect()
    }
    exact = {
        (r["event_type"], r["hour"]): r["n"]
        for r in ev.groupBy("event_type", hour.alias("hour"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for key, row in got.items():
        assert row["approx_users"] == direct[key], (key, row, direct[key])
        err = abs(row["approx_users"] - exact[key]) / exact[key]
        assert err <= 0.05, (key, row["approx_users"], exact[key])
