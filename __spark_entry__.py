"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a SURVEY.md §2 operator exercised on the shared
driver testdata; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL. The
local harness ``tools/check_oracle.py`` replays the driver's comparison
(row count + column names + sorted-value equality) at sf0.01.

Float policy: every floating-point output column is rounded to 4 decimals
(money to 2) ON BOTH SIDES — Spark and DuckDB aggregate doubles in different
orders, so raw doubles differ in the last ulps; rounding makes the value
hash deterministic. Integer/count columns are exact, never rounded.

The reference-parity operators (R1-R4 rolling stats / detect, A1 rollup,
A2 cascade — SURVEY.md §2.0/2.4) are exercised here on the ``events`` table
(user_id = series key, ts order); their bit-exact token-table twins are
gated by ``python -m pytest -x -q`` against engine/oracle.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

W_EVENTS = 30  # rolling window on the events series (engine default)
K_EVENTS = 3.0  # detect threshold


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rolling_cols(ev: DataFrame):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(W_EVENTS - 1), 0)
    )
    full = F.count("value").over(w) == W_EVENTS
    ma = F.when(full, F.avg("value").over(w))
    sd = F.when(full, F.stddev_samp("value").over(w))
    return ma, sd


def _scored_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ma, sd = _rolling_cols(ev)
    scored = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        ma.alias("_ma"),
        sd.alias("_sd"),
    ).withColumn(
        "_score",
        F.when(
            F.col("_sd").isNotNull() & (F.col("_sd") != 0),
            F.abs(F.col("value") - F.col("_ma")) / F.col("_sd"),
        ),
    )
    return scored


_ROLLING_SQL_BASE = f"""
WITH t AS (
  SELECT event_id, user_id, value,
         CASE WHEN count(value) OVER w = {W_EVENTS} THEN avg(value) OVER w END AS ma_raw,
         CASE WHEN count(value) OVER w = {W_EVENTS} THEN stddev_samp(value) OVER w END AS sd_raw
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {W_EVENTS - 1} PRECEDING AND CURRENT ROW)
)
"""


# ---------------------------------------------------------------------------
# R1-R4 on events
# ---------------------------------------------------------------------------


def q_rolling_mean(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ma, _ = _rolling_cols(ev)
    return ev.select(
        "event_id", "user_id", F.round(ma, 4).alias("ma")
    )


def q_rolling_std(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    _, sd = _rolling_cols(ev)
    return ev.select("event_id", "user_id", F.round(sd, 4).alias("sd"))


def q_anomaly_score(spark, sf_dir):
    return _scored_events(spark, sf_dir).select(
        "event_id", "user_id", F.round("_score", 4).alias("score")
    )


def q_detect(spark, sf_dir):
    return (
        _scored_events(spark, sf_dir)
        .where(F.col("_score") > K_EVENTS)
        .select(
            "event_id", "user_id", "value", F.round("_score", 4).alias("score")
        )
    )


def q_detect_count_per_user(spark, sf_dir):
    return (
        _scored_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.coalesce((F.col("_score") > K_EVENTS).cast("long"), F.lit(0))
            ).alias("anomalies")
        )
    )


# ---------------------------------------------------------------------------
# A1/A2 rollup + cascade on events (minute buckets from real timestamps)
# ---------------------------------------------------------------------------


def _minute_rollup(spark, sf_dir) -> DataFrame:
    scored = _scored_events(spark, sf_dir)
    return (
        scored.withColumn("bucket", F.expr("unix_timestamp(ts) DIV 60"))
        .groupBy("user_id", "bucket")
        .agg(
            F.count("value").alias("cnt"),
            F.round(F.min("value"), 4).alias("vmin"),
            F.round(F.max("value"), 4).alias("vmax"),
            F.round(F.sum("value"), 4).alias("vsum"),
            F.sum(
                F.coalesce((F.col("_score") > K_EVENTS).cast("long"), F.lit(0))
            ).alias("anom_cnt"),
            F.min_by("value", "event_id").alias("first_v"),
            F.max_by("value", "event_id").alias("last_v"),
        )
    )


def q_rollup_minute(spark, sf_dir):
    return _minute_rollup(spark, sf_dir)


def q_cascade_hour(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    minute = (
        ev.withColumn("bucket", F.expr("unix_timestamp(ts) DIV 60"))
        .groupBy("user_id", "bucket")
        .agg(
            F.count("value").alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum("value").alias("vsum"),
        )
    )
    return (
        minute.withColumn("hbucket", F.expr("bucket DIV 60"))
        .groupBy("user_id", "hbucket")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.round(F.min("vmin"), 4).alias("vmin"),
            F.round(F.max("vmax"), 4).alias("vmax"),
            F.round(F.sum("vsum"), 4).alias("vsum"),
            F.round(F.sum("vsum") / F.sum("cnt"), 4).alias("vmean"),
        )
    )


# ---------------------------------------------------------------------------
# Relational surface (SURVEY.md §2.9) on the TPC-H-ish tables
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), "c_custkey").limit(10)


def q_region_nation_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(
        F.count("*").alias("customers"),
        F.round(F.sum("c_acctbal"), 2).alias("acctbal"),
    )


def q_customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_orders_with_big_lineitem(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


def q_rank_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
    )


def q_order_gaps(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )


def q_nations_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


def q_nations_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.exceptAll(s.distinct())


def q_distinct_aggs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("orders"),
        F.countDistinct("o_custkey").alias("customers"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_scalar_funcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head"),
        F.length("text").alias("chars"),
        (F.col("n_chars") % 7).cast("long").alias("mod7"),
        F.concat_ws("|", "lang", "source").alias("tag"),
    )


# ---------------------------------------------------------------------------
# Training-data ops (documents / embeddings)
# ---------------------------------------------------------------------------


def q_doc_fingerprint(spark, sf_dir):
    """Exact-dedup machinery: per-doc content hash + bag-of-words hash (the
    join key a dedup pass groups on)."""
    d = _t(spark, sf_dir, "documents")
    bow = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
    )
    return d.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.md5(bow).alias("bow_hash"),
    )


def q_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def q_quality_score(spark, sf_dir):
    """Quality scoring: tokens/char ratio + stopword share, per doc."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and")))
    return d.select(
        "doc_id",
        n_toks.cast("long").alias("n_toks"),
        stop.cast("long").alias("stopwords"),
        F.round(stop / n_toks, 4).alias("stop_ratio"),
        F.round(F.col("n_chars") / n_toks, 4).alias("chars_per_tok"),
    )


def q_embedding_norms(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("i", "x"))
        .groupBy("vec_id")
        .agg(F.round(F.sqrt(F.sum(F.col("x").cast("double") * F.col("x"))), 4).alias("l2"))
    )


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 query vector (ANN baseline)."""
    e = _t(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.posexplode("embedding").alias("i", "x")).withColumn(
        "x", F.col("x").cast("double")
    )
    q = pts.where("vec_id = 0").select(
        F.col("i").alias("qi"), F.col("x").alias("qx")
    )
    sims = (
        pts.join(F.broadcast(q), pts.i == q.qi)
        .groupBy("vec_id")
        .agg(
            (
                F.sum(F.col("x") * F.col("qx"))
                / (
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("qx") * F.col("qx")))
                )
            ).alias("_cos")
        )
    )
    return (
        sims.where("vec_id != 0")
        .orderBy(F.desc("_cos"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("_cos", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: rolling-stat anomaly detection + minute rollup + anomaly
    filter over the events series at sf0.001 (the engine's read path shape:
    detect -> rollup -> anomaly-flag filter)."""
    sf_dir = "/root/testdata/sf0.001"
    return _minute_rollup(spark, sf_dir).where(F.col("anom_cnt") > 0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rolling_mean": q_rolling_mean,
        "rolling_std": q_rolling_std,
        "anomaly_score": q_anomaly_score,
        "detect": q_detect,
        "detect_count_per_user": q_detect_count_per_user,
        "rollup_minute": q_rollup_minute,
        "cascade_hour": q_cascade_hour,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "region_nation_rollup": q_region_nation_rollup,
        "customers_without_orders": q_customers_without_orders,
        "orders_with_big_lineitem": q_orders_with_big_lineitem,
        "rank_orders": q_rank_orders,
        "order_gaps": q_order_gaps,
        "nations_intersect": q_nations_intersect,
        "nations_except": q_nations_except,
        "distinct_aggs": q_distinct_aggs,
        "json_extract": q_json_extract,
        "scalar_funcs": q_scalar_funcs,
        "doc_fingerprint": q_doc_fingerprint,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "embedding_norms": q_embedding_norms,
        "embedding_topk": q_embedding_topk,
    }


def oracle_sql() -> dict[str, str]:
    score_expr = (
        "CASE WHEN sd_raw IS NOT NULL AND sd_raw != 0 "
        "THEN abs(value - ma_raw) / sd_raw END"
    )
    return {
        "rolling_mean": _ROLLING_SQL_BASE
        + "SELECT event_id, user_id, round(ma_raw, 4) AS ma FROM t",
        "rolling_std": _ROLLING_SQL_BASE
        + "SELECT event_id, user_id, round(sd_raw, 4) AS sd FROM t",
        "anomaly_score": _ROLLING_SQL_BASE
        + f"SELECT event_id, user_id, round({score_expr}, 4) AS score FROM t",
        "detect": _ROLLING_SQL_BASE
        + f"SELECT event_id, user_id, value, round({score_expr}, 4) AS score "
        f"FROM t WHERE {score_expr} > {K_EVENTS}",
        "detect_count_per_user": _ROLLING_SQL_BASE
        + f"SELECT user_id, CAST(count(*) FILTER ({score_expr} > {K_EVENTS}) AS BIGINT) AS anomalies "
        "FROM t GROUP BY user_id",
        "rollup_minute": _ROLLING_SQL_BASE
        + f""",
        j AS (SELECT t.*, e.ts FROM t JOIN events e USING (event_id))
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 60 AS bucket,
               CAST(count(value) AS BIGINT) AS cnt,
               round(min(value), 4) AS vmin,
               round(max(value), 4) AS vmax,
               round(sum(value), 4) AS vsum,
               CAST(count(*) FILTER ({score_expr} > {K_EVENTS}) AS BIGINT) AS anom_cnt,
               arg_min(value, event_id) AS first_v,
               arg_max(value, event_id) AS last_v
        FROM j GROUP BY 1, 2""",
        "cascade_hour": """
        WITH minute AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 60 AS bucket,
                 count(value) AS cnt, min(value) AS vmin, max(value) AS vmax,
                 sum(value) AS vsum
          FROM events GROUP BY 1, 2)
        SELECT user_id, bucket // 60 AS hbucket,
               CAST(sum(cnt) AS BIGINT) AS cnt,
               round(min(vmin), 4) AS vmin, round(max(vmax), 4) AS vmax,
               round(sum(vsum), 4) AS vsum,
               round(sum(vsum) / sum(cnt), 4) AS vmean
        FROM minute GROUP BY 1, 2""",
        "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""",
        "top_customers": """
        SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 10""",
        "region_nation_rollup": """
        SELECT r_name, n_name, count(*) AS customers,
               round(sum(c_acctbal), 2) AS acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)""",
        "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
        "orders_with_big_lineitem": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 45)""",
        "rank_orders": """
        SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
          FROM orders) WHERE rnk <= 3""",
        "order_gaps": """
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS INT) AS gap_days
        FROM orders""",
        "nations_intersect": """
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier""",
        "nations_except": """
        SELECT DISTINCT c_nationkey AS nk FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nk FROM supplier""",
        "distinct_aggs": """
        SELECT o_orderpriority, count(*) AS orders,
               count(DISTINCT o_custkey) AS customers,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderpriority""",
        "json_extract": """
        SELECT event_type, count(*) AS events,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type""",
        "scalar_funcs": """
        SELECT doc_id, upper(substring(text, 1, 12)) AS head,
               CAST(length(text) AS INT) AS chars,
               n_chars % 7 AS mod7,
               concat_ws('|', lang, source) AS tag
        FROM documents""",
        "doc_fingerprint": """
        SELECT doc_id, md5(text) AS content_hash,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_hash
        FROM documents""",
        "token_count": """
        SELECT lang, count(*) AS docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang""",
        "quality_score": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS stopwords,
               round(len(list_filter(string_split(text, ' '),
                    x -> x IN ('the', 'a', 'of', 'and')))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS stop_ratio,
               round(n_chars / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS chars_per_tok
        FROM documents""",
        "embedding_norms": """
        SELECT vec_id, round(sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS l2
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        GROUP BY vec_id""",
        "embedding_topk": """
        WITH pts AS (
          SELECT vec_id, i, CAST(x AS DOUBLE) AS x
          FROM (SELECT vec_id, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i FROM embeddings)),
        q AS (SELECT i AS qi, x AS qx FROM pts WHERE vec_id = 0),
        sims AS (
          SELECT vec_id,
                 sum(x * qx) / (sqrt(sum(x * x)) * sqrt(sum(qx * qx))) AS c
          FROM pts JOIN q ON pts.i = q.qi GROUP BY vec_id)
        SELECT vec_id, round(c, 4) AS cos_sim FROM sims
        WHERE vec_id != 0 ORDER BY c DESC, vec_id LIMIT 10""",
    }
