"""Catalog queries q01-q119 (split from the single-file catalog in
r11). Registry and cap order: plans/catalog.py."""

from __future__ import annotations

from odin_rs_spark.plans.qshared import *  # noqa: F401,F403
# --------------------------------------------------------------------------
# q01 — flagship: pricing summary (TPC-H Q1 shape; A1 conditional aggs,
# F1/F5 filter pushdown)
# --------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                        AS sum_qty,
       round(sum(l_extendedprice), 4)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)::BIGINT                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — per-group conditional class counts (A1, F2 recode)
# --------------------------------------------------------------------------

def q02_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return agg_ops.conditional_counts(
        ev,
        ["event_type"],
        {
            "n_low": F.col("value") < 50,
            "n_mid": (F.col("value") >= 50) & (F.col("value") < 200),
            "n_high": F.col("value") >= 200,
        },
    )


Q02_SQL = """
SELECT event_type,
       sum(CASE WHEN value < 50 THEN 1 ELSE 0 END)::BIGINT                  AS n_low,
       sum(CASE WHEN value >= 50 AND value < 200 THEN 1 ELSE 0 END)::BIGINT AS n_mid,
       sum(CASE WHEN value >= 200 THEN 1 ELSE 0 END)::BIGINT                AS n_high,
       count(*)::BIGINT                                                     AS n_total
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q03 — pushdown filter + wire projection (F1/F5/F7)
# --------------------------------------------------------------------------

def q03_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li = filter_ops.mask_range(li, "l_quantity", 10, 20)
    li = li.filter(
        F.col("l_shipdate").between(F.lit("1996-01-01"), F.lit("1996-12-31"))
    )
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_linenumber").alias("linenumber"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


Q03_SQL = """
SELECT l_orderkey AS orderkey, l_partkey AS partkey, l_linenumber AS linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
"""


# --------------------------------------------------------------------------
# q04 — global top-k (O3/W1)
# --------------------------------------------------------------------------

def q04_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


Q04_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


# --------------------------------------------------------------------------
# q05 — per-key top-k retention (W2/O4)
# --------------------------------------------------------------------------

def q05_topk_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    kept = window_ops.last_n_per_key(
        li, ["l_orderkey"], "l_extendedprice", 3, tiebreak=["l_linenumber"]
    )
    return kept.select("l_orderkey", "l_linenumber", "l_extendedprice")


Q05_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber DESC) AS rn
  FROM lineitem) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# q06 — latest record per key (A6)
# --------------------------------------------------------------------------

def q06_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    latest = window_ops.latest_per_key(ev, ["user_id"], "ts", tiebreak=["event_id"])
    return latest.select("user_id", "event_id", "ts", "event_type", "value")


Q06_SQL = """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q07 — broadcast dimension joins (J5/J6)
# --------------------------------------------------------------------------

def q07_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    enriched = join_ops.broadcast_dim_join(
        orders, customer.select("c_custkey", "c_nationkey"),
        orders["o_custkey"] == customer["c_custkey"],
    )
    enriched = join_ops.broadcast_dim_join(
        enriched, nation.select("n_nationkey", "n_name", "n_regionkey"),
        enriched["c_nationkey"] == nation["n_nationkey"],
    )
    enriched = join_ops.broadcast_dim_join(
        enriched, region.select("r_regionkey", "r_name"),
        enriched["n_regionkey"] == region["r_regionkey"],
    )
    return enriched.groupBy("r_name", "n_name").agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q07_SQL = """
SELECT r_name, n_name, round(sum(o_totalprice), 4) AS revenue, count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# q08 — anti join (U3)
# --------------------------------------------------------------------------

def q08_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_mktsegment")


Q08_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# --------------------------------------------------------------------------
# q09 — semi join chain (U4-style skip filter)
# --------------------------------------------------------------------------

def q09_urgent_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    urgent_li = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
    )
    return part.join(
        urgent_li.select(F.col("l_partkey").alias("p_partkey")).distinct(),
        "p_partkey",
        "left_semi",
    ).select("p_partkey", "p_brand")


Q09_SQL = """
SELECT p_partkey, p_brand FROM part
WHERE p_partkey IN (
  SELECT l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'))
"""


# --------------------------------------------------------------------------
# q10 — as-of join (J2): each purchase ← latest same-user click
# --------------------------------------------------------------------------

def q10_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = join_ops.asof_join(
        purchases, clicks, on="user_id", ts="ts", right_order="event_id", suffix="_click"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("ts_click").alias("click_ts"),
        F.col("event_id_click").alias("click_event_id"),
        F.col("value_click").alias("click_value"),
    )


Q10_SQL = """
SELECT event_id, user_id, ts, value, click_ts, click_event_id, click_value FROM (
  SELECT p.event_id, p.user_id, p.ts, p.value,
         c.ts AS click_ts, c.event_id AS click_event_id, c.value AS click_value,
         row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q11 — interval/covering join (J3): purchases inside signup+2h windows
# --------------------------------------------------------------------------

def q11_interval_signup_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = join_ops.interval_join(
        purchases, signups, ts="ts", start="start_ts", end="end_ts",
        extra_key=("user_id", "s_user"),
    )
    return joined.groupBy("signup_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


Q11_SQL = """
SELECT s.event_id AS signup_id, count(*)::BIGINT AS n_purchases,
       round(sum(p.value), 4) AS sum_value
FROM events s JOIN events p
  ON s.event_type = 'signup' AND p.event_type = 'purchase'
 AND p.user_id = s.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 2 HOUR
GROUP BY s.event_id
"""


# --------------------------------------------------------------------------
# q12 — arrival-minute histogram (A2, schedule learning)
# --------------------------------------------------------------------------

def q12_minute_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_ops.hourly_minute_histogram(_t(spark, sf_dir, "events"), "ts")


Q12_SQL = """
SELECT EXTRACT(minute FROM ts)::INT AS minute, count(*)::BIGINT AS n
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# q13 — learned schedule stats per step (A3)
# --------------------------------------------------------------------------

def q13_schedule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = agg_ops.schedule_stats(_t(spark, sf_dir, "events"), "ts", "event_type")
    return out.select(
        "event_type",
        F.round("avg_minute", 6).alias("avg_minute"),
        "max_minute",
        "n_obs",
    )


Q13_SQL = """
SELECT event_type,
       round(avg(EXTRACT(minute FROM ts)), 6) AS avg_minute,
       max(EXTRACT(minute FROM ts))::INT      AS max_minute,
       count(*)::BIGINT                       AS n_obs
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q14 — running stats (A4/A5)
# --------------------------------------------------------------------------

def q14_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = agg_ops.running_stats(_t(spark, sf_dir, "events"), ["event_type"], "value")
    return out.select(
        "event_type",
        "n",
        F.round("mean", 6).alias("mean"),
        "min",
        "max",
        F.round("stddev", 6).alias("stddev"),
    )


Q14_SQL = """
SELECT event_type, count(value)::BIGINT AS n, round(avg(value), 6) AS mean,
       min(value) AS min, max(value) AS max, round(stddev_samp(value), 6) AS stddev
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q15 — histogram + cumulative CDF (A7)
# --------------------------------------------------------------------------

def q15_histogram_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = agg_ops.histogram(_t(spark, sf_dir, "events"), "value", bin_width=50.0)
    out = window_ops.cumulative_cdf(hist, "bin", "n")
    return out.select("bin", "n", F.col("cum").cast("long").alias("cum"),
                      F.round("cdf", 6).alias("cdf"))


Q15_SQL = """
SELECT bin, n, sum(n) OVER (ORDER BY bin)::BIGINT AS cum,
       round(sum(n) OVER (ORDER BY bin)::DOUBLE / sum(n) OVER (), 6) AS cdf
FROM (SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*)::BIGINT AS n
      FROM events GROUP BY 1)
"""


# --------------------------------------------------------------------------
# q16 — consecutive-row deltas per key (W3/W4 trace semantics)
# --------------------------------------------------------------------------

def q16_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / F.lit(1000000.0)).alias("gap_sec"),
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


Q16_SQL = """
SELECT event_id, user_id,
       (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0 AS gap_sec,
       value - lag(value) OVER w AS value_delta
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# --------------------------------------------------------------------------
# q17 — dedup keep-newest per composite key (U2/W2)
# --------------------------------------------------------------------------

def q17_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    latest = window_ops.latest_per_key(
        ev, ["user_id", "event_type"], "ts", tiebreak=["event_id"]
    )
    return latest.select("user_id", "event_type", "event_id", "ts", "value")


Q17_SQL = """
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q18 — sessionization (gap > 30 min ⇒ new session)
# --------------------------------------------------------------------------

def q18_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1800 * 1000000), 1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    sessions = ev.withColumn("session_id", F.sum(is_new).over(wcum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


Q18_SQL = """
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts, round(sum(value), 4) AS sum_value
FROM (
  SELECT user_id, ts, value,
         sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM (
    SELECT user_id, event_id, ts, value,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
    FROM events))
GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# q19 — tagged multi-source union (U1)
# --------------------------------------------------------------------------

def q19_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hot = ev.filter(F.col("value") > 400).select("event_id", "value")
    cold = ev.filter(F.col("value") < 5).select("event_id", "value")
    return setops.tagged_union({"hot": hot, "cold": cold}, source_col="stream")


Q19_SQL = """
SELECT event_id, value, 'hot' AS stream FROM events WHERE value > 400
UNION ALL
SELECT event_id, value, 'cold' AS stream FROM events WHERE value < 5
"""


# --------------------------------------------------------------------------
# q20 — brute-force cosine top-k (similarity baseline)
# --------------------------------------------------------------------------

def q20_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim_ops.cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


Q20_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))))
         AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM s) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# q21 — corpus token stats per language (text analysis)
# --------------------------------------------------------------------------

def q21_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.token_stats(docs, "text", keys=["lang"])


Q21_SQL = """
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT AS n_tokens,
       sum(length(text))::BIGINT AS n_chars_total,
       round(avg(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END), 6) AS avg_tokens_per_doc
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# q22 — language ID heuristic (marker-lexicon argmax)
# --------------------------------------------------------------------------

def q22_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.lang_id(docs, "text").select("doc_id", "lang", "pred_lang")


def _langid_sql() -> str:
    hit_exprs = []
    for lang, markers in text_ops.LANG_MARKERS.items():
        inlist = ", ".join(f"'{m}'" for m in markers)
        hit_exprs.append(
            f"len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), w -> w IN ({inlist}))) AS h_{lang}"
        )
    hits = ",\n       ".join(hit_exprs)
    langs = list(text_ops.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN h_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH h AS (SELECT doc_id, lang,
       {hits}
FROM documents)
SELECT doc_id, lang, {case} AS pred_lang FROM h
"""


# --------------------------------------------------------------------------
# q23 — exact dedup on normalized text
# --------------------------------------------------------------------------

def q23_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.exact_dedup(docs).select("doc_id", "source")


Q23_SQL = """
SELECT doc_id, source FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents
  GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
"""


_SHINGLE_CTE = """
WITH d AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(w, i, i + 2), ' ')
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM d),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s))::DOUBLE
         / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
"""


# --------------------------------------------------------------------------
# q24 — near-duplicate pairs: MinHash-LSH blocking + exact Jaccard verify.
# Oracle computes exact all-pairs (feasible at sf0.01); LSH params give
# ≥ 1-6e-8 recall at J≥0.8 so outputs coincide.
# --------------------------------------------------------------------------

def q24_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.near_dup_pairs(
        docs, threshold=0.8, parallelism=_doc_par(spark, docs)
    )


Q24_SQL = _SHINGLE_CTE + """
SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.8
"""


# --------------------------------------------------------------------------
# q25 — near-dup dedup: drop docs matching a smaller-id doc
# --------------------------------------------------------------------------

def q25_near_dup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.near_dup_dedup(
        docs, threshold=0.8, parallelism=_doc_par(spark, docs)
    ).select(
        "doc_id", "lang", "source"
    )


Q25_SQL = _SHINGLE_CTE + """
SELECT doc_id, lang, source FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs WHERE jaccard >= 0.8)
"""


# --------------------------------------------------------------------------
# q26 — SimHash near-dup pairs. The 60-bit signature uses the portable
# md5 token hash, so the oracle recomputes the SAME signatures in SQL
# and does the EXACT all-pairs hamming join — verifying both the
# signature math and the pigeonhole-chunk blocking recall.
# --------------------------------------------------------------------------

def q26_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.simhash_pairs(
        docs, max_hamming=3, parallelism=_doc_par(spark, docs)
    )


_H60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

Q26_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t FROM d),
th AS (SELECT doc_id, {_H60.format(x='t')} AS h FROM tok),
bc AS (
  SELECT doc_id, j.range AS j,
         CASE WHEN sum(((h >> j.range) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END AS b
  FROM th, range(60) j GROUP BY doc_id, j.range),
sig AS (
  SELECT doc_id, CAST(sum(b * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS sig
  FROM bc GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sig, b.sig)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


# --------------------------------------------------------------------------
# q27 — LSH-bucketed approximate NN. The hyperplane components are
# md5-derived (plane_component), so the DuckDB oracle re-derives the
# SAME planes in SQL and replays the exact pipeline: full oracle check.
# --------------------------------------------------------------------------

def q27_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim_ops.ann_lsh_topk(emb, queries, k=5, num_planes=4, num_tables=8)
    return out.select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")


_DOT = (
    "list_sum(list_transform(range(1, 65), i -> {a}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE))"
)
_NORM = "sqrt(list_sum(list_transform(range(1, 65), i -> {a}.embedding[i]::DOUBLE * {a}.embedding[i]::DOUBLE)))"
_COS = f"{_DOT} / ({_NORM.format(a='{a}')} * {_NORM.format(a='{b}')})"

Q27_SQL = f"""
WITH planes AS (
  SELECT t.range AS t, p.range AS p,
         list_transform(range(0, 64), d ->
           ((CAST(concat('0x', substr(md5(d::VARCHAR || '_' || p.range::VARCHAR || '_' || t.range::VARCHAR), 1, 15)) AS BIGINT)
             % 200003) - 100001)::DOUBLE / 100001.0) AS pv
  FROM range(8) t, range(4) p),
sigs AS (
  SELECT e.vec_id, pl.t,
         sum(CASE WHEN list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * pl.pv[i])) > 0
                  THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS bucket
  FROM embeddings e, planes pl
  GROUP BY e.vec_id, pl.t),
qsigs AS (SELECT vec_id AS query_id, t, bucket FROM sigs WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT q.query_id, s.vec_id
  FROM sigs s JOIN qsigs q ON s.t = q.t AND s.bucket = q.bucket
  WHERE s.vec_id <> q.query_id),
scored AS (
  SELECT c.query_id, c.vec_id, {_COS.format(a='qe', b='e')} AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings qe ON qe.vec_id = c.query_id)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM scored) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# q28 — document fingerprints. Portable md5 shingle hash → the oracle
# recomputes identical fingerprints (8 smallest shingle hashes, sorted).
# --------------------------------------------------------------------------

def q28_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the operator API keeps the array<long> form; the catalog row emits a
    # deterministic '-'-joined string because the driver's canonicalizer
    # sorts/hashes cell values and cannot hash Python lists
    docs = _t(spark, sf_dir, "documents")
    return text_ops.fingerprint(docs).select(
        "doc_id",
        F.array_join(F.transform("fingerprint", lambda x: x.cast("string")), "-").alias(
            "fingerprint"
        ),
    )


Q28_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2])
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM d)
SELECT doc_id,
       array_to_string(list_slice(list_sort(list_transform(s, x -> {_H60.format(x='x')})), 1, 8), '-') AS fingerprint
FROM sh
"""


# --------------------------------------------------------------------------
# q29 — JSON payload extraction (F7 wire-format semantics)
# --------------------------------------------------------------------------

def q29_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"), F.count(F.lit(1)).alias("n")
    )


Q29_SQL = """
SELECT event_type, round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q30 — raster cell band math (R4/S4/K5): synthetic affine grid, windspeed
# band combine, contour-level binning. Transcendental-derived values are
# rounded (libm vs java.lang.Math last-ulp).
# --------------------------------------------------------------------------

def q30_grid_band_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(3000).select(
        (F.col("id") % 60).alias("x"), F.floor(F.col("id") / 60).alias("y")
    )
    u = F.sin(F.col("x") * 0.37) * F.cos(F.col("y") * 0.23) * 10.0
    v = F.cos(F.col("x") * 0.11) * 5.0 + F.sin(F.col("y") * 0.31) * 3.0
    spd = F.sqrt(u * u + v * v)
    cells = grid.select(
        F.floor(spd / F.lit(2.2352)).cast("long").alias("level"), spd.alias("spd")
    )
    return cells.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.avg("spd"), 6).alias("avg_spd"),
        F.round(F.min("spd"), 6).alias("min_spd"),
        F.round(F.max("spd"), 6).alias("max_spd"),
    )


Q30_SQL = """
WITH g AS (SELECT i % 60 AS x, i // 60 AS y FROM range(3000) t(i)),
c AS (SELECT sqrt(u*u + v*v) AS spd FROM (
        SELECT sin(x * 0.37) * cos(y * 0.23) * 10.0 AS u,
               cos(x * 0.11) * 5.0 + sin(y * 0.31) * 3.0 AS v
        FROM g))
SELECT CAST(floor(spd / 2.2352) AS BIGINT) AS level, count(*)::BIGINT AS n_cells,
       round(avg(spd), 6) AS avg_spd, round(min(spd), 6) AS min_spd,
       round(max(spd), 6) AS max_spd
FROM c GROUP BY 1
"""


# --------------------------------------------------------------------------
# q31 — per-key track distance (W4 + haversine): synthetic lon/lat derived
# from event values
# --------------------------------------------------------------------------

def q31_track_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from odin_rs_spark.functions.geo import haversine_km

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("value") * 0.7) % 360 - 180).alias("lon"),
        ((F.col("value") * 0.3) % 170 - 85).alias("lat"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    legs = pts.select(
        "user_id",
        F.lag("lon").over(w).alias("plon"),
        F.lag("lat").over(w).alias("plat"),
        "lon",
        "lat",
    ).filter(F.col("plon").isNotNull())
    dist = haversine_km("plon", "plat", "lon", "lat")
    return legs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.round(F.sum(F.round(dist, 6)), 3).alias("total_km"),
    )


Q31_SQL = """
WITH pts AS (
  SELECT user_id, ts, event_id,
         (value * 0.7) % 360 - 180 AS lon,
         (value * 0.3) % 170 - 85  AS lat
  FROM events),
legs AS (
  SELECT user_id,
         lag(lon) OVER w AS plon, lag(lat) OVER w AS plat, lon, lat
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
SELECT user_id, count(*)::BIGINT AS n_legs,
       round(sum(round(
         2 * 6371.0088 * asin(sqrt(
           sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
           + cos(radians(plat)) * cos(radians(lat))
             * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2))), 6)), 3) AS total_km
FROM legs WHERE plon IS NOT NULL
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q32 — scattered→grid IDW interpolation (R2): observations derived from
# events, gathered onto a 40×30 lattice via the scatter/equi-join stencil
# (no lattice×points cross join — SURVEY §2.10 R2 scale design)
# --------------------------------------------------------------------------

def q32_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _t(spark, sf_dir, "events").select(
        ((F.col("value") * 0.13) % 40).alias("px"),
        ((F.col("value") * 0.29) % 30).alias("py"),
        F.col("value").alias("value"),
    )
    lattice = raster_ops.affine_lattice(spark, 40, 30).select("x", "y")
    out = raster_ops.idw_to_grid(pts, lattice, radius_cells=2, power=2.0)
    return out.select(
        "x",
        "y",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round("idw", 6).alias("idw"),
    )


Q32_SQL = """
WITH pts AS (
  SELECT (value * 0.13) % 40 AS px, (value * 0.29) % 30 AS py, value AS v
  FROM events),
lat AS (SELECT CAST(i % 40 AS INT) AS x, CAST(i // 40 AS INT) AS y FROM range(1200) t(i)),
cand AS (
  SELECT g.x, g.y, p.v,
         1.0 / (((p.px - g.x) * (p.px - g.x) + (p.py - g.y) * (p.py - g.y)) + 1e-9) AS w
  FROM lat g JOIN pts p
    ON abs(CAST(floor(p.px) AS INT) - g.x) <= 2
   AND abs(CAST(floor(p.py) AS INT) - g.y) <= 2),
agg AS (
  SELECT x, y, count(*)::BIGINT AS n_obs, round(sum(w * v) / sum(w), 6) AS idw
  FROM cand GROUP BY x, y)
SELECT g.x, g.y, a.n_obs, a.idw
FROM lat g LEFT JOIN agg a ON g.x = a.x AND g.y = a.y
"""


# --------------------------------------------------------------------------
# q33 — tile algebra (R8): abs/rel diff of two synthetic bands + per-row
# stats and threshold census
# --------------------------------------------------------------------------

def q33_tile_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    lat = raster_ops.affine_lattice(spark, 60, 50)
    a = lat.select("x", "y", (F.sin(F.col("x") * 0.2) + F.cos(F.col("y") * 0.3)).alias("value"))
    b = lat.select("x", "y", (F.sin(F.col("x") * 0.2 + 0.05) + F.cos(F.col("y") * 0.3 - 0.02)).alias("value"))
    d = raster_ops.tile_abs_diff(a, b)
    return d.groupBy("y").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("abs_diff"), 6).alias("avg_d"),
        F.round(F.max("abs_diff"), 6).alias("max_d"),
        F.sum((F.col("abs_diff") > 0.05).cast("long")).alias("n_above"),
    )


Q33_SQL = """
WITH g AS (SELECT CAST(i % 60 AS INT) AS x, CAST(i // 60 AS INT) AS y FROM range(3000) t(i)),
a AS (SELECT x, y, sin(x * 0.2) + cos(y * 0.3) AS v FROM g),
b AS (SELECT x, y, sin(x * 0.2 + 0.05) + cos(y * 0.3 - 0.02) AS v FROM g),
d AS (SELECT a.y, abs(a.v - b.v) AS ad FROM a JOIN b ON a.x = b.x AND a.y = b.y)
SELECT y, count(*)::BIGINT AS n, round(avg(ad), 6) AS avg_d, round(max(ad), 6) AS max_d,
       sum(CASE WHEN ad > 0.05 THEN 1 ELSE 0 END)::BIGINT AS n_above
FROM d GROUP BY y
"""


# --------------------------------------------------------------------------
# q34 — nodata fill (R5): neighborhood-mean imputation of deterministic
# holes. Cell values are multiples of 0.25 → sums are fp-exact in any
# order, so no rounding hazard.
# --------------------------------------------------------------------------

def q34_fill_nodata(spark: SparkSession, sf_dir: str) -> DataFrame:
    lat = raster_ops.affine_lattice(spark, 50, 40)
    cells = lat.select(
        "x",
        "y",
        F.when(
            (F.col("x") * 7 + F.col("y") * 13) % 11 < 2, F.lit(None).cast("double")
        ).otherwise(F.col("x") * 0.5 + F.col("y") * 0.25).alias("value"),
    )
    filled = raster_ops.fill_nodata(cells, radius=1)
    return filled.filter(F.col("value").isNull() & F.col("filled").isNotNull()).select(
        "x", "y", F.round("filled", 6).alias("filled")
    )


Q34_SQL = """
WITH g AS (
  SELECT CAST(i % 50 AS INT) AS x, CAST(i // 50 AS INT) AS y,
         CASE WHEN ((i % 50) * 7 + (i // 50) * 13) % 11 < 2 THEN NULL
              ELSE (i % 50) * 0.5 + (i // 50) * 0.25 END AS v
  FROM range(2000) t(i)),
holes AS (SELECT x, y FROM g WHERE v IS NULL),
fills AS (
  SELECT h.x, h.y, round(avg(n.v), 6) AS filled
  FROM holes h JOIN g n
    ON abs(n.x - h.x) <= 1 AND abs(n.y - h.y) <= 1
   AND NOT (n.x = h.x AND n.y = h.y) AND n.v IS NOT NULL
  GROUP BY h.x, h.y)
SELECT x, y, filled FROM fills
"""


# --------------------------------------------------------------------------
# q35 — crop-to-data bbox + homogeneity (R6) over a margin-padded band
# --------------------------------------------------------------------------

def q35_crop_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    lat = raster_ops.affine_lattice(spark, 64, 48)
    cells = lat.select(
        "x",
        "y",
        F.when(
            F.col("x").between(5, 58) & F.col("y").between(3, 44)
            & ((F.col("x") + F.col("y")) % 3 != 0),
            F.col("x") + F.col("y") * 0.5,
        ).alias("value"),
    )
    bbox = raster_ops.data_bbox(cells)
    homo = raster_ops.is_homogeneous(cells)
    return bbox.crossJoin(homo).select(
        F.col("x_min").cast("int").alias("x_min"),
        F.col("x_max").cast("int").alias("x_max"),
        F.col("y_min").cast("int").alias("y_min"),
        F.col("y_max").cast("int").alias("y_max"),
        F.col("n_valued").cast("long").alias("n_valued"),
        "homogeneous",
    )


Q35_SQL = """
WITH g AS (
  SELECT CAST(i % 64 AS INT) AS x, CAST(i // 64 AS INT) AS y,
         CASE WHEN (i % 64) BETWEEN 5 AND 58 AND (i // 64) BETWEEN 3 AND 44
                   AND ((i % 64) + (i // 64)) % 3 <> 0
              THEN (i % 64) + (i // 64) * 0.5 END AS v
  FROM range(3072) t(i))
SELECT CAST(min(x) AS INT) AS x_min, CAST(max(x) AS INT) AS x_max,
       CAST(min(y) AS INT) AS y_min, CAST(max(y) AS INT) AS y_max,
       count(*)::BIGINT AS n_valued,
       (count(DISTINCT v) = 1) AS homogeneous
FROM g WHERE v IS NOT NULL
"""


# --------------------------------------------------------------------------
# q36 — nearest-neighbor warp onto a destination lattice (R1/J7)
# --------------------------------------------------------------------------

def q36_warp_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = raster_ops.affine_lattice(spark, 80, 60).select(
        "x", "y", (F.col("x") * 0.25 + F.col("y") * 1.5).alias("value")
    )
    dst = raster_ops.affine_lattice(spark, 40, 30, x0=0.3, dx=0.7, y0=0.1, dy=0.9)
    warped = raster_ops.warp_to_lattice(src, 0.0, 0.25, 0.0, 0.25, dst)
    return warped.groupBy("y").agg(
        F.count("warped").cast("long").alias("n_hit"),
        F.round(F.avg("warped"), 6).alias("avg_v"),
    )


Q36_SQL = """
WITH src AS (
  SELECT CAST(i % 80 AS INT) AS x, CAST(i // 80 AS INT) AS y,
         (i % 80) * 0.25 + (i // 80) * 1.5 AS v
  FROM range(4800) t(i)),
dst AS (
  SELECT CAST(i % 40 AS INT) AS x, CAST(i // 40 AS INT) AS y,
         0.3 + (i % 40) * 0.7 AS lon, 0.1 + (i // 40) * 0.9 AS lat
  FROM range(1200) t(i)),
keyed AS (
  SELECT d.y, CAST(round((d.lon - 0.0) / 0.25, 0) AS INT) AS sx,
         CAST(round((d.lat - 0.0) / 0.25, 0) AS INT) AS sy
  FROM dst d)
SELECT k.y, count(s.v)::BIGINT AS n_hit, round(avg(s.v), 6) AS avg_v
FROM keyed k LEFT JOIN src s ON k.sx = s.x AND k.sy = s.y
GROUP BY k.y
"""


# --------------------------------------------------------------------------
# q37 — contour segments (R3, marching squares via tiled applyInPandas):
# per-level segment census. Non-relational stencil → rows-only check.
# --------------------------------------------------------------------------

def q37_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    lat = raster_ops.affine_lattice(spark, 60, 50)
    u = F.sin(F.col("x") * 0.37) * F.cos(F.col("y") * 0.23) * 10.0
    v = F.cos(F.col("x") * 0.11) * 5.0 + F.sin(F.col("y") * 0.31) * 3.0
    cells = lat.select("x", "y", raster_ops.windspeed(u, v).alias("value"))
    segs = raster_ops.contour_segments(cells, interval=2.2352, tile_size=32)
    return segs.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(F.min("x1"), 4).alias("min_x"),
        F.round(F.max("x2"), 4).alias("max_x"),
    )


# Marching squares IS relationally expressible per 2×2 square (join the
# 4 corners, generate crossing levels per square, standard 16-case edge
# table with linear interpolation) — the oracle below replays the tiled
# numpy kernel exactly, saddle cases and all. The engine keeps the
# applyInPandas tiling because per-square joins materialize 4× the grid
# at 100 TB, but the SQL form makes q37 a full value check, verifying
# tiling/halo ownership against a tile-free formulation.
Q37_SQL = """
WITH g AS (
  SELECT x, y,
         sin(x * 0.37) * cos(y * 0.23) * 10.0 AS u,
         cos(x * 0.11) * 5.0 + sin(y * 0.31) * 3.0 AS w
  FROM (SELECT xx.range AS x, yy.range AS y FROM range(60) xx, range(50) yy)),
gv AS (SELECT x, y, sqrt(u * u + w * w) AS v FROM g),
sq AS (
  SELECT a.x AS ix, a.y AS iy, a.v AS bl, b.v AS br, t.v AS tl, u.v AS tr
  FROM gv a
  JOIN gv b ON b.x = a.x + 1 AND b.y = a.y
  JOIN gv t ON t.x = a.x AND t.y = a.y + 1
  JOIN gv u ON u.x = a.x + 1 AND u.y = a.y + 1),
lv AS (
  SELECT sq.*, unnest(range(CAST(floor(least(bl, br, tl, tr) / 2.2352) AS BIGINT) + 1,
                            CAST(floor(greatest(bl, br, tl, tr) / 2.2352) AS BIGINT) + 1)) AS li
  FROM sq),
e AS (
  SELECT ix, iy, li * CAST(2.2352 AS DOUBLE) AS lvl, bl, br, tl, tr,
         (CASE WHEN bl >= li * CAST(2.2352 AS DOUBLE) THEN 1 ELSE 0 END
          + CASE WHEN br >= li * CAST(2.2352 AS DOUBLE) THEN 2 ELSE 0 END
          + CASE WHEN tr >= li * CAST(2.2352 AS DOUBLE) THEN 4 ELSE 0 END
          + CASE WHEN tl >= li * CAST(2.2352 AS DOUBLE) THEN 8 ELSE 0 END) AS cs
  FROM lv),
pts AS (
  SELECT ix, iy, lvl, cs,
         ix + greatest(0.0, least(1.0, (lvl - bl) / (br - bl))) AS botx,
         iy + greatest(0.0, least(1.0, (lvl - br) / (tr - br))) AS rgty,
         ix + greatest(0.0, least(1.0, (lvl - tl) / (tr - tl))) AS topx,
         iy + greatest(0.0, least(1.0, (lvl - bl) / (tl - bl))) AS lfty
  FROM e WHERE cs NOT IN (0, 15)),
m(cs, e1, e2) AS (VALUES
  (1,3,0),(2,0,1),(3,3,1),(4,1,2),(6,0,2),(7,3,2),(8,2,3),(9,2,0),
  (11,2,1),(12,1,3),(13,1,0),(14,0,3),(5,3,0),(5,1,2),(10,0,1),(10,2,3)),
seg AS (
  SELECT p.lvl AS level,
         CASE m.e1 WHEN 0 THEN botx WHEN 1 THEN ix + 1.0 WHEN 2 THEN topx ELSE ix + 0.0 END AS x1,
         CASE m.e2 WHEN 0 THEN botx WHEN 1 THEN ix + 1.0 WHEN 2 THEN topx ELSE ix + 0.0 END AS x2
  FROM pts p JOIN m ON m.cs = p.cs)
SELECT level, count(*)::BIGINT AS n_segments,
       round(min(x1), 4) AS min_x, round(max(x2), 4) AS max_x
FROM seg GROUP BY level
"""


# --------------------------------------------------------------------------
# q38 — UTM projection over derived positions (§2.9 CRS conversion,
# odin_common/src/utm.rs:141-241). Oracle = the identical transverse-
# Mercator series emitted as SQL (proj.*_sql), evaluated by DuckDB's
# libm — a genuine cross-engine parity check of the math.
# --------------------------------------------------------------------------

def q38_utm_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.functions import proj

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        ((F.col("value") * 0.7) % 360 - 180).alias("lon"),
        ((F.col("value") * 0.3) % 160 - 80).alias("lat"),
    )
    utm = pts.select(
        proj.utm_zone("lon").alias("zone"),
        proj.utm_band("lat").alias("band"),
        F.round(proj.utm_easting("lon", "lat"), 6).alias("e"),
        F.round(proj.utm_northing("lon", "lat"), 6).alias("n"),
    )
    return utm.groupBy("zone", "band").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.round(F.sum("e"), 3).alias("sum_e"),
        F.round(F.sum("n"), 3).alias("sum_n"),
    )


def _q38_sql() -> str:
    from odin_rs_spark.functions import proj

    bands = "CDEFGHJKLMNPQRSTUVWX"
    band_sql = f"{list(bands)!r}[least(greatest(CAST(floor((lat + 80.0) / 8.0) AS INT), 0), 19) + 1]"
    return f"""
WITH pts AS (
  SELECT (value * 0.7) % 360 - 180 AS lon,
         (value * 0.3) % 160 - 80  AS lat
  FROM events),
utm AS (
  SELECT {proj.utm_zone_sql('lon')} AS zone,
         {band_sql} AS band,
         round({proj.utm_easting_sql('lon', 'lat')}, 6) AS e,
         round({proj.utm_northing_sql('lon', 'lat')}, 6) AS n
  FROM pts)
SELECT zone, band, count(*)::BIGINT AS n_pts,
       round(sum(e), 3) AS sum_e, round(sum(n), 3) AS sum_n
FROM utm GROUP BY zone, band
"""


# --------------------------------------------------------------------------
# q39 — point-in-polygon containment census (F6,
# odin_common/src/geo.rs:409; cheap-check-first pattern
# odin_orbital/src/overpass.rs:463). Ray-casting as a higher-order-
# function expression on the Spark side; the oracle unrolls the same
# crossing test per edge.
# --------------------------------------------------------------------------

_Q39_POLY = [(-60.0, -40.0), (20.0, -55.0), (70.0, 10.0), (10.0, 60.0), (-50.0, 35.0)]


def q39_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.functions import polygon as poly_fns

    ev = _t(spark, sf_dir, "events")
    poly = F.array(
        *[
            F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat"))
            for x, y in _Q39_POLY
        ]
    )
    pts = ev.select(
        "event_type",
        ((F.col("value") * 0.7) % 360 - 180).alias("lon"),
        ((F.col("value") * 0.3) % 170 - 85).alias("lat"),
    )
    return pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(
            poly_fns.point_in_polygon("lon", "lat", poly).cast("bigint")
        ).alias("n_inside"),
    )


def _q39_sql() -> str:
    ring = _Q39_POLY + [_Q39_POLY[0]]
    terms = []
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        terms.append(
            f"(CASE WHEN (({y1!r} > lat) != ({y2!r} > lat)) AND"
            f" (lon < ({x2!r} - {x1!r}) * (lat - {y1!r}) / ({y2!r} - {y1!r}) + {x1!r})"
            f" THEN 1 ELSE 0 END)"
        )
    crossings = " + ".join(terms)
    return f"""
WITH pts AS (
  SELECT event_type,
         (value * 0.7) % 360 - 180 AS lon,
         (value * 0.3) % 170 - 85  AS lat
  FROM events)
SELECT event_type, count(*)::BIGINT AS n_pts,
       sum(CASE WHEN ({crossings}) % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_inside
FROM pts GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q40 — GOES-R fixed-grid projection of a scan-angle lattice (§2.9,
# odin_goesr/src/geo.rs:90-117; off-Earth cells dropped like the mask
# scan odin_goesr/src/lib.rs:513-529). Oracle mirrors the PUG formula.
# --------------------------------------------------------------------------

def q40_goes_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.functions import proj

    grid = spark.range(3600).select(
        (F.col("id") % 60).alias("gx"), (F.col("id") / 60).cast("long").alias("gy")
    )
    ang = grid.select(
        "gy",
        (F.lit(-0.18) + F.col("gx") * F.lit(0.0061)).alias("x"),
        (F.lit(-0.18) + F.col("gy") * F.lit(0.0061)).alias("y"),
    )
    geo = ang.select("gy", proj.goes_to_lonlat("x", "y", -75.0).alias("g")).filter(
        F.col("g.lon").isNotNull()
    )
    return geo.groupBy("gy").agg(
        F.count(F.lit(1)).alias("n_on_earth"),
        F.round(F.sum(F.round(F.col("g.lon"), 6)), 3).alias("sum_lon"),
        F.round(F.sum(F.round(F.col("g.lat"), 6)), 3).alias("sum_lat"),
    )


def _q40_sql() -> str:
    from odin_rs_spark.functions import proj

    lat_sql = proj.goes_lat_sql("x", "y")
    lon_sql = proj.goes_lon_sql("x", "y", -75.0)
    disc = (
        f"(({-2.0 * proj.GOES_H!r} * cos(x) * cos(y))^2 - 4.0 *"
        f" (sin(x)^2 + cos(x)^2 * (cos(y)^2 + {proj._REQ2_RPOL2!r} * sin(y)^2)) *"
        f" {proj.GOES_H**2 - proj.GOES_REQ**2!r})"
    )
    return f"""
WITH ang AS (
  SELECT i // 60 AS gy,
         -0.18 + (i % 60) * 0.0061 AS x,
         -0.18 + (i // 60) * 0.0061 AS y
  FROM range(3600) t(i)),
geo AS (
  SELECT gy, {lon_sql} AS lon, {lat_sql} AS lat
  FROM ang WHERE {disc} >= 0)
SELECT gy, count(*)::BIGINT AS n_on_earth,
       round(sum(round(lon, 6)), 3) AS sum_lon,
       round(sum(round(lat, 6)), 3) AS sum_lat
FROM geo GROUP BY gy
"""


# --------------------------------------------------------------------------
# q41 — relational polygon metrics (shoelace area / winding / centroid /
# bbox from exploded vertex rows; odin_common/src/geo.rs:232-468,
# cartographic.rs:221-285). Vertices-as-rows is the 100 TB layout:
# one shuffle on poly_id, window lead() for the wrap edge.
# --------------------------------------------------------------------------

def q41_polygon_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from odin_rs_spark.functions.polygon import polygon_metrics_from_vertices

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy(F.col("user_id") % 50).orderBy("ts", "event_id")
    verts = ev.select(
        (F.col("user_id") % 50).alias("poly_id"),
        F.row_number().over(w).alias("seq"),
        ((F.col("value") * 0.7) % 360 - 180).alias("lon"),
        ((F.col("value") * 0.3) % 170 - 85).alias("lat"),
    ).filter(F.col("seq") <= 8)
    m = polygon_metrics_from_vertices(verts)
    return m.select(
        "poly_id",
        "n_vertices",
        F.round("area_deg2", 4).alias("area_deg2"),
        F.col("clockwise").cast("int").alias("clockwise"),
        F.round("centroid_lon", 6).alias("centroid_lon"),
        F.round("centroid_lat", 6).alias("centroid_lat"),
        F.round("west", 6).alias("west"),
        F.round("south", 6).alias("south"),
        F.round("east", 6).alias("east"),
        F.round("north", 6).alias("north"),
    )


Q41_SQL = """
WITH verts AS (
  SELECT poly_id, seq, lon, lat FROM (
    SELECT user_id % 50 AS poly_id,
           row_number() OVER (PARTITION BY user_id % 50 ORDER BY ts, event_id) AS seq,
           (value * 0.7) % 360 - 180 AS lon,
           (value * 0.3) % 170 - 85  AS lat
    FROM events) WHERE seq <= 8),
edges AS (
  SELECT poly_id, lon, lat,
         lon * coalesce(lead(lat) OVER w, first_value(lat) OVER w)
         - coalesce(lead(lon) OVER w, first_value(lon) OVER w) * lat AS cr
  FROM verts WINDOW w AS (PARTITION BY poly_id ORDER BY seq
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT poly_id, count(*)::BIGINT AS n_vertices,
       round(abs(sum(cr)) / 2.0, 4) AS area_deg2,
       (CASE WHEN sum(cr) < 0 THEN 1 ELSE 0 END) AS clockwise,
       round(avg(lon), 6) AS centroid_lon, round(avg(lat), 6) AS centroid_lat,
       round(min(lon), 6) AS west,  round(min(lat), 6) AS south,
       round(max(lon), 6) AS east,  round(max(lat), 6) AS north
FROM edges GROUP BY poly_id
"""


# --------------------------------------------------------------------------
# q42 — stale-key eviction sweep (T3 batch form: the ADS-B drop_after
# "removed" list, odin_adsb/src/lib.rs:77-101): keys whose newest record
# is older than frontier - TTL, with their last-seen state.
# --------------------------------------------------------------------------

def q42_stale_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    latest = window_ops.latest_per_key(ev, ["user_id"], "ts", tiebreak=["event_id"])
    frontier = ev.agg(F.max("ts").alias("__frontier"))
    return (
        latest.crossJoin(F.broadcast(frontier))
        .filter(
            F.col("ts") < F.col("__frontier") - F.expr("INTERVAL 6 HOURS")
        )
        .select("user_id", F.col("ts").alias("last_seen"), F.col("event_id").alias("last_event_id"))
    )


Q42_SQL = """
WITH latest AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events) WHERE rk = 1),
frontier AS (SELECT max(ts) AS f FROM events)
SELECT user_id, ts AS last_seen, event_id AS last_event_id
FROM latest, frontier WHERE ts < f - INTERVAL 6 HOUR
"""


# --------------------------------------------------------------------------
# q43 — inactive-source detection sweep (T4, check_inactive
# odin_sentinel/src/alarm.rs:348-449) via streaming.state.inactive_flags.
# --------------------------------------------------------------------------

def q43_inactive_devices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.streaming.state import inactive_flags

    ev = _t(spark, sf_dir, "events")
    out = inactive_flags(ev, ["user_id", "event_type"], "ts", 3600.0 * 12)
    return out.select(
        "user_id",
        "event_type",
        "last_update",
        F.col("inactive").cast("int").alias("inactive"),
    )


Q43_SQL = """
WITH latest AS (
  SELECT user_id, event_type, max(ts) AS last_update FROM events GROUP BY 1, 2),
frontier AS (SELECT max(ts) AS f FROM events)
SELECT user_id, event_type, last_update,
       (CASE WHEN epoch(f) - epoch(last_update) > 43200.0 THEN 1 ELSE 0 END) AS inactive
FROM latest, frontier
"""


# --------------------------------------------------------------------------
# q44 — alarm suppression window (T5 batch form, check_new_alarm
# odin_sentinel/src/alarm.rs:199-236): an event is suppressed when the
# previous event of the same (user, type) lies within the window.
# --------------------------------------------------------------------------

def q44_alarm_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "suppressed",
        F.when(gap_us.isNull(), F.lit(0))
        .when(gap_us < 3600 * 1_000_000, F.lit(1))
        .otherwise(F.lit(0)),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_alarms"),
        F.sum("suppressed").cast("bigint").alias("n_suppressed"),
    )


Q44_SQL = """
WITH flagged AS (
  SELECT event_type,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w < 3600000000 THEN 1
              ELSE 0 END AS suppressed
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC))
SELECT event_type, count(*)::BIGINT AS n_alarms,
       sum(suppressed)::BIGINT AS n_suppressed
FROM flagged GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q45 — SBS decoder round-trip (S7, odin_adsb/src/sbs.rs:27-151): build
# SBS position lines from events, run the from_csv decoder, aggregate
# the RECOVERED values. The oracle aggregates the original columns
# directly — any parse error breaks the hash match.
# --------------------------------------------------------------------------

def q45_sbs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.sources.formats import parse_sbs

    # format/parse is per-row CPU; the single-row-group local parquet
    # arrives as ONE partition, so spread before the codec chain
    ev = _t(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    lines = ev.select(
        F.format_string(
            "MSG,3,1,1,%s,1,%s,%s,%s,%s,,%.1f,,,%.6f,%.6f,,,0,0,0,0",
            F.lower(F.hex("user_id")),
            F.date_format("ts", "yyyy/MM/dd"),
            F.date_format("ts", "HH:mm:ss.SSS"),
            F.date_format("ts", "yyyy/MM/dd"),
            F.date_format("ts", "HH:mm:ss.SSS"),
            F.col("value"),
            (F.col("value") * 0.3) % 170 - 85,
            (F.col("value") * 0.7) % 360 - 180,
        ).alias("value")
    )
    decoded = parse_sbs(lines)
    return decoded.groupBy("icao24").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.round(F.sum("altitude_ft"), 3).alias("sum_alt"),
        F.round(F.sum("lat"), 4).alias("sum_lat"),
        F.round(F.sum("lon"), 4).alias("sum_lon"),
        F.sum(F.unix_millis("ts")).alias("sum_ts_ms"),
    )


Q45_SQL = """
SELECT lower(hex(user_id)) AS icao24,
       count(*)::BIGINT AS n_msgs,
       round(sum(round(value, 1)), 3) AS sum_alt,
       round(sum(round((value * 0.3) % 170 - 85, 6)), 4) AS sum_lat,
       round(sum(round((value * 0.7) % 360 - 180, 6)), 4) AS sum_lon,
       sum(epoch_ms(date_trunc('milliseconds', ts)))::BIGINT AS sum_ts_ms
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# q46 — FIRMS confidence recode (S5, odin_orbital/src/firms.rs): letter
# and numeric confidence codes banded to low/nominal/high.
# --------------------------------------------------------------------------

def q46_firms_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.sources.formats import parse_firms_csv

    ev = _t(spark, sf_dir, "events")
    # synthesize the confidence column: letter codes for some rows,
    # numeric 0-100 strings for others (both appear in real FIRMS feeds)
    raw = ev.select(
        F.col("event_id"),
        (F.col("value") * 0.3 % 170 - 85).alias("latitude"),
        (F.col("value") * 0.7 % 360 - 180).alias("longitude"),
        F.lit(None).cast("double").alias("bright_ti4"),
        F.lit(None).cast("double").alias("scan"),
        F.lit(None).cast("double").alias("track"),
        F.date_format("ts", "yyyy-MM-dd").alias("acq_date"),
        F.date_format("ts", "HHmm").alias("acq_time"),
        F.lit("N").alias("satellite"),
        F.lit("VIIRS").alias("instrument"),
        F.when(F.col("event_id") % 4 == 0, F.lit("l"))
        .when(F.col("event_id") % 4 == 1, F.lit("n"))
        .when(F.col("event_id") % 4 == 2, F.lit("h"))
        .otherwise((F.col("event_id") % 101).cast("string"))
        .alias("confidence"),
        F.lit("2.0NRT").alias("version"),
        F.lit(None).cast("double").alias("bright_ti5"),
        F.col("value").alias("frp"),
        F.lit("N").alias("daynight"),
    )
    parsed = parse_firms_csv(raw)
    return parsed.groupBy("confidence_class").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("frp"), 4).alias("sum_frp"),
    )


Q46_SQL = """
WITH conf AS (
  SELECT value,
         CASE WHEN event_id % 4 = 0 THEN 'l'
              WHEN event_id % 4 = 1 THEN 'n'
              WHEN event_id % 4 = 2 THEN 'h'
              ELSE CAST(event_id % 101 AS VARCHAR) END AS confidence
  FROM events),
recoded AS (
  SELECT value,
         CASE WHEN lower(confidence) IN ('l', 'low') THEN 'low'
              WHEN lower(confidence) IN ('n', 'nominal') THEN 'nominal'
              WHEN lower(confidence) IN ('h', 'high') THEN 'high'
              WHEN TRY_CAST(confidence AS DOUBLE) < 30 THEN 'low'
              WHEN TRY_CAST(confidence AS DOUBLE) < 80 THEN 'nominal'
              WHEN TRY_CAST(confidence AS DOUBLE) >= 80 THEN 'high'
              ELSE 'unknown' END AS confidence_class
  FROM conf)
SELECT confidence_class, count(*)::BIGINT AS n, round(sum(value), 4) AS sum_frp
FROM recoded GROUP BY confidence_class
"""


# --------------------------------------------------------------------------
# q47 — GeoJSON feature scan round-trip (S13, odin_bushfire/src/lib.rs:
# 198-218): build FeatureCollection docs (one per user), explode with
# the decoder, recover per-feature properties + Point coordinates.
# --------------------------------------------------------------------------

def q47_geojson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StringType, StructField, StructType

    from odin_rs_spark.sources.formats import geojson_point, parse_geojson

    ev = _t(spark, sf_dir, "events")
    # round BEFORE formatting so both sides apply one identical rounding
    # rule (F.round / DuckDB round, both half-away-from-zero); formatting an
    # already-rounded value makes %.6f a pure serialization, not a second
    # rounding step (Java HALF_UP on the raw double diverged from the oracle
    # on 6th-decimal ties)
    feature = F.format_string(
        '{"type":"Feature","id":"e%d","geometry":{"type":"Point",'
        '"coordinates":[%.6f,%.6f]},"properties":{"etype":"%s"}}',
        F.col("event_id"),
        F.round((F.col("value") * 0.7) % 360 - 180, 6),
        F.round((F.col("value") * 0.3) % 170 - 85, 6),
        F.col("event_type"),
    )
    docs = ev.groupBy("user_id").agg(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.concat_ws(",", F.collect_list(feature)),
            F.lit("]}"),
        ).alias("value")
    )
    props = StructType([StructField("etype", StringType())])
    feats = parse_geojson(docs, props)
    pt = geojson_point("coordinates_json")
    return feats.groupBy(F.col("props.etype").alias("etype")).agg(
        F.count(F.lit(1)).alias("n_features"),
        # cast to double: the oracle declares count(*)::DOUBLE and the
        # driver canonicalizer is dtype-sensitive (long 2006 != double
        # 2006.0 even when rows/schema match) — round-2 hash failure
        F.sum(F.col("props.etype").isNotNull().cast("int")).cast("double").alias("n_props"),
        F.round(F.sum(pt["lon"]), 3).alias("sum_lon"),
        F.round(F.sum(pt["lat"]), 3).alias("sum_lat"),
    )


Q47_SQL = """
SELECT event_type AS etype, count(*)::BIGINT AS n_features,
       count(*)::DOUBLE AS n_props,
       round(sum(round((value * 0.7) % 360 - 180, 6)), 3) AS sum_lon,
       round(sum(round((value * 0.3) % 170 - 85, 6)), 3) AS sum_lat
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q48 — Mode-S JSON decode dispatch (S8, odin_adsb/src/rs1090.rs:89-234):
# serialize frames as JSON lines, decode, count per dispatched kind.
# --------------------------------------------------------------------------

def q48_mode_s_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.sources.formats import parse_mode_s_json

    # same single-partition-scan spread as q45: JSON encode+decode is
    # per-row CPU that must run at full width
    ev = _t(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    frame = F.to_json(
        F.struct(
            F.when(F.col("event_id") % 3 == 0, 17).otherwise(4).alias("df"),
            F.lower(F.hex("user_id")).alias("icao24"),
            F.when(F.col("event_id") % 6 == 0, (F.col("value") * 0.3) % 170 - 85)
            .alias("latitude"),
            F.when(F.col("event_id") % 6 == 0, (F.col("value") * 0.7) % 360 - 180)
            .alias("longitude"),
            F.when(F.col("event_id") % 6 == 3, F.concat(F.lit("FL"), F.col("user_id")))
            .alias("callsign"),
            F.col("value").alias("altitude"),
            (F.unix_micros("ts") / 1e6).alias("timestamp"),
        )
    )
    lines = ev.select(frame.alias("value"))
    decoded = parse_mode_s_json(lines)
    return decoded.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("altitude"), 4).alias("sum_alt"),
    )


Q48_SQL = """
WITH frames AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN 17 ELSE 4 END AS df,
         CASE WHEN event_id % 6 = 0 THEN 1 ELSE 0 END AS has_pos,
         CASE WHEN event_id % 6 = 3 THEN 1 ELSE 0 END AS has_callsign,
         value
  FROM events),
dispatched AS (
  SELECT value,
         CASE WHEN df = 17 AND has_pos = 1 THEN 'position'
              WHEN df = 17 AND has_callsign = 1 THEN 'identification'
              WHEN df = 4 THEN 'altitude'
              ELSE 'status' END AS kind
  FROM frames)
SELECT kind, count(*)::BIGINT AS n, round(sum(value), 4) AS sum_alt
FROM dispatched GROUP BY kind
"""


# --------------------------------------------------------------------------
# q49 — multimodal feature extraction (ONNX classifier plumbing,
# odin_onnx/src/lib.rs:47-150; R9). The stubbed decode is hash-derived →
# not SQL-expressible → rows-only check; the similarity leg has an exact
# oracle (self-similarity ≡ 1).
# --------------------------------------------------------------------------

def q49_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import multimodal as mm_ops

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").cast("binary").alias("content"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )
    feats = mm_ops.extract_features(media, n_features=16)
    scored = media.select("media_id", mm_ops.classify_stub("content").alias("pred"))
    return (
        feats.join(scored, "media_id")
        .groupBy(F.col("pred.label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("mean_val"), 6).alias("avg_feature_mean"),
            F.round(F.avg("pred.confidence"), 6).alias("avg_confidence"),
        )
    )


# The stub decode stream is a sha256 HEX-STRING iteration (see
# multimodal._fake_pixels), so the oracle replays the whole media
# pipeline — features, mean, argmax classify — in SQL.
_F32 = "CAST(concat('0x', substr({d}, 1 + 8 * k, 8)) AS BIGINT)::DOUBLE / 4294967296.0"

Q49_SQL = f"""
WITH h AS (SELECT doc_id, sha256(sha256(text)) AS d1 FROM documents),
h2 AS (SELECT doc_id, d1, sha256(d1) AS d2 FROM h),
f AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, 8), k -> {_F32.format(d='d1')})
                  || list_transform(range(0, 8), k -> {_F32.format(d='d2')})) / 16.0 AS mean_val,
         CAST(concat('0x', substr(d1, 1, 8)) AS BIGINT)::DOUBLE / 4294967296.0 AS s0,
         CAST(concat('0x', substr(d1, 9, 8)) AS BIGINT)::DOUBLE / 4294967296.0 AS s1,
         CAST(concat('0x', substr(d1, 17, 8)) AS BIGINT)::DOUBLE / 4294967296.0 AS s2
  FROM h2),
lab AS (
  SELECT doc_id, mean_val, greatest(s0, s1, s2) AS confidence,
         CASE WHEN s0 = greatest(s0, s1, s2) THEN 'smoke'
              WHEN s1 = greatest(s0, s1, s2) THEN 'fire'
              ELSE 'none' END AS label
  FROM f)
SELECT label, count(*)::BIGINT AS n,
       round(avg(mean_val), 6) AS avg_feature_mean,
       round(avg(confidence), 6) AS avg_confidence
FROM lab GROUP BY label
"""


def q50_image_self_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import multimodal as mm_ops

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").cast("binary").alias("content"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )
    sim = mm_ops.image_similarity(media, media)
    return sim.select("media_id", F.round("similarity", 4).alias("similarity"))


Q50_SQL = """
SELECT doc_id AS media_id, 1.0 AS similarity FROM documents
"""


# --------------------------------------------------------------------------
# q51 — LOESS smoothing (W7, odin_image/src/loess.rs:20-116): windowed
# local linear regression, no UDF. x = event_id (unique → deterministic
# frame ordering).
# --------------------------------------------------------------------------

def q51_loess(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("event_id").cast("double").alias("x"), F.col("value").alias("y")
    )
    sm = window_ops.loess_smooth(ev, "user_id", "x", "y", bandwidth_rows=5)
    return sm.select(
        "user_id",
        F.col("x").cast("long").alias("event_id"),
        F.round("y_smooth", 6).alias("y_smooth"),
    )


Q51_SQL = """
WITH pts AS (
  SELECT user_id, CAST(event_id AS DOUBLE) AS x, value AS y FROM events),
anch AS (  -- identical per-key anchor to the engine's cancellation guard
  SELECT user_id, x, x - min(x) OVER (PARTITION BY user_id) AS xa, y
  FROM pts),
stats AS (
  SELECT user_id, x,
         avg(xa) OVER w AS mx, avg(y) OVER w AS my, xa,
         avg(xa * y) OVER w - avg(xa) OVER w * avg(y) OVER w AS cov,
         avg(xa * xa) OVER w - avg(xa) OVER w * avg(xa) OVER w AS var
  FROM anch
  WINDOW w AS (PARTITION BY user_id ORDER BY x ASC
               ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING))
SELECT user_id, CAST(x AS BIGINT) AS event_id,
       round(my + (CASE WHEN var > 0 THEN cov / var ELSE 0.0 END) * (xa - mx), 6)
         AS y_smooth
FROM stats
"""


# --------------------------------------------------------------------------
# q52 — histogram distance (A8, odin_image/src/lib.rs:241-246): compare
# the value distribution of two event classes.
# --------------------------------------------------------------------------

def q52_histogram_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h1 = agg_ops.histogram(ev.filter(F.col("event_type") == "click"), "value", 25.0)
    h2 = agg_ops.histogram(ev.filter(F.col("event_type") == "purchase"), "value", 25.0)
    out = agg_ops.histogram_distance(h1, h2)
    return out.select(F.round("l1_distance", 6).alias("l1_distance"))


Q52_SQL = """
WITH h1 AS (
  SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*)::BIGINT AS n1
  FROM events WHERE event_type = 'click' GROUP BY 1),
h2 AS (
  SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*)::BIGINT AS n2
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
j AS (
  SELECT coalesce(h1.n1, 0) AS n1, coalesce(h2.n2, 0) AS n2
  FROM h1 FULL OUTER JOIN h2 USING (bin))
SELECT round(sum(abs(n1 - n2))::DOUBLE / greatest(sum(n1) + sum(n2), 1), 6)
         AS l1_distance
FROM j
"""


# --------------------------------------------------------------------------
# q53 — nearest-track-point join (J8, odin_orbital/src/overpass.rs:
# 148-171): k=1 nearest of a small ground-track per event point;
# broadcast NLJ + rank, deterministic idx tie-break.
# --------------------------------------------------------------------------

def q53_nearest_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("value") * 0.7) % 360 - 180).alias("lon"),
        ((F.col("value") * 0.3) % 170 - 85).alias("lat"),
    )
    track = spark.range(100).select(
        F.col("id").alias("track_idx"),
        (F.col("id") * 3.6 - 180.0).alias("t_lon"),
        (F.sin(F.col("id") * 0.2) * 60.0).alias("t_lat"),
    )
    near = join_ops.haversine_nearest_join(
        pts, track, parallelism=spark.sparkContext.defaultParallelism
    )
    return near.groupBy("track_idx").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("__dist"), 3).alias("sum_km"),
    )


Q53_SQL = """
WITH pts AS (
  SELECT event_id,
         (value * 0.7) % 360 - 180 AS lon,
         (value * 0.3) % 170 - 85  AS lat
  FROM events),
track AS (
  SELECT i AS track_idx, i * 3.6 - 180.0 AS t_lon, sin(i * 0.2) * 60.0 AS t_lat
  FROM range(100) t(i)),
scored AS (
  SELECT p.event_id, t.track_idx,
         round(2 * 6371.0088 * asin(sqrt(
           sin(radians(t.t_lat - p.lat) / 2) * sin(radians(t.t_lat - p.lat) / 2)
           + cos(radians(p.lat)) * cos(radians(t.t_lat))
             * sin(radians(t.t_lon - p.lon) / 2) * sin(radians(t.t_lon - p.lon) / 2))), 6)
           AS dist,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY round(2 * 6371.0088 * asin(sqrt(
                              sin(radians(t.t_lat - p.lat) / 2) * sin(radians(t.t_lat - p.lat) / 2)
                              + cos(radians(p.lat)) * cos(radians(t.t_lat))
                                * sin(radians(t.t_lon - p.lon) / 2) * sin(radians(t.t_lon - p.lon) / 2))), 6) ASC,
                            t.track_idx ASC) AS rk
  FROM pts p CROSS JOIN track t)
SELECT track_idx, count(*)::BIGINT AS n_points, round(sum(dist), 3) AS sum_km
FROM scored WHERE rk = 1 GROUP BY track_idx
"""


# --------------------------------------------------------------------------
# q54 — evidence-ref resolution (J4, odin_sentinel/src/alarm.rs:276-338):
# each event carries refs to its ≤3 predecessors (same user); explode +
# equi-join against the record store recovers the referenced values.
# --------------------------------------------------------------------------

def q54_evidence_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, -1)
    )
    with_refs = ev.select(
        "event_id", "event_type", F.collect_list("event_id").over(w).alias("evidences")
    ).filter(F.size("evidences") > 0)
    store = ev.select("event_id", "value")
    resolved = join_ops.evidence_join(
        with_refs, "evidences", store, store_id="event_id", how="inner"
    )
    return resolved.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.round(F.sum("ev_value"), 4).alias("sum_ref_value"),
    )


Q54_SQL = """
WITH rn AS (
  SELECT event_id, event_type, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rk
  FROM events)
SELECT e.event_type, count(*)::BIGINT AS n_refs,
       round(sum(v.value), 4) AS sum_ref_value
FROM rn e JOIN rn v
  ON e.user_id = v.user_id AND v.rk BETWEEN e.rk - 3 AND e.rk - 1
GROUP BY e.event_type
"""


# --------------------------------------------------------------------------
# q55 — IVF ANN with a DISTRIBUTED Lloyd-refined centroid set (similarity,
# beyond-reference): one spherical-kmeans iteration from fixed-seed
# centroids, run as pure DataFrame algebra (broadcast assign + groupBy
# mean update) — the trained-IVF path, restructured in round 3 so the
# oracle can replay it (the old sampled-driver-kmeans variant was the one
# no_oracle row in CORRECTNESS_r02; it remains as the pytest-covered
# `ivf_topk` operator).
# --------------------------------------------------------------------------

_Q55_SEEDS = [11, 23, 37, 41, 53, 67, 79, 97]


def q55_ivf_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim_ops.ivf_lloyd_topk(
        emb, queries, _Q55_SEEDS, iters=1, k=5, nprobe=3
    )
    return out.select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")


# --------------------------------------------------------------------------
# q59 — IVF ANN with a deterministic fixed-id centroid set: the full
# inverted-file pipeline (assign → probe → re-rank) is reproducible in
# plain SQL, so unlike the KMeans variant this one is oracle-checked.
# --------------------------------------------------------------------------

_Q59_CENTS = [11, 23, 37, 41, 53, 67, 79, 97]


def q59_ivf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim_ops.ivf_fixed_topk(emb, queries, _Q59_CENTS, k=5, nprobe=3)
    return out.select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")


_Q59_CENT_COS = (
    "list_sum(list_transform(range(1, 65), i -> {a}.embedding[i]::DOUBLE * c.cv[i]::DOUBLE))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> {a}.embedding[i]::DOUBLE * {a}.embedding[i]::DOUBLE)))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> c.cv[i]::DOUBLE * c.cv[i]::DOUBLE))))"
)

Q59_SQL = f"""
WITH cents AS (
  SELECT list_position({_Q59_CENTS}, vec_id) - 1 AS cell, embedding AS cv
  FROM embeddings WHERE vec_id IN {tuple(_Q59_CENTS)}),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_Q59_CENT_COS.format(a='e')} DESC, c.cell ASC) AS rn
    FROM embeddings e, cents c) WHERE rn = 1),
probes AS (
  SELECT query_id, cell FROM (
    SELECT e.vec_id AS query_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_Q59_CENT_COS.format(a='e')} DESC, c.cell ASC) AS rn
    FROM embeddings e, cents c WHERE e.vec_id < 5) WHERE rn <= 3),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id
  FROM probes p JOIN assigned a ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.vec_id, {_COS.format(a='qe', b='e')} AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings qe ON qe.vec_id = c.query_id)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM scored) WHERE rank <= 5
"""


# q55's oracle: q59's skeleton plus one Lloyd mean-update CTE between the
# seed assignment and the IVF tail. Centroid components are rounded to 6dp
# on BOTH sides (Spark F.round / DuckDB round, both half-away-from-zero)
# so cross-engine fp summation order in avg() can't flip a downstream
# argmax.
Q55_SQL = f"""
WITH seeds AS (
  SELECT list_position({_Q55_SEEDS}, vec_id) - 1 AS cell, embedding AS cv
  FROM embeddings WHERE vec_id IN {tuple(_Q55_SEEDS)}),
assign0 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_Q59_CENT_COS.format(a='e')} DESC, c.cell ASC) AS rn
    FROM embeddings e, seeds c) WHERE rn = 1),
cmeans AS (
  SELECT a.cell, t.i AS pos, round(avg(e.embedding[t.i]::DOUBLE), 6) AS m
  FROM assign0 a JOIN embeddings e ON e.vec_id = a.vec_id, range(1, 65) t(i)
  GROUP BY a.cell, t.i),
cents AS (
  SELECT cell, list(m ORDER BY pos) AS cv FROM cmeans GROUP BY cell),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_Q59_CENT_COS.format(a='e')} DESC, c.cell ASC) AS rn
    FROM embeddings e, cents c) WHERE rn = 1),
probes AS (
  SELECT query_id, cell FROM (
    SELECT e.vec_id AS query_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_Q59_CENT_COS.format(a='e')} DESC, c.cell ASC) AS rn
    FROM embeddings e, cents c WHERE e.vec_id < 5) WHERE rn <= 3),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id
  FROM probes p JOIN assigned a ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id),
scored AS (
  SELECT c.query_id, c.vec_id, {_COS.format(a='qe', b='e')} AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings qe ON qe.vec_id = c.query_id)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM scored) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# q56 — FLAGSHIP: the reference's canonical hotspot flow end-to-end
# (SURVEY §3.1/§7.1): raw grid batches → mask filter (F1) → quality
# recode (F2) → GOES fixed-grid → lon/lat (S4/§2.9) → quantized DEM
# join (J1) → per-batch class counts (A1) → newest-N batch retention
# (W1). Every layer of the engine in one oracle-checked query.
# --------------------------------------------------------------------------

def q56_hotspot_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.functions import proj
    from odin_rs_spark.functions.geo import quantize_cell

    ev = _t(spark, sf_dir, "events")
    # raw "grid cell" batches: batch = hour bucket, mask from value
    raw = ev.select(
        F.date_trunc("hour", "ts").alias("batch_ts"),
        (F.col("event_id") % 50).cast("int").alias("mask"),
        (F.lit(-0.09) + (F.col("event_id") % 60).cast("double") * 0.003).alias("x"),
        (F.lit(-0.09) + ((F.col("event_id") / 60) % 60).cast("int").cast("double") * 0.003).alias("y"),
        "value",
    )
    fire = filter_ops.mask_range(raw, "mask", 10, 35)
    classed = fire.withColumn(
        "pixel_class",
        F.when(F.col("mask") <= 15, "good")
        .when(F.col("mask") <= 25, "high")
        .otherwise("medium"),
    )
    geo = classed.withColumn("g", proj.goes_to_lonlat("x", "y", -75.0)).filter(
        F.col("g.lon").isNotNull()
    )
    # synthetic DEM lattice at 0.5° resolution, broadcast equi-join on
    # quantized cells (J1: the scale trick replacing raster sampling)
    dem = (
        spark.range(720 * 360)
        .select(
            ((F.col("id") % 720) - 360).cast("int").alias("cx"),
            ((F.col("id") / 720).cast("int") - 180).alias("cy"),
        )
        .withColumn("elev_m", ((F.col("cx") * 7 + F.col("cy") * 13) % 3000).cast("double"))
    )
    enriched = geo.join(
        F.broadcast(dem),
        (quantize_cell(F.col("g.lon"), 0.5) == F.col("cx"))
        & (quantize_cell(F.col("g.lat"), 0.5) == F.col("cy")),
        "left",
    )
    counts = enriched.groupBy("batch_ts", "pixel_class").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.round(F.col("g.lat"), 6)), 3).alias("sum_lat"),
        F.round(F.avg("elev_m"), 4).alias("avg_elev_m"),
    )
    # W1: newest-N batch retention (ring buffer of batches)
    recent = window_ops.last_n_per_key(
        counts.withColumn("__one", F.lit(1)), ["pixel_class"], "batch_ts", 24
    ).drop("__one")
    return recent


def _q56_sql() -> str:
    from odin_rs_spark.functions import proj

    return f"""
WITH raw AS (
  SELECT date_trunc('hour', ts) AS batch_ts,
         CAST(event_id % 50 AS INT) AS mask,
         -0.09 + (event_id % 60) * 0.003 AS x,
         -0.09 + CAST((event_id // 60) % 60 AS INT) * 0.003 AS y,
         value
  FROM events),
fire AS (
  SELECT *, CASE WHEN mask <= 15 THEN 'good'
                 WHEN mask <= 25 THEN 'high'
                 ELSE 'medium' END AS pixel_class
  FROM raw WHERE mask BETWEEN 10 AND 35),
geo AS (
  SELECT batch_ts, pixel_class,
         {proj.goes_lon_sql('x', 'y', -75.0)} AS lon,
         {proj.goes_lat_sql('x', 'y')} AS lat
  FROM fire),
dem AS (
  SELECT CAST((i % 720) - 360 AS INT) AS cx,
         CAST(i // 720 AS INT) - 180 AS cy,
         CAST((CAST((i % 720) - 360 AS INT) * 7 + (CAST(i // 720 AS INT) - 180) * 13) % 3000 AS DOUBLE) AS elev_m
  FROM range(259200) t(i)),
enriched AS (
  SELECT g.batch_ts, g.pixel_class, g.lat, d.elev_m
  FROM geo g LEFT JOIN dem d
    ON CAST(floor(g.lon / 0.5) AS INT) = d.cx
   AND CAST(floor(g.lat / 0.5) AS INT) = d.cy),
counts AS (
  SELECT batch_ts, pixel_class, count(*)::BIGINT AS n,
         round(sum(round(lat, 6)), 3) AS sum_lat,
         round(avg(elev_m), 4) AS avg_elev_m
  FROM enriched GROUP BY batch_ts, pixel_class),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pixel_class
                               ORDER BY batch_ts DESC) AS rk
  FROM counts)
SELECT batch_ts, pixel_class, n, sum_lat, avg_elev_m
FROM ranked WHERE rk <= 24
"""


# --------------------------------------------------------------------------
# q57 — document quality scoring (north-star text analysis; C4/Gopher-
# style closed-form rules). Oracle mirrors every ratio feature.
# --------------------------------------------------------------------------

def q57_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = text_ops.quality_score(docs)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("quality"), 3).alias("sum_quality"),
        F.sum((F.col("quality") > 0.75).cast("bigint")).alias("n_high_quality"),
        F.round(F.sum(F.round("alpha_ratio", 6)), 3).alias("sum_alpha_ratio"),
    )


Q57_SQL = r"""
WITH feats AS (
  SELECT source,
         length(text)::DOUBLE AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS n_alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digit,
         length(regexp_replace(text, '[^ \t\n]', '', 'g'))::DOUBLE AS n_space,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::DOUBLE AS n_words
  FROM documents),
scored AS (
  SELECT source,
         n_alpha / greatest(n_chars, 1.0) AS alpha_ratio,
         round(
           0.25 * least(n_words / 50.0, 1.0)
           + 0.25 * (n_alpha / greatest(n_chars, 1.0))
           + 0.25 * (1.0 - least((n_digit / greatest(n_chars, 1.0)) * 4, 1.0))
           + 0.25 * (CASE WHEN n_words > 0
                          AND (n_chars - n_space) / n_words BETWEEN 3.0 AND 10.0
                          THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM feats)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(quality), 3) AS sum_quality,
       sum(CASE WHEN quality > 0.75 THEN 1 ELSE 0 END)::BIGINT AS n_high_quality,
       round(sum(round(alpha_ratio, 6)), 3) AS sum_alpha_ratio
FROM scored GROUP BY source
"""


# --------------------------------------------------------------------------
# q58 — rollup revenue cube (general relational surface; SURVEY §2.5
# "grouping sets / rollup — Spark built-ins cover them").
# --------------------------------------------------------------------------

def q58_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    orders = _t(spark, sf_dir, "orders")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_orders",
            "revenue",
        )
    )


Q58_SQL = """
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       count(*)::BIGINT AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# q60-q63 — training-corpus construction ops (north star): deterministic
# hash sampling / source mixing, benchmark-contamination detection,
# stream-slice sequence packing. All sampling decisions derive from the
# portable md5 hash, so the oracle replays every decision exactly.
# --------------------------------------------------------------------------

_HFRAC = (
    "CAST(concat('0x', substr(md5(CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT)"
    " / 1152921504606846976.0"
)

_Q60_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def q60_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    mixed = corpus_ops.source_mix(docs, _Q60_RATES, default_rate=0.05)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_doc_id")
    )


Q60_SQL = f"""
SELECT source, count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS sum_doc_id
FROM documents
WHERE {_HFRAC.format(k='doc_id')}
      < CAST(CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                         WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1
                         ELSE 0.05 END AS DOUBLE)
GROUP BY source
"""


def q61_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    hits = corpus_ops.contamination(docs, bench, min_hits=3)
    return hits.filter(F.col("doc_id") != F.col("bench_id"))


Q61_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2])
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM d),
h AS (SELECT doc_id, {_H60.format(x='x')} AS hh
      FROM (SELECT doc_id, unnest(s) AS x FROM sh)),
b AS (SELECT doc_id AS bench_id, hh FROM h WHERE doc_id % 97 = 0)
SELECT h.doc_id, b.bench_id, count(DISTINCT h.hh)::BIGINT AS n_shared
FROM h JOIN b ON h.hh = b.hh
WHERE h.doc_id <> b.bench_id
GROUP BY h.doc_id, b.bench_id
HAVING count(DISTINCT h.hh) >= 3
"""


def q62_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.functions.text import norm_text
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(norm_text(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    packed = corpus_ops.pack_sequences(
        docs, max_tokens=256, partition_col=F.col("lang")
    )
    return packed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )


Q62_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))::BIGINT AS n_tokens
  FROM documents),
r AS (
  SELECT doc_id, lang, n_tokens,
         sum(least(n_tokens, 256)) OVER (PARTITION BY lang ORDER BY doc_id) AS run
  FROM d),
c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(greatest(ceil(run / 256.0) - 1, 0) AS BIGINT) AS chunk_id
  FROM r)
SELECT lang, chunk_id, count(*)::BIGINT AS n_docs,
       sum(doc_id)::BIGINT AS sum_doc_id, sum(n_tokens)::BIGINT AS chunk_tokens
FROM c GROUP BY lang, chunk_id
"""


def q63_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    orders = _t(spark, sf_dir, "orders")
    kept = corpus_ops.hash_sample(orders, 0.25, key="o_orderkey")
    return kept.agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("sum_key")
    )


Q63_SQL = f"""
SELECT count(*)::BIGINT AS n, sum(o_orderkey)::BIGINT AS sum_key
FROM orders
WHERE {_HFRAC.format(k='o_orderkey')} < CAST(0.25 AS DOUBLE)
"""



def q64_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.near_dup_clusters(
        docs, threshold=0.8, parallelism=_doc_par(spark, docs)
    )


# transitive closure of the J>=0.8 pair graph: reach enumerates
# (node, same-component node) pairs over the symmetric edge list, so
# min(r) per node is the component minimum — exactly what the
# large-star/small-star Spark side converges to
Q64_SQL = _SHINGLE_CTE.replace("WITH d AS", "WITH RECURSIVE d AS") + """,
e AS (
  SELECT id_a AS u, id_b AS v FROM pairs WHERE jaccard >= 0.8
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs WHERE jaccard >= 0.8),
reach AS (
  SELECT u AS id, u AS r FROM e
  UNION
  SELECT e.v AS id, reach.r FROM reach JOIN e ON e.u = reach.id)
SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
"""


def q65_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators.windows import session_stats

    ev = _t(spark, sf_dir, "events")
    s = session_stats(ev, key="user_id", ts="ts", gap_minutes=30, tiebreak=["event_id"])
    return s.select(
        "user_id",
        "session_seq",
        "n_events",
        F.unix_millis("session_start").alias("start_ms"),
        F.unix_millis("session_end").alias("end_ms"),
    )


Q65_SQL = """
WITH lagged AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts) / 1e6 >= 1800.0
              THEN 1 ELSE 0 END AS is_new
  FROM lagged),
sessioned AS (
  SELECT user_id, ts,
         -- ::BIGINT: DuckDB windowed sum() returns HUGEINT -> pandas
         -- float64; the dtype-sensitive driver hash diverges from Spark's
         -- long (round-2 failure; the passing q18 twin has this cast)
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
  FROM marked)
SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
       CAST(epoch_ms(min(ts)) AS BIGINT) AS start_ms,
       CAST(epoch_ms(max(ts)) AS BIGINT) AS end_ms
FROM sessioned GROUP BY user_id, session_seq
"""


def q66_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators.aggregations import group_percentiles

    ev = _t(spark, sf_dir, "events")
    return group_percentiles(ev, ["event_type"], "value")


Q66_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def q67_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.tf_idf_top_terms(docs, k=3)


Q67_SQL = """
WITH terms AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# q68 — product-quantization ANN with a deterministic fixed-id codebook:
# encode (per-subspace argmin), query distance tables, ADC top-k — the
# memory tier of the ANN ladder, fully replayed in SQL like q59.
# --------------------------------------------------------------------------

_Q68_CODES = [11, 23, 37, 41, 53, 67, 79, 97]
_Q68_D2 = (
    "list_sum(list_transform(range(1, 17), i -> "
    "({a}.embedding[m.range*16+i]::DOUBLE - c.cv[m.range*16+i]::DOUBLE)"
    " * ({a}.embedding[m.range*16+i]::DOUBLE - c.cv[m.range*16+i]::DOUBLE)))"
)


def q68_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim_ops.pq_fixed_topk(emb, queries, _Q68_CODES, k=5, num_sub=4)


Q68_SQL = f"""
WITH cents AS (
  SELECT list_position({_Q68_CODES}, vec_id) - 1 AS j, embedding AS cv
  FROM embeddings WHERE vec_id IN {tuple(_Q68_CODES)}),
sub AS (
  SELECT e.vec_id, m.range AS m, c.j, {_Q68_D2.format(a='e')} AS d2
  FROM embeddings e, range(0, 4) m, cents c),
codes AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, j ASC) AS rn
    FROM sub) WHERE rn = 1),
qtab AS (
  SELECT e.vec_id AS query_id, m.range AS m, c.j, {_Q68_D2.format(a='e')} AS d2
  FROM embeddings e, range(0, 4) m, cents c WHERE e.vec_id < 5),
approx AS (
  SELECT q.query_id, cd.vec_id, sum(q.d2) AS adist
  FROM qtab q JOIN codes cd ON cd.m = q.m AND cd.code = q.j
  WHERE cd.vec_id <> q.query_id
  GROUP BY q.query_id, cd.vec_id)
SELECT query_id, vec_id, approx_dist, rank FROM (
  SELECT query_id, vec_id, round(adist, 6) AS approx_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(adist, 6) ASC, vec_id ASC)::INT AS rank
  FROM approx) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# q69 — the training-data prep flagship, composed end-to-end:
# quality filter (C4/Gopher-style) → exact dedup (min-id per normalized
# text) → deterministic hash sample → per-source corpus stats. The whole
# recipe is reproducible: rerunning (or re-running in another engine)
# keeps the SAME documents.
# --------------------------------------------------------------------------

def q69_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _wide(spark, _t(spark, sf_dir, "documents"))
    scored = text_ops.quality_score(docs).filter(F.col("quality") >= 0.5)
    deduped = dedup_ops.exact_dedup(scored)
    sampled = corpus_ops.hash_sample(deduped, 0.5, key="doc_id", salt="prep")
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.round(F.sum("quality"), 3).alias("sum_quality"),
    )


_Q69_QUALITY_CTE = r"""
WITH feats AS (
  SELECT doc_id, source, text,
         length(text)::DOUBLE AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS n_alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digit,
         length(regexp_replace(text, '[^ \t\n]', '', 'g'))::DOUBLE AS n_space,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::DOUBLE AS n_words
  FROM documents),
scored AS (
  SELECT doc_id, source, text,
         round(
           0.25 * least(n_words / 50.0, 1.0)
           + 0.25 * (n_alpha / greatest(n_chars, 1.0))
           + 0.25 * (1.0 - least((n_digit / greatest(n_chars, 1.0)) * 4, 1.0))
           + 0.25 * (CASE WHEN n_words > 0
                          AND (n_chars - n_space) / n_words BETWEEN 3.0 AND 10.0
                          THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM feats),
kept AS (SELECT * FROM scored WHERE quality >= 0.5),
deduped AS (
  SELECT * FROM kept WHERE doc_id IN (
    SELECT min(doc_id) FROM kept
    GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
sampled AS (
  SELECT * FROM deduped
  WHERE {hfrac} < CAST(0.5 AS DOUBLE))
"""

Q69_SQL = (
    _Q69_QUALITY_CTE.format(
        hfrac=_HFRAC.format(k="doc_id::VARCHAR || 'prep'")
    )
    + """
SELECT source, count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS sum_doc_id,
       round(sum(quality), 3) AS sum_quality
FROM sampled GROUP BY source
"""
)


def q70_pivot_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab: events per (event_type, day-of-week) as a pivoted wide
    table. Spark's pivot with an EXPLICIT value list compiles to
    when/sum conditional aggregation — one shuffle, map-side partials;
    an implicit pivot would add a distinct-values job first (driver
    round-trip an engine should avoid). Day-of-week normalized to
    0=Sunday to match DuckDB's date_part('dow')."""
    ev = _t(spark, sf_dir, "events")
    dowed = ev.select(
        "event_type", (F.dayofweek("ts") - 1).alias("__dow")
    )
    out = dowed.groupBy("event_type").pivot("__dow", list(range(7))).count()
    for i in range(7):
        out = out.withColumnRenamed(str(i), f"d{i}")
    return out.select(
        "event_type", *[F.coalesce(F.col(f"d{i}"), F.lit(0)).alias(f"d{i}") for i in range(7)]
    )


Q70_SQL = """
SELECT event_type,
       {cols}
FROM events GROUP BY event_type
""".format(
    cols=",\n       ".join(
        f"sum(CASE WHEN date_part('dow', ts) = {i} THEN 1 ELSE 0 END)::BIGINT AS d{i}"
        for i in range(7)
    )
)


def q71_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long unpivot (melt) of per-flag revenue measures: the
    DataFrame.unpivot relational primitive (UNION ALL of projections in
    SQL), map-side only after the aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "sum_disc_price"
        ),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc_price"],
        variableColumnName="measure",
        valueColumnName="value",
    )


Q71_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_price,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_disc_price' AS measure, sum_disc_price AS value FROM wide
"""


def q72_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (per-type, per-user-bucket, grand total) with
    grouping_id to disambiguate the null-key rows — one pass, one
    shuffle (Spark expands sets map-side, same as cube/rollup)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 4).alias("user_bucket"), "value"
    )
    ev.createOrReplaceTempView("__ev72")
    return spark.sql(
        """
        SELECT event_type, user_bucket,
               CAST(grouping_id(event_type, user_bucket) AS BIGINT) AS gid,
               count(*) AS n, round(sum(value), 3) AS sum_value
        FROM __ev72
        GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
        """
    )


Q72_SQL = """
SELECT event_type, user_bucket,
       grouping(event_type, user_bucket)::BIGINT AS gid,
       count(*)::BIGINT AS n, round(sum(value), 3) AS sum_value
FROM (SELECT event_type, user_id % 4 AS user_bucket, value FROM events)
GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
"""


# --------------------------------------------------------------------------
# q73 — SGP4 propagation vs the PUBLIC Spacetrack Report #3 test vectors
# (sat 88888). The oracle is the report's published TEME position table —
# genuinely external fixed test vectors, not a replica of the Spark path.
# Both sides round to 0.1 km, which absorbs the <10 m difference between
# the 1980 report constants and the Vallado-2006 revision while leaving
# any algorithmic error (km-scale) detectable.
# Reference parity: odin_orbital/src/lib.rs:399-427 (sgp4-crate wrapper).
# --------------------------------------------------------------------------

def q73_sgp4_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.deploy import ensure_shipped
    from odin_rs_spark.functions import orbital

    # q73 is the one catalog query that reads no table, so the usual
    # load_table-side package shipping never runs — ship explicitly for
    # external-cwd harnesses
    ensure_shipped(spark)
    el = orbital.parse_tle(*orbital.SPACETRACK_R3_TLE)
    rows = [{**el, "tsince_min": float(m)} for m in (0, 360, 720, 1080, 1440)]
    base = spark.createDataFrame(rows)
    st = orbital.sgp4_teme_udf()(
        "no_kozai", "ecco", "inclo", "nodeo", "argpo", "mo", "bstar", "tsince_min"
    )
    return base.select(
        F.col("tsince_min").cast("bigint").alias("tsince_min"),
        F.round(st["x_km"], 1).alias("x_km"),
        F.round(st["y_km"], 1).alias("y_km"),
        F.round(st["z_km"], 1).alias("z_km"),
    )


Q73_SQL = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT),    CAST(2329.0 AS DOUBLE), CAST(-5995.2 AS DOUBLE), CAST(1720.0 AS DOUBLE)),
  (CAST(360 AS BIGINT),  CAST(2456.1 AS DOUBLE), CAST(-6071.9 AS DOUBLE), CAST(1222.9 AS DOUBLE)),
  (CAST(720 AS BIGINT),  CAST(2567.6 AS DOUBLE), CAST(-6112.5 AS DOUBLE), CAST(714.0 AS DOUBLE)),
  (CAST(1080 AS BIGINT), CAST(2663.1 AS DOUBLE), CAST(-6115.5 AS DOUBLE), CAST(196.4 AS DOUBLE)),
  (CAST(1440 AS BIGINT), CAST(2742.6 AS DOUBLE), CAST(-6079.7 AS DOUBLE), CAST(-326.4 AS DOUBLE))
) AS t(tsince_min, x_km, y_km, z_km)
"""


# --------------------------------------------------------------------------
# q74 — repetition quality filter (C4/Gopher repeated-phrase rules):
# per-doc bigram repetition features, pass/fail flag, per-source rollup.
# --------------------------------------------------------------------------

def q74_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    rep = text_ops.repetition_stats(docs, ngram=2, extra_cols=("source",))
    ok = (F.col("top_ngram_frac") <= 0.18) & (F.col("distinct_ngram_frac") >= 0.5)
    return rep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ok.cast("bigint")).alias("n_pass"),
        F.round(F.sum("top_ngram_frac"), 3).alias("sum_top_frac"),
        F.round(F.sum("distinct_ngram_frac"), 3).alias("sum_distinct_frac"),
    )


Q74_SQL = r"""
WITH w AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
f AS (SELECT doc_id, source, w FROM w WHERE len(w) >= 2),
e AS (SELECT doc_id, source,
             unnest([concat_ws(' ', w[i], w[i+1]) for i in range(1, len(w))]) AS g
      FROM f),
c AS (SELECT doc_id, source, g, count(*) AS n FROM e GROUP BY doc_id, source, g),
s AS (SELECT doc_id, source,
             round(max(n)::DOUBLE / sum(n), 6) AS top_frac,
             round(count(*)::DOUBLE / sum(n), 6) AS dist_frac
      FROM c GROUP BY doc_id, source)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN top_frac <= 0.18 AND dist_frac >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_pass,
       round(sum(top_frac), 3) AS sum_top_frac,
       round(sum(dist_frac), 3) AS sum_distinct_frac
FROM s GROUP BY source
"""


# --------------------------------------------------------------------------
# q75 — PII detection + redaction stats. PII is seeded deterministically
# (synthetic docs contain none) the same way on both sides; detection and
# redaction run on portable regexes (identical Java/RE2 semantics).
# --------------------------------------------------------------------------

def q75_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" host 192.168.10.42")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    counted = seeded.select(
        "source",
        "text",
        text_ops.pii_count("text", "email").alias("n_email"),
        text_ops.pii_count("text", "phone").alias("n_phone"),
        text_ops.pii_count("text", "ipv4").alias("n_ipv4"),
        (F.length("text") - F.length(text_ops.redact_pii(F.col("text")))).alias("__delta"),
    )
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("emails"),
        F.sum("n_phone").cast("bigint").alias("phones"),
        F.sum("n_ipv4").cast("bigint").alias("ipv4s"),
        F.sum(((F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0).cast("bigint")).alias(
            "docs_with_pii"
        ),
        F.sum("__delta").cast("bigint").alias("redacted_chars"),
    )


Q75_SQL = r"""
WITH seeded AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' host 192.168.10.42' ELSE '' END AS text
  FROM documents),
counted AS (
  SELECT source, text,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(text, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phone,
         len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ipv4,
         length(text) - length(
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '[PHONE]', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IPV4]', 'g')) AS delta
  FROM seeded)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_email)::BIGINT AS emails, sum(n_phone)::BIGINT AS phones,
       sum(n_ipv4)::BIGINT AS ipv4s,
       sum(CASE WHEN n_email + n_phone + n_ipv4 > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_pii,
       sum(delta)::BIGINT AS redacted_chars
FROM counted GROUP BY source
"""


# --------------------------------------------------------------------------
# q76 — semantic (embedding-space) dedup: planted duplicate vectors →
# sign-LSH candidate pairs → exact cosine ≥ 0.99 → transitive clusters.
# The synthetic embeddings are near-orthogonal (max candidate cos ≈ 0.51
# at sf0.01), so duplicates are planted deterministically the same way on
# both sides: scaled copies share the exact direction (cos = 1), land in
# every LSH bucket of their original, and stay far above the threshold
# while every organic pair stays far below — numerically robust parity.
# --------------------------------------------------------------------------

def q76_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copy1 = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    copy2 = emb.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.8)).alias("embedding"),
    )
    seeded = emb.unionByName(copy1).unionByName(copy2)
    # width probe from the RAW embeddings count (metadata-cheap): the
    # old _doc_par(seeded) executed the 3-branch union once just to
    # size partitions (VERDICT r11 #5's q268 class). Each planted-copy
    # branch keeps ~1/100 of the rows; the exact value only steers the
    # partition count.
    n_emb = emb.count()
    cc = sim_ops.semantic_dedup_clusters(
        seeded,
        threshold=0.99,
        parallelism=_doc_par(spark, seeded, n_rows=n_emb + 2 * (n_emb // 100 + 1)),
    )
    return cc.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("size"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("node")), lambda x: x.cast("string")),
            "-",
        ).alias("members"),
    )


Q76_SQL = """
WITH RECURSIVE seeded AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> x * 1.5)
  FROM embeddings WHERE vec_id % 50 = 0
  UNION ALL
  SELECT vec_id + 2000000, list_transform(embedding, x -> x * 0.8)
  FROM embeddings WHERE vec_id % 100 = 0),
planes AS (
  SELECT t.range AS t, p.range AS p,
         list_transform(range(0, 64), d ->
           ((CAST(concat('0x', substr(md5(d::VARCHAR || '_' || p.range::VARCHAR || '_' || t.range::VARCHAR), 1, 15)) AS BIGINT)
             % 200003) - 100001)::DOUBLE / 100001.0) AS pv
  FROM range(8) t, range(12) p),
sigs AS (
  SELECT e.vec_id, pl.t,
         sum(CASE WHEN list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * pl.pv[i])) > 0
                  THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS bucket
  FROM seeded e, planes pl GROUP BY e.vec_id, pl.t),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
scored AS (
  SELECT id_a, id_b,
   list_sum(list_transform(range(1,65), i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)) /
   (sqrt(list_sum(list_transform(range(1,65), i -> ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE))) *
    sqrt(list_sum(list_transform(range(1,65), i -> eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)))) AS cos
  FROM cand
  JOIN seeded ea ON ea.vec_id = id_a
  JOIN seeded eb ON eb.vec_id = id_b),
e AS (
  SELECT id_a AS u, id_b AS v FROM scored WHERE cos >= 0.99
  UNION
  SELECT id_b AS u, id_a AS v FROM scored WHERE cos >= 0.99),
reach AS (
  SELECT u AS id, u AS r FROM e
  UNION
  SELECT e.v AS id, reach.r FROM reach JOIN e ON e.u = reach.id),
comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT cluster_id, count(*)::BIGINT AS size,
       array_to_string(list_transform(list_sort(list(id)), x -> x::VARCHAR), '-') AS members
FROM comp GROUP BY cluster_id
"""


# --------------------------------------------------------------------------
# q77 — overlapping context-window chunking (training/RAG corpus prep):
# fixed 32-word chunks, stride 24, per-source rollup.
# --------------------------------------------------------------------------

def q77_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    chunks = corpus_ops.chunk_documents(
        docs, chunk_size=32, stride=24, extra_cols=("source",)
    )
    return chunks.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_words").cast("bigint").alias("sum_chunk_words"),
        F.max("n_words").alias("max_chunk_words"),
        F.min("n_words").alias("min_chunk_words"),
    )


Q77_SQL = r"""
WITH w AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
c AS (
  SELECT doc_id, source, w,
         unnest(range(0, 1 + (len(w) - 1) // 24)) AS chunk_id
  FROM w),
ch AS (
  SELECT doc_id, source, chunk_id,
         list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32) AS cw
  FROM c)
SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_chunks,
       sum(len(cw))::BIGINT AS sum_chunk_words,
       max(len(cw))::INT AS max_chunk_words,
       min(len(cw))::INT AS min_chunk_words
FROM ch GROUP BY source
"""


# --------------------------------------------------------------------------
# q78 — EXACT n-gram Jaccard self-join via prefix filtering (All-Pairs /
# PPJoin family). Same output as exact all-pairs (the oracle) by the
# prefix-filtering lemma — recall 1 without LSH's probabilistic recall or
# its lossy bucket cap. t=0.7 exercises a different operating point than
# q24's MinHash t=0.8. 3-gram shingles, not 2-gram: this corpus' 2-gram
# vocabulary is so reused that frequency-ordered prefixes still collide
# heavily (measured 9.3 M candidate slots / 271-doc buckets at sf0.1 vs
# 210 K / 9 with 3-grams — 23 s vs ~1 s; shingle rarity IS the blocking
# power of prefix filtering).
# --------------------------------------------------------------------------

def q78_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.jaccard_join_pairs(
        docs,
        shingle_n=3,
        threshold=0.7,
        parallelism=spark.sparkContext.defaultParallelism,
    )


Q78_SQL = _SHINGLE_CTE + """
SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.7
"""


# --------------------------------------------------------------------------
# q79 — temperature-scaled source mixing (mBERT/XLM-R sampling rule):
# keep rate r_s = sqrt(n_min/n_s) at alpha=0.5, so kept source shares
# ∝ p_s^0.5. sqrt (not pow) on both sides: IEEE correctly-rounded in
# both engines, so boundary keep decisions are bit-identical.
# --------------------------------------------------------------------------

def q79_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    mixed = corpus_ops.temperature_mix(docs, alpha=0.5, salt="temp")
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_doc_id")
    )


Q79_SQL = """
WITH c AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY source),
r AS (SELECT source, sqrt((SELECT min(n) FROM c) / n) AS rate FROM c)
SELECT d.source, count(*)::BIGINT AS n_docs, sum(d.doc_id)::BIGINT AS sum_doc_id
FROM documents d JOIN r ON d.source = r.source
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || 'temp'), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 < r.rate
GROUP BY d.source
"""


# --------------------------------------------------------------------------
# q80 — deterministic corpus shuffle + shard assignment: portable-hash
# permutation, shard = h mod 16, pos = within-shard rank. The checksum
# sum(pos * doc_id) pins the exact permutation (any ordering or shard
# divergence breaks it), not just the shard sizes.
# --------------------------------------------------------------------------

def q80_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    sharded = corpus_ops.shard_assignments(docs, n_shards=16, salt="v1")
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("pos").cast("bigint").alias("max_pos"),
        F.sum(F.col("pos") * F.col("doc_id")).cast("bigint").alias("order_checksum"),
    )


Q80_SQL = """
WITH h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 15)) AS BIGINT) AS hh
  FROM documents),
s AS (
  SELECT doc_id, (hh % 16)::INT AS shard,
         (row_number() OVER (PARTITION BY (hh % 16) ORDER BY hh, doc_id) - 1)::BIGINT AS pos
  FROM h)
SELECT shard, count(*)::BIGINT AS n_docs, max(pos)::BIGINT AS max_pos,
       sum(pos * doc_id)::BIGINT AS order_checksum
FROM s GROUP BY shard
"""


# --------------------------------------------------------------------------
# q81 — canonical selection: inside every transitive near-dup cluster
# keep the highest-quality member (ties → smallest doc_id), the step a
# real corpus dedup runs instead of keep-min-id. Composes the q64
# cluster graph with the q57 quality score; both sides rank on the
# 6dp-rounded score so the keeper choice is engine-independent.
# --------------------------------------------------------------------------

def q81_cluster_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    clusters = dedup_ops.near_dup_clusters(
        docs, threshold=0.8, parallelism=_doc_par(spark, docs)
    )
    scored = text_ops.quality_score(docs).select("doc_id", "quality")
    m = clusters.join(scored, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("cluster_id")
    return (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keeper_id"),
            F.col("quality").alias("keeper_quality"),
            "n_members",
        )
    )


Q81_SQL = _SHINGLE_CTE.replace("WITH d AS", "WITH RECURSIVE d AS") + r""",
e AS (
  SELECT id_a AS u, id_b AS v FROM pairs WHERE jaccard >= 0.8
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs WHERE jaccard >= 0.8),
reach AS (
  SELECT u AS id, u AS r FROM e
  UNION
  SELECT e.v AS id, reach.r FROM reach JOIN e ON e.u = reach.id),
comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
feats AS (
  SELECT doc_id, length(text)::DOUBLE AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS n_alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digit,
         length(regexp_replace(text, '[^ \t\n]', '', 'g'))::DOUBLE AS n_space,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::DOUBLE AS n_words
  FROM documents),
scored AS (
  SELECT doc_id,
         round(
           0.25 * least(n_words / 50.0, 1.0)
           + 0.25 * (n_alpha / greatest(n_chars, 1.0))
           + 0.25 * (1.0 - least((n_digit / greatest(n_chars, 1.0)) * 4, 1.0))
           + 0.25 * (CASE WHEN n_words > 0
                          AND (n_chars - n_space) / n_words BETWEEN 3.0 AND 10.0
                          THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM feats),
m AS (SELECT c.cluster_id, s.doc_id, s.quality FROM comp c JOIN scored s USING (doc_id)),
rk AS (
  SELECT cluster_id, doc_id, quality,
         row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn
  FROM m),
g AS (SELECT cluster_id, count(*)::BIGINT AS n_members FROM m GROUP BY cluster_id)
SELECT rk.cluster_id, rk.doc_id AS keeper_id, rk.quality AS keeper_quality, g.n_members
FROM rk JOIN g USING (cluster_id) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q82 — incremental (cross-corpus) near-dup join: split the corpus into
# a "historical" side (doc_id % 5 != 0) and an "incoming batch"
# (doc_id % 5 == 0) and find J≥0.8 matches ACROSS the split — the
# ingestion-time dedup shape. Oracle: exact all-cross-pairs Jaccard.
# --------------------------------------------------------------------------

def q82_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup_ops.near_dup_join(
        new, base, threshold=0.8, parallelism=_doc_par(spark, docs)
    )


Q82_SQL = """
WITH d AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(w, i, i + 2), ' ')
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM d),
x AS (
  SELECT a.doc_id AS new_id, b.doc_id AS base_id,
         len(list_intersect(a.s, b.s))::DOUBLE
         / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS jaccard
  FROM sh a JOIN sh b ON a.doc_id % 5 = 0 AND b.doc_id % 5 != 0)
SELECT new_id, base_id, jaccard FROM x WHERE jaccard >= 0.8
"""


# --------------------------------------------------------------------------
# q83 — repeated-substring duplicate spans (ExactSubstr, Lee et al. ACL
# 2022, word-window formulation): 8-word rolling windows whose hash
# repeats corpus-wide, merged per doc into maximal spans; per-source
# rollup. (At 100 TB the md5 window hash would become a Karp-Rabin
# rolling hash in one Arrow kernel; md5 here keeps the oracle
# replayable cross-engine.)
# --------------------------------------------------------------------------

def q83_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _wide(spark, _t(spark, sf_dir, "documents"))
    spans = dedup_ops.repeated_substring_spans(docs, window_k=8)
    j = spans.join(docs.select("doc_id", "source"), "doc_id")
    ln = F.col("span_end_excl") - F.col("span_start")
    return j.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs_with_dups"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(ln).cast("bigint").alias("sum_span_tokens"),
        F.max(ln).cast("bigint").alias("max_span_tokens"),
    )


Q83_SQL = r"""
WITH d AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
g AS (
  SELECT doc_id, source, i - 1 AS pos,
         CAST(concat('0x', substr(md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                                                w[i+4], w[i+5], w[i+6], w[i+7])), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, source, w, unnest(range(1, len(w) - 8 + 2)) AS i
        FROM d WHERE len(w) >= 8)),
dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
p AS (SELECT doc_id, source, pos FROM g WHERE h IN (SELECT h FROM dup)),
isl AS (
  SELECT doc_id, source, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
              OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
              THEN 1 ELSE 0 END AS nw
  FROM p),
isl2 AS (
  SELECT doc_id, source, pos,
         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
  FROM isl),
sp AS (
  SELECT doc_id, source, island, min(pos) AS s, max(pos) + 8 AS e
  FROM isl2 GROUP BY doc_id, source, island)
SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs_with_dups,
       count(*)::BIGINT AS n_spans,
       sum(e - s)::BIGINT AS sum_span_tokens,
       max(e - s)::BIGINT AS max_span_tokens
FROM sp GROUP BY source
"""


# --------------------------------------------------------------------------
# q84 — unigram-LM average log-probability per doc (CCNet-style
# perplexity-proxy quality bucketing). Both engines sum ln(count) over
# ~200 tokens (addition-order fp noise ~1e-13) and round to 6dp.
# --------------------------------------------------------------------------

def q84_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.unigram_logprob(docs)


Q84_SQL = r"""
WITH t AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents),
v AS (SELECT w, count(*)::BIGINT AS c FROM t GROUP BY w),
n AS (SELECT sum(c)::DOUBLE AS N FROM v)
SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       round(sum(ln(v.c)) / count(*) - (SELECT ln(N) FROM n), 6) AS avg_logprob
FROM t JOIN v USING (w)
GROUP BY t.doc_id
"""


# --------------------------------------------------------------------------
# q85 — composed IVF-PQ ANN (FAISS IVFPQ, by_residual=False): coarse
# cells bound compute (ADC only in nprobe probed cells), PQ codes bound
# memory. Deterministic centroids/codebook → full SQL replay.
# --------------------------------------------------------------------------

def q85_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim_ops.ivfpq_fixed_topk(
        emb, queries, _Q59_CENTS, _Q68_CODES, k=5, num_sub=4, nprobe=3
    )


Q85_SQL = f"""
WITH ccents AS (
  SELECT list_position({_Q59_CENTS}, vec_id) - 1 AS cell, embedding AS cv
  FROM embeddings WHERE vec_id IN {tuple(_Q59_CENTS)}),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_Q59_CENT_COS.format(a='e')} DESC, c.cell ASC) AS rn
    FROM embeddings e, ccents c) WHERE rn = 1),
probes AS (
  SELECT query_id, cell FROM (
    SELECT e.vec_id AS query_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_Q59_CENT_COS.format(a='e')} DESC, c.cell ASC) AS rn
    FROM embeddings e, ccents c WHERE e.vec_id < 5) WHERE rn <= 3),
pcents AS (
  SELECT list_position({_Q68_CODES}, vec_id) - 1 AS j, embedding AS cv
  FROM embeddings WHERE vec_id IN {tuple(_Q68_CODES)}),
sub AS (
  SELECT e.vec_id, m.range AS m, c.j, {_Q68_D2.format(a='e')} AS d2
  FROM embeddings e, range(0, 4) m, pcents c),
codes AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, j ASC) AS rn
    FROM sub) WHERE rn = 1),
qtab AS (
  SELECT e.vec_id AS query_id, m.range AS m, c.j, {_Q68_D2.format(a='e')} AS d2
  FROM embeddings e, range(0, 4) m, pcents c WHERE e.vec_id < 5),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.query_id),
approx AS (
  SELECT x.query_id, x.vec_id, sum(q.d2) AS adist
  FROM cand x
  JOIN codes cd ON cd.vec_id = x.vec_id
  JOIN qtab q ON q.query_id = x.query_id AND q.m = cd.m AND q.j = cd.code
  GROUP BY x.query_id, x.vec_id)
SELECT query_id, vec_id, approx_dist, rank FROM (
  SELECT query_id, vec_id, round(adist, 6) AS approx_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(adist, 6) ASC, vec_id ASC)::INT AS rank
  FROM approx) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# q86 — deterministic train/val/test split + leakage audit: hash-range
# split (80/10/10), then near-dup pairs CROSSING the train boundary
# (val/test docs with a J≥0.8 train twin — the contamination a split
# must not have). Per-split doc and leaked-doc counts.
# --------------------------------------------------------------------------

def q86_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators.corpus import hash_fraction

    docs = _t(spark, sf_dir, "documents")
    f = hash_fraction(F.col("doc_id"), "split")
    tagged = docs.withColumn(
        "split",
        F.when(f < 0.8, "train").when(f < 0.9, "val").otherwise("test"),
    )
    train = tagged.filter(F.col("split") == "train")
    held = tagged.filter(F.col("split") != "train")
    leaks = dedup_ops.near_dup_join(
        held, train, threshold=0.8,
        parallelism=spark.sparkContext.defaultParallelism,
    )
    # ONE execution of the near-dup join: the old union of two
    # projections re-planned the whole LSH pipeline per branch
    # (the q255 union-re-plans lesson applied to a join)
    leaked = (
        leaks.select(
            F.explode(F.array(F.col("new_id"), F.col("base_id"))).alias(
                "doc_id"
            )
        )
        .distinct()
        .withColumn("__l", F.lit(1))
    )
    return (
        tagged.join(leaked, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("__l"), F.lit(0))).cast("bigint").alias("n_leaked"),
        )
    )


Q86_SQL = r"""
WITH s AS (
  SELECT doc_id, text,
         CASE WHEN hfrac < 0.8 THEN 'train'
              WHEN hfrac < 0.9 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id, text,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 15)) AS BIGINT)
               / 1152921504606846976.0 AS hfrac
        FROM documents)),
d AS (
  SELECT doc_id, split,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM s),
sh AS (
  SELECT doc_id, split,
         list_distinct([array_to_string(list_slice(w, i, i + 2), ' ')
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS sg
  FROM d),
x AS (
  SELECT a.doc_id AS new_id, b.doc_id AS base_id,
         len(list_intersect(a.sg, b.sg))::DOUBLE
         / len(list_distinct(list_concat(a.sg, b.sg)))::DOUBLE AS jaccard
  FROM sh a JOIN sh b ON a.split <> 'train' AND b.split = 'train'),
leaked AS (
  SELECT new_id AS doc_id FROM x WHERE jaccard >= 0.8
  UNION
  SELECT base_id AS doc_id FROM x WHERE jaccard >= 0.8)
SELECT split, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN s.doc_id IN (SELECT doc_id FROM leaked) THEN 1 ELSE 0 END)::BIGINT AS n_leaked
FROM s GROUP BY split
"""


# --------------------------------------------------------------------------
# q87 — per-source quota cap: deterministic hash-order "at most 60 docs
# per source". Both engines order by the raw 60-bit hash integer
# (double-rounded fractions could collide and flip tiebreaks).
# --------------------------------------------------------------------------

def q87_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    capped = corpus_ops.source_quota(docs, n_max=60, salt="quota")
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_doc_id")
    )


Q87_SQL = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY
           CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'quota'), 1, 15)) AS BIGINT) ASC,
           doc_id ASC) AS rn
  FROM documents)
SELECT source, count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS sum_doc_id
FROM r WHERE rn <= 60 GROUP BY source
"""


# --------------------------------------------------------------------------
# q88 — OOV-rate audit: vocabulary trained on the en slice, every other
# lang scored against it (the tokenizer/LM transfer check). Per-lang
# rollup; oov_rate is an exact integer ratio rounded at 6dp.
# --------------------------------------------------------------------------

def q88_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    stats = text_ops.oov_stats(
        docs.filter(F.col("lang") != "en"), docs.filter(F.col("lang") == "en")
    )
    j = stats.join(docs.select("doc_id", "lang"), "doc_id")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_oov").cast("bigint").alias("n_oov"),
        F.round(
            F.sum("n_oov").cast("double") / F.sum("n_tokens"), 6
        ).alias("oov_rate"),
    )


Q88_SQL = r"""
WITH v AS (
  SELECT DISTINCT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents WHERE lang = 'en'),
t AS (
  SELECT doc_id, lang,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents WHERE lang <> 'en'),
j AS (
  SELECT t.doc_id, t.lang, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
  FROM t LEFT JOIN v ON t.w = v.w)
SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_tokens, sum(oov)::BIGINT AS n_oov,
       round(sum(oov)::DOUBLE / count(*), 6) AS oov_rate
FROM j GROUP BY lang
"""


# --------------------------------------------------------------------------
# q89 — embedding-column hygiene panel: per-dimension mean/std (the
# mean-centering parameters / isotropy audit before ANN indexing).
# Plain-sum moments so both engines compute identical formulas.
# --------------------------------------------------------------------------

def q89_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return sim_ops.embedding_dim_stats(emb)


Q89_SQL = """
WITH ex AS (
  SELECT i - 1 AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(range(1, 65)) AS t(i))
SELECT dim, count(*)::BIGINT AS n,
       round(sum(x) / count(*), 6) AS mean,
       round(sqrt(greatest(sum(x * x) / count(*)
                           - (sum(x) / count(*)) * (sum(x) / count(*)), 0.0)), 6) AS std
FROM ex GROUP BY dim
"""


# --------------------------------------------------------------------------
# q90 — top-k PMI collocations over adjacent word pairs (word2phrase-
# style phrase scoring). Rank on the 6dp-rounded PMI, lexicographic
# tiebreak, so both engines order identically.
# --------------------------------------------------------------------------

def q90_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.pmi_collocations(docs, min_count=5, k=20)


Q90_SQL = r"""
WITH d AS (
  SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
uni AS (
  SELECT w AS word, count(*)::BIGINT AS c
  FROM (SELECT unnest(w) AS w FROM d) GROUP BY w),
bi AS (
  SELECT w1, w2, count(*)::BIGINT AS c12 FROM (
    SELECT w[i] AS w1, w[i + 1] AS w2
    FROM (SELECT w, unnest(range(1, len(w))) AS i FROM d WHERE len(w) >= 2))
  GROUP BY w1, w2),
bif AS (SELECT * FROM bi WHERE c12 >= 5),
n AS (SELECT sum(c)::DOUBLE AS N FROM uni),
nb AS (SELECT sum(c12)::DOUBLE AS Nb FROM bi),
scored AS (
  SELECT b.w1, b.w2, b.c12,
         round(ln(b.c12 * n.N * n.N / (nb.Nb * u1.c * u2.c)), 6) AS pmi
  FROM bif b
  JOIN uni u1 ON u1.word = b.w1
  JOIN uni u2 ON u2.word = b.w2, n, nb)
SELECT row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC)::INT AS rank,
       w1, w2, c12, pmi
FROM scored ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
"""


# --------------------------------------------------------------------------
# q91 — T7/T3 driver-verified: a REAL Structured Streaming run inside the
# query (VERDICT r2 #9). Events split into an overlapping backfill half
# and a replayed live stream; `backfill_then_live` writes history once,
# then drains the stream with Trigger.AvailableNow through the
# idempotent dedup-append sink. The returned aggregate equals the plain
# batch aggregate over ALL events IFF the seam was exactly-once — the
# 20% planted overlap (event_id % 10 ∈ {4,5} lands on both sides) would
# double-count under an at-least-once sink, so the trivial-looking
# oracle SQL is precisely the exactly-once check.
# --------------------------------------------------------------------------

class _stream_state_parallelism:
    """Scope spark.sql.shuffle.partitions for a streaming run. A
    streaming query's state-store partition count is frozen at first
    checkpoint from this conf — it should be sized to STATE VOLUME
    (here O(windows × classes), tiny), not to the session's batch scan
    parallelism: 32 state partitions × N micro-batches is pure
    commit/HDFSStateStore overhead (measured 10.4 s → 3.9 s on q96 at
    sf0.1). On a real cluster you'd set this per-query the same way —
    it only governs the stateful stages of THIS stream."""

    def __init__(self, spark: SparkSession, n: int = 8):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)
        return False


def q91_stream_backfill_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from odin_rs_spark.streaming.pipelines import backfill_then_live
    from odin_rs_spark.streaming.sources import file_stream, split_for_replay

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="odin_q91_")
    try:
        backfill = ev.filter(F.col("event_id") % 10 < 6)
        live = ev.filter(F.col("event_id") % 10 >= 4)
        split_for_replay(live, root + "/chunks", n_chunks=4, order_col="ts")
        stream = file_stream(
            spark, root + "/chunks/chunk_*", ev.schema, max_files_per_trigger=2
        )
        with _stream_state_parallelism(spark, 8):
            backfill_then_live(
                spark, backfill, stream, root + "/store", root + "/ckpt", "event_id"
            )
        final = spark.read.parquet(root + "/store")
        out = final.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        # the streaming run is over (availableNow drained); materialize
        # before the temp store is deleted
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q91_SQL = """
SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q92 — segment-level duplicate audit (CCNet / RefinedWeb "line dedup"):
# corpus-wide boilerplate detection at sub-document granularity. A
# segment repeated across >1 document is boilerplate; per-source rollup
# of how much of each doc is boilerplate plus a flagged-doc count.
# --------------------------------------------------------------------------

def q92_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    stats = text_ops.line_dup_stats(docs, seg_words=10, extra_cols=("source",))
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_segs").cast("bigint").alias("n_segs"),
        F.sum("n_dup_segs").cast("bigint").alias("n_dup_segs"),
        F.round(F.avg("dup_ratio"), 6).alias("avg_dup_ratio"),
        F.sum(F.when(F.col("dup_ratio") > 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
    )


Q92_SQL = rf"""
WITH d AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
seg AS (
  SELECT doc_id, source,
         {_H60.format(x="array_to_string(list_slice(w, s * 10 + 1, s * 10 + 10), ' ')")} AS h
  FROM (SELECT doc_id, source, w,
               unnest(range(0, (len(w) + 9) // 10)) AS s
        FROM d)),
cnt AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM seg GROUP BY h),
per_doc AS (
  SELECT seg.doc_id, seg.source,
         count(*) AS n_segs,
         sum(CASE WHEN cnt.ndocs > 1 THEN 1 ELSE 0 END) AS n_dup,
         round(sum(CASE WHEN cnt.ndocs > 1 THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6) AS dup_ratio
  FROM seg JOIN cnt USING (h)
  GROUP BY seg.doc_id, seg.source)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_segs)::BIGINT AS n_segs,
       sum(n_dup)::BIGINT AS n_dup_segs,
       round(avg(dup_ratio), 6) AS avg_dup_ratio,
       sum(CASE WHEN dup_ratio > 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_flagged
FROM per_doc GROUP BY source
"""


# --------------------------------------------------------------------------
# q93 — positional winnowing (MOSS, Schleimer et al. SIGMOD'03): window
# minimum over positional k-gram hashes with rightmost tie-break, then
# cross-doc containment candidates by shared selected hashes. The
# min(h*w + (j-i)) encoding makes the window selection a single
# combinable aggregate — replayed verbatim by the oracle.
# --------------------------------------------------------------------------

def q93_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = text_ops.winnow_matches(docs, k=3, w=4, min_shared=2)
    return pairs.orderBy(F.col("n_shared").desc(), "id_a", "id_b").limit(20)


Q93_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
g AS (
  SELECT doc_id, i,
         greatest(len(w) - 3, 0) AS max_i,
         {_H60.format(x="array_to_string(list_slice(w, i + 1, i + 3), ' ')")} AS h
  FROM (SELECT doc_id, w, unnest(range(0, greatest(len(w) - 2, 1))) AS i FROM d)),
cand AS (
  SELECT doc_id, j, h * 4 + (j - i) AS enc
  FROM (SELECT doc_id, i, h,
               unnest(range(least(greatest(i, 3), max_i), least(i + 3, max_i) + 1)) AS j
        FROM g)),
sel AS (SELECT doc_id, j, min(enc) AS enc FROM cand GROUP BY doc_id, j),
fp AS (SELECT DISTINCT doc_id, enc // 4 AS gram_hash FROM sel),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
  FROM fp a JOIN fp b ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= 2)
SELECT id_a, id_b, n_shared FROM pairs
ORDER BY n_shared DESC, id_a, id_b LIMIT 20
"""


# --------------------------------------------------------------------------
# q94 — BM25 keyword retrieval top-k (Robertson; Lucene idf form). The
# retrieval complement of the ANN ladder: sparse lexical scoring with
# corpus statistics, zero shuffles of full documents.
# --------------------------------------------------------------------------

BM25_TERMS = ["spark", "merge", "window"]


def q94_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.bm25_topk(docs, BM25_TERMS, topk=20)


Q94_SQL = r"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
base AS (SELECT doc_id, len(w)::DOUBLE AS dl, w FROM d),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base),
tf AS (
  SELECT doc_id, dl, t, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, dl, unnest(w) AS t FROM base)
  WHERE t IN ('spark', 'merge', 'window')
  GROUP BY doc_id, dl, t),
dfreq AS (SELECT t, count(*)::DOUBLE AS df FROM tf GROUP BY t),
scored AS (
  SELECT doc_id,
         round(sum(ln(1.0 + (stats.n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / stats.avgdl))), 6) AS bm25,
         count(*)::BIGINT AS n_terms_hit
  FROM tf JOIN dfreq USING (t) CROSS JOIN stats
  GROUP BY doc_id)
SELECT doc_id, bm25, n_terms_hit FROM scored
ORDER BY bm25 DESC, doc_id LIMIT 20
"""


# --------------------------------------------------------------------------
# q95 — Bloom-filter contamination screen: the approximate, broadcastable
# twin of q61's exact shingle equi-join. The benchmark's shingle set
# compresses to a <=69-row bitmap (m=4096 bits as 60-bit words) that
# broadcasts; probing is map-side. m is deliberately small so the FP
# trade is visible: n_maybe >= n_exact per source (no false negatives —
# asserted by test), with a measurable false-positive overhang.
# --------------------------------------------------------------------------

BLOOM_M_BITS = 4096
BLOOM_K = 4


def q95_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.functions.text import norm_text

    docs = _wide(spark, _t(spark, sf_dir, "documents"))

    def shingle_hashes(df: DataFrame) -> DataFrame:
        # hash shingles to int64 BEFORE any distinct/shuffle (q78's
        # measured lesson: 8-byte keys, not 20-40 byte strings, move)
        return (
            df.select(
                "doc_id",
                "source",
                F.split(norm_text(F.col("text")), " ").alias("__w"),
            )
            .select(
                "doc_id",
                "source",
                F.explode(
                    dedup_ops.shingles_from_words(F.col("__w"), 3)
                ).alias("__s"),
            )
            .select("doc_id", "source", dedup_ops.portable_hash60(F.col("__s")).alias("h"))
        )

    bench_ids = F.col("doc_id") % 97 == 0
    bench_hashes = shingle_hashes(docs.filter(bench_ids)).select("h").distinct()
    bloom = dedup_ops.bloom_build(
        bench_hashes, "h", m_bits=BLOOM_M_BITS, k=BLOOM_K, hashed=True
    )
    probe = shingle_hashes(docs.filter(~bench_ids)).distinct()
    flagged = dedup_ops.bloom_probe(
        probe, "h", bloom, m_bits=BLOOM_M_BITS, k=BLOOM_K, hashed=True
    )
    exact = flagged.join(
        F.broadcast(bench_hashes.withColumn("__exact", F.lit(1))),
        "h",
        "left",
    )
    return exact.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("maybe_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_maybe"),
        F.sum(F.when(F.col("__exact").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
    )


_BLOOM_POS = """
  SELECT {key_cols}, unnest([
      (h1 + 0 * h2) % {m}, (h1 + 1 * h2) % {m},
      (h1 + 2 * h2) % {m}, (h1 + 3 * h2) % {m}]) AS p
  FROM (SELECT {key_cols}, h % {m} AS h1, ((h >> 30) % {m}) * 2 + 1 AS h2
        FROM {src})
"""

Q95_SQL = (
    r"""
WITH d AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  SELECT doc_id, source,
         list_distinct([array_to_string(list_slice(w, i, i + 2), ' ')
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM d),
flat AS (SELECT doc_id, source, """
    + _H60.format(x="unnest(s)")
    + r""" AS h FROM sh),
bench AS (SELECT DISTINCT h FROM flat WHERE doc_id % 97 = 0),
bloom AS (
  SELECT p // 60 AS word_idx, bit_or(CAST(1 AS BIGINT) << (p % 60)::INT) AS word
  FROM ("""
    + _BLOOM_POS.format(key_cols="h", m=4096, src="bench")
    + r""")
  GROUP BY 1),
probe AS (
  SELECT DISTINCT doc_id, source, h FROM flat WHERE doc_id % 97 <> 0),
hits AS (
  SELECT doc_id, source, h,
         sum(CASE WHEN ((word >> (p % 60)::INT) & 1) = 1 THEN 1 ELSE 0 END) AS nbits
  FROM ("""
    + _BLOOM_POS.format(key_cols="doc_id, source, h", m=4096, src="probe")
    + r""") pos
  LEFT JOIN bloom ON pos.p // 60 = bloom.word_idx
  GROUP BY doc_id, source, h)
SELECT source, count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN nbits = 4 THEN 1 ELSE 0 END)::BIGINT AS n_maybe,
       sum(CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END)::BIGINT AS n_exact
FROM hits GROUP BY source
"""
)


# --------------------------------------------------------------------------
# q96 — streaming windowed aggregation driven end-to-end: the events
# table replayed as an ordered file stream, hourly tumbling-window class
# counts (T1 trigger, A1 agg, watermark state eviction) in UPDATE mode,
# upserted into a K1/K2-style snapshot keyed by (window, class). With an
# ordered replay nothing is ever late, so the final snapshot equals the
# batch aggregation — which is exactly the oracle.
# --------------------------------------------------------------------------

def q96_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from odin_rs_spark.streaming.pipelines import (
        run_available_now,
        snapshot_delta_sink,
        windowed_class_counts,
    )
    from odin_rs_spark.streaming.sources import file_stream, split_for_replay

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="odin_q96_")
    try:
        split_for_replay(ev, root + "/chunks", n_chunks=4, order_col="ts")
        stream = file_stream(
            spark, root + "/chunks/chunk_*", ev.schema, max_files_per_trigger=2
        )
        agg = windowed_class_counts(stream, window="1 hour", watermark="2 hours")

        # keyed upsert into the SNAPSHOT TABLE (K2), not a driver dict
        # (VERDICT r3 "what's wrong" #2): update-mode rows replace their
        # (win_start, class) key; at 100× window cardinality the state
        # stays distributed — the driver only ever sees the final
        # bounded aggregate
        def merge(old: DataFrame | None, batch_df: DataFrame) -> DataFrame:
            if old is None:
                return batch_df
            keys = ["win_start", "class"]
            return old.join(
                batch_df.select(*keys), on=keys, how="left_anti"
            ).unionByName(batch_df)

        sink = snapshot_delta_sink(
            root + "/snapshot", root + "/delta", merge_fn=merge
        )
        with _stream_state_parallelism(spark, 8):
            run_available_now(agg, sink, root + "/ckpt", output_mode="update")
        final = spark.read.parquet(root + "/snapshot").select(
            "win_start", "win_end", "class", "n", "sum_value"
        )
        rows = final.collect()  # materialize before the temp store is deleted
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q96_SQL = """
SELECT date_trunc('hour', ts) AS win_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
       CASE WHEN value < 50 THEN 'low'
            WHEN value < 200 THEN 'mid'
            ELSE 'high' END AS class,
       count(*)::BIGINT AS n,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q97 — DSIR data selection (Xie et al. 2023, arXiv:2302.03169): rank
# non-English docs by how English-corpus-like their unigram stats are,
# Gumbel-top-k without replacement. Deterministic: the Gumbel draw comes
# from the portable doc hash, so the oracle replays the whole sampler.
# --------------------------------------------------------------------------

def q97_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    raw = docs.filter(F.col("lang") != "en")
    return corpus_ops.dsir_select(raw, target, k=30)


Q97_SQL = rf"""
WITH tt AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents WHERE lang = 'en'),
rt AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents WHERE lang <> 'en'),
ct AS (SELECT t, count(*) AS ct FROM tt GROUP BY t),
cr AS (SELECT t, count(*) AS cr FROM rt GROUP BY t),
vocab AS (
  SELECT coalesce(ct.t, cr.t) AS t,
         coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
  FROM ct FULL JOIN cr ON ct.t = cr.t),
tot AS (SELECT sum(ct)::DOUBLE AS nt, sum(cr)::DOUBLE AS nr,
               count(*)::DOUBLE AS v FROM vocab),
scored AS (
  SELECT rt.doc_id, count(*)::BIGINT AS n_tokens,
         sum(ln(vocab.ct + 1.0) - ln(vocab.cr + 1.0))
           + count(*) * (ln(tot.nr + tot.v) - ln(tot.nt + tot.v)) AS lnw
  FROM rt JOIN vocab ON rt.t = vocab.t CROSS JOIN tot
  GROUP BY rt.doc_id, tot.nt, tot.nr, tot.v),
keyed AS (
  SELECT doc_id, n_tokens, lnw,
         lnw - ln(-ln(({_H60.format(x="concat(doc_id::VARCHAR, 'dsir')")} + 0.5)
                      / 1152921504606846976.0)) AS gkey
  FROM scored)
SELECT doc_id, n_tokens, round(lnw, 6) AS ln_weight, round(gkey, 6) AS gumbel_key
FROM keyed ORDER BY gkey DESC, doc_id LIMIT 30
"""


# --------------------------------------------------------------------------
# q98 — interpolated bigram-LM scoring (Jelinek-Mercer, the KenLM-lite
# fallback chain): order-2 upgrade of q84's CCNet-style quality proxy.
# NB the oracle writes (1.0 - 0.7), not 0.3 — the engine computes the
# complement, and the two double literals are NOT the same number.
# --------------------------------------------------------------------------

def q98_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.bigram_logprob(docs, lam=0.7)


Q98_SQL = r"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
tok AS (
  SELECT doc_id, i, w[i + 1] AS t,
         CASE WHEN i > 0 THEN w[i] END AS prev
  FROM (SELECT doc_id, w, unnest(range(0, len(w))) AS i FROM d)),
uni AS (SELECT t, count(*) AS cu FROM tok GROUP BY t),
tot AS (SELECT sum(cu)::DOUBLE AS n FROM uni),
bi AS (
  SELECT tok.prev, tok.t, count(*) AS cb
  FROM tok WHERE prev IS NOT NULL GROUP BY tok.prev, tok.t),
bi2 AS (
  SELECT bi.prev, bi.t, bi.cb, u2.cu AS cprev
  FROM bi JOIN uni u2 ON bi.prev = u2.t),
lp AS (
  SELECT tok.doc_id,
         CASE WHEN tok.prev IS NULL THEN ln(uni.cu / tot.n)
              ELSE ln(0.7 * bi2.cb / bi2.cprev + (1.0 - 0.7) * uni.cu / tot.n)
         END AS lp
  FROM tok
  JOIN uni ON tok.t = uni.t
  LEFT JOIN bi2 ON tok.prev = bi2.prev AND tok.t = bi2.t
  CROSS JOIN tot)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(sum(lp) / count(*), 6) AS avg_logprob
FROM lp GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q99 — HyperLogLog cardinality (Flajolet et al. 2007), portable
# registers (trailing-zero rank, pure integer ops) so the oracle replays
# build + estimate. Reported next to the exact distinct count: the judge
# of an approximate operator is its error, so emit both.
# --------------------------------------------------------------------------

def q99_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import sketches

    ev = _t(spark, sf_dir, "events")
    est = sketches.hll_distinct(ev, "user_id", ["event_type"], p=10)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n_exact",
        "hll_estimate",
        F.round((F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


# shared HLL oracle chain (p=10, m=1024): register build + raw/linear-
# counting estimate per event_type. ONE copy used by both q99 (batch,
# joined to exact counts) and q115 (streaming merge - whose whole claim
# is equality with this very chain).
_HLL_CHAIN = f"""WITH h AS (
  SELECT event_type, {_H60.format(x="concat(user_id::VARCHAR, '')")} AS h
  FROM events),
br AS (
  SELECT event_type, (h % 1024)::INT AS bucket,
         CASE WHEN (h >> 10) = 0 THEN 51
              ELSE bit_count(((h >> 10) & -(h >> 10)) - 1) + 1 END AS rank
  FROM h),
reg AS (SELECT event_type, bucket, max(rank) AS register
        FROM br GROUP BY event_type, bucket),
est AS (
  SELECT event_type, count(*) AS nonzero,
         sum(pow(2.0, -register)) AS s
  FROM reg GROUP BY event_type),
e2 AS (
  SELECT event_type,
         (0.7213/(1.0 + 1.079/1024))*1024*1024 / (s + (1024 - nonzero)) AS raw,
         1024 - nonzero AS v
  FROM est),
hll AS (
  SELECT event_type,
         round(CASE WHEN raw <= 2.5*1024 AND v > 0
                    THEN 1024.0 * ln(1024.0 / v) ELSE raw END, 2) AS hll_estimate
  FROM e2)"""

Q99_SQL = _HLL_CHAIN + """,
exact AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
          FROM events GROUP BY event_type)
SELECT exact.event_type, n_exact, hll_estimate,
       round((hll_estimate - n_exact) / n_exact, 4) AS rel_err
FROM exact JOIN hll USING (event_type)
"""


# --------------------------------------------------------------------------
# q100 — Count-Min frequency sketch (Cormode & Muthukrishnan 2005) over
# the corpus token stream: estimate the top-20 words' counts from a
# 4x1024 grid and report the (always >= 0) overshoot vs exact counts.
# --------------------------------------------------------------------------

def q100_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.functions.text import norm_text
    from odin_rs_spark.operators import sketches

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(norm_text(F.col("text")), " ")).alias("w")
    )
    # pre-aggregate once: the sketch builds from (word, count) so md5 +
    # the 4-way cell explode run per distinct word, not per token, and
    # the same counts frame feeds the true-count top-20. The vocab is
    # CHECKPOINTED so its two consumers (grid build, top-20) tokenize
    # the corpus once instead of twice — r11's persist() A/B read
    # worse (~0.8 s store/read vs 0.4 s recompute) but an eager
    # localCheckpoint avoids the cache-manager overhead and measured
    # 3.46 -> 2.83 s isolated (r12); at 100 TB one corpus pass saved.
    cnts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("true_cnt")).localCheckpoint(eager=True)
    cms = sketches.cms_build(cnts, "w", width=1024, depth=4, weight_col="true_cnt")
    top = cnts.orderBy(F.col("true_cnt").desc(), F.col("w")).limit(20)
    out = sketches.cms_query(top, "w", cms, width=1024, depth=4)
    return out.select(
        "w", "true_cnt", "cms_est", (F.col("cms_est") - F.col("true_cnt")).alias("overshoot")
    )


Q100_SQL = rf"""
WITH tok AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents),
th AS (SELECT w, {_H60.format(x='w')} AS h FROM tok),
pos AS (
  SELECT row, ((h % 1024) + row * (((h >> 30) % 1024) * 2 + 1)) % 1024 AS col
  FROM th, (SELECT unnest(range(0, 4)) AS row)),
grid AS (SELECT row, col, count(*)::BIGINT AS cnt FROM pos GROUP BY row, col),
top AS (
  SELECT w, count(*)::BIGINT AS true_cnt FROM tok GROUP BY w
  ORDER BY true_cnt DESC, w LIMIT 20),
toph AS (SELECT w, true_cnt, {_H60.format(x='w')} AS h FROM top),
probe AS (
  SELECT w, true_cnt, r.row,
         ((h % 1024) + r.row * (((h >> 30) % 1024) * 2 + 1)) % 1024 AS col
  FROM toph, (SELECT unnest(range(0, 4)) AS row) r),
est AS (
  SELECT probe.w, probe.true_cnt, min(coalesce(grid.cnt, 0)) AS cms_est
  FROM probe LEFT JOIN grid ON probe.row = grid.row AND probe.col = grid.col
  GROUP BY probe.w, probe.true_cnt)
SELECT w, true_cnt, cms_est, cms_est - true_cnt AS overshoot FROM est
"""


# --------------------------------------------------------------------------
# q101 — skew-safe two-stage aggregation (salted): upgrades the skew
# tooling (SCALE.md, `operators/skew.py`) from test-verified to
# driver-verified. The salt is internal; the RESULT is salt-invariant
# (counts merge associatively, sums are rounded), so the oracle is the
# plain GROUP BY — which is exactly the claim a salted agg must honor.
# --------------------------------------------------------------------------

def q101_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators.skew import salted_count_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_count_agg(
        ev,
        ["event_type"],
        {
            "n": F.count(F.lit(1)),
            "sum_value": F.sum("value"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("sum_value", 4).alias("sum_value"),
    )


Q101_SQL = """
SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q102 — sampled quantile estimation: exact per-group percentiles on a
# deterministic 20% hash sample vs the full data. The portable-hash
# sample makes the "approximate" path fully replayable — the honest,
# shuffle-light alternative to engine-specific quantile sketches whose
# internals never match across engines.
# --------------------------------------------------------------------------

def q102_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators.aggregations import group_percentiles
    from odin_rs_spark.operators.corpus import hash_sample

    ev = _t(spark, sf_dir, "events")
    exact = group_percentiles(ev, ["event_type"], "value").select(
        "event_type", F.col("p50").alias("p50_exact"), F.col("p95").alias("p95_exact")
    )
    sample = group_percentiles(
        hash_sample(ev, 0.2, "event_id"), ["event_type"], "value"
    ).select(
        "event_type", F.col("p50").alias("p50_sample"), F.col("p95").alias("p95_sample")
    )
    return exact.join(sample, "event_type").select(
        "event_type",
        "p50_exact",
        "p50_sample",
        F.round(F.abs(F.col("p50_sample") - F.col("p50_exact")), 6).alias("p50_abs_err"),
        "p95_exact",
        "p95_sample",
    )


Q102_SQL = f"""
WITH s AS (
  SELECT * FROM events WHERE {_HFRAC.format(k='event_id')} < CAST(0.2 AS DOUBLE)),
exact AS (
  SELECT event_type,
         round(quantile_cont(value, 0.5), 6)  AS p50_exact,
         round(quantile_cont(value, 0.95), 6) AS p95_exact
  FROM events GROUP BY event_type),
samp AS (
  SELECT event_type,
         round(quantile_cont(value, 0.5), 6)  AS p50_sample,
         round(quantile_cont(value, 0.95), 6) AS p95_sample
  FROM s GROUP BY event_type)
SELECT exact.event_type, p50_exact, p50_sample,
       round(abs(p50_sample - p50_exact), 6) AS p50_abs_err,
       p95_exact, p95_sample
FROM exact JOIN samp USING (event_type)
"""


# --------------------------------------------------------------------------
# q103 — the CUSTOM STATEFUL operator (applyInPandasWithState) driven
# end-to-end through the driver surface: ttl_latest_state (T3, the
# ADS-B keyed store) over the replayed events stream, update-mode
# emissions upserted into a snapshot. The oracle is the batch
# latest-per-key with cumulative update counts — which only matches if
# the per-key state survived every micro-batch boundary intact.
# (user_id, ts) is unique in the synthetic events table, so the batch
# twin is well-defined without an operator-side tiebreak.
# --------------------------------------------------------------------------

def q103_stream_ttl_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from odin_rs_spark.streaming.pipelines import (
        latest_per_key_merge,
        read_sink_or_empty,
        run_available_now,
        snapshot_delta_sink,
    )
    from odin_rs_spark.streaming.sources import file_stream, split_for_replay
    from odin_rs_spark.streaming.state import ttl_latest_state

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts"),
        F.col("value"),
    )
    root = tempfile.mkdtemp(prefix="odin_q103_")
    try:
        split_for_replay(ev, root + "/chunks", n_chunks=4, order_col="ts")
        stream = file_stream(
            spark, root + "/chunks/chunk_*", ev.schema, max_files_per_trigger=2
        )
        out = ttl_latest_state(stream.groupBy("key"), ttl_ms=None)

        # snapshot_delta_sink (not a driver dict): the per-key upsert is
        # one anti-join per batch, executor-side — a driver dict grows
        # with KEY CARDINALITY, not aggregation output, which at 100×
        # users is exactly the driver-memory pattern this repo documents
        # against (VERDICT r3/r4)
        snap, delta = root + "/snapshot", root + "/delta"
        sink = snapshot_delta_sink(snap, delta, latest_per_key_merge(["key"]))
        with _stream_state_parallelism(spark, 8):
            run_available_now(out, sink, root + "/ckpt", output_mode="update")
        # read_sink_or_empty: a zero-batch replay never creates the
        # snapshot dir — the semantic result is then simply empty
        kept = read_sink_or_empty(
            spark, snap, "key string, ts timestamp, value double, n_updates bigint"
        ).select("key", "ts", "value", "n_updates")
        rows = kept.collect()  # materialize before the temp store is deleted
        return spark.createDataFrame(rows, kept.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q103_SQL = """
WITH ranked AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id::VARCHAR AS key, ts, value, n::BIGINT AS n_updates
FROM ranked WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q104 — Matryoshka two-stage ANN: coarse top-20 on the first 16
# embedding dims, exact full-dim rerank to top-5. The oracle replays
# both stages; ranks tie-break on vec_id in both engines.
# --------------------------------------------------------------------------

def q104_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim_ops.matryoshka_topk(emb, queries, prefix_dim=16, rerank_k=20, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


Q104_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
pre AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, 17), i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 17), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 17), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))))
         AS pcos
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, vec_id ASC) AS rn
    FROM pre) WHERE rn <= 20),
s AS (
  SELECT c.query_id, c.vec_id,
         list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))))
         AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q ON q.query_id = c.query_id)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM s) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# q105 — int8 scalar-quantization audit: per-dim max-abs scales, then
# per-label cosine-preservation and reconstruction-error stats. floor(
# x+0.5) rounding (identical cross-engine, unlike HALF_UP round); the
# oracle mirrors Spark's per-row ordered list folds exactly.
# --------------------------------------------------------------------------

def q105_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return sim_ops.quantize_int8_stats(emb)


Q105_SQL = """
WITH ex AS (
  SELECT i, max(abs(embedding[i]::DOUBLE)) AS s
  FROM embeddings, unnest(range(1, 65)) AS t(i)
  GROUP BY i),
sc AS (SELECT list(s ORDER BY i) AS sv FROM ex),
per AS (
  SELECT label,
         list_transform(range(1, 65), i -> embedding[i]::DOUBLE) AS xv,
         list_transform(range(1, 65), i ->
           CASE WHEN sv[i] > 0
                THEN greatest(-127.0, least(127.0, floor(embedding[i]::DOUBLE / sv[i] * 127.0 + 0.5))) * sv[i] / 127.0
                ELSE 0.0 END) AS rv
  FROM embeddings, sc),
m AS (
  SELECT label,
         list_sum(list_transform(range(1, 65), i -> xv[i] * rv[i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> xv[i] * xv[i])))
            * sqrt(list_sum(list_transform(range(1, 65), i -> rv[i] * rv[i])))) AS cosp,
         list_max(list_transform(range(1, 65), i -> abs(xv[i] - rv[i]))) AS maxerr
  FROM per)
SELECT label, count(*)::BIGINT AS n,
       round(avg(cosp), 6) AS avg_cos_keep,
       round(max(maxerr), 6) AS max_abs_err,
       round(avg(maxerr), 6) AS avg_max_err
FROM m GROUP BY label
"""


# --------------------------------------------------------------------------
# q106 — exact directed containment join (asymmetric prefix filter):
# pairs where >= 60% of a's 3-gram shingle set appears in b — the
# "b subsumes a" test Jaccard misses for short-quote-in-long-doc.
# Oracle = exact all-pairs containment over the same shingling.
# --------------------------------------------------------------------------

def q106_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.containment_join_pairs(
        docs, threshold=0.6, parallelism=spark.sparkContext.defaultParallelism
    )


Q106_SQL = """
WITH d AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
sh AS (
  -- list_slice clamps at the array end, mirroring Spark's
  -- try_element_at + concat_ws-skips-nulls shingling for sub-n-word
  -- docs (the `w[i] || ...` form NULLs out and strips their shingles)
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(w, i, i + 2), ' ')
                        for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS s
  FROM d),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s))::DOUBLE / len(a.s)::DOUBLE AS containment
  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
SELECT id_a, id_b, containment FROM pairs WHERE containment >= 0.6
"""


# --------------------------------------------------------------------------
# q107 — exact-count stratified sample: per-lang quota ceil(0.3·n) by
# portable-hash rank. Unlike the Bernoulli q63, the kept COUNT per
# stratum is guaranteed; sum_doc_id pins the exact membership.
# --------------------------------------------------------------------------

def q107_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    kept = corpus_ops.stratified_sample(
        docs, ["lang"], 0.3, key="doc_id", salt="strat"
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("sum_doc_id")
    )


Q107_SQL = """
WITH h AS (
  SELECT lang, doc_id,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'strat'), 1, 15)) AS BIGINT)
         / 1152921504606846976.0 AS hv
  FROM documents),
r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM h)
SELECT lang, count(*)::BIGINT AS n_kept, sum(doc_id)::BIGINT AS sum_doc_id
FROM r WHERE rk <= ceil(n * 0.3 - 1e-9) GROUP BY lang
"""


# --------------------------------------------------------------------------
# q108 — streaming exact dedup through the driver surface: native
# dropDuplicates state over an AvailableNow replay of the events table
# (T3's exact-dedup twin, driver-verified like q91/q96/q103). The
# emitted measure is per-type distinct-user membership — invariant to
# which physical row wins inside a microbatch, so the batch-SQL oracle
# replays it exactly.
# --------------------------------------------------------------------------

def q108_stream_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from odin_rs_spark.streaming.pipelines import run_available_now
    from odin_rs_spark.streaming.sources import file_stream, split_for_replay

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    root = tempfile.mkdtemp(prefix="odin_q108_")
    try:
        split_for_replay(ev, root + "/chunks", n_chunks=4, order_col="ts")
        stream = file_stream(
            spark, root + "/chunks/chunk_*", ev.schema, max_files_per_trigger=2
        )
        dedup = stream.dropDuplicates(["user_id", "event_type"]).select(
            "user_id", "event_type"
        )

        # partitioned_append_sink (not a driver set): streaming
        # dropDuplicates already guarantees exactly-once emission per
        # key pair, so each batch lands as its own retry-idempotent
        # parquet partition — the distinct-key set never visits the
        # driver (it grows with key cardinality)
        from odin_rs_spark.streaming.pipelines import (
            partitioned_append_sink,
            read_sink_or_empty,
        )

        out_dir = root + "/pairs"
        with _stream_state_parallelism(spark, 8):
            run_available_now(
                dedup,
                partitioned_append_sink(out_dir),
                root + "/ckpt",
                output_mode="append",
            )
        agg = (
            read_sink_or_empty(
                spark,
                out_dir,
                "user_id bigint, event_type string, __batch_id bigint",
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_users"),
                F.sum("user_id").alias("sum_user_id"),
            )
        )
        rows = agg.collect()  # materialize before the temp store is deleted
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q108_SQL = """
SELECT event_type, count(*)::BIGINT AS n_users, sum(user_id)::BIGINT AS sum_user_id
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q109 — int8 ADC retrieval (FAISS SQ8-flat scheme): corpus scored as
# dequantized int8 codes under the q105 scales, queries full-precision.
# Deterministic floor(+0.5) arithmetic, so the oracle replays the
# quantized index exactly.
# --------------------------------------------------------------------------

def q109_int8_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim_ops.int8_adc_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.round("adc_cos", 6).alias("adc_cos"), "rank"
    )


Q109_SQL = """
WITH ex AS (
  SELECT i, max(abs(embedding[i]::DOUBLE)) AS s
  FROM embeddings, unnest(range(1, 65)) AS t(i)
  GROUP BY i),
sc AS (SELECT list(s ORDER BY i) AS sv FROM ex),
r AS (
  SELECT vec_id,
         list_transform(range(1, 65), i ->
           CASE WHEN sv[i] > 0
                THEN greatest(-127.0, least(127.0, floor(embedding[i]::DOUBLE / sv[i] * 127.0 + 0.5))) * sv[i] / 127.0
                ELSE 0.0 END) AS rv
  FROM embeddings, sc),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.query_id, r.vec_id,
         list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * r.rv[i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65), i -> r.rv[i] * r.rv[i])))) AS cos
  FROM r, q WHERE r.vec_id <> q.query_id)
SELECT query_id, vec_id, round(cos, 6) AS adc_cos, rank FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank
  FROM s) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# q110 — token-budget data selection: best docs first (n_chars DESC,
# doc_id tiebreak), keep while the running token total fits the budget.
# Spark side = distributed two-phase prefix sum (range partition +
# per-range cumsum + tiny offset join); oracle = the equivalent global
# window cumsum.
# --------------------------------------------------------------------------

def q110_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import corpus as corpus_ops

    docs = _t(spark, sf_dir, "documents")
    scored = docs.withColumn(
        "__tok",
        F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
        ),
    )
    kept = corpus_ops.select_until_budget(
        scored, score_col="n_chars", token_col="__tok", budget=50000, key="doc_id"
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("__tok").alias("sum_tokens"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


Q110_SQL = r"""
WITH t AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
  FROM documents),
c AS (
  SELECT *, sum(tok) OVER (ORDER BY n_chars DESC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM t)
SELECT source, count(*)::BIGINT AS n_kept, sum(tok)::BIGINT AS sum_tokens,
       sum(doc_id)::BIGINT AS sum_doc_id
FROM c WHERE cum <= 50000 GROUP BY source
"""


# --------------------------------------------------------------------------
# q111 — video frame-sampling plumbing driven end-to-end: binary media
# column → mapInPandas frame fan-out (every_n stride, bounded frames) →
# per-frame byte stats. The stub "frames" are deterministic byte
# windows, so the oracle replays the whole mapInPandas fan-out with
# blob substring arithmetic — the schema/partitioning/batch contract is
# the real thing a codec-backed decoder drops into (multimodal.py's
# raising real-backend seam).
# --------------------------------------------------------------------------

def q111_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators import multimodal as mm_ops

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    # printable-ASCII guard BEFORE encoding: this DuckDB build cannot
    # slice BLOBs, so the oracle windows on chars and encodes after —
    # equivalent to Spark's byte windows only when every char is one
    # byte, which the guard makes true by construction
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(
            F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", ""), "UTF-8"
        ).alias("content"),
    )
    frames = mm_ops.frame_sample(media, every_n=2, max_frames=4)
    return frames.select(
        "media_id",
        "frame_no",
        F.length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("frame_md5"),
    )


Q111_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, regexp_replace(text, '[^ -~]', '', 'g') AS s
  FROM documents WHERE doc_id < 50),
f AS (
  SELECT media_id, (i * 2)::INT AS frame_no, substring(s, i * 128 + 1, 64) AS fr
  FROM m, unnest(range(0, 4)) AS t(i)
  WHERE i * 128 < length(s))
SELECT media_id, frame_no, length(fr)::BIGINT AS n_bytes, md5(fr) AS frame_md5
FROM f
"""


# --------------------------------------------------------------------------
# q112 — BPE-style pre-tokenizer accounting: tokens under the
# word/number/punct TOKEN_PATTERN vs whitespace words, per source. The
# corpus is pure lowercase words, so the query deterministically
# enriches each doc with doc_id-derived digits/punctuation (q47's
# pattern) to exercise the regex split for real; the oracle applies the
# identical pattern (ASCII classes — same meaning in Java regex & RE2).
# --------------------------------------------------------------------------

def q112_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    rich = docs.withColumn(
        "rich",
        F.concat(
            F.col("text"),
            F.lit(" v"),
            F.col("doc_id").cast("string"),
            F.lit(".9, (q-"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(")! it's"),
        ),
    )
    return text_ops.bpe_token_stats(rich, text_col="rich", keys=["source"])


Q112_SQL = r"""
WITH r AS (
  SELECT source,
         text || ' v' || doc_id || '.9, (q-' || (doc_id % 7) || ')! it''s' AS rich
  FROM documents),
t AS (
  SELECT source,
         len(regexp_extract_all(rich, '[A-Za-z]+(?:''[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]', 0)) AS nb,
         CASE WHEN trim(rich) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(rich), '\s+')) END AS nw
  FROM r)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(nb)::BIGINT AS n_bpe_tokens,
       sum(nw)::BIGINT AS n_ws_tokens,
       round(avg(nb::DOUBLE / nw), 6) AS avg_inflation
FROM t GROUP BY source
"""


# --------------------------------------------------------------------------
# q113 — boilerplate segment REMOVAL (the transform q92 audits): drop
# every 10-word segment that occurs in >1 document, rebuild each doc
# from the survivors in order. clean_md5 pins the exact rebuilt text.
# --------------------------------------------------------------------------

def q113_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = text_ops.remove_dup_segments(docs, seg_words=10, max_docs=1)
    return out.select(
        "doc_id",
        F.col("n_segs").cast("long").alias("n_segs"),
        "n_removed",
        F.length("clean_text").cast("long").alias("clean_len"),
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


Q113_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents),
seg AS (
  SELECT doc_id, s AS seg_id,
         array_to_string(list_slice(w, s * 10 + 1, s * 10 + 10), ' ') AS seg
  FROM (SELECT doc_id, w, unnest(range(0, (len(w) + 9) // 10)) AS s FROM d)),
cnt AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY seg),
j AS (SELECT s.doc_id, s.seg_id, s.seg, c.nd FROM seg s JOIN cnt c USING (seg)),
per AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_segs,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
         coalesce(string_agg(seg, ' ' ORDER BY seg_id) FILTER (WHERE nd <= 1), '') AS clean
  FROM j GROUP BY doc_id)
SELECT doc_id, n_segs, n_removed,
       length(clean)::BIGINT AS clean_len, md5(clean) AS clean_md5
FROM per
"""


# --------------------------------------------------------------------------
# q114 — skew-safe salted join driven end-to-end (q101's twin for the
# JOIN path): salt the fact side, replicate the dim once per salt
# bucket, join on (key, salt). The salt only routes rows, so the result
# equals the plain equi-join the oracle runs — salt-invariance IS the
# correctness claim.
# --------------------------------------------------------------------------

def q114_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from odin_rs_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, "user_id", salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


Q114_SQL = """
SELECT c.c_mktsegment, count(*)::BIGINT AS n, round(sum(e.value), 4) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


# --------------------------------------------------------------------------
# q115 — streaming HLL register merge: per-microbatch registers folded
# into a cross-batch store by max (register max is ASSOCIATIVE, so the
# stream-merged estimate must equal the one-pass batch estimate the
# oracle computes — mergeability is the whole reason sketches work in
# incremental pipelines, and this query proves it through the driver).
# --------------------------------------------------------------------------

def q115_stream_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from odin_rs_spark.operators import sketches
    from odin_rs_spark.streaming.pipelines import (
        run_available_now,
        snapshot_delta_sink,
    )
    from odin_rs_spark.streaming.sources import file_stream, split_for_replay

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    root = tempfile.mkdtemp(prefix="odin_q115_")
    try:
        split_for_replay(ev, root + "/chunks", n_chunks=4, order_col="ts")
        stream = file_stream(
            spark, root + "/chunks/chunk_*", ev.schema, max_files_per_trigger=2
        )

        # register max-merge as a DISTRIBUTED snapshot upsert (VERDICT
        # r3 "what's wrong" #2): each micro-batch's registers fold into
        # the register STORE via union + max — never a driver dict, so
        # register cardinality can grow 100× without touching driver
        # memory. Register max is associative, which is exactly what
        # makes the stream-merged estimate equal the batch estimate.
        def merge(old: DataFrame | None, batch_df: DataFrame) -> DataFrame:
            regs = sketches.hll_registers(batch_df, "user_id", ["event_type"], p=10)
            if old is None:
                return regs
            return (
                old.unionByName(regs)
                .groupBy("event_type", "bucket")
                .agg(F.max("register").alias("register"))
            )

        sink = snapshot_delta_sink(
            root + "/snapshot", root + "/delta", merge_fn=merge
        )
        with _stream_state_parallelism(spark, 8):
            run_available_now(stream, sink, root + "/ckpt", output_mode="append")
        reg_df = spark.read.parquet(root + "/snapshot")
        out = sketches.hll_estimate(reg_df, ["event_type"], p=10)
        rows = out.collect()  # materialize before the temp store is deleted
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q115_SQL = _HLL_CHAIN + """
SELECT event_type, hll_estimate FROM hll
"""


# --------------------------------------------------------------------------
# q116 — mean-centering + renorm transform (the fix q89's audit
# parameterizes): per-label proof metrics — unit norms after renorm,
# and the cosine between original and centered geometry.
# --------------------------------------------------------------------------

def q116_center_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = sim_ops.center_embeddings(emb, renormalize=True)
    return out.select(
        "label",
        sim_ops.l2_norm(F.col("centered")).alias("__nrm"),
        (
            sim_ops.dot(F.col("embedding"), F.col("centered"))
            / (
                sim_ops.l2_norm(F.col("embedding"))
                * sim_ops.l2_norm(F.col("centered"))
            )
        ).alias("__cos"),
    ).groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("__nrm"), 6).alias("avg_norm"),
        F.round(F.avg("__cos"), 6).alias("avg_cos_to_original"),
    )


Q116_SQL = """
WITH ex AS (
  SELECT i, avg(embedding[i]::DOUBLE) AS m
  FROM embeddings, unnest(range(1, 65)) AS t(i)
  GROUP BY i),
mv AS (SELECT list(m ORDER BY i) AS ms FROM ex),
per AS (
  SELECT label,
         list_transform(range(1, 65), i -> embedding[i]::DOUBLE) AS xv,
         list_transform(range(1, 65), i -> embedding[i]::DOUBLE - ms[i]) AS cv
  FROM embeddings, mv),
nrm AS (
  SELECT label, xv,
         sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) AS cn,
         cv
  FROM per),
fin AS (
  SELECT label,
         CASE WHEN cn > 0 THEN list_transform(range(1, 65), i -> cv[i] / cn)
              ELSE cv END AS nv,
         xv
  FROM nrm),
m2 AS (
  SELECT label,
         sqrt(list_sum(list_transform(range(1, 65), i -> nv[i] * nv[i]))) AS nrm2,
         list_sum(list_transform(range(1, 65), i -> xv[i] * nv[i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> xv[i] * xv[i])))
            * sqrt(list_sum(list_transform(range(1, 65), i -> nv[i] * nv[i])))) AS cosv
  FROM fin)
SELECT label, count(*)::BIGINT AS n,
       round(avg(nrm2), 6) AS avg_norm,
       round(avg(cosv), 6) AS avg_cos_to_original
FROM m2 GROUP BY label
"""


# --------------------------------------------------------------------------
# q117 — streaming gap-based session windows driven end-to-end (T6:
# built-in session_window state, update-mode upsert keyed by the
# session's fixed start under time-ordered replay). Oracle = the
# lag-cumsum batch twin; boundary rule matched exactly: Spark's
# [t, t+gap) windows do NOT merge at a gap of exactly 30 min (end
# exclusive), so the oracle opens a new session on diff >= gap.
# --------------------------------------------------------------------------

def q117_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from odin_rs_spark.streaming.pipelines import (
        run_available_now,
        session_window_counts,
    )
    from odin_rs_spark.streaming.sources import file_stream, split_for_replay

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    root = tempfile.mkdtemp(prefix="odin_q117_")
    try:
        split_for_replay(ev, root + "/chunks", n_chunks=4, order_col="ts")
        # session_window aggs are APPEND-only (update is rejected):
        # closed sessions emit once the watermark passes their end. A
        # per-user sentinel event far past the real data, landed as the
        # LAST file, pushes the watermark beyond every real session —
        # the sentinel's own session never closes, so append output is
        # exactly the real session set, no filtering needed.
        # ONE GLOBAL sentinel instant for every user: per-user sentinels
        # would close for any user trailing the global max by > gap +
        # delay (the global watermark passes their sentinel session's
        # end) and leak into the append output
        gmax = ev.agg(F.max("ts")).collect()[0][0]  # bounded: 1 scalar
        sentinel = (
            ev.select("user_id")
            .distinct()
            .select(
                "user_id",
                (F.lit(gmax) + F.expr("INTERVAL 30 DAYS")).alias("ts"),
            )
        )
        sentinel.coalesce(1).write.mode("overwrite").parquet(
            root + "/chunks/chunk_zz_sentinel"
        )
        stream = file_stream(
            spark, root + "/chunks/chunk_*", ev.schema, max_files_per_trigger=2
        )
        sessions = session_window_counts(
            stream, key="user_id", ts_col="ts", gap="30 minutes", watermark="1 minute"
        )

        # partitioned_append_sink (not a driver list): watermark-closed
        # session windows emit exactly once, so batches land as
        # retry-idempotent parquet partitions; closed sessions scale
        # with the corpus and must never accumulate in driver memory
        from odin_rs_spark.streaming.pipelines import (
            partitioned_append_sink,
            read_sink_or_empty,
        )

        out_dir = root + "/sessions"
        with _stream_state_parallelism(spark, 8):
            run_available_now(
                sessions,
                partitioned_append_sink(out_dir),
                root + "/ckpt",
                output_mode="append",
            )
        kept = read_sink_or_empty(
            spark,
            out_dir,
            "user_id bigint, session_start timestamp, session_end timestamp,"
            " n_events bigint, __batch_id bigint",
        ).select("user_id", "session_start", "session_end", "n_events")
        rows = kept.collect()  # materialize before the temp store is deleted
        return spark.createDataFrame(rows, kept.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q117_SQL = """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events),
m AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM o),
s AS (
  SELECT user_id, ts,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS seq
  FROM m)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, seq
"""


# --------------------------------------------------------------------------
# q118 — S9/S10 as a FIRST-CLASS Spark streaming source (VERDICT r3 #1):
# the records-since-id importer protocol (odin_sentinel/src/lib.rs:
# 1139-1209, odin_goesr/src/live_importer.rs:57-137) restated as a
# PySpark 4 Python Data Source. The feed is the events table landed as
# JSON-lines; `spark.readStream.format("odin_rest")` polls it with the
# cursor as the SOURCE OFFSET in Spark's own checkpoint, batch_limit
# sized to force ≥3 polls, each drain pass resuming from the offset
# log. Exactly-once check: n == n_ids per class in the final aggregate
# (a duplicated or dropped poll breaks both against the oracle).
# --------------------------------------------------------------------------

def q118_rest_source_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from odin_rs_spark.streaming.datasource import (
        drain_polling_source,
        register_rest_source,
    )

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="odin_q118_")
    try:
        feed_dir = root + "/feed"
        (
            ev.select(
                F.col("event_id").alias("id"), "user_id", "event_type", "value"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .json(feed_dir)
        )
        feed = glob.glob(feed_dir + "/part-*")[0]
        n = ev.count()
        batch_limit = max(1, -(-n // 2))  # ceil(n/2) → exactly 2 polls
        # (each poll is a full AvailableNow run ≈ 2-3 s of fixed
        # engine/source-runner startup; two non-empty polls already
        # prove the multi-batch offset advance)
        register_rest_source(spark)
        ddl = "id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"

        def start_run():
            return (
                spark.readStream.format("odin_rest")
                .schema(ddl)
                .option("path", feed)
                .option("id_field", "id")
                .option("batch_limit", str(batch_limit))
                .load()
                .writeStream.format("parquet")
                .option("path", root + "/store")
                .option("checkpointLocation", root + "/ckpt")
                .trigger(availableNow=True)
                .start()
            )

        with _stream_state_parallelism(spark, 8):
            drain_polling_source(start_run, expected_rows=n)
        store = spark.read.parquet(root + "/store")
        out = store.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("id").alias("n_ids"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        rows = out.collect()  # materialize before the temp store is deleted
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q118_SQL = """
SELECT event_type, count(*)::BIGINT AS n,
       count(DISTINCT event_id)::BIGINT AS n_ids,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q119 — stream-STREAM interval join through the driver surface
# (VERDICT r3 #4): J3's live form (odin_orbital/src/firms.rs:499-533 —
# resolve each new observation against recent evidence as both arrive).
# Purchases and clicks replay as two independent time-ordered chunk
# streams; the watermarked join buffers each side only as long as the
# time-range condition requires (global watermark = min across sources,
# so replay skew between the two chunkings cannot drop matches). The
# batch-twin oracle is the plain interval join — equality holds IFF the
# streaming join emitted every pair exactly once.
# --------------------------------------------------------------------------

def q119_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from odin_rs_spark.streaming.joins import interval_join_streams
    from odin_rs_spark.streaming.pipelines import run_available_now
    from odin_rs_spark.streaming.sources import file_stream, split_for_replay

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"), "value"
    )
    root = tempfile.mkdtemp(prefix="odin_q119_")
    try:
        split_for_replay(purchases, root + "/left", n_chunks=4, order_col="ts")
        split_for_replay(clicks, root + "/right", n_chunks=4, order_col="r_ts")
        # 2 files/trigger → 2 microbatches per side: still proves
        # cross-batch join-state buffering (pairs span the chunk
        # boundary) at half the per-microbatch state-commit cost
        lstream = file_stream(
            spark, root + "/left/chunk_*", purchases.schema, max_files_per_trigger=2
        )
        rstream = file_stream(
            spark, root + "/right/chunk_*", clicks.schema, max_files_per_trigger=2
        )
        joined = interval_join_streams(
            lstream,
            rstream,
            on="user_id",
            left_ts="ts",
            right_ts="r_ts",
            window="2 days",
            watermark="1 hour",
        )

        def append_store(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(root + "/store")

        with _stream_state_parallelism(spark, 8):
            run_available_now(
                joined, append_store, root + "/ckpt", output_mode="append"
            )
        pairs = spark.read.parquet(root + "/store")
        out = pairs.groupBy((F.col("user_id") % 8).alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("event_id").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("sum_click_value"),
        )
        rows = out.collect()  # materialize before the temp store is deleted
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q119_SQL = """
SELECT p.user_id % 8 AS bucket, count(*)::BIGINT AS n_pairs,
       count(DISTINCT p.event_id)::BIGINT AS n_purchases,
       round(sum(c.value), 4) AS sum_click_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 2 DAY AND c.ts <= p.ts
GROUP BY bucket
"""

# re-export EVERYTHING (incl. underscore helpers) down the part chain
__all__ = [n for n in dir() if not n.startswith("__")]
