"""Headline relational queries over the TPC-H-ish fixtures.

These exercise the generic DataFrame capability the rebuild layers the ER
engine on (scan → filter → join → agg → window), expressed so Catalyst gets
full pushdown/pruning/broadcast freedom. They double as the bench workload.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from dblink_spark.queries import load, owns_caches, register

# Exact-decimal helpers (see package docstring for why).
def dec(c, p=18, s=2):
    return F.col(c).cast(f"decimal({p},{s})")


def disc_price():
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 4, 2))


def charge():
    return (
        dec("l_extendedprice")
        * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 4, 2))
        * (F.lit(1).cast("decimal(3,2)") + dec("l_tax", 4, 2))
    )


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    survey_ref="flagship; SURVEY §2.7 aggregation family (G11 map-accumulators → groupBy/agg)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan + 8-way aggregate, fully whole-stage-codegen.

    Scale: one shuffle on a 6-value grouping key; partial aggregation
    (map-side combine) reduces the shuffle to ~|groups| rows per task.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount", 4, 2)).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey AS orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate AS orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
""",
    survey_ref="SURVEY §2.8 join family (J2 inner-join + groupBy)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + aggregate. customer/orders SCALE with the data, so they
    carry NO broadcast hint: AQE picks broadcast-vs-SMJ from runtime stats
    (broadcast at small SF, sort-merge at 100 TB). A forced broadcast here
    would be an OOM at scale, not a slow plan."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(l.l_orderkey.alias("orderkey"), o.o_orderdate.alias("orderdate"))
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate")
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    survey_ref="SURVEY §2.8 multi-way join",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join, single shuffle for the final agg. Only the
    FIXED-cardinality dims (nation: 25 rows, region: 5 rows) carry explicit
    broadcast hints; orders/customer/supplier grow linearly with SF, so AQE
    chooses their join strategy from runtime stats (broadcast at test SF,
    shuffle join at 100 TB)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    survey_ref="SURVEY §2.2 filter family (P3 iteration filter shape)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter+agg; all four predicates push into the parquet scan."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(dec("l_extendedprice") * dec("l_discount", 4, 2))).cast("double").alias("revenue"))
    )


@register(
    "q_top_customers",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
    COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT c.c_name AS name, c.c_mktsegment AS mktsegment, s.total_spend, s.n_orders,
    ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment ORDER BY s.total_spend DESC, c.c_custkey) AS rank
  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
)
SELECT name, mktsegment, total_spend, n_orders, rank FROM ranked WHERE rank <= 5
""",
    survey_ref="SURVEY §2.7 G1 (per-key argmax via window row_number)",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group — the mostProbableClusters (G1) access pattern:
    aggregate frequencies then row_number() over a partitioned ordering."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return (
        spend.join(c, spend.o_custkey == c.c_custkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("mktsegment"),
            "total_spend",
            "n_orders",
            "rank",
        )
    )


@register(
    "q_orders_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    survey_ref="beyond-reference: grouping sets (absent category, SURVEY §2.12)",
)
def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregate — a capability category the reference lacks entirely."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )


def load_events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS); work in integer microseconds
    (`ts_us`). DuckDB side mirrors this with epoch_ns(ts) // 1000.

    Reader behavior differs by Spark version, so dispatch on the read dtype:
    - pre-4.1 rejects nanos unless `nanosAsLong` is set → ts is int64 nanos;
      integer DIV (float division of ~1e18 nanos loses precision past 2^53)
    - 4.1+ ignores that conf and reads nanos natively as timestamp_ntz →
      NTZ-to-NTZ timestampdiff, which is timezone-independent (no session-tz
      reinterpretation, unlike unix_micros(cast(ts as timestamp)))
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = load(spark, sf_dir, "events")
    if dict(e.dtypes)["ts"] == "bigint":
        return e.withColumn("ts_us", F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    return e.withColumn(
        "ts_us",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).cast("bigint"),
    )


@register(
    "q_events_asof_attribution",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us FROM events
),
clicks AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
purchases AS (SELECT user_id, ts_us, value FROM ev WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id, c.ts_us,
  p.value AS value_asof, p.ts_us AS ts_us_asof
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
""",
    survey_ref="beyond-reference: as-of join (operators/asof.py, union+window formulation)",
)
def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the same user's latest preceding purchase —
    the as-of join pattern. Spark side is the union+window operator
    (one shuffle, no range-join nested loops); the oracle is DuckDB's
    native ASOF LEFT JOIN, so the formulations are fully independent."""
    from dblink_spark.operators.asof import asof_join

    e = load_events_us(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "value"
    )
    return asof_join(clicks, purchases, on="ts_us", by="user_id", value_cols=["value"])


@register(
    "q_events_error_click_band",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
),
err AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'error'),
clk AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click')
SELECT e.event_id AS l_event_id, e.user_id AS l_user_id, e.ts_us AS l_ts_us,
  c.event_id AS r_event_id, c.ts_us AS r_ts_us
FROM err e JOIN clk c
  ON e.user_id = c.user_id AND ABS(e.ts_us - c.ts_us) <= 3600000000
""",
    survey_ref="beyond-reference: banded range join (operators/rangejoin.py, bucket blocking)",
)
def q_events_error_click_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors paired with same-user clicks within ±1 hour — the bounded
    range join. Spark side blocks by delta-buckets (equi-join + band
    filter, fan-out bounded by local density); the oracle is DuckDB's
    plain inequality join — independent formulations."""
    from dblink_spark.operators.rangejoin import band_join

    e = load_events_us(spark, sf_dir)
    err = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts_us")
    clk = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_us")
    return band_join(
        err, clk, on="ts_us", by="user_id", delta=3_600_000_000
    ).select("l_event_id", "l_user_id", "l_ts_us", "r_event_id", "r_ts_us")


@register(
    "q_events_sessionize",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
), seq AS (
  SELECT user_id, ts_us,
    LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
  FROM ev
), flagged AS (
  SELECT user_id, ts_us,
    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM seq
), sessions AS (
  SELECT user_id, ts_us,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
  CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
FROM sessions GROUP BY user_id, session_id
""",
    survey_ref="beyond-reference: sessionization (streaming-shaped batch op)",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum.
    The streaming twin lives in dblink_spark.streaming."""
    e = load_events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = e.withColumn("prev_us", F.lag("ts_us").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wrun))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("duration_us"),
    ).withColumn("session_id", F.col("session_id").cast("bigint"))


@register(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority AS orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
""",
    survey_ref="beyond-reference: left-semi join (EXISTS decorrelation)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery as a left-semi join. The semi join
    needs no dedup of the probe side (semantics built into the join type)
    and shuffles only the join key column of lineitem after pushdown."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
""",
    survey_ref="beyond-reference: outer join + two-level aggregation (TPC-H Q13)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving customers with zero orders, then a
    distribution-of-counts second aggregate. The outer join's extra
    predicate lives in the join condition (not a post-filter), which is
    semantically different and exercises conditional outer-join planning."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
SELECT
  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
    THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END) AS DOUBLE) AS promo_rev,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_rev,
  100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
    THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
    survey_ref="beyond-reference: conditional aggregation over broadcast join (TPC-H Q14)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: conditional (CASE) aggregate over a
    lineitem-part join. The month filter pushes into the lineitem scan so
    the join probes ~1/72 of it. part scales with SF (no forced broadcast);
    AQE broadcasts it while it fits and falls back to a shuffle join when
    it doesn't."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    agg = (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc_price())).cast("double").alias("promo_rev"),
            F.sum(disc_price()).cast("double").alias("total_rev"),
        )
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_revenue"),
    )


@register(
    "q16_idle_parts",
    oracle="""
SELECT p.p_brand AS brand, COUNT(*) AS idle_parts
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00')
GROUP BY p.p_brand
""",
    survey_ref="beyond-reference: left-anti join (NOT EXISTS decorrelation)",
)
def q16_idle_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts with no shipments in Jan 1996, counted by brand — NOT EXISTS
    as a left-anti join. The date filter pushes into the lineitem scan;
    only the join-key column survives to the anti join."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    ).select("l_partkey")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_anti")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("idle_parts"))
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c.c_name AS name, o.o_orderkey AS orderkey, o.o_orderdate AS orderdate,
  o.o_totalprice AS totalprice, b.total_qty
FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
    survey_ref="beyond-reference: aggregate-then-filter (HAVING) + join back (TPC-H Q18)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 250, joined back to order and
    customer detail. The HAVING survivor set is a fixed FRACTION (~p99 cut)
    of orders, i.e. it still grows linearly with SF — so no forced
    broadcast: AQE sees the post-aggregate size at runtime and broadcasts
    only while it actually fits."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


@register(
    "q19_brand_band_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50 AND l.l_quantity BETWEEN 20 AND 30)
""",
    survey_ref="beyond-reference: disjunctive predicate pushdown (TPC-H Q19)",
)
def q19_brand_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive bands across both join sides. Catalyst
    factors the single-side conjuncts out of the OR (p_brand IN (...),
    l_quantity range) and pushes them below the join; the residual mixed
    predicate evaluates post-join in codegen."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(F.sum(disc_price()).cast("double").alias("revenue"))


@register(
    "q_events_type_pivot",
    oracle="""
SELECT user_id,
  COUNT(*) FILTER (event_type = 'click') AS click,
  COUNT(*) FILTER (event_type = 'error') AS error,
  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (event_type = 'signup') AS signup,
  COUNT(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
""",
    survey_ref="beyond-reference: pivot (wide conditional aggregation)",
)
def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts as a wide table — Spark's native pivot
    with an explicit value list (no extra distinct-values job; one shuffle
    on user_id, conditional counts fused in codegen)."""
    e = load_events_us(spark, sf_dir)
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves missing combinations null; the oracle's FILTER counts give 0
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("bigint").alias(k) for k in kinds]
    )


@register(
    "q_customer_setops",
    oracle="""
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
urgent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT 'building_and_urgent' AS cohort, COUNT(*) AS n FROM (
  SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM urgent)
UNION ALL
SELECT 'building_not_urgent' AS cohort, COUNT(*) AS n FROM (
  SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM urgent)
""",
    survey_ref="beyond-reference: set operations (INTERSECT / EXCEPT / UNION ALL)",
)
def q_customer_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort algebra over key sets: INTERSECT and EXCEPT (each planned as
    an aggregate + semi/anti join under AQE) unioned into one summary."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(urgent).agg(F.count("*").alias("n")).select(
        F.lit("building_and_urgent").alias("cohort"), "n"
    )
    only = building.exceptAll(urgent.select("c_custkey")).agg(
        F.count("*").alias("n")
    ).select(F.lit("building_not_urgent").alias("cohort"), "n")
    return both.unionAll(only)


@register(
    "q_events_bucket_rollup",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us FROM events
)
SELECT CAST(ts_us // 3600000000 AS BIGINT) AS hour_bucket, event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM ev GROUP BY 1, 2
""",
    survey_ref="beyond-reference: hypertable-style time-bucket rollup",
)
def q_events_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly continuous-aggregate shape: bucket the time axis with integer
    division, roll up count / distinct users / value per (bucket, type).
    One shuffle; count-distinct is planned as a partial two-phase expand.
    The streaming twin is the watermarked windowed count in
    dblink_spark.streaming.events."""
    e = load_events_us(spark, sf_dir)
    return (
        e.withColumn("hour_bucket", F.expr("CAST(ts_us DIV 3600000000 AS BIGINT)"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


@register(
    "q_events_type_stats_salted",
    oracle="""
WITH ev AS (
  SELECT event_type, value, epoch_ns(ts) // 1000 AS ts_us FROM events
)
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
  MIN(ts_us) AS first_us,
  MAX(ts_us) AS last_us
FROM ev GROUP BY event_type
""",
    survey_ref="beyond-reference: skew-mitigation salted two-stage aggregation",
)
def q_events_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event stats computed via the SALTED two-stage aggregation
    (operators/skew.py): event_type is a genuinely hot key (a handful of
    values over the whole table), the exact shape that serializes a plain
    groupBy's reducers at scale. The oracle is the plain GROUP BY — the
    salted plan must be row-identical (decomposable aggs, DECIMAL sums)."""
    from dblink_spark.operators.skew import salted_aggregate

    e = load_events_us(spark, sf_dir)
    return salted_aggregate(
        e,
        keys=["event_type"],
        exprs={
            "n_events": ("count", F.lit(1)),
            "total_value": ("sum", F.col("value").cast("decimal(18,4)")),
            "first_us": ("min", F.col("ts_us")),
            "last_us": ("max", F.col("ts_us")),
        },
        n_salts=16,
        salt_col="event_id",
    ).withColumn("total_value", F.col("total_value").cast("double"))

# --- r11: sequential conversion funnel ------------------------------------
#
# The classic product-analytics shape on the events table: how many users
# progress signup -> view -> click -> purchase IN ORDER (each stage's
# timestamp at or after the previous stage's). The Spark side computes the
# whole funnel in ONE exchange: four chained per-user WINDOW minima over
# the same user partitioning (NULL cascades: missing a stage nulls every
# later stage). r12 (VERDICT r11 task 4): windows, NOT collect_list — a
# window buffers partition rows in a SPILLABLE array (disk-backed past
# spark.sql.windowExec.buffer.in.memory.threshold), so a 100M-event bot user
# costs disk, never one unbounded in-memory aggregation buffer. The
# oracle reaches the same RESULT through four chained stage CTEs —
# formulation-independent because stage_k's time is
# MIN(ts of type_k >= t_{k-1}) either way.
_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


@register(
    "q_events_funnel",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
),
s1 AS (
  SELECT user_id, MIN(ts_us) AS t FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts_us) AS t FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts_us >= s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts_us) AS t FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us >= s2.t GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(e.ts_us) AS t FROM ev e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us >= s3.t GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS stage_idx, 'signup' AS stage, COUNT(*) AS n FROM s1
  UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
  UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
  UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4
)
SELECT stage_idx, stage, CAST(n AS BIGINT) AS n_users,
  CAST(CASE WHEN stage_idx = 1 THEN 1000
       WHEN LAG(n) OVER (ORDER BY stage_idx) > 0
       THEN (1000 * n) // LAG(n) OVER (ORDER BY stage_idx)
       ELSE 0 END AS BIGINT) AS conv_milli
FROM counts
""",
    survey_ref=(
        "beyond-reference: sequential conversion funnel — per-user "
        "chained stage times in one exchange + row-local folds; exact "
        "integer milli conversion rates"
    ),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel over the event stream: a user reaches stage k
    iff an event of stage k's type occurs AT OR AFTER their stage-(k-1)
    time (chained minima — re-orderings don't count, which is what
    separates a funnel from four independent existence checks). Emits one
    row per stage with the user count and the exact integer milli
    conversion rate from the previous stage.

    100-TB shape: ONE exchange — the events repartition by user_id once,
    and all four stage times are chained unbounded-frame window minima
    over that SAME partitioning (each stage's predicate reads the
    previous stage's column; NULL cascades kill later stages for free);
    the per-user dedup and the stage counts reuse the partitioning
    (zero further exchanges), and the 4-row report is built by exploding
    a literal array — no second pass over events, no join. Per-user
    state is the window's SPILLABLE row buffer (disk-backed past
    `spark.sql.windowExec.buffer.in.memory.threshold`) — a 100M-event bot
    user spills instead of building one 100M-struct in-memory
    aggregation buffer, which is what the r11 collect_list formulation
    risked (VERDICT r11 task 4; the spill path is pinned by a 10⁵-event
    single-user fixture in tests/test_query_edge_corpora.py). The
    oracle's 4-CTE formulation replays the identical result through
    stage semi-joins."""
    e = load_events_us(spark, sf_dir)
    w = Window.partitionBy("user_id")
    d = e.select("user_id", "ts_us", "event_type")
    prev = None
    for i, stage in enumerate(_FUNNEL_STAGES):
        hit = F.col("event_type") == stage
        if prev is not None:
            hit = hit & (F.col("ts_us") >= F.col(prev))
        d = d.withColumn(
            f"t{i+1}", F.min(F.when(hit, F.col("ts_us"))).over(w)
        )
        prev = f"t{i+1}"
    per_user = d.groupBy("user_id").agg(
        *[F.first(f"t{i+1}").alias(f"t{i+1}") for i in range(4)]
    )
    one = per_user.agg(
        *[F.count(f"t{i+1}").alias(f"n{i+1}") for i in range(4)]
    ).limit(1)
    conv = [F.lit(1000).cast("bigint")]
    for i in range(1, 4):
        conv.append(
            F.when(
                F.col(f"n{i}") > 0,
                F.expr(f"(1000 * n{i+1}) DIV n{i}"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
        )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"n{i+1}").cast("bigint").alias("n_users"),
                conv[i].alias("conv_milli"),
            )
            for i, stage in enumerate(_FUNNEL_STAGES)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.stage_idx", "r.stage", "r.n_users", "r.conv_milli"
    )



# --- r11: correlated-subquery SQL shapes -----------------------------------
#
# The four classic TPC-H decision-support shapes the inventory still lacked:
# a scalar MAX over an aggregated view (Q15), a correlated per-group average
# threshold (Q17), multi-correlated EXISTS + NOT EXISTS on the same fact
# table (Q21), and a whole-table scalar threshold feeding an anti join
# (Q22). Each is expressed as the DECORRELATED DataFrame plan a 100-TB run
# needs (per-key aggregate + join-back; 1-row broadcast thresholds), while
# the oracle keeps the textbook correlated-subquery formulation — the gate
# proves the decorrelation is semantics-preserving.


@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name,
       CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
    survey_ref="beyond-reference: scalar MAX over an aggregated view (TPC-H Q15)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — a scalar subquery over an aggregated view. Revenue stays
    DECIMAL end-to-end so the equality against the max is EXACT in both
    engines (a double round-trip could split a genuine tie); ties emit
    every maximal supplier, deterministically.

    100-TB shape: the per-supplier aggregate is one partial-aggregating
    exchange over the date-pruned scan, PERSISTED so the fact table is
    scanned exactly once — the MAX consumer and the winner filter both
    read the supplier-cardinality cache (2 narrow columns), not lineitem.
    The MAX collapses it to a 1-row frame (``.limit(1)`` documents the
    fixed cardinality) broadcast back as a nested-loop filter, so the
    aggregate is never sorted and never crosses a second exchange. The
    supplier dim joins AFTER the max filter — only the winning row(s)
    reach it."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum(disc_price()).alias("total_rev")
    ).persist()
    max_rev = F.broadcast(rev.agg(F.max("total_rev").alias("max_rev")).limit(1))
    winners = rev.join(max_rev, rev.total_rev == max_rev.max_rev, "inner")
    s = load(spark, sf_dir, "supplier")
    out = winners.join(s, winners.l_suppkey == s.s_suppkey).select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("name"),
        F.col("total_rev").cast("double").alias("total_revenue"),
    )
    return owns_caches(out, rev)  # caller releases after materializing


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND 5 * CAST(l.l_quantity AS BIGINT)
        * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      < (SELECT SUM(CAST(l3.l_quantity AS BIGINT)) FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)
""",
    survey_ref="beyond-reference: correlated per-group average threshold (TPC-H Q17)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems of one
    brand whose quantity is below 20% of that part's average quantity.
    The correlated AVG threshold is evaluated in EXACT integer arithmetic
    (quantities are integral): ``qty < 0.2 * sum/cnt`` becomes
    ``5*qty*cnt < sum`` — no division, no float, so the strict-inequality
    boundary (a part whose average is exactly 5x a line's quantity) cannot
    flip between engines. The oracle keeps the textbook correlated form;
    this plan is its decorrelation.

    100-TB shape: the brand filter broadcast-semi-joins the scan FIRST, so
    the per-part (count, sum) aggregate runs over only the brand's
    lineitems — the correlation key (l_partkey) is a subset of the brand's
    parts, so restricting the aggregate is semantics-preserving and cuts
    the aggregated volume by |brands|. One partial-aggregating exchange on
    l_partkey, join-back on the same key (the exchange is reused), final
    1-row fold."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    l = load(spark, sf_dir, "lineitem").join(
        parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    per_part = l.groupBy("l_partkey").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )
    probe = l.select("l_partkey", "l_quantity", "l_extendedprice").withColumnRenamed(
        "l_partkey", "pk"
    )
    small = probe.join(per_part, probe.pk == per_part.l_partkey).filter(
        F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt")
        < F.col("sum_qty")
    )
    return small.agg(
        (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q21_blamed_supplier",
    oracle="""
SELECT s.s_name AS name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
""",
    survey_ref=(
        "beyond-reference: multi-correlated EXISTS + NOT EXISTS on one fact "
        "table (TPC-H Q21)"
    ),
)
def q21_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a flagged line on
    a finished multi-supplier order — the returned-line supplier where at
    least one OTHER supplier shipped on the same order (EXISTS) and no
    other supplier's line was flagged (NOT EXISTS). Both subqueries
    correlate on the order key AND an inequality on the supplier key, the
    textbook shape planners decorrelate into semi/anti joins.

    100-TB shape: the flagged slice l1 is returnflag-pruned at the scan;
    the EXISTS becomes a left-semi and the NOT EXISTS a left-anti join,
    both equi-keyed on l_orderkey with the supplier inequality as a
    residual — all three lineitem passes co-partition on l_orderkey so
    AQE reuses one exchange layout, and only (orderkey, suppkey) pairs
    ever shuffle (never price/comment-width rows). The orders join is
    equi-keyed on the same orderkey; the supplier dim join happens last,
    on the already-aggregated-down slice."""
    li = load(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    cand = l1.join(
        l2,
        (l1.l_orderkey == l2.ok2) & (l1.l_suppkey != l2.sk2),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == l3.ok3) & (F.col("l_suppkey") != l3.sk3),
        "left_anti",
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cand.join(o, cand.l_orderkey == o.o_orderkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_dormant_accounts",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0 AND c_nationkey % 5 = 0
)
SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_nationkey % 5 = 0 AND c.c_acctbal > avg_bal.a
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c.c_nationkey
""",
    survey_ref=(
        "beyond-reference: whole-table scalar threshold + anti join "
        "(TPC-H Q22)"
    ),
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance-above-average customers in a
    nation subset with NO recent order (dormant since 2000-06-01 — the
    fixtures give every customer SOME order, so the classic no-order anti
    join would be vacuously empty; dormancy keeps the identical plan shape
    with a non-trivial result). The threshold is a whole-table scalar
    subquery; the recency check is a correlated NOT EXISTS.

    100-TB shape: the 1-row average (``.limit(1)`` documents fixed
    cardinality) broadcasts back over the nation-pruned customer scan —
    sum/count are exact DECIMAL/BIGINT so the single IEEE division, and
    therefore the > comparison, is bit-identical in both engines. The NOT
    EXISTS is a left-anti equi-join against the date-pruned orders scan
    (only o_custkey shuffles). Final aggregate groups the handful of
    surviving rows by nation."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") % 5 == 0
    )
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("a")
        )
        .limit(1)
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    rich = c.join(avg_bal).filter(F.col("c_acctbal") > F.col("a"))
    dormant = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return dormant.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("numcust"),
        F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
) GROUP BY supp_nation, cust_nation, l_year
""",
    survey_ref=(
        "beyond-reference: bidirectional nation-pair volume, 6-table join "
        "+ year rollup (TPC-H Q7)"
    ),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year, both
    directions kept as separate rows — the pair disjunction
    ((supp=A AND cust=B) OR (supp=B AND cust=A)) can only be evaluated
    after both nation joins, the property that makes Q7 a planner test.

    100-TB shape: the 25-row nation dim broadcasts into supplier and
    customer FIRST, and the name filter prunes each to the two named
    nations — so the big joins (lineitem⋈orders on orderkey,
    ⋈customer on custkey) see only pair-eligible rows; the residual
    disjunction then drops the two same-nation combinations post-join.
    Year extraction is row-local; the final rollup groups ~|2×2×years|
    keys with map-side combine."""
    pair = ["NATION_3", "NATION_7"]
    n = load(spark, sf_dir, "nation")
    n1 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("nk1"),
            F.col("n_name").alias("supp_nation"),
        ).filter(F.col("supp_nation").isin(pair))
    )
    n2 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("nk2"),
            F.col("n_name").alias("cust_nation"),
        ).filter(F.col("cust_nation").isin(pair))
    )
    s = load(spark, sf_dir, "supplier").join(
        n1, F.col("s_nationkey") == F.col("nk1")
    ).select("s_suppkey", "supp_nation")
    c = load(spark, sf_dir, "customer").join(
        n2, F.col("c_nationkey") == F.col("nk2")
    ).select("c_custkey", "cust_nation")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_orders_moving_revenue",
    oracle="""
SELECT o_orderkey AS orderkey, o_custkey AS custkey,
       CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_idx,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
FROM orders
""",
    survey_ref=(
        "beyond-reference: RANGE-frame sliding window (30-day trailing "
        "revenue per customer) — value-based frames, not row counts"
    ),
)
def q_orders_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day trailing revenue per customer at every order: a RANGE-frame
    window — the frame is defined by the DAY VALUE (day_idx-29 .. day_idx),
    not a row count, so sparse customers and same-day peer orders (every
    peer's amount counts in every peer's frame) behave correctly; a ROWS
    frame would get both wrong. Sums stay DECIMAL inside the window and
    cast to double once.

    100-TB shape: exactly one exchange (hash on o_custkey) + an in-partition
    sort on the integer day index — the minimum any per-key ordered window
    pays; no join, no second pass, and the frame bound is an integer
    comparison evaluated inside codegen. Day index = exact integer
    datediff from the epoch (no timezone arithmetic, identical in both
    engines)."""
    o = load(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("int")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_idx")
        .rangeBetween(-29, Window.currentRow)
    )
    return (
        o.withColumn("day_idx", day)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            "day_idx",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("trailing_30d"),
        )
    )


@register(
    "q_events_retention",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id,
         (epoch_ns(ts) // 1000) // 86400000000 AS day FROM events
),
fst AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
),
cells AS (
  SELECT f.cohort_day, ud.day - f.cohort_day AS offset_day,
         COUNT(*) AS n_users
  FROM ud JOIN fst f USING (user_id)
  GROUP BY 1, 2
)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
       CAST(offset_day AS BIGINT) AS offset_day,
       CAST(n_users AS BIGINT) AS n_users,
       CAST((1000 * n_users) // MAX(CASE WHEN offset_day = 0 THEN n_users END)
            OVER (PARTITION BY cohort_day) AS BIGINT) AS retention_milli
FROM cells
""",
    survey_ref=(
        "beyond-reference: cohort retention matrix — first-touch cohorts, "
        "day offsets, exact integer milli retention"
    ),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over the event stream: users are cohorted by their
    FIRST active day, and cell (c, k) counts users of cohort c active
    again k days later — the product-analytics companion to the funnel.
    Retention rates are exact integer millis against the cohort's own
    day-0 size (every cohort has an offset-0 cell by construction, so the
    window max never NULLs).

    100-TB shape: ONE corpus-sized exchange — per-user day sets collapse
    under groupBy(user_id) (collect_set partial-aggregates map-side), the
    cohort day is a row-local array_min, and the (cohort, offset) cells
    explode from the per-user array into a map-side-combining aggregate
    whose key domain is ~|days|² — tiny. The retention window then runs
    over that tiny cell relation, never over events. Per-user state is
    the distinct-day set: bounded by the calendar, not by event volume."""
    e = load_events_us(spark, sf_dir)
    per_user = (
        e.withColumn("day", F.expr("ts_us DIV 86400000000"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
        .select(
            F.array_min("days").alias("cohort_day"),
            F.explode("days").alias("day"),
        )
    )
    cells = (
        per_user.select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_day")
        )
        .groupBy("cohort_day", "offset_day")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )
    w = Window.partitionBy("cohort_day")
    base = F.max(
        F.when(F.col("offset_day") == 0, F.col("n_users"))
    ).over(w)
    return cells.select(
        F.col("cohort_day").cast("bigint").alias("cohort_day"),
        F.col("offset_day").cast("bigint").alias("offset_day"),
        "n_users",
        base.alias("base_n"),
    ).select(
        "cohort_day",
        "offset_day",
        "n_users",
        # exact integer division (no float quotient anywhere), mirroring
        # the oracle's `//` — a double round-trip could disagree with
        # exact floor past ~2^40 cohort sizes
        F.expr("(1000 * n_users) DIV base_n").cast("bigint").alias(
            "retention_milli"
        ),
    )


# ONE dense-hourly spec shared by the gap-fill report and the anomaly
# monitor (both oracles extend this CTE; the Spark twin is
# `_dense_hourly`) — the two consumers cannot disagree on what "dense"
# means: every (observed type, spine hour) cell exists, zero-filled.
_DENSE_HOURLY_CTE = """ev AS (
  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS hr,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
agg AS (
  SELECT event_type, hr, COUNT(*) AS n, SUM(v) AS sv FROM ev GROUP BY 1, 2
),
bounds AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM agg),
spine AS (SELECT UNNEST(generate_series(h0, h1)) AS hr FROM bounds),
types AS (SELECT DISTINCT event_type FROM agg),
dense AS (
  SELECT t.event_type, CAST(s.hr AS BIGINT) AS hr,
         CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
         COALESCE(a.sv, 0) AS sv
  FROM spine s CROSS JOIN types t
  LEFT JOIN agg a ON a.event_type = t.event_type AND a.hr = s.hr
)"""


def _dense_hourly(spark: SparkSession, sf_dir: str):
    """Spark twin of `_DENSE_HOURLY_CTE`: the zero-filled
    (event_type, hr, n, sv) relation plus the persisted rollup it derives
    from (caller attaches via `owns_caches`). Events scan ONCE; the spine
    bounds, type list and zero-fill join all read the cache."""
    e = load_events_us(spark, sf_dir)
    ev = e.select(
        "event_type",
        F.expr("ts_us DIV 3600000000").alias("hr"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    agg = (
        ev.groupBy("event_type", "hr")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .persist()
    )
    spine = (
        agg.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .limit(1)
        .select(F.explode(F.sequence("h0", "h1")).alias("hr"))
    )
    types = agg.select("event_type").distinct()
    dense = (
        spine.crossJoin(types)
        .join(agg, ["event_type", "hr"], "left")
        .select(
            "event_type",
            F.col("hr").cast("bigint").alias("hr"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.coalesce(F.col("sv"), F.lit(0).cast("decimal(18,6)")).alias("sv"),
        )
    )
    return dense, agg


@register(
    "q_events_gap_fill",
    oracle=f"""
WITH {_DENSE_HOURLY_CTE}
SELECT event_type, hr, n AS n_events, CAST(sv AS DOUBLE) AS total_value
FROM dense
""",
    survey_ref=(
        "beyond-reference: calendar-spine gap filling — generated hourly "
        "sequence x observed types, zero-filled rollup (dense time series "
        "from sparse events)"
    ),
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly time series from sparse events: a generated calendar
    spine (every hour between the corpus' first and last event) crossed
    with the observed event types, left-joined against the hourly rollup
    with explicit zero fill — the gap-filling pass every
    monitoring/forecasting consumer needs, because a missing hour and a
    zero hour are different facts only if the engine says so.

    100-TB shape: events are scanned ONCE and crossed by exactly ONE
    corpus-sized exchange (the map-side-combining (type, hour) rollup);
    the spine bounds, the type list, the sequence-explode, and the
    zero-fill join are all derived from the PERSISTED rollup — a
    |hours|x|types| relation bounded by the calendar and the type
    vocabulary, not by event volume. The sequence generation is
    plan-side (F.sequence + explode), no driver loop, no UDF."""
    dense, agg = _dense_hourly(spark, sf_dir)
    out = dense.select(
        "event_type",
        "hr",
        F.col("n").alias("n_events"),
        F.col("sv").cast("double").alias("total_value"),
    )
    return owns_caches(out, agg)


@register(
    "q_events_hourly_anomaly",
    oracle=f"""
WITH {_DENSE_HOURLY_CTE},
win AS (
  SELECT event_type, hr, n,
    COUNT(*) OVER w AS win_n,
    SUM(CAST(n AS DECIMAL(38,0))) OVER w AS s1,
    SUM(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))) OVER w AS s2
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, hr, n AS n_events,
  CAST(win_n AS BIGINT) AS win_n, CAST(s1 AS BIGINT) AS win_sum,
  (win_n = 24 AND
   (CAST(win_n AS DECIMAL(38,0)) * n - s1)
     * (CAST(win_n AS DECIMAL(38,0)) * n - s1)
   > 9 * (CAST(win_n AS DECIMAL(38,0)) * s2 - s1 * s1)) AS is_anomaly
FROM win
""",
    survey_ref=(
        "beyond-reference: windowed anomaly detection over the DENSE "
        "hourly series — exact integer z-squared test, no sqrt, no float"
    ),
)
def q_events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly monitor: for every (type, hour) of the DENSE
    series, flag hours whose event count deviates more than 3 sigma from
    the trailing 24-hour window — ON THE GAP-FILLED relation, because a
    silent zero hour is precisely the anomaly a sparse rollup would never
    show (the composition is why `q_events_gap_fill` exists). The z² > 9
    test runs in EXACT integer arithmetic through an identical op
    sequence in both engines: (win_n·c − S1)² > 9·(win_n·S2 − S1²) — the
    `vector_outlier_filter` discipline, no sqrt, no float, no mean ever
    divided. Moments are DECIMAL(38,0) BEFORE squaring (per-cell counts
    safe to ~1e17; the r10 cast-order lesson), and only FULL 24-hour
    windows flag — a half-window at series start has no calibrated
    variance, so is_anomaly is defined false there (win_n rides along
    for consumers that want their own rule).

    100-TB shape: everything after the ONE corpus-sized rollup exchange
    (shared with the gap fill via `_dense_hourly` — one spec, one scan,
    persisted) runs over the calendar-bounded dense relation: the
    trailing window is one partitionBy(type) exchange over
    |hours|×|types| rows."""
    dense, agg = _dense_hourly(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-23, Window.currentRow)
    )
    nd = F.col("n").cast("decimal(38,0)")
    win = dense.select(
        "event_type",
        "hr",
        "n",
        F.count("*").over(w).alias("win_n"),
        F.sum(nd).over(w).alias("s1"),
        F.sum(nd * nd).over(w).alias("s2"),
    )
    wnd = F.col("win_n").cast("decimal(38,0)")
    dev = wnd * F.col("n") - F.col("s1")
    var9 = F.lit(9).cast("decimal(38,0)") * (
        wnd * F.col("s2") - F.col("s1") * F.col("s1")
    )
    out = win.select(
        "event_type",
        "hr",
        F.col("n").alias("n_events"),
        F.col("win_n").cast("bigint").alias("win_n"),
        F.col("s1").cast("bigint").alias("win_sum"),
        ((F.col("win_n") == 24) & (dev * dev > var9)).alias("is_anomaly"),
    )
    return owns_caches(out, agg)


@register(
    "q10_returned_items",
    oracle="""
WITH rev AS (
  SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
         CAST(c.c_acctbal AS DOUBLE) AS acctbal,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS revenue
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_returnflag = 'R'
  GROUP BY 1, 2, 3, 4
)
SELECT custkey, name, nation, CAST(revenue AS DOUBLE) AS revenue, acctbal
FROM rev ORDER BY revenue DESC, custkey ASC LIMIT 20
""",
    survey_ref=(
        "beyond-reference: global top-k without a global sort — "
        "TakeOrderedAndProject (TPC-H Q10)"
    ),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue in
    a quarter — the global-top-k report. Revenue stays DECIMAL through
    the ORDER BY so the cut is exact, and the tie-break (custkey
    ascending) is explicit in BOTH engines — without it, two customers
    tying at rank 20 would make the result set engine-dependent and flip
    the gate hash.

    100-TB shape: ``orderBy(...).limit(k)`` plans as
    TakeOrderedAndProject (plan-pinned) — every task keeps a k-row heap
    and only k rows per partition reach the driver-side merge, so the
    global ranking costs NO sort exchange at all; the date-pruned orders
    scan drives the join order and the nation dim broadcasts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            c.c_custkey.alias("custkey"),
            c.c_name.alias("name"),
            n.n_name.alias("nation"),
            c.c_acctbal.cast("double").alias("acctbal"),
        )
        .agg(F.sum(disc_price()).alias("rev_dec"))
    )
    return (
        rev.orderBy(F.col("rev_dec").desc(), F.col("custkey").asc())
        .limit(20)
        .select(
            "custkey",
            "name",
            "nation",
            F.col("rev_dec").cast("double").alias("revenue"),
            "acctbal",
        )
    )


# --- r11: RFM user segmentation ---------------------------------------------

_RFM_CUT_SQL = (
    "SELECT MIN(CASE WHEN 5*cum >= 1*tot THEN k END) AS t1,"
    " MIN(CASE WHEN 5*cum >= 2*tot THEN k END) AS t2,"
    " MIN(CASE WHEN 5*cum >= 3*tot THEN k END) AS t3,"
    " MIN(CASE WHEN 5*cum >= 4*tot THEN k END) AS t4"
)


@register(
    "q_events_rfm",
    oracle=f"""
WITH ev AS (
  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
per_user AS (
  SELECT user_id,
    CAST((SELECT MAX(day) FROM ev) - MAX(day) AS BIGINT) AS r_key,
    CAST(LEAST(COUNT(*), 99999) AS BIGINT) AS f_key,
    CAST(LEAST(CAST(FLOOR(SUM(v)) AS BIGINT), 99999) AS BIGINT) AS m_key
  FROM ev GROUP BY user_id
),
rh AS (SELECT r_key AS k, COUNT(*) AS c FROM per_user GROUP BY 1),
rc AS (SELECT k, SUM(c) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS cum,
              SUM(c) OVER () AS tot FROM rh),
rt AS ({_RFM_CUT_SQL} FROM rc),
fh AS (SELECT f_key AS k, COUNT(*) AS c FROM per_user GROUP BY 1),
fc AS (SELECT k, SUM(c) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS cum,
              SUM(c) OVER () AS tot FROM fh),
ft AS ({_RFM_CUT_SQL} FROM fc),
mh AS (SELECT m_key AS k, COUNT(*) AS c FROM per_user GROUP BY 1),
mc AS (SELECT k, SUM(c) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS cum,
              SUM(c) OVER () AS tot FROM mh),
mt AS ({_RFM_CUT_SQL} FROM mc)
SELECT u.user_id, u.r_key, u.f_key, u.m_key,
  CAST(6 - (1 + (u.r_key > rt.t1)::INT + (u.r_key > rt.t2)::INT
              + (u.r_key > rt.t3)::INT + (u.r_key > rt.t4)::INT)
       AS INTEGER) AS r_score,
  CAST(1 + (u.f_key > ft.t1)::INT + (u.f_key > ft.t2)::INT
         + (u.f_key > ft.t3)::INT + (u.f_key > ft.t4)::INT
       AS INTEGER) AS f_score,
  CAST(1 + (u.m_key > mt.t1)::INT + (u.m_key > mt.t2)::INT
         + (u.m_key > mt.t3)::INT + (u.m_key > mt.t4)::INT
       AS INTEGER) AS m_score
FROM per_user u, rt, ft, mt
""",
    survey_ref=(
        "beyond-reference: RFM user segmentation — three quintile codings "
        "via histogram CDFs, exact integer keys, no corpus sort"
    ),
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic user-value coding: every user gets
    quintile scores for Recency (days since last event — LOWER is
    better, so the ascending quintile index inverts), Frequency (event
    count) and Monetary (exact DECIMAL value sum, floored to integer
    units), each 1..5. The quintile cuts follow the histogram-CDF
    discipline on EXACT integer keys (frequency and monetary capped at
    99999 so the histogram domain stays bounded — the cap is inert on
    any plausible per-user activity and documented here), with the pure
    integer rule t_j = min key with 5·cum ≥ j·tot — no division, no
    percentile function, no corpus sort; ties are bucket-granular, so
    two users with identical behavior always share a score.

    100-TB shape: ONE corpus-sized exchange (the per-user aggregate,
    map-side combining); the reference day, all three histograms, their
    single-partition CDF windows and the three 1-row threshold frames
    (``.limit(1)`` documents the cardinality) all derive from the
    PERSISTED user-cardinality relation; scoring is a narrow pass over
    broadcast thresholds."""
    e = load_events_us(spark, sf_dir)
    ev = e.select(
        "user_id",
        F.expr("ts_us DIV 86400000000").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max("day").alias("last_day"),
            F.least(F.count("*"), F.lit(99999)).cast("bigint").alias("f_key"),
            F.least(
                F.floor(F.sum("v")).cast("bigint"), F.lit(99999)
            ).cast("bigint").alias("m_key"),
        )
        .persist()
    )
    ref_day = F.broadcast(
        base.agg(F.max("last_day").alias("max_day")).limit(1)
    )
    per_user = base.crossJoin(ref_day).select(
        "user_id",
        (F.col("max_day") - F.col("last_day")).cast("bigint").alias("r_key"),
        "f_key",
        "m_key",
    )

    def cuts(col):
        h = per_user.groupBy(F.col(col).alias("k")).agg(
            F.count("*").alias("c")
        )
        w_cum = Window.orderBy("k").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.partitionBy()
        c = h.select(
            "k",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("tot"),
        )
        return F.broadcast(
            c.agg(
                *[
                    F.min(
                        F.when(
                            F.col("cum") * 5 >= j * F.col("tot"), F.col("k")
                        )
                    ).alias(f"{col}_t{j}")
                    for j in range(1, 5)
                ]
            ).limit(1)
        )

    scored = (
        per_user.crossJoin(cuts("r_key"))
        .crossJoin(cuts("f_key"))
        .crossJoin(cuts("m_key"))
    )

    def asc_score(col):
        s = F.lit(1)
        for j in range(1, 5):
            s = s + F.when(F.col(col) > F.col(f"{col}_t{j}"), 1).otherwise(0)
        return s

    out = scored.select(
        "user_id",
        "r_key",
        "f_key",
        "m_key",
        (F.lit(6) - asc_score("r_key")).cast("int").alias("r_score"),
        asc_score("f_key").cast("int").alias("f_score"),
        asc_score("m_key").cast("int").alias("m_score"),
    )
    return owns_caches(out, base)


# --- r12: completing the classic TPC-H shape set ---------------------------
#
# The inventory now carries all 22 classic decision-support shapes. The
# fixture schema lacks partsupp and lineitem's shipmode/commit/receipt
# columns, so Q2/Q9/Q11/Q12/Q20 are ADAPTED: the published query SHAPE
# (correlated min-per-group, multi-dim market share, profit rollup,
# scalar-fraction HAVING, CASE-sum bands, nested half-of-total semi-join)
# is preserved exactly, with the missing relation replaced by the
# equivalent derivation from lineitem (unit price observed on lines stands
# in for ps_supplycost, shipped volume for ps_availqty, ship-vs-order
# lateness for commit-vs-receipt lateness). Every adaptation is spelled
# out in the docstring; the arithmetic is exact-integer throughout (the
# repo's DECIMAL/DIV discipline) so the oracle gates are bit-exact.

#: exact unit price in milli-currency: 1000 * cents / qty, all integer —
#: cents from DECIMAL(18,2)*100 (exact), qty integral by construction
_UNIT_MILLI_SQL = (
    "(1000 * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
    " // CAST(l_quantity AS BIGINT)"
)


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH eu_supp AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
offer AS (
  SELECT l.l_partkey AS pk, l.l_suppkey AS sk,
    MIN((1000 * CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        // CAST(l.l_quantity AS BIGINT)) AS unit_milli
  FROM lineitem l JOIN eu_supp es ON es.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
)
SELECT p.p_partkey AS partkey, es.s_name AS supplier, es.n_name AS nation,
  CAST(es.s_acctbal AS DOUBLE) AS s_acctbal,
  CAST(o.unit_milli AS BIGINT) AS unit_milli
FROM offer o
JOIN part p ON p.p_partkey = o.pk AND p.p_type = 'STANDARD'
JOIN eu_supp es ON es.s_suppkey = o.sk
WHERE o.unit_milli = (
  SELECT MIN(o2.unit_milli) FROM offer o2 WHERE o2.pk = o.pk
)
""",
    survey_ref=(
        "beyond-reference: correlated min-per-group supplier selection "
        "(TPC-H Q2 shape; supply cost adapted to observed lineitem unit "
        "price — the fixtures carry no partsupp)"
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every STANDARD part sourced from a EUROPE
    supplier, the supplier(s) offering the REGION'S minimum unit price —
    the correlated-min-subquery classic. Adaptation (no partsupp
    fixture): an 'offer' is the minimum observed unit price on that
    (part, supplier)'s lineitems, in exact milli-currency integers
    (1000·cents DIV qty — no division of doubles anywhere, so the
    min-equality correlation cannot flip between engines). Ties keep ALL
    minimum-price suppliers, exactly like the published query before its
    LIMIT (the global top-k physical shape is pinned separately by
    q10's TakeOrderedAndProject).

    100-TB shape: region→nation→supplier prunes via two broadcast joins
    BEFORE lineitem is touched, so the offer aggregate runs over the
    region's lines only; the correlated min decorrelates into a window
    min over the Δ-sized offer relation (partitioned by part — no
    self-join, no second aggregate over lines); the part-type filter
    joins on the offer relation, not the corpus. The oracle keeps the
    textbook correlated subquery."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = F.broadcast(
        n.join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        ).select("n_nationkey", "n_name")
    )
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(eu_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    unit = F.expr(_UNIT_MILLI_SQL.replace("//", "DIV"))
    offer = (
        l.join(
            eu_supp.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("unit_milli"))
    )
    w = Window.partitionBy("l_partkey")
    best = offer.withColumn("best", F.min("unit_milli").over(w)).filter(
        F.col("unit_milli") == F.col("best")
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    return (
        best.join(p, best["l_partkey"] == p["p_partkey"])
        .join(eu_supp, best["l_suppkey"] == eu_supp["s_suppkey"])
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("unit_milli").cast("bigint").alias("unit_milli"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
WITH market AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
    ns.n_name AS supp_nation,
    CAST(l.l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
      AS volume
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
),
by_year AS (
  SELECT o_year,
    CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
             ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT)
      AS nat_e4,
    CAST(SUM(volume) * 10000 AS BIGINT) AS tot_e4
  FROM market GROUP BY o_year
)
SELECT o_year, CAST((1000 * nat_e4) // tot_e4 AS BIGINT) AS mkt_share_milli,
  CAST(CAST(nat_e4 AS DOUBLE) / 10000 AS DOUBLE) AS nation_volume,
  CAST(CAST(tot_e4 AS DOUBLE) / 10000 AS DOUBLE) AS total_volume
FROM by_year
""",
    survey_ref=(
        "beyond-reference: national market share within a region's "
        "market by year, 8-relation star join (TPC-H Q8)"
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of the ASIA market for ECONOMY
    parts, by order year — the widest classic star join (lineitem at the
    center; part, orders→customer→nation→region on the demand side,
    supplier→nation on the supply side). The share is an exact integer
    milli-rate: discounted volumes sum as DECIMAL, scale to integral
    ten-thousandths (BIGINT, exact), and divide with integer DIV — the
    0/total and tie boundaries cannot flip between engines; the raw
    volumes ride along as DOUBLE casts of the same exact sums.

    100-TB shape: part/nation/region prune via broadcast joins into the
    lineitem scan FIRST (ECONOMY cuts the fact ~6x before any shuffle
    join); the two big joins (orders on orderkey, customer on custkey)
    run on the pruned fact; supplier-nation names broadcast. One
    conditional aggregate produces numerator and denominator in the SAME
    pass — the share needs no self-join and no second scan — and the
    rollup is |years| rows under map-side combine."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cnk"))
    )
    supp_nation = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("snk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(asia_nations, F.col("c_nationkey") == F.col("cnk"), "left_semi")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    fact = (
        # part scales with SF — no broadcast hint (AQE decides at runtime;
        # TestBroadcastHintDiscipline pins the rule)
        l.join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_nation, F.col("s_nationkey") == F.col("snk"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    vol = disc_price()
    by_year = (
        fact.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol)
                    .otherwise(zero)
                )
                * 10000
            ).cast("bigint").alias("nat_e4"),
            (F.sum(vol) * 10000).cast("bigint").alias("tot_e4"),
        )
    )
    return by_year.select(
        "o_year",
        F.expr("(1000 * nat_e4) DIV tot_e4").cast("bigint").alias(
            "mkt_share_milli"
        ),
        (F.col("nat_e4").cast("double") / F.lit(10000)).cast("double").alias(
            "nation_volume"
        ),
        (F.col("tot_e4").cast("double") / F.lit(10000)).cast("double").alias(
            "total_volume"
        ),
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
  CAST(SUM(
    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
      * 10000 AS BIGINT)
    - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
      * CAST(l.l_quantity AS BIGINT) * 10000 AS BIGINT)
  ) AS BIGINT) AS profit_e4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""",
    survey_ref=(
        "beyond-reference: product-line profit by supplier nation and "
        "year (TPC-H Q9 shape; supply cost adapted to p_retailprice x "
        "quantity — the fixtures carry no partsupp)"
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on every 'gear' part, rolled up by the
    supplier's nation and the order year. Adaptation (no partsupp
    fixture): supply cost is the part's retail price times quantity —
    same join graph, same LIKE-on-part-name pushdown, same
    profit = revenue − cost arithmetic. Profit sums in exact integral
    ten-thousandths (every term scales to BIGINT before the sum, so the
    DECIMAL subtraction can never round differently across engines);
    negative profit rows are real and kept.

    100-TB shape: the name LIKE prunes part BEFORE the fact join
    (semi-join on partkey; the retail price rides a separate inner join
    on the pruned dim); orders joins on orderkey, supplier on suppkey —
    all equi-joins AQE sizes at runtime; the 25-row nation dim
    broadcasts. The rollup is |nations×years| keys, map-side
    combining."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_retailprice")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nn = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
        )
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    rev_e4 = (disc_price() * 10000).cast("bigint")
    cost_e4 = (
        dec("p_retailprice") * F.col("l_quantity").cast("bigint") * 10000
    ).cast("bigint")
    fact = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nn, F.col("s_nationkey") == F.col("nk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        fact.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("nation", "o_year")
        .agg(F.sum(rev_e4 - cost_e4).cast("bigint").alias("profit_e4"))
    )


@register(
    "q11_important_parts",
    oracle="""
WITH am_supp AS (
  SELECT s.s_suppkey
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'AMERICA'
),
val AS (
  SELECT l.l_partkey AS partkey,
    SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      AS value_cents
  FROM lineitem l JOIN am_supp a ON a.s_suppkey = l.l_suppkey
  GROUP BY 1
)
SELECT partkey, CAST(value_cents AS BIGINT) AS value_cents
FROM val
WHERE 1500 * value_cents > (SELECT SUM(value_cents) FROM val)
""",
    survey_ref=(
        "beyond-reference: scalar-fraction HAVING over a grouped "
        "aggregate (TPC-H Q11 shape; stock value adapted to shipped "
        "lineitem value — the fixtures carry no partsupp)"
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value (from one region's suppliers)
    exceeds a FIXED FRACTION of the region's total — the
    scalar-subquery-threshold classic. Adaptation (no partsupp fixture):
    a part's value is the cent-exact sum of extended prices shipped by
    AMERICA suppliers, and 'important' means value > total/1500,
    evaluated as the cross-multiplied integer inequality
    1500·value > total so the fraction never materializes as a float.

    100-TB shape: region→nation→supplier prunes via broadcasts before
    lineitem; ONE partial-aggregating exchange on partkey builds the
    Δ-sized value relation; the scalar total folds from the SAME
    relation (persisted — both the scalar fold and the filter read the
    InMemoryRelation, a second pass over |parts| rows, not over lines)
    and broadcasts back as a 1-row frame — no corpus self-join, no
    second lineitem scan. The oracle keeps the textbook scalar
    subquery."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    am_nations = F.broadcast(
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("nk"))
    )
    am_supp = (
        load(spark, sf_dir, "supplier")
        .join(am_nations, F.col("s_nationkey") == F.col("nk"), "left_semi")
        .select("s_suppkey")
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cents = (dec("l_extendedprice") * 100).cast("bigint")
    val = (
        l.join(am_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents).alias("value_cents"))
        .persist()  # feeds the scalar fold AND the filter — one build
    )
    total = F.broadcast(
        val.agg(F.sum("value_cents").alias("total_cents")).limit(1)
    )
    out = (
        val.crossJoin(total)
        .filter(F.lit(1500) * F.col("value_cents") > F.col("total_cents"))
        .select("partkey", F.col("value_cents").cast("bigint").alias("value_cents"))
    )
    return owns_caches(out, val)


@register(
    "q12_priority_shipping",
    oracle="""
SELECT l.l_linestatus AS linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
""",
    survey_ref=(
        "beyond-reference: CASE-sum priority bands over late shipments "
        "(TPC-H Q12 shape; lateness adapted to ship-vs-order +60d — the "
        "fixtures carry no shipmode/commit/receipt columns)"
    ),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among LATE lineitems, how many belong to
    high-priority orders vs low — the CASE-sum banding classic that
    checks whether slow logistics are hitting the orders that matter.
    Adaptation (no shipmode/commitdate/receiptdate columns): 'late'
    means shipped more than 60 days after the order date, and the group
    key is l_linestatus. Both CASE sums are exact integers.

    100-TB shape: one orderkey equi-join (the lateness predicate needs
    both sides, so it evaluates as a join residual — nothing else
    shuffles); both bands come from ONE conditional aggregate pass over
    the joined fact (never two scans), collapsing to |linestatus| rows
    under map-side combine."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
WITH small_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
),
shipped AS (
  SELECT l.l_partkey AS pk, l.l_suppkey AS sk,
    SUM(CAST(l.l_quantity AS BIGINT)) AS qty
  FROM lineitem l
  JOIN small_parts sp ON sp.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
),
dominant AS (
  SELECT sk, COUNT(*) AS n_dominated
  FROM shipped s
  WHERE 2 * s.qty > (SELECT SUM(s2.qty) FROM shipped s2 WHERE s2.pk = s.pk)
  GROUP BY sk
)
SELECT sup.s_name AS supplier, n.n_name AS nation,
  CAST(d.n_dominated AS BIGINT) AS n_dominated
FROM dominant d
JOIN supplier sup ON sup.s_suppkey = d.sk
JOIN nation n ON n.n_nationkey = sup.s_nationkey
""",
    survey_ref=(
        "beyond-reference: suppliers holding more than half a part's "
        "volume (TPC-H Q20 shape; availqty adapted to shipped quantity "
        "— the fixtures carry no partsupp)"
    ),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: which suppliers DOMINATE a 'small%' part —
    shipped more than HALF of that part's 1996 volume — and how many
    parts each dominates. Adaptation (no partsupp fixture): the
    published query compares ps_availqty against half the shipped
    quantity; here the same more-than-half correlation runs between a
    (part, supplier)'s shipped quantity and the part's total, as the
    exact integer inequality 2·qty > total (the half never materializes
    as a float, so an exactly-half supplier is excluded identically on
    both engines). The nested-subquery chain (name-filtered parts →
    per-pair quantities → correlated per-part total → supplier rollup)
    is the Q20 signature.

    100-TB shape: the name filter semi-joins the fact before its ONE
    partial-aggregating exchange on (partkey, suppkey); the correlated
    total decorrelates into a window sum over the Δ-sized shipped
    relation (partitioned by part — no self-join, no second fact pass);
    the supplier rollup and name joins touch |suppliers| rows; the
    25-row nation dim broadcasts."""
    sp = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        l.join(sp, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    w = Window.partitionBy("pk")
    dominant = (
        shipped.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.lit(2) * F.col("qty") > F.col("part_total"))
        .groupBy("sk")
        .agg(F.count("*").cast("bigint").alias("n_dominated"))
    )
    sup = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nn = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
        )
    )
    return (
        dominant.join(sup, F.col("sk") == F.col("s_suppkey"))
        .join(nn, F.col("s_nationkey") == F.col("nk"))
        .select(
            F.col("s_name").alias("supplier"),
            "nation",
            "n_dominated",
        )
    )


@register(
    "q_events_transition_matrix",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         epoch_ns(ts) // 1000 AS ts_us
  FROM events
),
seq AS (
  SELECT user_id, event_type AS to_type,
    LAG(event_type) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
    ) AS from_type
  FROM ev
),
pairs AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type,
  CAST(n_transitions AS BIGINT) AS n_transitions,
  CAST((1000 * n_transitions)
       // SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)
    AS prob_milli
FROM pairs
""",
    survey_ref=(
        "beyond-reference: user-journey Markov transition matrix — the "
        "behavioral-model substrate funnels approximate; exact integer "
        "milli transition probabilities"
    ),
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-journey transition matrix: for every ordered pair
    of event types, how many times a user's NEXT event followed it, and
    the exact integer milli transition probability (row-normalized over
    the from-type's outgoing total — 1000·n DIV total, so rows of the
    matrix sum to ~1000 with deterministic truncation). Consecutiveness
    is per user, ordered by (ts_us, event_id) — the event-id tie-break
    makes same-microsecond pairs engine-deterministic. The first event
    of every user has no predecessor and feeds nothing.

    100-TB shape: ONE corpus-sized exchange — the LAG window partitions
    by user_id (spillable row buffer, the funnel's bot-user discipline —
    no per-user array ever materializes in an aggregation buffer) and
    the pair rollup partial-aggregates map-side down to a |types|²-key
    relation; the row-normalizing total is a window over THAT tiny
    relation, never a second pass over events. The oracle replays the
    identical LAG/rollup pipeline."""
    e = load_events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.expr(
            "(1000 * n_transitions) DIV "
            "(SUM(n_transitions) OVER (PARTITION BY from_type))"
        ).cast("bigint").alias("prob_milli"),
    )


#: engagement-count cap (the RFM 99999 discipline): bounds the Gini
#: histogram's key domain by the cap, not by user cardinality, so the
#: single-partition CDF window runs over <= 99999 buckets at ANY scale.
_GINI_CAP = 99999

#: per-bucket exact rank-sum contribution x·cnt·(2R+cnt+1)/2 in
#: DECIMAL(38,0) (ADVICE r12: the BIGINT form wraps near 10^19). The /2
#: is exact: cnt and 2R+cnt+1 have opposite parity, so halve whichever
#: is even while still comfortably in BIGINT, then promote to decimal
#: BEFORE the wide multiplies. Module-level so the overflow-regime test
#: pins this exact production expression at 10^9-user magnitudes.
_GINI_RANK_SUM_EXPR = (
    "CAST(x AS DECIMAL(38,0)) * IF(cnt % 2 = 0,"
    " CAST(cnt DIV 2 AS DECIMAL(38,0)) * (2 * r_before + cnt + 1),"
    " CAST(cnt AS DECIMAL(38,0)) * ((2 * r_before + cnt + 1) DIV 2))"
)


@register(
    "q_events_engagement_gini",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, LEAST(COUNT(*), {_GINI_CAP}) AS x
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM per_user
),
s AS (
  SELECT COUNT(*) AS n, SUM(x) AS t, SUM(i * x) AS rs FROM ranked
),
top AS (
  SELECT COALESCE(SUM(r.x), 0) AS s_top
  FROM ranked r, s WHERE r.i > s.n - (s.n // 10)
)
SELECT CAST(s.n AS BIGINT) AS n_users,
  CAST(s.t AS BIGINT) AS total_events,
  CAST((1000 * (2 * s.rs - (s.n + 1) * s.t)) // (s.n * s.t) AS BIGINT)
    AS gini_milli,
  CAST((1000 * top.s_top) // s.t AS BIGINT) AS top_decile_share_milli
FROM s, top
""",
    survey_ref=(
        "beyond-reference: engagement-concentration audit — exact integer "
        "Gini coefficient + top-decile share over per-user event counts; "
        "the skew report a pipeline reads before per-user sampling"
    ),
)
def q_events_engagement_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is the event stream: the exact integer milli Gini
    coefficient of per-user event counts (0 = everyone equal, ->1000 =
    one user is the corpus) plus the share of all events held by the top
    decile of users — the audit that tells a sampling design whether
    per-user caps matter at all. All arithmetic is exact — BIGINT while
    in range, DECIMAL(38,0) for the rank-sum products that pass ~10^19
    (exact up to n_users·cap ~ 10^38): with counts ascending,
    Gini = (2·Σi·x_i − (N+1)·T) / (N·T), rendered in millis with
    integer DIV; the rank sum is TIE-INVARIANT (equal counts
    contribute the same regardless of within-tie order), which is what
    licenses the two formulations below to agree bit-for-bit. Counts cap
    at {cap} (the RFM discipline) so the histogram domain is bounded by
    the cap, not the user base.

    100-TB shape: ONE corpus-sized exchange collapses events to the
    per-user relation; everything after runs on the COUNT HISTOGRAM
    (<= {cap} buckets): a bucket holding cnt users of count x at
    cumulative offset R contributes x·cnt·(2R + cnt + 1) DIV 2 to the
    rank sum (exact — cnt and 2R+cnt+1 have opposite parity), the
    top-decile take is a descending-CDF partial-bucket slice, and both
    CDF windows are single-partition over the histogram ONLY — no
    corpus sort, no rank over users, 1-row output. The oracle keeps the
    textbook per-user ROW_NUMBER formulation; equality IS the
    tie-invariance proof."""
    e = load_events_us(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.least(F.count("*"), F.lit(_GINI_CAP)).alias("x")
    )
    hist = per_user.groupBy("x").agg(F.count("*").alias("cnt"))
    asc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    desc = Window.orderBy(F.col("x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = hist.select(
        "x",
        "cnt",
        F.coalesce(F.sum("cnt").over(asc), F.lit(0)).alias("r_before"),
        F.coalesce(F.sum("cnt").over(desc), F.lit(0)).alias("d_before"),
    )
    # per-bucket exact rank-sum contribution and the (k - d_before)-bounded
    # top-decile take; k depends on N, so fold N/T first from the SAME
    # histogram and broadcast the 1-row frame back
    tot = F.broadcast(
        hist.agg(
            F.sum("cnt").cast("bigint").alias("n_users"),
            F.sum(F.col("x") * F.col("cnt")).cast("bigint").alias(
                "total_events"
            ),
        ).limit(1)
    )
    taken = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.col("cnt").cast("bigint"),
            F.expr("n_users DIV 10") - F.col("d_before"),
        ),
    )
    # The rank-sum contribution x·cnt·(2R+cnt+1)/2 reaches ~10^23 for
    # 10^9 users near the count cap — past BIGINT (ADVICE r12). All
    # wide products run in DECIMAL(38,0): the /2 stays EXACT by halving
    # whichever of cnt / (2R+cnt+1) is even (they have opposite parity)
    # while still in BIGINT range, and every overflow-capable multiply
    # promotes to decimal first. The final DIVs are decimal-safe because
    # their QUOTIENTS are millis (≤1000); exactness now holds for any
    # n_users·cap product under 10^38.
    contrib = b.crossJoin(tot).select(
        "n_users",
        "total_events",
        F.expr(_GINI_RANK_SUM_EXPR).alias("rank_sum"),
        (F.col("x").cast("decimal(38,0)") * taken).alias("top_take"),
    )
    return contrib.groupBy("n_users", "total_events").agg(
        F.expr(
            "CAST((1000 * (2 * SUM(rank_sum)"
            " - (CAST(n_users AS DECIMAL(38,0)) + 1) * total_events))"
            " DIV (CAST(n_users AS DECIMAL(38,0)) * total_events) AS BIGINT)"
        ).alias("gini_milli"),
        F.expr(
            "CAST((1000 * SUM(top_take)) DIV total_events AS BIGINT)"
        ).alias("top_decile_share_milli"),
    )


q_events_engagement_gini.__doc__ = q_events_engagement_gini.__doc__.format(
    cap=_GINI_CAP
)
