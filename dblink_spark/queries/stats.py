"""Dataset-statistics operators (SURVEY §2.3 A1: one-pass per-file /
per-attribute stats) expressed over the fixtures, plus distinct counts (G5)
and filter pushdown (P3)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dblink_spark.queries import load, register
from dblink_spark.queries.tpch import load_events_us


@register(
    "dataset_stats",
    oracle="""
SELECT source AS file_id, COUNT(*) AS n_records,
  COUNT(DISTINCT lang) AS n_langs,
  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_text,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents GROUP BY source
""",
    survey_ref="SURVEY §2.3 A1 (one-pass file sizes / value counts / missing counts)",
)
def dataset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RecordsCache statistics pass as a single aggregation
    (ref: RecordsCache.scala:74-106 — three accumulator families, one job)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("source").alias("file_id")).agg(
        F.count("*").alias("n_records"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).cast("bigint").alias("missing_text"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "distinct_counts",
    oracle="""
SELECT COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderstatus) AS n_statuses,
  COUNT(DISTINCT o_orderpriority) AS n_priorities,
  COUNT(*) AS n_orders
FROM orders
""",
    survey_ref="SURVEY §2.7 G5 (distinct iteration count)",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (the G5 shape; at 100 TB swap in
    approx_count_distinct — see operators module)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


@register(
    "iteration_filter",
    oracle="""
WITH ev AS (SELECT event_type, user_id, epoch_ns(ts) // 1000 AS ts_us FROM events)
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM ev WHERE ts_us >= 1704070800000000
GROUP BY event_type
""",
    survey_ref="SURVEY §2.2 P3 (iteration >= cutoff filter)",
)
def iteration_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The savedLinkageChain cutoff filter shape (ref: Project.scala:111-112):
    predicate on a monotone column, pushed into the scan."""
    e = load_events_us(spark, sf_dir)
    return (
        e.filter(F.col("ts_us") >= 1_704_070_800_000_000)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
