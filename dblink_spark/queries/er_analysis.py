"""ER analysis operators (SURVEY §2.2/2.3/2.7/2.8/2.9) expressed over the
fixture tables for the duckdb-oracle gate.

Each query is the same DataFrame shape the ER engine uses in
dblink_spark.er.{analysis,metrics,chain} — exercised here on TPC-H-ish data
so the oracle can verify it. The SQL mirrors the Spark expression order
exactly (IEEE ops on identical inputs are bit-identical; see package
docstring for the decimal discipline on sums).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from dblink_spark.queries import load, register


@register(
    "pair_canonicalize",
    oracle="""
SELECT DISTINCT LEAST(l_partkey, l_suppkey) AS rec1, GREATEST(l_partkey, l_suppkey) AS rec2
FROM lineitem WHERE l_partkey <> l_suppkey
""",
    survey_ref="SURVEY §2.2 P4 (pair canonicalization)",
)
def pair_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """least/greatest + distinct — the canonical-link normalizer
    (ref: analysis/package.scala:15-27)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_partkey") != F.col("l_suppkey"))
        .select(
            F.least("l_partkey", "l_suppkey").alias("rec1"),
            F.greatest("l_partkey", "l_suppkey").alias("rec2"),
        )
        .distinct()
    )


@register(
    "dict_encode",
    oracle="""
WITH dom AS (
  SELECT c_mktsegment AS value, COUNT(*) AS weight FROM customer GROUP BY c_mktsegment
)
SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY value) - 1 AS INT) AS value_id,
  CAST(weight AS DOUBLE) / SUM(weight) OVER () AS prob
FROM dom
""",
    survey_ref="SURVEY §2.2 P2 + §2.3 A2 (dictionary encode / index build)",
)
def dict_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-domain id assignment + empirical distribution — the
    AttributeIndex build (ref: AttributeIndex.scala:106-125)."""
    c = load(spark, sf_dir, "customer")
    dom = c.groupBy(F.col("c_mktsegment").alias("value")).agg(
        F.count("*").alias("weight")
    )
    w = Window.orderBy("value")
    return dom.select(
        "value",
        (F.row_number().over(w) - 1).cast("int").alias("value_id"),
        (F.col("weight").cast("double") / F.sum("weight").over(Window.partitionBy())).alias(
            "prob"
        ),
    )


@register(
    "sim_neighbors_levenshtein",
    oracle="""
WITH dom AS (SELECT DISTINCT n_name AS v FROM nation)
SELECT a.v AS value_a, b.v AS value_b,
  2.0 * (10.0 * (1.0 - (2.0 * levenshtein(a.v, b.v)) / (length(a.v) + length(b.v) + levenshtein(a.v, b.v))) - 5.0) AS sim
FROM dom a CROSS JOIN dom b
WHERE 2.0 * (10.0 * (1.0 - (2.0 * levenshtein(a.v, b.v)) / (length(a.v) + length(b.v) + levenshtein(a.v, b.v))) - 5.0) > 0.0
""",
    survey_ref="SURVEY §2.3 A3 + §2.4 F2/F3 (all-pairs truncated Levenshtein similarity)",
)
def sim_neighbors_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain self-crossJoin + truncated normalized-Levenshtein similarity,
    threshold 5 / max 10 (ref: AttributeIndex.scala:219-231 +
    SimilarityFn.scala:82-106). JVM-side levenshtein, no UDF."""
    n = load(spark, sf_dir, "nation").select(F.col("n_name").alias("v")).distinct()
    a = n.select(F.col("v").alias("value_a"))
    b = n.select(F.col("v").alias("value_b"))
    d = F.levenshtein("value_a", "value_b").cast("double")
    total = (F.length("value_a") + F.length("value_b")).cast("double")
    unit = 1.0 - (2.0 * d) / (total + d)
    sim = 2.0 * (10.0 * unit - 5.0)
    return (
        a.crossJoin(b)
        .withColumn("sim", sim)
        .filter(F.col("sim") > 0.0)
        .select("value_a", "value_b", "sim")
    )


@register(
    "most_common_priority",
    oracle="""
WITH freq AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority, n,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY n DESC, o_orderpriority) AS rn
  FROM freq
)
SELECT custkey, priority, n FROM ranked WHERE rn = 1
""",
    survey_ref="SURVEY §2.7 G1 (mostProbableClusters: freq count + per-key argmax)",
)
def most_common_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The G1 access pattern (ref: LinkageChain.scala:52-64): frequency
    aggregation then windowed argmax with deterministic tie-break."""
    o = load(spark, sf_dir, "orders")
    freq = o.groupBy("o_custkey", "o_orderpriority").agg(F.count("*").alias("n"))
    w = Window.partitionBy("o_custkey").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
            "n",
        )
    )


@register(
    "cluster_size_distribution",
    oracle="""
WITH sizes AS (SELECT o_custkey, COUNT(*) AS cluster_size FROM orders GROUP BY o_custkey)
SELECT cluster_size, COUNT(*) AS n_clusters FROM sizes GROUP BY cluster_size
""",
    survey_ref="SURVEY §2.7 G4 (clusterSizeDistribution)",
)
def cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-of-group-sizes (ref: LinkageChain.scala:137-154)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
    )


@register(
    "membership_to_clusters",
    oracle="""
SELECT s_nationkey AS ent_id,
  md5(string_agg(s_suppkey::VARCHAR, '-' ORDER BY s_suppkey)) AS cluster_hash,
  COUNT(*) AS cluster_size
FROM supplier GROUP BY s_nationkey
""",
    survey_ref="SURVEY §2.7 G6 (membershipToClusters)",
)
def membership_to_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership -> cluster sets (ref: analysis/package.scala:52-63); the
    cluster identity surfaces as an md5 over the sorted member list so the
    oracle compares strings, not arrays."""
    s = load(spark, sf_dir, "supplier")
    members = F.sort_array(F.collect_list("s_suppkey"))
    return s.groupBy(F.col("s_nationkey").alias("ent_id")).agg(
        F.md5(F.array_join(F.transform(members, lambda x: x.cast("string")), "-")).alias(
            "cluster_hash"
        ),
        F.count("*").alias("cluster_size"),
    )


@register(
    "pairwise_links",
    oracle="""
SELECT a.c_custkey AS rec1, b.c_custkey AS rec2, a.c_nationkey AS nationkey
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE a.c_custkey <= 1000 AND b.c_custkey <= 1000
""",
    survey_ref="SURVEY §2.7 G8 (toPairwiseLinks: within-cluster pairs)",
)
def pairwise_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cluster pair expansion as a self-join — distributed, not
    driver-side combinations (ref: analysis/package.scala:70-75). The key cap
    bounds the quadratic blow-up so output size is SF-independent; the filter
    is applied pre-join so it pushes down to the parquet scan on both sides."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    a = c.select(F.col("c_custkey").alias("rec1"), F.col("c_nationkey").alias("nationkey"))
    b = c.select(F.col("c_custkey").alias("rec2"), F.col("c_nationkey").alias("nk2"))
    return (
        a.join(b, (F.col("nationkey") == F.col("nk2")) & (F.col("rec1") < F.col("rec2")))
        .select("rec1", "rec2", "nationkey")
    )


@register(
    "pairwise_metrics",
    oracle="""
WITH nat AS (SELECT n_nationkey, n_regionkey FROM nation),
cust AS (
  SELECT c_custkey, c_nationkey, n_regionkey
  FROM customer JOIN nat ON c_nationkey = n_nationkey
  WHERE c_custkey < 300
),
pred AS (
  SELECT a.c_custkey r1, b.c_custkey r2 FROM cust a JOIN cust b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
),
tru AS (
  SELECT a.c_custkey r1, b.c_custkey r2 FROM cust a JOIN cust b
    ON a.n_regionkey = b.n_regionkey AND a.c_custkey < b.c_custkey
),
j AS (
  SELECT COALESCE(p.r1, t.r1) r1,
         p.r1 IS NOT NULL AS is_pred, t.r1 IS NOT NULL AS is_true
  FROM pred p FULL OUTER JOIN tru t ON p.r1 = t.r1 AND p.r2 = t.r2
),
cm AS (
  SELECT
    SUM(CASE WHEN is_pred AND is_true THEN 1 ELSE 0 END) AS tp,
    SUM(CASE WHEN is_pred AND NOT is_true THEN 1 ELSE 0 END) AS fp,
    SUM(CASE WHEN NOT is_pred AND is_true THEN 1 ELSE 0 END) AS fn
  FROM j
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
  CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
  CAST(tp AS DOUBLE) / (tp + fn) AS recall_,
  2.0 * (CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / (tp + fn))
    / (CAST(tp AS DOUBLE) / (tp + fp) + CAST(tp AS DOUBLE) / (tp + fn)) AS f1
FROM cm
""",
    survey_ref="SURVEY §2.8 J1 + §2.9 E1-E3 (pairwise confusion + P/R/F1)",
)
def pairwise_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of predicted vs true link sets with presence flags,
    reduced to a confusion matrix + P/R/F1 (ref: PairwiseMetrics.scala:44-63,
    BinaryConfusionMatrix.scala:45-70). Predicted = same-nation pairs,
    truth = same-region pairs over a capped customer subset."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    n = load(spark, sf_dir, "nation")
    # persisted: cust feeds both sides of two self-joins (4 consumers) —
    # without it the scan+join re-executes per consumer
    cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_regionkey"
    ).persist()
    a = cust.alias("a")
    b = cust.alias("b")
    pred = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(F.col("a.c_custkey").alias("r1"), F.col("b.c_custkey").alias("r2"))
    tru = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(F.col("a.c_custkey").alias("r1"), F.col("b.c_custkey").alias("r2"))
    j = pred.withColumn("__p", F.lit(True)).join(
        tru.withColumn("__t", F.lit(True)), ["r1", "r2"], "full_outer"
    )
    cm = j.agg(
        F.sum(F.when(F.col("__p") & F.col("__t"), 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(F.col("__p") & F.col("__t").isNull(), 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(F.col("__p").isNull() & F.col("__t"), 1).otherwise(0)).cast("bigint").alias("fn"),
    )
    p = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    r = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    from dblink_spark.queries import owns_caches

    out = cm.select(
        "tp",
        "fp",
        "fn",
        p.alias("precision_"),
        r.alias("recall_"),
        (2.0 * p * r / (p + r)).alias("f1"),
    )
    return owns_caches(out, cust)  # caller releases after materializing


@register(
    "adjusted_rand_index",
    oracle="""
WITH ct AS (
  SELECT c_nationkey AS pred_uid, c_mktsegment AS true_uid, COUNT(*) AS n_common
  FROM customer GROUP BY 1, 2
),
tot AS (SELECT SUM(n_common * (n_common - 1) / 2) AS s, SUM(n_common) AS n FROM ct),
pc AS (SELECT SUM(c * (c - 1) / 2) AS s FROM (SELECT SUM(n_common) AS c FROM ct GROUP BY pred_uid)),
tc AS (SELECT SUM(c * (c - 1) / 2) AS s FROM (SELECT SUM(n_common) AS c FROM ct GROUP BY true_uid))
SELECT
  (CAST(tot.s AS DOUBLE) - CAST(pc.s AS DOUBLE) * CAST(tc.s AS DOUBLE) / (tot.n * (tot.n - 1) / 2))
  / ((CAST(pc.s AS DOUBLE) + CAST(tc.s AS DOUBLE)) / 2.0
     - CAST(pc.s AS DOUBLE) * CAST(tc.s AS DOUBLE) / (tot.n * (tot.n - 1) / 2)) AS ari
FROM tot, pc, tc
""",
    survey_ref="SURVEY §2.8 J2 + §2.9 E4/E5 (contingency table + adjusted Rand index)",
)
def adjusted_rand_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARI between the nation-clustering and segment-clustering of customers
    (ref: ClusteringContingencyTable.scala:56-65 + ClusteringMetrics.scala:42-83)."""
    c = load(spark, sf_dir, "customer")
    ct = c.groupBy(
        F.col("c_nationkey").alias("pred_uid"), F.col("c_mktsegment").alias("true_uid")
    ).agg(F.count("*").alias("n_common"))
    comb2 = lambda x: x * (x - 1) / 2  # noqa: E731
    tot = ct.agg(
        F.sum(comb2(F.col("n_common"))).alias("s"), F.sum("n_common").alias("n")
    ).collect()[0]
    pc = (
        ct.groupBy("pred_uid").agg(F.sum("n_common").alias("c"))
        .agg(F.sum(comb2(F.col("c"))).alias("s")).collect()[0]["s"]
    )
    tc = (
        ct.groupBy("true_uid").agg(F.sum("n_common").alias("c"))
        .agg(F.sum(comb2(F.col("c"))).alias("s")).collect()[0]["s"]
    )
    n = float(tot["n"])
    expected = float(pc) * float(tc) / (n * (n - 1) / 2)
    ari = (float(tot["s"]) - expected) / ((float(pc) + float(tc)) / 2.0 - expected)
    return spark.createDataFrame([(ari,)], "ari double")


@register(
    "near_match_blocking",
    oracle="""
SELECT block_key, COUNT(*) AS n_members FROM (
  SELECT 'nation:' || c_nationkey::VARCHAR AS block_key, c_custkey FROM customer
  UNION ALL
  SELECT 'segment:' || c_mktsegment AS block_key, c_custkey FROM customer
) GROUP BY block_key
""",
    survey_ref="SURVEY §2.7 G10 (nearClusters blocking baseline)",
)
def near_match_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of groupings over attribute subsets — the overlapping-blocks
    baseline (ref: analysis/baselines.scala:40-54)."""
    c = load(spark, sf_dir, "customer")
    nation_blocks = c.select(
        F.concat(F.lit("nation:"), F.col("c_nationkey").cast("string")).alias("block_key"),
        "c_custkey",
    )
    seg_blocks = c.select(
        F.concat(F.lit("segment:"), F.col("c_mktsegment")).alias("block_key"), "c_custkey"
    )
    return (
        nation_blocks.unionByName(seg_blocks)
        .groupBy("block_key")
        .agg(F.count("*").alias("n_members"))
    )
