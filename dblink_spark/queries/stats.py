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


# Count-min sketch parameters: depth d independent hash rows, width w
# counters each. Hashes are explicit polynomial maps ((a*x + b) mod p mod w,
# p = 2^31 - 1 prime, a/b fixed odd constants) so BOTH engines compute the
# identical sketch with plain integer arithmetic — no engine-native hash
# involved, which is what makes a sketch hash-gateable at all.
#
# Overflow discipline: the item id is FIRST reduced to x = pmod(id, p), so
# x < 2^31 and a < 2^31 give a*x + b < 2^62 — provably inside int64 for ANY
# bigint id (a 2^61-1 modulus would let a*x overflow silently in Spark while
# DuckDB raises, diverging the engines). pmod keeps every intermediate
# non-negative even for negative ids.
_CMS_P = (1 << 31) - 1
_CMS_W = 256
_CMS_ROWS = [(999999937, 31), (774856787, 97), (492876847, 193), (198491317, 389)]


@register(
    "sketch_count_min",
    oracle=f"""
WITH rows_spec(row_idx, a, b) AS (
  VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_ROWS))}
),
cells AS (
  -- ((x % p) + p) % p == Spark pmod(x, p): reduce the id below 2^31 first
  -- so a*x + b stays inside int64 for any bigint id. a is cast to BIGINT
  -- because DuckDB types VALUES literals INT32 and would overflow the
  -- multiply instead of widening.
  SELECT r.row_idx,
    CAST(((CAST(r.a AS BIGINT) * (((e.user_id % {_CMS_P}) + {_CMS_P}) % {_CMS_P}) + r.b) % {_CMS_P}) % {_CMS_W} AS INT) AS col_idx
  FROM events e CROSS JOIN rows_spec r
)
SELECT row_idx, col_idx, COUNT(*) AS cnt
FROM cells GROUP BY row_idx, col_idx
""",
    survey_ref="beyond-reference: count-min sketch (streaming-frequency primitive)",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of the events ``user_id`` frequency distribution:
    d x w counter cells, each item incrementing one counter per hash row.

    Scale shape: building the sketch is ONE partial-aggregated shuffle of
    at most d*w rows (the explode is a d-way row multiply, combined
    map-side), and the sketch itself is a ~4KB table that broadcasts
    anywhere — point-frequency estimates (min over d counters) then never
    touch the raw data again. Deterministic polynomial hashing makes the
    whole sketch hash-gateable against DuckDB."""
    e = load(spark, sf_dir, "events").select("user_id")
    cells = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        F.pmod(
                            F.pmod(
                                F.lit(a) * F.pmod(F.col("user_id"), F.lit(_CMS_P))
                                + F.lit(b),
                                F.lit(_CMS_P),
                            ),
                            F.lit(_CMS_W),
                        )
                        .cast("int")
                        .alias("col_idx"),
                    )
                    for i, (a, b) in enumerate(_CMS_ROWS)
                ]
            )
        ).alias("c")
    ).select("c.row_idx", "c.col_idx")
    return cells.groupBy("row_idx", "col_idx").agg(F.count("*").alias("cnt"))


@register(
    "q_events_value_quantiles",
    oracle="""
SELECT event_type,
  COUNT(*) AS n,
  CAST(quantile_cont(value, 0.5) AS DOUBLE) AS p50,
  CAST(quantile_cont(value, 0.9) AS DOUBLE) AS p90,
  CAST(quantile_cont(value, 0.99) AS DOUBLE) AS p99
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
""",
    survey_ref="beyond-reference: exact quantiles (quality-scoring cutoffs at corpus scale)",
)
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value quantiles (linear interpolation) — the
    distribution-cutoff primitive a quality-filtering pipeline needs (e.g.
    'drop the bottom decile by quality score'). Spark's ``percentile`` is
    the exact interpolating aggregate, matching DuckDB's quantile_cont
    bit-for-bit on the same doubles.

    SCALE CAVEAT: exact percentile buffers every distinct value per group —
    unbounded per-group memory, so a 100-TB hot group blows the aggregation
    buffer. This query is the correctness anchor; the 100-TB default is
    `q_events_value_quantiles_approx` below (bounded sketch memory,
    documented rank-error bound)."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.percentile("value", F.lit(0.5)).cast("double").alias("p50"),
        F.percentile("value", F.lit(0.9)).cast("double").alias("p90"),
        F.percentile("value", F.lit(0.99)).cast("double").alias("p99"),
    )


#: approx_percentile accuracy: guarantees rank error <= n/_APPROX_ACC.
_APPROX_ACC = 10_000


@register(
    "q_events_value_quantiles_approx",
    oracle="""
SELECT event_type, COUNT(*) AS n,
  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM events WHERE value IS NOT NULL GROUP BY event_type
""",
    survey_ref="beyond-reference: approximate quantiles — the bounded-memory 100-TB default",
)
def q_events_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type quantiles via ``approx_percentile`` — the 100-TB default:
    the Greenwald-Khanna sketch holds O(accuracy) state per group however
    many rows the group has, where exact ``percentile`` buffers every value
    (see `q_events_value_quantiles`). Guarantee: the returned element's rank
    is within ``n / accuracy`` of the target rank.

    GATE DESIGN: DuckDB cannot replay Spark's sketch value-for-value, so the
    hash-gated contract is the GUARANTEE itself — the query joins each
    estimate back to the data, brackets its true rank [#(<est)+1, #(<=est)],
    and emits per-quantile booleans 'bracket intersects target +/- 2n/acc';
    the oracle asserts literal TRUE per group. A regression that breaks the
    error bound (or returns a non-element) flips a boolean and fails the
    hash."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    ps = [0.5, 0.9, 0.99]
    est = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.percentile_approx(
            "value", F.array(*[F.lit(p) for p in ps]), F.lit(_APPROX_ACC)
        ).alias("est"),
    )
    # No explicit broadcast hint: `est` is bounded by |event_type| (a grouped
    # aggregate, KBs at any SF) but the repo's hint discipline reserves
    # hints for provably fixed-cardinality dims — AQE sees the tiny
    # post-agg size at runtime and broadcasts it unhinted.
    j = e.join(est, "event_type")
    agg = j.groupBy("event_type").agg(
        F.first("n").alias("n"),
        *[
            agg_col
            for i in range(len(ps))
            for agg_col in (
                F.sum(
                    F.when(F.col("value") < F.col("est").getItem(i), 1).otherwise(0)
                ).alias(f"lt{i}"),
                F.sum(
                    F.when(F.col("value") <= F.col("est").getItem(i), 1).otherwise(0)
                ).alias(f"le{i}"),
            )
        ],
    )
    err = F.lit(2.0) * F.col("n") / _APPROX_ACC + F.lit(1.0)
    out_cols = [F.col("event_type"), F.col("n")]
    for name, i, p in (("p50_ok", 0, 0.5), ("p90_ok", 1, 0.9), ("p99_ok", 2, 0.99)):
        target = F.lit(p) * F.col("n")
        ok = ((F.col(f"lt{i}") + 1) <= target + err) & (F.col(f"le{i}") >= target - err)
        out_cols.append(ok.alias(name))
    return agg.select(*out_cols)


#: approx_count_distinct rsd (relative standard deviation of the HLL++
#: estimate). Tolerance in the gate is 5x this — a deterministic check for
#: fixed input (the sketch hash is fixed), with headroom for any future
#: Spark HLL tweak that stays within its documented accuracy contract.
_HLL_RSD = 0.02


@register(
    "q_events_user_distinct_approx",
    oracle="""
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
  TRUE AS approx_ok
FROM events GROUP BY event_type
""",
    survey_ref="beyond-reference: HLL approximate distinct — the bounded-memory cardinality primitive at 100 TB",
)
def q_events_user_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via ``approx_count_distinct`` (HLL++),
    the 100-TB cardinality primitive: COUNT(DISTINCT) needs a full shuffle
    of the distinct keys per group (state grows with cardinality), while
    the HLL sketch is a fixed few KB per group, merges associatively
    map-side, and answers within rsd relative error.

    GATE DESIGN (same contract-as-data trick as
    `q_events_value_quantiles_approx`): DuckDB cannot replay Spark's HLL
    registers, so the query emits the exact count plus a boolean asserting
    |approx - exact| <= 5 * rsd * exact; the oracle pins the boolean TRUE.
    An HLL regression beyond its accuracy contract flips the boolean and
    fails the hash. The exact count rides along only to anchor the row —
    the production pipeline drops it (and the exact-distinct shuffle with
    it)."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=_HLL_RSD).alias("n_approx"),
    )
    tol = F.lit(5.0 * _HLL_RSD) * F.col("n_exact")
    return agg.select(
        "event_type",
        "n_exact",
        (F.abs(F.col("n_approx") - F.col("n_exact")) <= tol).alias("approx_ok"),
    )


@register(
    "q_docs_sample_split",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, lang,
    substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key,
    substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) AS split_key
  FROM documents
)
SELECT doc_id, source, sample_key,
  CASE WHEN split_key < '0ccccccd' THEN 'valid' ELSE 'train' END AS split
FROM keyed
WHERE sample_key < (CASE WHEN lang = 'en' THEN '80000000' ELSE '33333334' END)
""",
    survey_ref="beyond-reference: deterministic stratified sampling + train/valid split (hash thresholds) — reproducible corpus subsetting at 100 TB",
)
def q_docs_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling and train/valid splitting in ONE
    narrow pass: each doc gets two independent md5-derived keys (domain-
    separated by a salt prefix); a doc is kept iff its sample key falls
    under the stratum's rate threshold (50% for ``lang='en'``, 20%
    otherwise — hex-prefix comparison, identical in any engine), and kept
    docs are assigned 5% valid / 95% train by the second key.

    Why this and not ``df.sample``: at 100 TB reproducibility matters more
    than randomness quality — hash thresholds give the SAME subset
    regardless of partitioning, retries, cluster size, or engine (the
    DuckDB oracle replays it bit-for-bit), membership is decidable per-row
    (no coordination, no shuffle, scales embarrassingly), and rates are
    adjustable per stratum with a CASE. ``TABLESAMPLE``/``rand()`` give
    none of that."""
    d = load(spark, sf_dir, "documents")
    sample_key = F.substring(
        F.md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))), 1, 8
    )
    split_key = F.substring(
        F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 8
    )
    rate = F.when(F.col("lang") == "en", F.lit("80000000")).otherwise(
        F.lit("33333334")
    )
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            sample_key.alias("sample_key"),
            split_key.alias("split_key"),
        )
        .filter(F.col("sample_key") < rate)
        .select(
            "doc_id",
            "source",
            "sample_key",
            F.when(F.col("split_key") < "0ccccccd", "valid")
            .otherwise("train")
            .alias("split"),
        )
    )


@register(
    "q_docs_lang_rebalance",
    oracle="""
WITH counts AS (
  SELECT COALESCE(lang, 'und') AS lang_k, COUNT(*) AS cnt
  FROM documents GROUP BY 1
),
m AS (SELECT MIN(cnt) AS min_cnt FROM counts),
keyed AS (
  SELECT d.doc_id, c.lang_k, c.cnt, m.min_cnt,
    substr(md5('rebalance|' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS sample_key,
    printf('%08x', LEAST(CAST(floor(
      CAST(m.min_cnt AS DOUBLE) / c.cnt * 4294967296.0) AS BIGINT),
      4294967295)) AS thr
  FROM documents d
  JOIN counts c ON c.lang_k = COALESCE(d.lang, 'und')
  CROSS JOIN m
)
SELECT doc_id, lang_k AS lang, sample_key
FROM keyed WHERE cnt = min_cnt OR sample_key < thr
""",
    survey_ref=(
        "beyond-reference: deterministic per-language corpus rebalancing "
        "(data mixing) — downsample every language to the smallest "
        "language's rate via hash thresholds, one narrow pass"
    ),
)
def q_docs_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: rebalance the corpus so every language contributes at
    (approximately) the rate of the SMALLEST language — each doc is kept
    iff its salted md5 key falls under min_count/count(lang), with the
    smallest language kept whole. The kept-set is deterministic per doc
    (same subset on any engine, partitioning, or retry; the DuckDB oracle
    replays it row-for-row), and per-language kept counts are binomial
    around the target — the standard trade at scale, where an EXACT-k cap
    would need a per-language global sort/rank over the full corpus.

    The data-derived threshold crosses engines exactly: rate =
    min_cnt/cnt is ONE IEEE division on identical integers,
    floor(rate * 2^32) one multiply+floor CLAMPED to 2^32-1 (ADVICE r8:
    near-equal strata with cnt > ~2^33 can round the IEEE product up to
    exactly 2^32, whose 9-hex-digit rendering Spark's lpad(8) would
    silently truncate to '10000000' while DuckDB printf kept 9 chars —
    the clamp keeps both engines at 8 hex digits always), and both
    engines render the same integer as the same 8-hex-digit string
    compared against the 8-hex-digit key (rate=1 is handled by the
    cnt = min_cnt clause, never by threshold compare). NULL languages
    coalesce to 'und' so they form a stratum instead of silently
    dropping at the join.

    100-TB shape: per-language counts are a tiny broadcast aggregate
    (5-200 languages), the min is a 1-row cross join, and membership is a
    pure narrow filter — no window, no sort, no shuffle of the corpus."""
    d = load(spark, sf_dir, "documents")
    lang_k = F.coalesce(F.col("lang"), F.lit("und"))
    # .limit() is a semantic no-op that makes the FIXED cardinality of the
    # aggregate explicit in the logical plan: the language-code domain is
    # bounded (~200 real codes; 10k covers any tagging scheme) regardless
    # of corpus size — which is what licenses the broadcast hint at any SF
    # (plan-audit discipline, same pattern as ann_topk_cosine's query side)
    counts = (
        d.groupBy(lang_k.alias("lang_k"))
        .agg(F.count("*").alias("cnt"))
        .limit(10_000)
    )
    m = counts.agg(F.min("cnt").alias("min_cnt")).limit(1)
    key = F.substring(
        F.md5(F.concat(F.lit("rebalance|"), F.col("doc_id").cast("string"))),
        1, 8,
    )
    thr = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.floor(
                        F.col("min_cnt").cast("double")
                        / F.col("cnt")
                        * F.lit(4294967296.0)
                    ).cast("bigint"),
                    F.lit(4294967295),
                )
            )
        ),
        8, "0",
    )
    # LEFT join + raise_error instead of the former inner join (ADVICE r8):
    # if the lang domain ever exceeded the aggregate's 10k cap, an inner
    # join silently VANISHED the truncated strata's documents; now any doc
    # whose stratum is missing from `counts` fails the job loudly the
    # moment its filter evaluates — fail-fast, zero extra Spark jobs.
    cnt_checked = F.when(
        F.col("cnt").isNull(),
        F.raise_error(
            "q_docs_lang_rebalance: language domain exceeds the 10k "
            "aggregate cap — raise the cap or pre-bucket the lang column"
        ).cast("long"),
    ).otherwise(F.col("cnt"))
    return (
        d.select("doc_id", lang_k.alias("lang_k"), key.alias("sample_key"))
        .join(F.broadcast(counts), "lang_k", "left")
        .crossJoin(F.broadcast(m))
        .withColumn("cnt", cnt_checked)
        .filter(
            (F.col("cnt") == F.col("min_cnt")) | (F.col("sample_key") < thr)
        )
        .select("doc_id", F.col("lang_k").alias("lang"), "sample_key")
    )


# --- r11: temperature/alpha-resampled language mixture ---------------------
#
# The mT5/XLM-R multilingual recipe: sample language l with probability
# proportional to n_l^alpha (alpha < 1 flattens the distribution — high-
# resource languages are downsampled, low-resource ones keep more of their
# share). alpha is fixed at 0.5 because sqrt is the ONE fractional power
# with a correctly-rounded primitive in both engines (IEEE-754 requires
# it); arbitrary alpha would route through exp/log, whose last-ulp
# disagreement between JVM and C libm is a documented gotcha of this repo.
# All derived integers (quantized weights, per-stratum targets, hex
# thresholds) come from single correctly-rounded IEEE ops on identical
# inputs, so the kept-set replays row-for-row in the oracle.
_ALPHA_SALT = "alpha|"


@register(
    "q_docs_alpha_mixture",
    oracle="""
WITH counts AS (
  SELECT COALESCE(lang, 'und') AS lang_k, COUNT(*) AS cnt
  FROM documents GROUP BY 1
),
w AS (
  SELECT lang_k, cnt,
    CAST(FLOOR(sqrt(CAST(cnt AS DOUBLE)) * 1048576.0) AS BIGINT) AS wq
  FROM counts
),
tot AS (SELECT SUM(wq) AS w_sum, SUM(cnt) AS n_total FROM w),
tgt AS (
  SELECT lang_k, cnt, wq,
    LEAST(cnt, CAST(FLOOR(
      CAST(n_total // 2 AS DOUBLE)
      * (CAST(wq AS DOUBLE) / CAST(w_sum AS DOUBLE))) AS BIGINT)) AS target
  FROM w CROSS JOIN tot
),
keyed AS (
  SELECT d.doc_id, t.lang_k, t.cnt, t.target,
    substr(md5('alpha|' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS sample_key,
    printf('%08x', LEAST(CAST(FLOOR(
      CAST(t.target AS DOUBLE) / t.cnt * 4294967296.0) AS BIGINT),
      4294967295)) AS thr
  FROM documents d JOIN tgt t ON t.lang_k = COALESCE(d.lang, 'und')
)
SELECT doc_id, lang_k AS lang, sample_key,
  CAST(cnt AS BIGINT) AS n_docs, CAST(target AS BIGINT) AS target_docs
FROM keyed WHERE cnt = target OR sample_key < thr
""",
    survey_ref=(
        "beyond-reference: temperature/alpha-resampled language mixture "
        "(p_l proportional to n_l^0.5 — the mT5/XLM-R multilingual "
        "recipe) under a half-corpus budget, deterministic hash-threshold "
        "membership"
    ),
)
def q_docs_alpha_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled corpus mixing at alpha = 0.5: each language
    stratum gets a target share of the half-corpus budget proportional to
    sqrt(n_l) — flattening the language distribution the way multilingual
    pretraining recipes do (high-resource languages yield share to
    low-resource ones; a stratum whose target reaches its size is kept
    whole). Membership is the salted-hash-threshold discipline of
    `q_docs_lang_rebalance`, so the kept subset is deterministic across
    engines, partitionings and retries; emits one row per KEPT doc with
    its stratum's ``(n_docs, target_docs)`` carried for audit.

    Exactness chain (every step one correctly-rounded IEEE op on
    identical inputs): weight = floor(sqrt(n) * 2^20) — sqrt is
    correctly rounded BY THE STANDARD and the 2^20 scale is a pure
    exponent shift, so the quantized weight is engine-exact; the target
    is floor(budget * (w / w_sum)) with division-then-multiplication in
    a fixed order; the per-stratum rate threshold reuses the clamped
    floor(rate * 2^32) 8-hex-digit rendering proven by the rebalance
    pass. Integer sums (w_sum, n_total) are exact BIGINTs. Doc counts up
    to 2^52 stay inside the double-exact range — comfortable at 100 TB.

    100-TB shape: per-language counts are a tiny broadcast aggregate
    (bounded lang domain, .limit documents it), totals are a 1-row cross
    join, membership is a pure NARROW filter — no window, no sort, no
    corpus shuffle; the fail-fast raise_error guards the 10k stratum cap
    exactly like the rebalance pass."""
    d = load(spark, sf_dir, "documents")
    lang_k = F.coalesce(F.col("lang"), F.lit("und"))
    counts = (
        d.groupBy(lang_k.alias("lang_k"))
        .agg(F.count("*").alias("cnt"))
        .limit(10_000)
    )
    wq = F.floor(F.sqrt(F.col("cnt").cast("double")) * F.lit(1048576.0)).cast(
        "bigint"
    )
    w = counts.select("lang_k", "cnt", wq.alias("wq"))
    tot = (
        w.agg(
            F.sum("wq").alias("w_sum"), F.sum("cnt").alias("n_total")
        ).limit(1)
    )
    budget_d = (F.col("n_total") / F.lit(2)).cast("bigint").cast("double")
    target = F.least(
        F.col("cnt"),
        F.floor(
            budget_d
            * (F.col("wq").cast("double") / F.col("w_sum").cast("double"))
        ).cast("bigint"),
    )
    tgt = w.crossJoin(F.broadcast(tot)).select(
        "lang_k", "cnt", target.alias("target")
    )
    key = F.substring(
        F.md5(F.concat(F.lit(_ALPHA_SALT), F.col("doc_id").cast("string"))),
        1,
        8,
    )
    thr = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.floor(
                        F.col("target").cast("double")
                        / F.col("cnt")
                        * F.lit(4294967296.0)
                    ).cast("bigint"),
                    F.lit(4294967295),
                )
            )
        ),
        8,
        "0",
    )
    cnt_checked = F.when(
        F.col("cnt").isNull(),
        F.raise_error(
            "q_docs_alpha_mixture: language domain exceeds the 10k "
            "aggregate cap — raise the cap or pre-bucket the lang column"
        ).cast("long"),
    ).otherwise(F.col("cnt"))
    return (
        d.select("doc_id", lang_k.alias("lang_k"), key.alias("sample_key"))
        .join(F.broadcast(tgt), "lang_k", "left")
        .withColumn("cnt", cnt_checked)
        .filter((F.col("cnt") == F.col("target")) | (F.col("sample_key") < thr))
        .select(
            "doc_id",
            F.col("lang_k").alias("lang"),
            "sample_key",
            F.col("cnt").cast("bigint").alias("n_docs"),
            F.col("target").cast("bigint").alias("target_docs"),
        )
    )


@register(
    "q_events_json_props",
    oracle="""
WITH parsed AS (
  -- exact mirror of Spark from_json(k LONG) PERMISSIVE semantics: k is
  -- extracted ONLY when props is valid JSON and $.k is a JSON integer that
  -- FITS int64 (strings/floats/arrays/null/malformed/absent all -> NULL,
  -- never an error) -- verified value-by-value in
  -- tests/test_query_edge_corpora.py. TRY_CAST, not CAST (r5 ADVICE):
  -- DuckDB types every non-negative JSON integer 'UBIGINT' (even 123), so
  -- the type test cannot exclude [2^63, 2^64) values -- Spark's LongType
  -- parse nulls those out, and a plain CAST here would raise
  -- out-of-range instead of comparing (2^63 row in the edge corpus).
  SELECT event_type,
    CASE WHEN json_valid(props)
              AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
         THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  CAST(MIN(k) AS BIGINT) AS min_k,
  CAST(MAX(k) AS BIGINT) AS max_k,
  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM parsed GROUP BY event_type
""",
    survey_ref="beyond-reference: semi-structured extraction — typed from_json projection over a JSON payload column",
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured ``props`` JSON column:
    parse with an EXPLICIT schema (``from_json`` — one pass, typed columns,
    malformed rows become nulls counted in ``n_missing``) and aggregate per
    event type.

    100-TB shape: explicit schema means no inference pass over the corpus;
    parsing is JVM-side (Jackson under codegen, no UDF); only the projected
    field materializes. With many JSON fields the production variant is
    the same ``from_json`` with a wider struct — still one parse per row —
    never N ``get_json_object`` calls (N parses per row)."""
    from pyspark.sql.types import LongType, StructField as SF_, StructType as ST_

    e = load(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json(F.col("props"), ST_([SF_("k", LongType())])).alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("p.k").cast("long").alias("sum_k"),
        F.min("p.k").cast("long").alias("min_k"),
        F.max("p.k").cast("long").alias("max_k"),
        F.sum(F.when(F.col("p.k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
    )
