"""Vector similarity over the `embeddings` table (array<float>, 64-dim):
brute-force cosine top-k (the correctness baseline) and an LSH-bucketed
variant (the scale path). Beyond-reference pipeline family.

Exactness: float dot products are order-sensitive, and double rounding
differs between engines at the last ulp — so both engines *quantize* each
elementwise product with floor(p * 1e9) (multiply and floor are single
correctly-rounded IEEE ops, identical everywhere) and sum the resulting
BIGINTs exactly. Scores are therefore deterministic integers / integer
ratios, within 1e-7 of the true cosine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from dblink_spark.functions import eval_once
from dblink_spark.functions.vector import quantized_dot as _dot_q
from dblink_spark.queries import load, owns_caches, register, widen_small_scan


_DOT_SQL = """
CAST(list_sum(list_transform(list_zip({a}, {b}),
  p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1000000000.0) AS BIGINT))) AS BIGINT)
"""

# Random-hyperplane LSH banding for near-dup blocking: each hyperplane is
# sign(e[i] +/- e[j]) on fixed (1-based) coordinates; a band key packs its
# sign bits into an int. Two true near-dups collide in a band with high
# probability (banding trades recall for the N^2 blowup), and the candidate
# join is a pure equi-join on (band_idx, band_key) — the same pigeonhole
# shape as dedup_simhash. Coordinates are seeded-PRNG-fixed, not
# data-derived: NO ground-truth column participates anywhere.
#
# BAND WIDTH MUST GROW WITH CORPUS SIZE (hot-key bound): a band key splits N
# vectors into ~2^bits buckets, so the per-band candidate join fans out
# ~N^2 / 2^bits pairs and the largest bucket holds ~N / 2^bits vectors
# (plus skew from correlated coordinates). `bits_for_corpus(N)` sizes the
# width so the expected bucket stays ~64 vectors at ANY N — the registered
# query (`dedup_embedding_cosine_scaled`) derives its width that way; a
# fixed-width variant existed through r5 as `dedup_embedding_cosine` and
# was retired in r6 because its ~N^2/16 candidate fan-out is exactly the
# failure mode the width scaling removes (VERDICT r5 "What's wrong" #1).


def bits_for_corpus(n_vectors: int, target_bucket: int = 64) -> int:
    """Band bits so the EXPECTED bucket holds ~``target_bucket`` vectors:
    ``ceil(log2(N / target_bucket))`` (>= 2). Keeps the in-bucket join cost
    ~N * target_bucket per band regardless of N — the knob that makes
    hyperplane banding survive a 100x corpus growth."""
    import math

    return max(2, math.ceil(math.log2(max(n_vectors / target_bucket, 4.0))))


def make_lsh_bands(
    n_bands: int, bits_per_band: int, dim: int = 64, seed: int = 7
) -> list:
    """Deterministic random-hyperplane band specs ``[(i, j, sign), ...]``
    (1-based coordinates, ``sign(e[i] +/- e[j])``) drawn from a seeded PRNG;
    same shape as ``_LSH_BANDS`` so any width plugs into the one blocking
    implementation (`embedding_near_dups`)."""
    rng = __import__("numpy").random.default_rng(seed)
    bands = []
    for _ in range(n_bands):
        band = []
        for _ in range(bits_per_band):
            i, j = (int(x) + 1 for x in rng.choice(dim, size=2, replace=False))
            band.append((i, j, 1 if rng.random() < 0.5 else -1))
        bands.append(band)
    return bands


def make_lsh_bands_prefix(
    n_bands: int, bits_per_band: int, dim: int = 64, seed: int = 7
) -> list:
    """Like `make_lsh_bands`, but PREFIX-STABLE: band ``b``'s spec at width
    ``w`` is exactly the first ``w`` hyperplanes of its spec at any larger
    width (each band draws from its own seeded stream). That is what lets a
    STATIC DuckDB oracle — generated once at the maximum width with each
    term gated on ``k < bits`` — agree hyperplane-for-hyperplane with a
    Spark plan whose width is derived from the corpus size at runtime."""
    import numpy as np

    bands = []
    for b in range(n_bands):
        rng = np.random.default_rng([seed, b])
        band = []
        for _ in range(bits_per_band):
            i, j = (int(x) + 1 for x in rng.choice(dim, size=2, replace=False))
            band.append((i, j, 1 if rng.random() < 0.5 else -1))
        bands.append(band)
    return bands


def _safe_cosine(dot, sq_a, sq_b):
    """cosine(dot, |a|^2, |b|^2) with a zero-norm guard: a zero vector (a
    failed/empty encoder output — inevitable somewhere in 100 TB) makes the
    denominator 0, which ANSI mode turns into a job-killing DIVIDE_BY_ZERO.
    Guarded cosine is defined as 0.0 (a zero vector is similar to nothing),
    so such rows simply never rank or pair; every oracle mirrors the same
    CASE guard. Caught by tests/test_query_edge_corpora.py."""
    den = F.sqrt(sq_a.cast("double")) * F.sqrt(sq_b.cast("double"))
    return F.when(den > 0, dot.cast("double") / den).otherwise(F.lit(0.0))


def _band_col(band):
    """Band-key Column over the frame's ``embedding`` array — built as ONE
    SQL string handed to a single ``F.expr`` (r16, guide §1.2 per-task →
    driver work): the per-hyperplane Column algebra cost ~6 py4j round
    trips per bit, making frame BUILD (not execution) the dominant wall
    time of every banded query at gate scale (profiled: ann_lsh_recall
    spent ~1.9s of its 3.0s in driver-side Column construction). The
    string form is the IDENTICAL expression tree — 0-based array access,
    double casts on both operands, int CASE terms, left-assoc sum — just
    parsed JVM-side in one call."""
    terms = ["0"]
    for k, (i, j, s) in enumerate(band):
        proj = (
            f"(CAST(embedding[{i - 1}] AS DOUBLE) + "
            f"(CAST('{float(s)!r}' AS DOUBLE) * CAST(embedding[{j - 1}] AS DOUBLE)))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << k} ELSE 0 END)")
    return F.expr("(" + " + ".join(terms) + ")")


@register(
    "ann_topk_cosine",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
base AS (SELECT vec_id, embedding, label FROM embeddings),
dots AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, b.label,
    CAST({_DOT_SQL.format(a="q.qe", b="b.embedding")} AS DOUBLE) AS dot,
    CAST({_DOT_SQL.format(a="q.qe", b="q.qe")} AS DOUBLE) AS qq,
    CAST({_DOT_SQL.format(a="b.embedding", b="b.embedding")} AS DOUBLE) AS bb
  FROM q CROSS JOIN base b WHERE q.query_id <> b.vec_id
),
scored AS (
  SELECT query_id, neighbor_id, label,
    CASE WHEN (sqrt(qq) * sqrt(bb)) > 0 THEN dot / (sqrt(qq) * sqrt(bb)) ELSE 0 END AS cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY CASE WHEN (sqrt(qq) * sqrt(bb)) > 0 THEN dot / (sqrt(qq) * sqrt(bb)) ELSE 0 END DESC, neighbor_id) AS rank
  FROM dots
)
SELECT query_id, neighbor_id, label, cosine, CAST(rank AS INT) AS rank
FROM scored WHERE rank <= 5
""",
    survey_ref="beyond-reference: brute-force cosine top-k ANN baseline",
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for 8 query vectors, brute force.

    Scale shape: queries broadcast against the base scan; the per-row dot is
    a JVM higher-order fold (no Python). The window ranks per query."""
    # r16: widen the single-split gate-scale scan — the brute per-row dot
    # fold was serializing on one task (1.30x best-of-3; no-op at scale)
    e = widen_small_scan(load(spark, sf_dir, "embeddings"))
    # .limit(8) is a semantic no-op (the filter yields exactly 8 rows) but
    # makes the frame's fixed cardinality explicit in the logical plan, which
    # is what licenses the broadcast hint at any SF (plan-audit checked).
    # Self-dots (qq/bb) are computed ONCE per side before the join — per
    # joined pair they'd be recomputed |base| and |queries| times over.
    q = (
        e.filter(F.col("vec_id") < 8)
        .limit(8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            _dot_q(F.col("embedding"), F.col("embedding")).cast("double").alias("qq"),
        )
    )
    base = e.select(
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        "label",
        _dot_q(F.col("embedding"), F.col("embedding")).cast("double").alias("bb"),
    )
    joined = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    dots = joined.select(
        "query_id",
        "neighbor_id",
        "label",
        _dot_q(F.col("qe"), F.col("embedding")).cast("double").alias("dot"),
        "qq",
        "bb",
    )
    cosine = _safe_cosine(F.col("dot"), F.col("qq"), F.col("bb"))
    w = Window.partitionBy("query_id").orderBy(F.desc(cosine), F.asc("neighbor_id"))
    return (
        dots.withColumn("cosine", cosine)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter("rank <= 5")
        .select("query_id", "neighbor_id", "label", "cosine", "rank")
    )


@register(
    "vector_norms_by_label",
    oracle=f"""
SELECT label,
  COUNT(*) AS n_vectors,
  CAST(SUM({_DOT_SQL.format(a="embedding", b="embedding")}) AS BIGINT) AS total_sq_norm
FROM embeddings GROUP BY label
""",
    survey_ref="beyond-reference: vector aggregate statistics",
)
def vector_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector counts + exact (quantized) total squared L2 norm."""
    e = load(spark, sf_dir, "embeddings")
    sq = _dot_q(F.col("embedding"), F.col("embedding"))
    return e.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.sum(sq).cast("bigint").alias("total_sq_norm"),
    )


def embedding_near_dups(
    embeddings: DataFrame, bands: list, threshold: float = 0.35
) -> DataFrame:
    """LSH-banded near-duplicate blocking over any band spec (see
    `make_lsh_bands` / `bits_for_corpus` for sizing the width to the
    corpus). Input needs ``vec_id`` + ``embedding``; output is
    ``(v1, v2, cosine)`` with cosine >= ``threshold``."""
    e = embeddings.select(
        "vec_id",
        "embedding",
        _dot_q(F.col("embedding"), F.col("embedding")).alias("sq"),
        *[
            _band_col(band).alias(f"band{bi}")
            for bi, band in enumerate(bands)
        ],
    )
    exploded = e.select(
        "vec_id",
        "embedding",
        "sq",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.col(f"band{bi}").alias("band_key"),
                    )
                    for bi in range(len(bands))
                ]
            )
        ).alias("bd"),
    ).select(
        "vec_id",
        "embedding",
        "sq",
        F.col("bd.band_idx").alias("band_idx"),
        F.col("bd.band_key").alias("band_key"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    # eval_once (r16, guide §4.4): without the barrier the threshold
    # filter is pushed below this projection and the interpreted
    # quantized-dot fold runs TWICE per candidate — measured 2.30s →
    # 1.53s on the sf0.1 verify stage; the filter still runs BEFORE the
    # pair-dedup exchange, so only survivors shuffle (the scale property)
    cosine = eval_once(
        _safe_cosine(
            _dot_q(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a.sq"),
            F.col("b.sq"),
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        # a pair colliding in several bands appears once per collision with
        # a bit-identical cosine (deterministic integer dots) — collapse
        .groupBy("v1", "v2")
        .agg(F.max("cosine").alias("cosine"))
    )


# Width-scaled LSH spec: same blocking implementation, but the band width
# (sign bits per band) derives from the corpus size via `bits_for_corpus`,
# so the expected bucket holds ~TARGET_BUCKET vectors and the candidate
# join stays ~N * TARGET_BUCKET per band at ANY corpus size — this is the
# 100-TB path. MAX_BITS=30 bounds the generated SQL (enough for ~6e10
# vectors).
_SCALED_N_BANDS = 2
_SCALED_TARGET_BUCKET = 64
_SCALED_MAX_BITS = 30
_SCALED_BANDS_FULL = make_lsh_bands_prefix(_SCALED_N_BANDS, _SCALED_MAX_BITS)

#: bits_for_corpus(n, 64) in SQL: GREATEST(2, CEIL(LOG2(GREATEST(n/64, 4))))
_SCALED_BITS_SQL = (
    f"GREATEST(2, CAST(CEIL(LOG2(GREATEST(COUNT(*) / {_SCALED_TARGET_BUCKET}.0, 4.0))) AS INT))"
)


def _band_sql_gated(band, bits_col: str) -> str:
    """Band-key SQL where hyperplane k contributes only when k < bits."""
    terms = []
    for k, (i, j, s) in enumerate(band):
        op = "+" if s > 0 else "-"
        terms.append(
            f"(CASE WHEN {k} < {bits_col} AND CAST(embedding[{i}] AS DOUBLE) {op} "
            f"CAST(embedding[{j}] AS DOUBLE) > 0 THEN {1 << k} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "dedup_embedding_cosine_scaled",
    oracle=f"""
WITH params AS (
  SELECT {_SCALED_BITS_SQL} AS bits FROM embeddings
),
e AS (
  SELECT vec_id, embedding,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS sq,
    {_band_sql_gated(_SCALED_BANDS_FULL[0], "params.bits")} AS band0,
    {_band_sql_gated(_SCALED_BANDS_FULL[1], "params.bits")} AS band1
  FROM embeddings, params
),
cand AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
    CASE WHEN (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))) > 0
      THEN CAST({_DOT_SQL.format(a="a.embedding", b="b.embedding")} AS DOUBLE) / (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))) ELSE 0 END AS cosine
  FROM e a JOIN e b ON a.band0 = b.band0 AND a.vec_id < b.vec_id
  UNION
  SELECT a.vec_id AS v1, b.vec_id AS v2,
    CASE WHEN (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))) > 0
      THEN CAST({_DOT_SQL.format(a="a.embedding", b="b.embedding")} AS DOUBLE) / (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))) ELSE 0 END AS cosine
  FROM e a JOIN e b ON a.band1 = b.band1 AND a.vec_id < b.vec_id
)
SELECT v1, v2, cosine FROM cand WHERE cosine >= 0.35
""",
    survey_ref="beyond-reference: embedding near-dup dedup, corpus-width-scaled LSH (the 100-TB path)",
)
def dedup_embedding_cosine_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by cosine >= 0.35, LSH-band-blocked, with the
    band width derived from the corpus size (`bits_for_corpus`): ~2^bits
    buckets per band keep the expected bucket at ~64 vectors, so candidate
    fan-out is ~N*64 per band instead of a fixed-width spec's ~N^2/2^bits —
    the registered query IS the scale path (the fixed 4-bit demo was
    retired in r6).

    The corpus count is a driver-side scalar (one number, same boundary as
    the IVF centroids); the oracle derives the identical width from
    COUNT(*) and gates each pre-generated hyperplane term on ``k < bits``,
    with `make_lsh_bands_prefix` guaranteeing the specs agree."""
    # r16: widen the single-split gate-scale scan — band keys + quantized
    # dots were serializing on one task (2.25x best-of-3; no-op at scale).
    # r17 (ADVICE): the corpus COUNT runs on the RAW scan — counting the
    # widened frame executed the round-robin exchange as its own job,
    # shuffling the embeddings payload to produce a number the narrow
    # scan yields identically.
    raw = load(spark, sf_dir, "embeddings")
    e = widen_small_scan(raw)
    bits = bits_for_corpus(raw.count(), _SCALED_TARGET_BUCKET)
    bands = [band[:bits] for band in _SCALED_BANDS_FULL]
    return embedding_near_dups(e, bands=bands, threshold=0.35)


@register(
    "ann_lsh_bucketed",
    oracle=f"""
WITH hp AS (
  SELECT vec_id, label, embedding,
    (CASE WHEN CAST(embedding[1] AS DOUBLE) + CAST(embedding[3] AS DOUBLE) > 0 THEN 1 ELSE 0 END)
    + (CASE WHEN CAST(embedding[2] AS DOUBLE) - CAST(embedding[5] AS DOUBLE) > 0 THEN 2 ELSE 0 END)
    + (CASE WHEN CAST(embedding[4] AS DOUBLE) + CAST(embedding[8] AS DOUBLE) > 0 THEN 4 ELSE 0 END) AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2, a.bucket,
    {_DOT_SQL.format(a="a.embedding", b="b.embedding")} AS dot
  FROM hp a JOIN hp b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE a.vec_id < 64
)
SELECT bucket, COUNT(*) AS n_pairs,
  CAST(SUM(dot) AS BIGINT) AS total_dot
FROM pairs GROUP BY bucket
""",
    survey_ref="beyond-reference: LSH (random-hyperplane) bucketed similarity — the ANN scale path",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-of-projection (SimHash-for-vectors) bucketing: 3 fixed
    hyperplanes → 8 buckets; candidate pairs only form inside a bucket.
    Output aggregates per bucket so the oracle compares a small table."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")

    def el(i):  # 1-based to match DuckDB list indexing
        return emb[i - 1].cast("double")

    bucket = (
        F.when(el(1) + el(3) > 0, 1).otherwise(0)
        + F.when(el(2) - el(5) > 0, 2).otherwise(0)
        + F.when(el(4) + el(8) > 0, 4).otherwise(0)
    )
    hp = e.select("vec_id", "label", "embedding", bucket.alias("bucket"))
    a = hp.alias("a")
    b = hp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(F.col("a.vec_id") < 64)
        .select(
            F.col("a.bucket").alias("bucket"),
            _dot_q(F.col("a.embedding"), F.col("b.embedding")).alias("dot"),
        )
    )
    return pairs.groupBy("bucket").agg(
        F.count("*").alias("n_pairs"),
        F.sum("dot").cast("bigint").alias("total_dot"),
    )


def make_rp_signs(n_dims: int = 8, dim: int = 64, seed: int = 23) -> list:
    """Deterministic Rademacher (±1) sign matrix for sparse random
    projection, one seeded stream per OUTPUT dim (same per-row-stream
    discipline as `make_lsh_bands_prefix`, so widening n_dims never
    changes existing dims). Signs are embedded as literals in BOTH the
    Spark plan and the DuckDB oracle — the projection is model weights,
    shipped broadcast-style, never data-derived."""
    import numpy as np

    out = []
    for j in range(n_dims):
        rng = np.random.default_rng([seed, j])
        out.append([1 if rng.random() < 0.5 else -1 for _ in range(dim)])
    return out


_RP_DIMS = 8
_RP_SIGNS = make_rp_signs(_RP_DIMS)


def _rp_dim_sql(signs: list) -> str:
    lits = "[" + ", ".join(str(s) for s in signs) + "]"
    return (
        f"CAST(list_sum(list_transform(list_zip(embedding, {lits}), "
        f"p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * p[2] * 1000000.0) "
        f"AS BIGINT))) AS BIGINT)"
    )


@register(
    "vector_random_projection",
    oracle="SELECT vec_id, label,\n"
    + ",\n".join(
        f"  {_rp_dim_sql(s)} AS d{j}" for j, s in enumerate(_RP_SIGNS)
    )
    + "\nFROM embeddings",
    survey_ref=(
        "beyond-reference: sparse random projection (Rademacher signs, "
        "64 -> 8 dims) — the dimensionality-reduction pass before "
        "coarse indexing/clustering; pure narrow row-local map"
    ),
)
def vector_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss-style sparse random projection: every
    embedding maps to 8 coordinates, each the signed sum of its 64
    components under a fixed seeded ±1 pattern — the cheap
    dimensionality reduction pipelines run before coarse quantization,
    visualization, or drift monitoring, with pairwise distances preserved
    in expectation.

    Engine exactness (same trick as the quantized dot product): each
    elementwise product is quantized with floor(x * 1e6) — single
    correctly-rounded IEEE ops — and the resulting BIGINTs are summed
    EXACTLY, so coordinates are deterministic integers on any engine and
    any summation order.

    100-TB shape: a pure narrow map — the sign matrix is literal
    plan-side weights (broadcast semantics, zero data-derived state), no
    shuffle, no UDF; `zip_with`/`aggregate` keep the fold JVM-side."""
    e = load(spark, sf_dir, "embeddings")
    # r16 (guide §1.2, the ANN change-6 lesson): each dim's sign array +
    # fold is one SQL string through a single selectExpr — the Column-
    # algebra form built the 64-element literal array ELEMENT-WISE per
    # dim (~3.3k py4j round trips per invocation). Identical expression
    # tree: ((x*s)*1e6) ordering, FLOOR→BIGINT per term, BIGINT
    # accumulator; double literals round-trip via CAST('repr' AS DOUBLE).
    scale = "CAST('1000000.0' AS DOUBLE)"
    dims = []
    for j, signs in enumerate(_RP_SIGNS):
        arr = "array(" + ", ".join(
            f"CAST('{float(s)!r}' AS DOUBLE)" for s in signs
        ) + ")"
        dims.append(
            f"aggregate(zip_with(embedding, {arr}, "
            f"(x, s) -> CAST(FLOOR(((CAST(x AS DOUBLE) * s) * {scale})) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d{j}"
        )
    return e.selectExpr("vec_id", "label", *dims)


# ann_lsh_recall contract (VERDICT r7 task 5 — promote the pytest-only LSH
# recall check into the driver's hash gate, mirroring ann_ivf_trained):
# 12 prefix-stable hyperplane bands at bits_for_corpus width; candidates
# form ONLY inside shared band buckets; aggregate recall@5 over the 8
# benchmark queries must reach 0.85 vs the brute-force arm. Calibration at
# both fixture scales: recall 1.0 (sf0.001) / 0.95 (sf0.01), max bucket
# 88 vs expected 62.5 (1.4x), all 12*2^bits band keys populated.
_LSH_RECALL_BANDS = 12
_LSH_RECALL_MIN = 0.85
_LSH_RECALL_BALANCE = 3.0
_LSH_RECALL_NQUERY, _LSH_RECALL_TOPK = 8, 5


@register(
    "ann_lsh_recall",
    oracle=f"""
SELECT CAST({_LSH_RECALL_NQUERY} AS BIGINT) AS n_queries,
  CAST({_LSH_RECALL_NQUERY * _LSH_RECALL_TOPK} AS BIGINT) AS n_returned_total,
  TRUE AS recall_ok,
  TRUE AS buckets_ok
""",
    survey_ref=(
        "beyond-reference: LSH-bucketed ANN top-k with a hash-gated recall "
        "contract — the scale path's quality bar, driver-verified "
        "(contract-as-data, same design as ann_ivf_trained)"
    ),
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k search end-to-end, gated on its RECALL against
    the brute-force arm (contract-as-data: DuckDB cannot usefully replay a
    recall experiment, so the oracle pins the one row a working index must
    produce):

    - ``recall_ok``: aggregate recall@5 over the 8 benchmark queries
      >= 0.85 vs `ann_topk_cosine` (exact). A broken banding (wrong
      coordinates, bad key packing) scatters true neighbors across buckets
      and fails this.
    - ``buckets_ok``: every band populates >= half its key space AND the
      largest bucket stays <= 3x the expected N/2^bits — the opposite
      degeneracy (a constant projection lumping the corpus into one bucket
      scores recall 1.0 with no pruning) fails here.
    - ``n_returned_total`` exact: shared buckets must always hold enough
      candidates to fill top-k.

    Scale shape: signatures are a row-local narrow pass (one band-key
    column per band, JVM-side bit packing); the query side (8 rows x B
    band keys) broadcasts into a candidate equi-join on (band, key) — the
    same pigeonhole shape as `dedup_minhash_lsh`'s band join, so candidate
    count is ~N * bucket_size, never N^2. The brute arm exists only to
    measure recall inside the gate (run once per index build on a sample
    at scale, as documented on `ann_ivf_trained`)."""
    e = load(spark, sf_dir, "embeddings")
    n_vectors = e.count()
    bits = bits_for_corpus(n_vectors)
    bands = make_lsh_bands_prefix(_LSH_RECALL_BANDS, bits)
    # the signature table feeds three consumers (query side, candidate
    # side, bucket-balance arm) — persist so the per-row band-key pass over
    # the corpus runs once (caller-owns-cache contract, as in the dedup
    # family)
    base = e.select(
        "vec_id",
        "embedding",
        _dot_q(F.col("embedding"), F.col("embedding")).alias("sq"),
        *[_band_col(b).alias(f"k{i}") for i, b in enumerate(bands)],
    ).persist()
    kv = base.select(
        "vec_id",
        "embedding",
        "sq",
        F.posexplode(
            F.array(*[F.col(f"k{i}") for i in range(len(bands))])
        ).alias("band", "key"),
    )
    # .limit() is a semantic no-op (the filter yields exactly NQUERY * B
    # rows) but makes the fixed cardinality explicit in the logical plan —
    # what licenses the broadcast hint at any SF (plan-audit discipline,
    # same as ann_topk_cosine)
    q = (
        kv.filter(F.col("vec_id") < _LSH_RECALL_NQUERY)
        .limit(_LSH_RECALL_NQUERY * _LSH_RECALL_BANDS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("sq").alias("qsq"),
            "band",
            "key",
        )
    )
    cand = (
        F.broadcast(q)
        .join(kv, ["band", "key"])
        .filter(F.col("query_id") != F.col("vec_id"))
        # a pair can collide in several bands; cosine is identical in each,
        # so dedup with a cheap first() instead of a distinct over arrays
        .groupBy("query_id", "vec_id")
        .agg(
            F.first(
                _safe_cosine(
                    _dot_q(F.col("qe"), F.col("embedding")),
                    F.col("qsq"),
                    F.col("sq"),
                )
            ).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("vec_id")
    )
    topk = cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _LSH_RECALL_TOPK
    )
    brute = ann_topk_cosine(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("vec_id"), F.lit(1).alias("hit")
    )
    search_agg = topk.join(brute, ["query_id", "vec_id"], "left").agg(
        F.count_distinct("query_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("n_returned_total"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
    )
    bucket_agg = (
        kv.groupBy("band", "key")
        .count()
        .agg(
            F.count("*").alias("n_band_keys"),
            F.max("count").alias("max_bucket"),
        )
    )
    min_hits = F.lit(
        _LSH_RECALL_MIN * _LSH_RECALL_NQUERY * _LSH_RECALL_TOPK
    )
    buckets_ok = (
        F.col("n_band_keys")
        >= F.lit(_LSH_RECALL_BANDS * (1 << bits) // 2)
    ) & (
        F.col("max_bucket")
        <= F.lit(_LSH_RECALL_BALANCE)
        * F.ceil(F.lit(n_vectors) / F.lit(1 << bits))
    )
    out = search_agg.crossJoin(bucket_agg).select(
        "n_queries",
        "n_returned_total",
        (F.col("n_hits") >= min_hits).alias("recall_ok"),
        buckets_ok.alias("buckets_ok"),
    )
    return owns_caches(out, base)  # caller releases after materializing


# IVF parameters for the registered query: K seed centroids (the first K
# vectors stand in for a trained coarse quantizer — the plan shape is what
# matters), nprobe probed cells per query, top-k within candidates.
_IVF_K, _IVF_NPROBE, _IVF_TOPK, _IVF_NQUERY = 8, 2, 5, 8

_IVF_COS = (
    "CASE WHEN (sqrt(CAST({sa} AS DOUBLE)) * sqrt(CAST({sb} AS DOUBLE))) > 0 "
    "THEN CAST({d} AS DOUBLE) "
    "/ (sqrt(CAST({sa} AS DOUBLE)) * sqrt(CAST({sb} AS DOUBLE))) ELSE 0 END"
)


@register(
    "ann_ivf_untrained_baseline",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS csq
  FROM embeddings WHERE vec_id < {_IVF_K}
),
base AS (
  SELECT vec_id, embedding,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS sq
  FROM embeddings
),
assign AS (
  SELECT b.vec_id, b.embedding, b.sq, c.cid,
    ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
      {_IVF_COS.format(d=_DOT_SQL.format(a="b.embedding", b="c.ce"), sa="b.sq", sb="c.csq")} DESC,
      c.cid) AS rn
  FROM base b CROSS JOIN cents c
),
cells AS (SELECT vec_id, embedding, sq, cid FROM assign WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, embedding AS qe, sq AS qsq, cid
  FROM assign WHERE vec_id < {_IVF_NQUERY} AND rn <= {_IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, v.vec_id AS neighbor_id,
    {_IVF_COS.format(d=_DOT_SQL.format(a="p.qe", b="v.embedding"), sa="p.qsq", sb="v.sq")} AS cosine
  FROM probes p JOIN cells v ON v.cid = p.cid AND v.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_IVF_TOPK}
""",
    survey_ref="beyond-reference: IVF coarse-quantized ANN — the similarity-search scale path",
)
def ann_ivf_untrained_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbors with an UNTRAINED quantizer:
    K coarse centroids (the first K vectors — an explicit baseline arm,
    NOT the production path), every vector assigned to its nearest centroid
    (its *cell*), queries probing their ``nprobe`` nearest cells, and top-k
    searched only among the probed cells' members.

    Renamed from ``ann_ivf`` in r7: the fitted index is the used index
    (ref analogue AttributeIndex.scala:106-125), so the canonical IVF entry
    is `ann_ivf_trained` (spherical-k-means quantizer, contract-as-data
    gate). THIS entry stays registered because its value is the gate
    STRENGTH: with literal centroids the full search — assignment, probe
    selection, candidate join, ranking — is replayed value-for-value by the
    DuckDB oracle, a bit-exact check the trained arm cannot express in SQL.

    Scale shape: the quantizer is a driver-side constant (like trained
    model weights), so cell assignment is a NARROW column expression —
    ``greatest`` over K (cosine, -cid) structs built from literal centroid
    arrays, zero shuffle, no crossJoin. Candidates come from an equi-join
    on ``cid`` against the tiny probe frame (broadcast), so the search cost
    is ~N * nprobe / K instead of N per query — the IVF point. Quantized
    dots (module docstring) keep every score a deterministic function of
    BIGINTs, so the DuckDB oracle hash-matches."""
    e = load(spark, sf_dir, "embeddings")
    cents = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") < _IVF_K)
        .select("vec_id", "embedding")
        .collect()
    )
    return ivf_search(e, cents, n_query=_IVF_NQUERY, nprobe=_IVF_NPROBE, topk=_IVF_TOPK)


# Trained-IVF gate operating point. K=16 with nprobe=4 makes the gate
# SHARP: a quantizer that scatters true neighbors randomly recovers only
# ~nprobe/K = 0.25 of the brute-force top-k, while the trained spherical
# k-means measures 0.575-0.675 aggregate recall across the sf0.001/0.01/0.1
# fixtures — so the 0.45 floor separates the two regimes with margin on
# both sides. The degenerate OPPOSITE failure (all vectors in one cell ->
# recall 1.0 but no speedup) is caught by the balance bound instead:
# observed max cell <= 1.3x N/K; the gate allows 2x.
_IVF_TRAINED_K, _IVF_TRAINED_NPROBE = 16, 4
_IVF_TRAINED_MIN_RECALL = 0.45
_IVF_TRAINED_BALANCE = 2.0


@register(
    "ann_ivf_trained",
    oracle=f"""
SELECT CAST({_IVF_NQUERY} AS BIGINT) AS n_queries,
  CAST({_IVF_NQUERY * _IVF_TOPK} AS BIGINT) AS n_returned_total,
  TRUE AS recall_ok,
  TRUE AS balance_ok
""",
    survey_ref="beyond-reference: IVF ANN with a TRAINED spherical-k-means quantizer — the fitted index is the used index (ref analogue: AttributeIndex.scala:106-125)",
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search end-to-end through the TRAINED quantizer
    (`train_ivf_centroids`: spherical k-means on a deterministic sample,
    fit driver-side like model weights) — closing the r5 gap where the
    registered `ann_ivf` (now `ann_ivf_untrained_baseline`) used first-K stand-in centroids while the trained
    path had only a pytest recall check.

    GATE DESIGN (contract-as-data, same trick as
    `q_events_value_quantiles_approx`): DuckDB cannot replay k-means, so
    the hash-gated contract is the two properties a working IVF index must
    have — emitted as ONE row the oracle pins:

    - ``recall_ok``: aggregate recall vs the brute-force top-5 over the 8
      benchmark queries >= 0.45. A quantizer that scatters neighbors
      (garbage centroids, broken assignment) falls to ~nprobe/K = 0.25.
    - ``balance_ok``: max cell population <= 2x ceil(N/K). The degenerate
      quantizer that lumps everything into one cell scores recall 1.0 but
      fails here — together the booleans bound both failure directions.
    - ``n_returned_total`` = 40 exactly: probed cells must always contain
      enough candidates (a lost-cell regression shrinks result sets).

    Scale shape: training is outside the query path (sample once, fit
    once, broadcast forever); the search plan is identical to `ann_ivf_untrained_baseline`
    (narrow literal-array cell assignment, broadcast probe equi-join).
    The brute-force arm exists only to measure recall in the gate — a
    production pipeline runs it once per index build on a sample, not per
    query; the balance check is the one-shuffle groupBy(cid) any index
    build runs anyway to write its cell directory."""
    # r16: widen the single-split gate-scale scan (1.21x best-of-3; no-op
    # at scale). Training stays deterministic: the sample is orderBy'd
    # before its limit, so partitioning cannot reach the fit. r17
    # (ADVICE pattern): the training COLLECT runs on the RAW scan — on
    # the widened frame the TakeOrdered sample executed the round-robin
    # exchange as its own job; orderBy makes raw-vs-widened identical.
    raw = load(spark, sf_dir, "embeddings")
    e = widen_small_scan(raw)
    cents = _trained_centroids_cached(raw, sf_dir)
    # one set of per-centroid cosine SQL strings shared by the search AND
    # the balance arm: plan-BUILD time is linear in K x dim and constant in
    # data size — irrelevant at scale, but it dominates small-SF wall time
    # if duplicated (measured: build 4.3s vs exec 1.1s before sharing;
    # r16 moved the sharing from Column objects to SQL text so the K
    # cosines also COMPOSE into single F.expr calls downstream)
    cos_sqls = [_cos_to_cent_sql(cvals) for _, cvals in cents]
    # ONE cell-assignment frame feeds both the search and the balance arm —
    # the assignment is the K-cosines-per-row pass over the whole corpus,
    # and duplicating it doubles the dominant scan work
    cells = ivf_assign_cells(e, cents, cos_sqls=cos_sqls)
    ivf = ivf_search(
        e,
        cents,
        n_query=_IVF_NQUERY,
        nprobe=_IVF_TRAINED_NPROBE,
        topk=_IVF_TOPK,
        cos_sqls=cos_sqls,
        cells=cells,
    ).select("query_id", "neighbor_id")
    brute = ann_topk_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    per = ivf.join(
        brute.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    )
    search_agg = per.agg(
        F.count_distinct("query_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("n_returned_total"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
    )
    cell_agg = (
        cells
        .groupBy("cid")
        .count()
        .agg(
            F.max("count").alias("max_cell"),
            F.sum("count").alias("n_vectors"),
        )
    )
    min_hits = F.lit(_IVF_TRAINED_MIN_RECALL * _IVF_NQUERY * _IVF_TOPK)
    max_cell_ok = F.col("max_cell") <= F.lit(_IVF_TRAINED_BALANCE) * F.ceil(
        F.col("n_vectors") / F.lit(_IVF_TRAINED_K)
    )
    return search_agg.crossJoin(cell_agg).select(
        "n_queries",
        "n_returned_total",
        (F.col("n_hits") >= min_hits).alias("recall_ok"),
        max_cell_ok.alias("balance_ok"),
    )


#: fitted-quantizer memo for `ann_ivf_trained`: production trains ONCE per
#: index build and reuses the weights, so repeated invocations in a
#: long-lived session (bench reps, notebooks) should not re-collect and
#: re-fit. Keyed by (sf_dir, corpus size) — a different fixture path or a
#: grown corpus re-trains; the fit itself is deterministic (seeded, ordered
#: sample), so a reuse can never change gated values.
_TRAINED_CENTS_MEMO: dict = {}


def _trained_centroids_cached(e: DataFrame, sf_dir: str) -> list:
    # keyed by fixture path + K only: the fixture layout makes the path
    # unique per corpus, and a count()-based key would cost a full scan
    # job per invocation just to build the key
    key = (sf_dir, _IVF_TRAINED_K)
    cents = _TRAINED_CENTS_MEMO.get(key)
    if cents is None:
        cents = train_ivf_centroids(e, k=_IVF_TRAINED_K)
        _TRAINED_CENTS_MEMO.clear()  # hold one fit, not a history
        _TRAINED_CENTS_MEMO[key] = cents
    return cents


def train_ivf_centroids(
    embeddings: DataFrame, k: int = 8, sample_n: int = 10_000, iters: int = 10, seed: int = 11
) -> list:
    """Spherical k-means (Lloyd's on L2-normalized vectors, cosine
    assignment) over a deterministic sample, fit on the DRIVER in numpy —
    the quantizer is model weights, the same boundary as `ann_ivf_untrained_baseline`'s
    centroid collect; training is outside the query path at any scale
    (sample once, fit once, broadcast forever). Returns ``[(cid, vec)]``
    sorted by cid, plugging straight into `ivf_search`.

    The sample is ordered by ``vec_id`` before the limit so the fit is
    reproducible run-to-run (an unordered LIMIT has no determinism
    contract)."""
    import numpy as np

    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample_n)
        .collect()
    )
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return [(cid, [float(v) for v in cent[cid]]) for cid in range(k)]


def _quantized_dot_py(a, b, scale: float = 1_000_000_000.0) -> int:
    """Driver-side twin of functions.vector.quantized_dot for two KNOWN
    vectors (e.g. a centroid with itself): ``(x*y)*scale`` is the same
    left-to-right pair of IEEE double multiplications the JVM evaluates,
    and floor/int-sum are exact — so the result is bit-identical to the
    Column form, without building a 64-element fold expression."""
    import math

    return sum(int(math.floor(float(x) * float(y) * scale)) for x, y in zip(a, b))


def _cos_to_cent(vec_col, sq_col, cvals):
    """Quantized cosine of the frame's ``embedding``/``sq`` columns against
    ONE literal centroid — built as a single SQL string handed to one
    ``F.expr`` (r16, guide §1.2 per-task → driver work). The Column-algebra
    form cost ~700 py4j round trips PER CENTROID (element-wise ``F.lit``
    over the 64-float array plus two higher-order lambdas), so at K=16 the
    driver spent ~2.2s just BUILDING the assignment expressions — more
    than the query's whole execution (profiled on ann_ivf_trained: build
    2.6s vs exec 1.0s). The string is the IDENTICAL expression tree —
    ``aggregate(zip_with(...))`` quantized dot with ((x*y)*scale) ordering
    and FLOOR→BIGINT per term, sqrt-product guard, double-zero else — and
    literal doubles round-trip exactly through ``CAST('repr' AS DOUBLE)``.

    ``vec_col`` / ``sq_col`` are column NAMES (always "embedding" / "sq"
    at every call site); Columns are not accepted because the expression
    is assembled as text."""
    if not (isinstance(vec_col, str) and isinstance(sq_col, str)):
        raise TypeError("_cos_to_cent takes column NAMES (expression is built as SQL text)")
    return F.expr(_cos_to_cent_sql(cvals, vec_col, sq_col))


def _cos_to_cent_sql(cvals, vec: str = "embedding", sq: str = "sq") -> str:
    """The SQL TEXT behind `_cos_to_cent` — exposed so multi-centroid
    consumers (greatest-struct assignment, probe-struct arrays, classifier
    sweeps) can compose K cosines into ONE ``F.expr`` instead of K Column
    objects stitched together through K× more py4j calls."""
    csq = _quantized_dot_py(cvals, cvals)
    arr = "array(" + ",".join(
        f"CAST('{float(v)!r}' AS DOUBLE)" for v in cvals
    ) + ")"
    scale = "CAST('1000000000.0' AS DOUBLE)"
    dot = (
        f"aggregate(zip_with({vec}, {arr}, (x, y) -> "
        f"CAST(FLOOR((CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) * {scale}) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    den = f"(SQRT(CAST({sq} AS DOUBLE)) * SQRT(CAST({csq} AS DOUBLE)))"
    return (
        f"CASE WHEN {den} > 0 THEN CAST({dot} AS DOUBLE) / {den} "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )


#: above this K, cell assignment switches from the literal-expression arm
#: to the broadcast-join arm: K greatest-structs of 64-element folds grow
#: the codegen'd expression tree LINEARLY in K, and with `semdedup_k`
#: deriving K = N/64 the literal arm would hit compiler/driver limits at
#: ~100k-vector corpora (K in the thousands). Both arms are value-exact
#: twins (same quantized cosine spec, same (cos DESC, cid ASC) tie-break —
#: pinned by tests/test_ann_quality.py), so the threshold only picks the
#: PLAN: zero-shuffle narrow expression at small K, broadcast crossJoin +
#: map-side-combining max_by at large K (one vec_id exchange).
#:
#: r16 (guide §1.2 — per-task work after job shape): measured at K=31
#: (dedup_semantic, sf0.1) the literal arm's ~12k-node expression makes
#: analysis + codegen the dominant cost — best-of-3 8.0s literal vs 4.0s
#: join arm in one session. Threshold lowered 64 → 16 so K=31 rides the
#: join arm; at K ≤ 16 (the IVF demo quantizers) the literal arm's
#: zero-exchange plan still wins. `vector_semantic_decontaminate` keeps
#: its own 64 threshold (`_DECON_LITERAL_MAX_K`) — its suite is bounded
#: at 512 and its literal plan is pinned zero-exchange at small SF.
_IVF_LITERAL_MAX_K = 16

#: suite-size dispatch for `vector_semantic_decontaminate` — the r15
#: value, deliberately decoupled from `_IVF_LITERAL_MAX_K` (r16): the
#: decon suite is capped at 512 and the small-SF fixtures' literal plan
#: (zero exchanges) is pinned by tests/test_plan_audit.py.
_DECON_LITERAL_MAX_K = 64


def ivf_assign_cells(
    e: DataFrame,
    cents: list,
    cos_sqls: "list | None" = None,
    max_literal_k: "int | None" = None,
) -> DataFrame:
    """Nearest-centroid cell assignment ``(vec_id, embedding, sq, cid)``:
    max over K (cosine, -cid) structs built from literal centroid arrays —
    a NARROW column expression, zero shuffle, no crossJoin (the quantizer
    is a driver-side constant, like trained model weights). ``cos_sqls``
    lets a caller that already built the per-centroid cosine SQL strings
    (over ``embedding``/``sq`` — `_cos_to_cent_sql`) reuse them. The whole
    greatest-over-K-structs assignment is ONE ``F.expr`` (r16): the Column
    form cost ~40 py4j round trips per centroid on top of the per-cosine
    construction. Above ``max_literal_k`` centroids (default
    `_IVF_LITERAL_MAX_K`) the value-exact broadcast-join arm takes over —
    see the constant's note."""
    base = e.select(
        "vec_id", "embedding", _dot_q(F.col("embedding"), F.col("embedding")).alias("sq")
    )
    if max_literal_k is None:
        max_literal_k = _IVF_LITERAL_MAX_K
    if cos_sqls is None and len(cents) > max_literal_k:
        return _ivf_assign_cells_join(base, cents, e.sparkSession)
    if cos_sqls is None:
        cos_sqls = [_cos_to_cent_sql(cvals) for _, cvals in cents]
    structs = ", ".join(
        f"named_struct('cos', {cos}, 'ncid', {-cid})"
        for (cid, _), cos in zip(cents, cos_sqls)
    )
    return base.withColumn(
        "cid", F.expr(f"CAST(-(greatest({structs}).ncid) AS INT)")
    )


def _ivf_assign_cells_join(base: DataFrame, cents: list, spark) -> DataFrame:
    """Broadcast-join assignment arm for LARGE quantizers: K centroid rows
    ``(cid, ce array<double>, csq)`` broadcast against the corpus, best
    cell per vector via a map-side-combining ``max(struct(cos, -cid))``
    aggregate — the crossJoin's K rows per vector collapse locally, so the
    one exchange carries a single row per vector.

    Value parity with the literal arm is exact by construction: ``ce`` is
    stored as array<double> (the literal arm embeds double literals — a
    float column would silently narrow TRAINED centroids), the
    cosine is the same `quantized_dot`/`_safe_cosine` spec (element casts
    to double either way), ``csq`` is the same Python-computed
    `_quantized_dot_py`, and max(struct(cos, -cid)) is the same
    (cos DESC, cid ASC) tie-break as greatest over the literal structs."""
    rows = [
        (int(cid), [float(x) for x in cv], _quantized_dot_py(cv, cv))
        for cid, cv in cents
    ]
    cent_df = spark.createDataFrame(
        rows, "cid int, ce array<double>, csq bigint"
    ).limit(len(rows))  # fixed cardinality documented for the hint
    cos = _safe_cosine(
        _dot_q(F.col("embedding"), F.col("ce")), F.col("sq"), F.col("csq")
    )
    best = F.max(
        F.struct(cos.alias("cos"), (-F.col("cid")).cast("int").alias("ncid"))
    )
    return (
        base.crossJoin(F.broadcast(cent_df))
        .groupBy("vec_id")
        .agg(
            best.alias("m"),
            F.first("embedding").alias("embedding"),
            F.first("sq").alias("sq"),
        )
        .select(
            "vec_id",
            "embedding",
            "sq",
            (-F.col("m.ncid")).cast("int").alias("cid"),
        )
    )


def ivf_search(
    e: DataFrame,
    cents: list,
    n_query: int = _IVF_NQUERY,
    nprobe: int = _IVF_NPROBE,
    topk: int = _IVF_TOPK,
    query_ids: "list | None" = None,
    cos_sqls: "list | None" = None,
    cells: "DataFrame | None" = None,
) -> DataFrame:
    """IVF search against an arbitrary coarse quantizer ``[(cid, vec)]`` —
    the plan shape documented on `ann_ivf_untrained_baseline` (narrow literal-array cell
    assignment, broadcast probe equi-join on cid, windowed top-k).
    ``query_ids`` selects an explicit query set (default: vec_id < n_query,
    the registered-query spec); ``cos_sqls`` / ``cells`` let the caller
    share already-built per-centroid cosine SQL strings and the
    cell-assignment frame (see `ivf_assign_cells`)."""
    # per-centroid cosine SQL built ONCE and reused by both the cell
    # assignment and the probe ranking (driver-side plan-build cost is
    # linear in K x dim; duplicating it dominated wall time before)
    if cos_sqls is None:
        cos_sqls = [_cos_to_cent_sql(cvals) for _, cvals in cents]
    if cells is None:
        cells = ivf_assign_cells(e, cents, cos_sqls=cos_sqls)
    base = cells.drop("cid")

    # per-query probe list: rank the K cells per query (K rows per query —
    # tiny frame), keep nprobe
    if query_ids is not None:
        q = base.filter(F.col("vec_id").isin(list(query_ids)))
        n_query = len(query_ids)
    else:
        q = base.filter(F.col("vec_id") < n_query)
    probe_structs = ", ".join(
        f"named_struct('cid', {cid}, 'ccos', {cos})"
        for (cid, _), cos in zip(cents, cos_sqls)
    )
    probe_rows = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("sq").alias("qsq"),
        # ONE expr for the whole exploded probe-struct array (r16 — same
        # build-cost motivation as ivf_assign_cells)
        F.expr(f"explode(array({probe_structs}))").alias("pc"),
    ).select("query_id", "qe", "qsq", F.col("pc.cid").alias("cid"), F.col("pc.ccos").alias("ccos"))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cid")
    )
    # .limit is a semantic no-op (<= NQUERY*NPROBE rows by construction) but
    # makes the frame's fixed cardinality explicit in the logical plan,
    # which is what licenses the broadcast hint at any SF (plan-audit rule)
    probes = (
        probe_rows.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qe", "qsq", "cid")
        .limit(n_query * nprobe)
    )

    cand = F.broadcast(probes).join(
        cells, on="cid"
    ).filter(F.col("vec_id") != F.col("query_id"))
    cosine = _safe_cosine(
        _dot_q(F.col("qe"), F.col("embedding")), F.col("qsq"), F.col("sq")
    )
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cosine.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "hybrid_search",
    oracle=f"""
WITH keep AS (
  SELECT d.doc_id, d.lang, e.embedding,
    {_DOT_SQL.format(a="e.embedding", b="e.embedding")} AS sq
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
  WHERE d.n_chars BETWEEN 100 AND 20000
    AND length(string_split(d.text, ' ')) >= 10
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS qsq
  FROM embeddings WHERE vec_id < 4
),
scored AS (
  SELECT q.query_id, k.doc_id, k.lang,
    CASE WHEN (sqrt(CAST(q.qsq AS DOUBLE)) * sqrt(CAST(k.sq AS DOUBLE))) > 0
      THEN CAST({_DOT_SQL.format(a="q.qe", b="k.embedding")} AS DOUBLE) / (sqrt(CAST(q.qsq AS DOUBLE)) * sqrt(CAST(k.sq AS DOUBLE))) ELSE 0 END AS cosine
  FROM q CROSS JOIN keep k WHERE k.doc_id <> q.query_id
),
ranked AS (
  SELECT query_id, doc_id, lang, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, doc_id, lang, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
""",
    survey_ref="beyond-reference: hybrid retrieval (quality prefilter -> doc<->vector join -> top-k)",
)
def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the RAG-corpus pattern: documents pass a quality
    prefilter (length + token-count bounds — predicates that push into the
    parquet scan), join their embeddings on ``doc_id = vec_id`` (equi-join,
    AQE-chosen strategy), and only the surviving corpus is scored against
    the broadcast query vectors for top-3 cosine.

    Scale shape: the filter prunes BEFORE any vector math; the scored side
    is |filtered docs| x |queries| with the 4-query frame broadcast (LIMIT
    makes its fixed cardinality explicit); quantized dots keep scores
    hash-gateable."""
    d = load(spark, sf_dir, "documents").filter(
        (F.col("n_chars") >= 100)
        & (F.col("n_chars") <= 20000)
        & (F.size(F.split(F.col("text"), " ")) >= 10)
    )
    e = load(spark, sf_dir, "embeddings")
    keep = d.join(e, d["doc_id"] == e["vec_id"]).select(
        "doc_id",
        "lang",
        "embedding",
        _dot_q(F.col("embedding"), F.col("embedding")).alias("sq"),
    )
    q = (
        e.filter(F.col("vec_id") < 4)
        .limit(4)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            _dot_q(F.col("embedding"), F.col("embedding")).alias("qsq"),
        )
    )
    cosine = _safe_cosine(
        _dot_q(F.col("qe"), F.col("embedding")), F.col("qsq"), F.col("sq")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(keep)
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", "lang", cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "doc_id", "lang", "cosine", "rank")
    )


# --- r10: SemDeDup-style semantic dedup (cluster, then dedup within) -------
#
# Abbas et al. 2023 ("SemDeDup"): coarse-cluster the embedding space, then
# search for near-duplicates ONLY within each cluster — the cluster is the
# blocking key, the same pigeonhole role the LSH band plays in
# `dedup_embedding_cosine_scaled`, but derived from the data's own
# geometry, so semantically-redundant regions (not just hash-colliding
# ones) land in the same block. Keep-earliest within a cluster.
#
# CELL COUNT MUST GROW WITH CORPUS SIZE (VERDICT r10 "What's wrong" #1):
# at fixed K the expected in-cell candidate volume is O(N²/K) — quadratic
# at any K, the exact fixed-width failure mode `bits_for_corpus` retired
# for the hyperplane family in r6. K therefore derives from a corpus
# count: K = max(16, N // 64), the `bits_for_corpus` discipline restated
# for an integer cell count (expected cell ~64 vectors at ANY N, so the
# in-cell join costs ~N * 64 pairs regardless of corpus size). Both
# engines derive K from the SAME corpus count — Spark via df.count(),
# the oracle via a scalar subquery — so first-K centroid selection stays
# deterministic and the whole pass still replays value-for-value.
_SEMDEDUP_MIN_K = 16
_SEMDEDUP_TARGET_CELL = 64


def semdedup_k(n_vectors: int) -> int:
    """Cell count so the EXPECTED cell holds ~``_SEMDEDUP_TARGET_CELL``
    vectors: ``max(16, N // 64)`` — integer-exact in both engines (the
    oracle computes ``GREATEST(16, COUNT(*) // 64)`` over the same
    table)."""
    return max(_SEMDEDUP_MIN_K, n_vectors // _SEMDEDUP_TARGET_CELL)


#: oracle twin of `semdedup_k` as a scalar subquery over the corpus
_SEMDEDUP_K_SQL = (
    f"(SELECT GREATEST({_SEMDEDUP_MIN_K}, "
    f"COUNT(*) // {_SEMDEDUP_TARGET_CELL}) FROM embeddings)"
)
#: same near-dup operating point as `dedup_embedding_cosine_scaled` — the
#: two blockers are alternative candidate generators over ONE pair
#: predicate; a threshold drift between them would make their verdicts
#: incomparable.
_SEMDEDUP_TAU = 0.35


@register(
    "dedup_semantic",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS csq
  FROM embeddings WHERE vec_id < {_SEMDEDUP_K_SQL}
),
base AS (
  SELECT vec_id, embedding,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS sq
  FROM embeddings
),
assign AS (
  SELECT b.vec_id, b.embedding, b.sq, c.cid,
    ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
      {_IVF_COS.format(d=_DOT_SQL.format(a="b.embedding", b="c.ce"), sa="b.sq", sb="c.csq")} DESC,
      c.cid) AS rn
  FROM base b CROSS JOIN cents c
),
cells AS (SELECT vec_id, embedding, sq, cid FROM assign WHERE rn = 1),
pairs AS (
  SELECT b.vec_id AS vec_id, a.vec_id AS earlier,
    {_IVF_COS.format(d=_DOT_SQL.format(a="a.embedding", b="b.embedding"), sa="a.sq", sb="b.sq")} AS cos
  FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
),
drops AS (
  SELECT vec_id, MIN(earlier) AS rep_id, arg_min(cos, earlier) AS rep_cos
  FROM pairs WHERE cos >= {_SEMDEDUP_TAU} GROUP BY vec_id
)
SELECT c.vec_id, CAST(c.cid AS INT) AS cid,
  d.vec_id IS NULL AS keep, d.rep_id, d.rep_cos
FROM cells c LEFT JOIN drops d ON c.vec_id = d.vec_id
""",
    survey_ref=(
        "beyond-reference: SemDeDup-style semantic dedup — coarse k-means "
        "cells as the blocking key, cosine near-dup verdicts only within "
        "each cell, keep-earliest"
    ),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-shaped: every vector is assigned to its
    nearest coarse centroid (its *cell*), near-duplicate pairs
    (cosine >= {tau}) are searched ONLY within cells, and each vector
    keeps/drops by the keep-earliest rule — ``keep`` is false iff an
    earlier same-cell vector sits within the threshold, with ``rep_id``
    the earliest such representative and ``rep_cos`` the cosine to it.
    One row per corpus vector (survivor-verdict shape, like
    `dedup_exact`).

    The quantizer here is the first-K explicit baseline arm (the
    `ann_ivf_untrained_baseline` trick) so the WHOLE pass — assignment,
    in-cell pairing, verdicts — replays value-for-value in the DuckDB
    oracle; the production path swaps in `train_ivf_centroids` through
    the same `ivf_assign_cells` seam, and that quantizer's quality is
    gated separately by `ann_ivf_trained`'s recall/balance contract.

    100-TB shape: cell assignment is NARROW (greatest over K literal
    centroid structs — zero shuffle); candidates form only through the
    cid equi-join of the cell relation with itself (the blocking
    pigeonhole — no product join), so candidate volume is
    ~N * cell_size, bounded because K is DERIVED from a corpus count
    (``semdedup_k``: K = max(16, N // 64), the `bits_for_corpus`
    discipline — the expected cell stays ~64 vectors at any N, pinned by
    tests/test_ann_quality.py) and the quantizer's balance is the gated
    `balance_ok` contract; the verdict
    aggregate is a partial-aggregating groupBy (a hot cell partial-aggs
    map-side, never sorts in one task); the cell relation is persisted
    once and feeds both join sides plus the anchor (one assignment pass,
    not three)."""
    # r16: widen the single-split gate-scale scan — the K quantized
    # cosines per row were serializing on one task (1.22x best-of-3;
    # no-op at scale). The centroid collect is sorted(), order-insensitive.
    # r17 (ADVICE): the corpus count AND the centroid collect run on the
    # RAW scan — each driver action on the widened frame executed the
    # round-robin exchange as its own job; both are order-insensitive
    # (count; sorted() collect), so raw-vs-widened values are identical.
    raw = load(spark, sf_dir, "embeddings")
    e = widen_small_scan(raw)
    k = semdedup_k(raw.count())
    cents = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in raw.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    tagged = _semdedup_tagged_cells(ivf_assign_cells(e, cents)).persist()
    drops = (
        _semdedup_pairs(tagged)
        .filter(F.col("cos") >= _SEMDEDUP_TAU)
        .groupBy("vec_id")
        .agg(
            F.min("earlier").alias("rep_id"),
            F.min_by("cos", "earlier").alias("rep_cos"),
        )
    )
    out = (
        tagged.select("vec_id", "cid")
        .join(drops, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.col("rep_id").isNull().alias("keep"),
            "rep_id",
            "rep_cos",
        )
    )
    return owns_caches(out, tagged)


def _semdedup_tagged_cells(cells: DataFrame) -> DataFrame:
    """Cell assignment annotated with per-cell ``(occ, rep_id)`` via ONE
    unordered window over cid (the `_tagged_bands` trick). Only the
    SCALARS ride the window — carrying the representative's embedding in
    a min(struct) tag (the phash trick) doubles the persisted row width
    with a 64-float array and measurably slows the always-paid window;
    the hot arm instead joins the (normally EMPTY) hot-rep slice back for
    its embedding, so healthy corpora pay nothing."""
    from pyspark.sql import Window

    w = Window.partitionBy("cid")
    return cells.select(
        "vec_id",
        "embedding",
        "sq",
        "cid",
        F.count("*").over(w).alias("occ"),
        F.min("vec_id").over(w).alias("rep_id"),
    )


def _semdedup_pairs(tagged: DataFrame, cap: int | None = None) -> DataFrame:
    """In-cell candidate pairs ``(vec_id, earlier, cos)`` with HOT CELLS
    occupancy-capped (the VERDICT r10 phash/MinHash rule applied to the
    semantic blocker): identical or near-identical embeddings all land in
    one cell regardless of K, so a degenerate clique would cost O(occ²)
    in-cell pairs. Cells above ``cap`` (default `HOT_BUCKET_CAP`) emit
    star pairs against the cell representative (min vec_id; its embedding
    comes from the hot-rep slice join — see `_semdedup_tagged_cells` for
    why it does not ride the window). On the degenerate cliques that
    create hot cells this preserves the keep-earliest verdicts exactly —
    every member verifies against the clique minimum, which IS the
    min-earlier partner the uncapped join would pick; what degrades is
    partner choice inside heterogeneous pathological cells, only above
    the threshold. The cap never fires on the gate corpora (expected cell
    ~64 vectors by the `semdedup_k` sizing; hash gates stay bit-exact)."""
    from dblink_spark.queries.dedup import HOT_BUCKET_CAP

    if cap is None:
        cap = HOT_BUCKET_CAP
    cold = tagged.filter(F.col("occ") <= cap)
    a, b = cold.alias("a"), cold.alias("b")
    # eval_once on both arms (r16, guide §4.4): the caller's tau filter
    # pushes below the union and would re-evaluate each arm's quantized
    # cosine fold per in-cell candidate
    cos_cold = eval_once(_safe_cosine(
        _dot_q(F.col("a.embedding"), F.col("b.embedding")),
        F.col("a.sq"),
        F.col("b.sq"),
    ))
    pairs_cold = a.join(
        b,
        (F.col("a.cid") == F.col("b.cid"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("b.vec_id").alias("vec_id"),
        F.col("a.vec_id").alias("earlier"),
        cos_cold.alias("cos"),
    )
    # rep_id = min(vec_id) < member vec_id, so 'earlier' keeps its
    # meaning; the tau verify still applies downstream. The rep's
    # embedding comes from a cid join against the hot-REP slice — a
    # relation with one row per HOT cell, i.e. empty unless the cap
    # fired, so the healthy-corpus cost of this arm is ~zero.
    hot = tagged.filter(
        (F.col("occ") > cap) & (F.col("vec_id") != F.col("rep_id"))
    )
    reps = tagged.filter(
        (F.col("occ") > cap) & (F.col("vec_id") == F.col("rep_id"))
    ).select(
        "cid",
        F.col("embedding").alias("rep_embedding"),
        F.col("sq").alias("rep_sq"),
    )
    cos_hot = eval_once(_safe_cosine(
        _dot_q(F.col("rep_embedding"), F.col("embedding")),
        F.col("rep_sq"),
        F.col("sq"),
    ))
    pairs_hot = hot.join(reps, "cid").select(
        "vec_id", F.col("rep_id").alias("earlier"), cos_hot.alias("cos")
    )
    return pairs_cold.unionAll(pairs_hot)


dedup_semantic.__doc__ = dedup_semantic.__doc__.format(tau=_SEMDEDUP_TAU)


# --- r10: nearest-centroid classifier (model-based curation filter) --------
#
# The fastText/DCLM-style "model-based filtering" shape: fit a tiny linear
# model, score every document's embedding, keep/flag by prediction. The
# model here is a nearest-centroid (Rocchio) classifier over the labeled
# embeddings — per-label mean vectors, cosine assignment — because its fit
# is ONE exact distributed aggregation, so the oracle replays training AND
# inference value-for-value (a gradient fit cannot be SQL-replayed).
#
# Exactness: per-(label, dim) sums are over floor(x * 1e6) BIGINTs (exact,
# order-independent); the mean CAST(sum AS DOUBLE) / n is one IEEE division
# both engines round identically; scoring then rides the module's quantized
# -dot cosine spec. Scale note: the quantized per-dim sum stays inside
# BIGINT up to ~9e12 members per label (|q| <= ~1e6 for unit-range dims).
_CLS_QSCALE = 1_000_000.0


@register(
    "vector_centroid_classifier",
    oracle=f"""
WITH dims AS (
  SELECT label, unnest(range(len(embedding))) AS pos,
    unnest(embedding) AS val
  FROM embeddings
),
sums AS (
  SELECT label, pos,
    SUM(CAST(FLOOR(CAST(val AS DOUBLE) * {_CLS_QSCALE}) AS BIGINT)) AS s,
    COUNT(*) AS n
  FROM dims GROUP BY label, pos
),
cents AS (
  SELECT label AS clabel,
    list(CAST(s AS DOUBLE) / n / {_CLS_QSCALE} ORDER BY pos) AS ce
  FROM sums GROUP BY label
),
csq AS (
  SELECT clabel, ce, {_DOT_SQL.format(a="ce", b="ce")} AS cs FROM cents
),
base AS (
  SELECT vec_id, label, embedding,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS sq
  FROM embeddings
),
scored AS (
  SELECT b.vec_id, b.label, c.clabel,
    {_IVF_COS.format(d=_DOT_SQL.format(a="b.embedding", b="c.ce"), sa="b.sq", sb="c.cs")} AS cos,
    ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
      {_IVF_COS.format(d=_DOT_SQL.format(a="b.embedding", b="c.ce"), sa="b.sq", sb="c.cs")} DESC,
      c.clabel) AS rn
  FROM base b CROSS JOIN csq c
)
SELECT vec_id, label, CAST(clabel AS INT) AS pred_label, cos AS conf,
  label = clabel AS label_consistent
FROM scored WHERE rn = 1
""",
    survey_ref=(
        "beyond-reference: nearest-centroid classifier over embeddings — "
        "model-based curation filtering with an exactly-replayable "
        "distributed fit"
    ),
)
def vector_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based curation filter: fit a nearest-centroid classifier on
    the labeled embeddings (per-label mean vector), then classify every
    vector by cosine to the centroids — emitting ``pred_label``, the
    confidence ``conf``, and ``label_consistent`` (prediction agrees with
    the declared label; the docs a curation pass keeps/flags). One row per
    corpus vector.

    100-TB shape: the FIT is one exact distributed aggregation —
    posexplode to (label, dim, quantized value) partial-aggregates
    map-side down to labels x dims groups (640 here), so the shuffle
    carries group sums, never rows; the 640 fitted weights collect at the
    model-weights boundary (same seam as `train_ivf_centroids`) and
    broadcast as literal arrays; INFERENCE is then a NARROW pass —
    greatest over per-centroid cosine structs inside whole-stage codegen,
    zero shuffle, no join — so scoring cost is one scan regardless of
    corpus size."""
    e = load(spark, sf_dir, "embeddings")
    q = F.floor(F.col("val").cast("double") * F.lit(_CLS_QSCALE)).cast("bigint")
    sums = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.sum(q).alias("s"), F.count("*").alias("n"))
        .collect()
    )
    by_label: dict = {}
    for r in sums:
        # descale back to original units AFTER the mean — the division
        # order (sum / n, then / scale) must match the oracle's so both
        # engines round the same two IEEE divisions
        by_label.setdefault(r["label"], {})[r["pos"]] = (
            float(r["s"]) / r["n"] / _CLS_QSCALE
        )
    cents = sorted(
        (int(lbl), [dims[p] for p in sorted(dims)])
        for lbl, dims in by_label.items()
    )
    base = e.select(
        "vec_id",
        "label",
        "embedding",
        _dot_q(F.col("embedding"), F.col("embedding")).alias("sq"),
    )
    # ONE expr for the whole greatest-struct sweep (r16 — build-cost cut,
    # same expression tree as the former per-label F.struct chain)
    best = F.expr(
        "greatest(" + ", ".join(
            f"named_struct('cos', {_cos_to_cent_sql(cvals)}, 'nlbl', {-lbl})"
            for lbl, cvals in cents
        ) + ")"
    )
    return base.select(
        "vec_id",
        "label",
        (-best.getField("nlbl")).cast("int").alias("pred_label"),
        best.getField("cos").alias("conf"),
        (F.col("label") == (-best.getField("nlbl"))).alias("label_consistent"),
    )


# --- r11: classifier HOLDOUT contract (VERDICT r10 "What's missing" #5) ----
#
# `vector_centroid_classifier` fits and scores on the same rows; the
# production question is generalization, and the production failure is
# LEAKAGE (valid rows reaching the fit). This entry fits the same
# exact-integer Rocchio model on a deterministic hash-keyed TRAIN stratum
# (the q_docs_sample_split discipline, 25% valid) and scores the whole
# corpus in one narrow pass, emitting per-label train/valid accuracy plus
# two corpus-level contract booleans (the ann_ivf_trained
# contract-as-data pattern):
# - fit_ok:  train accuracy >= 2x chance. The fixture labels are
#   independent of the embeddings, so a real fit shows up as pure
#   MEMORIZATION (measured: train ~0.45 vs chance 0.1); a broken fit
#   (zeroed sums, wrong label mapping) collapses to chance.
# - leak_ok: valid accuracy <= chance + 5 sd (binomial). Labels being
#   unlearnable is exactly what makes this a leakage canary: the ONLY way
#   holdout accuracy can leave the chance band upward is valid rows
#   having reached the fit (they'd be memorized at ~0.45).
# On a production corpus with learnable labels, valid_acc is the number a
# curation pass reads off; the two booleans stay the wiring contract.
_HOLDOUT_SALT = "clsholdout|"
_HOLDOUT_VALID_THR = "40000000"  # top 25% of the 32-bit key space


@register(
    "vector_classifier_holdout",
    oracle=f"""
WITH keyed AS (
  SELECT vec_id, label, embedding,
    substr(md5('{_HOLDOUT_SALT}' || CAST(vec_id AS VARCHAR)), 1, 8) AS k
  FROM embeddings
),
tr AS (SELECT * FROM keyed WHERE k >= '{_HOLDOUT_VALID_THR}'),
dims AS (
  SELECT label, unnest(range(len(embedding))) AS pos,
    unnest(embedding) AS val
  FROM tr
),
sums AS (
  SELECT label, pos,
    SUM(CAST(FLOOR(CAST(val AS DOUBLE) * {_CLS_QSCALE}) AS BIGINT)) AS s,
    COUNT(*) AS n
  FROM dims GROUP BY label, pos
),
cents AS (
  SELECT label AS clabel,
    list(CAST(s AS DOUBLE) / n / {_CLS_QSCALE} ORDER BY pos) AS ce
  FROM sums GROUP BY label
),
csq AS (
  SELECT clabel, ce, {_DOT_SQL.format(a="ce", b="ce")} AS cs FROM cents
),
nl AS (SELECT COUNT(*) AS n_labels FROM csq),
base AS (
  SELECT vec_id, label, k, embedding,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS sq
  FROM keyed
),
sc AS (
  SELECT b.vec_id, b.label, b.k, c.clabel,
    ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
      {_IVF_COS.format(d=_DOT_SQL.format(a="b.embedding", b="c.ce"), sa="b.sq", sb="c.cs")} DESC,
      c.clabel) AS rn
  FROM base b CROSS JOIN csq c
),
pred AS (SELECT label, k, clabel AS pred_label FROM sc WHERE rn = 1),
per AS (
  SELECT label,
    SUM(CASE WHEN k >= '{_HOLDOUT_VALID_THR}' THEN 1 ELSE 0 END) AS n_train,
    SUM(CASE WHEN k < '{_HOLDOUT_VALID_THR}' THEN 1 ELSE 0 END) AS n_valid,
    SUM(CASE WHEN k >= '{_HOLDOUT_VALID_THR}' AND pred_label = label
        THEN 1 ELSE 0 END) AS n_correct_train,
    SUM(CASE WHEN k < '{_HOLDOUT_VALID_THR}' AND pred_label = label
        THEN 1 ELSE 0 END) AS n_correct_valid
  FROM pred GROUP BY label
),
tot AS (
  SELECT SUM(n_train) AS t_n, SUM(n_correct_train) AS t_c,
    SUM(n_valid) AS v_n, SUM(n_correct_valid) AS v_c
  FROM per
)
SELECT p.label,
  CAST(p.n_train AS BIGINT) AS n_train,
  CAST(p.n_valid AS BIGINT) AS n_valid,
  CAST(p.n_correct_train AS BIGINT) AS n_correct_train,
  CAST(p.n_correct_valid AS BIGINT) AS n_correct_valid,
  CASE WHEN p.n_train > 0
    THEN CAST(p.n_correct_train AS DOUBLE) / p.n_train END AS train_acc,
  CASE WHEN p.n_valid > 0
    THEN CAST(p.n_correct_valid AS DOUBLE) / p.n_valid END AS valid_acc,
  1.0 / nl.n_labels AS chance_acc,
  COALESCE(CAST(t.t_c AS DOUBLE) / NULLIF(t.t_n, 0)
    >= 2.0 / nl.n_labels, FALSE) AS fit_ok,
  COALESCE(CAST(t.v_c AS DOUBLE) / NULLIF(t.v_n, 0)
    <= 1.0 / nl.n_labels + 5.0 * sqrt(
      ((1.0 / nl.n_labels) * (1.0 - 1.0 / nl.n_labels)) / t.v_n),
    TRUE) AS leak_ok
FROM per p CROSS JOIN tot t CROSS JOIN nl
""",
    survey_ref=(
        "beyond-reference: holdout contract for the model-based curation "
        "classifier — hash-keyed train/valid split, fit on train only, "
        "per-label generalization accuracy, memorization + leakage "
        "contract booleans"
    ),
)
def vector_classifier_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier with a HOLDOUT discipline: a
    deterministic hash split (salt-domain-separated md5 over vec_id, 25%
    valid — the `q_docs_sample_split` mechanism) partitions the corpus;
    the exact-integer Rocchio fit sees ONLY the train stratum; one narrow
    inference pass scores every row; the result is one row per label with
    train/valid counts and accuracies plus two corpus-level contract
    booleans — ``fit_ok`` (train accuracy >= 2x chance: the fit
    memorizes, so it is real) and ``leak_ok`` (valid accuracy inside the
    binomial chance band: the fit never saw valid rows — a leak would be
    memorized and blow the band upward). Both engines replay fit AND
    inference value-for-value.

    100-TB shape: split membership is a row-local hash compare (no
    coordination); the fit is the same map-side-combining labels x dims
    aggregation as `vector_centroid_classifier` with the train filter
    pushed below it; inference is zero-exchange (greatest over literal
    broadcast weights); the per-label rollup partial-aggregates to L
    groups, and the corpus-level contract row is a broadcast of ONE
    summary row back onto L label rows."""
    e = load(spark, sf_dir, "embeddings")
    key = F.substring(
        F.md5(F.concat(F.lit(_HOLDOUT_SALT), F.col("vec_id").cast("string"))),
        1,
        8,
    )
    keyed = e.select("vec_id", "label", "embedding", key.alias("k"))
    tr = keyed.filter(F.col("k") >= _HOLDOUT_VALID_THR)
    q = F.floor(F.col("val").cast("double") * F.lit(_CLS_QSCALE)).cast("bigint")
    sums = (
        tr.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.sum(q).alias("s"), F.count("*").alias("n"))
        .collect()
    )
    by_label: dict = {}
    for r in sums:
        by_label.setdefault(r["label"], {})[r["pos"]] = (
            float(r["s"]) / r["n"] / _CLS_QSCALE
        )
    cents = sorted(
        (int(lbl), [dims[p] for p in sorted(dims)])
        for lbl, dims in by_label.items()
    )
    if not cents:
        raise ValueError(
            "vector_classifier_holdout: train stratum is empty — no model"
        )
    n_labels = len(cents)
    base = keyed.select(
        "label",
        "k",
        "embedding",
        _dot_q(F.col("embedding"), F.col("embedding")).alias("sq"),
    )
    structs = [
        f"named_struct('cos', {_cos_to_cent_sql(cvals)}, 'nlbl', {-lbl})"
        for lbl, cvals in cents
    ]
    # ONE expr for the sweep (r16 — build-cost cut, identical tree)
    best = F.expr(
        f"greatest({', '.join(structs)})" if len(structs) > 1 else structs[0]
    )
    is_train = F.col("k") >= _HOLDOUT_VALID_THR
    hit = F.col("pred_label") == F.col("label")
    per = (
        base.select(
            "label", "k", (-best.getField("nlbl")).cast("int").alias("pred_label")
        )
        .groupBy("label")
        .agg(
            F.sum(F.when(is_train, 1).otherwise(0)).cast("long").alias("n_train"),
            F.sum(F.when(~is_train, 1).otherwise(0)).cast("long").alias("n_valid"),
            F.sum(F.when(is_train & hit, 1).otherwise(0))
            .cast("long")
            .alias("n_correct_train"),
            F.sum(F.when((~is_train) & hit, 1).otherwise(0))
            .cast("long")
            .alias("n_correct_valid"),
        )
    )
    # ONE corpus-level summary row broadcast back onto the L label rows;
    # .limit(1) documents the fixed cardinality (broadcast-hint discipline)
    tot = (
        per.groupBy()
        .agg(
            F.sum("n_train").alias("t_n"),
            F.sum("n_correct_train").alias("t_c"),
            F.sum("n_valid").alias("v_n"),
            F.sum("n_correct_valid").alias("v_c"),
        )
        .limit(1)
    )
    p = 1.0 / n_labels
    band = F.lit(p) + F.lit(5.0) * F.sqrt(
        F.lit(p * (1.0 - p)) / F.col("v_n").cast("double")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "label",
        "n_train",
        "n_valid",
        "n_correct_train",
        "n_correct_valid",
        F.when(
            F.col("n_train") > 0,
            F.col("n_correct_train").cast("double") / F.col("n_train"),
        ).alias("train_acc"),
        F.when(
            F.col("n_valid") > 0,
            F.col("n_correct_valid").cast("double") / F.col("n_valid"),
        ).alias("valid_acc"),
        F.lit(p).alias("chance_acc"),
        F.coalesce(
            F.col("t_c").cast("double") / F.nullif(F.col("t_n"), F.lit(0))
            >= F.lit(2.0 / n_labels),
            F.lit(False),
        ).alias("fit_ok"),
        F.coalesce(
            F.col("v_c").cast("double") / F.nullif(F.col("v_n"), F.lit(0))
            <= band,
            F.lit(True),
        ).alias("leak_ok"),
    )


# --- r10: embedding outlier filter (exact z-score on quantized norms) ------
#
# Corpus-hygiene pass over the embedding table: flag vectors whose squared
# norm sits far outside their label's distribution (corrupt encodes,
# zeroed rows, scale bugs — the standard pre-index sanity filter). The
# per-label moments are EXACT (BIGINT/DECIMAL sums of the quantized
# squared norm), and the verdict compares dev^2 > K^2 * var through an
# identical sequence of IEEE double operations in both engines, so the
# flag is engine-exact without ever evaluating a square root.
#
# Norms are quantized at 1e6 (not the module's 1e9 dot scale). TWO bounds
# govern exactness (VERDICT r10 nit 4):
# - PER-ROW: the second moment squares sq BEFORE the DECIMAL cast, so each
#   row needs sq <= floor(sqrt(2^63-1)) ~ 3.04e9 — i.e. a squared norm up
#   to ~3e3 at the 1e6 scale (fixtures: sq <= ~6.4e7, norm^2 <= 64, three
#   orders inside). Spark's BIGINT multiply WRAPS silently on overflow
#   while DuckDB errors, so the Spark side guards the bound with
#   raise_error — a corpus outside it fails loudly on both engines
#   instead of hash-diverging.
# - PER-LABEL SUM: the DECIMAL(38,0) accumulators then keep ~1e12 rows of
#   headroom per label for the sum of squares.
_OUT_QSCALE = 1_000_000.0
_OUT_K2 = 4.0  # flag beyond 2 standard deviations
_OUT_SQ_MAX = 3_037_000_499  # floor(sqrt(2^63 - 1)): sq*sq stays in BIGINT


@register(
    "vector_outlier_filter",
    oracle=f"""
WITH base AS (
  SELECT vec_id, label,
    list_sum(list_transform(embedding,
      x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * {_OUT_QSCALE}) AS BIGINT)
    )) AS sq
  FROM embeddings
),
mom AS (
  SELECT label, COUNT(*) AS n_label,
    CAST(SUM(sq) AS DOUBLE) AS s1d,
    CAST(SUM(sq * sq) AS DOUBLE) AS s2d
  FROM base GROUP BY label
)
SELECT b.vec_id, b.label, CAST(b.sq AS BIGINT) AS sq,
  CAST(m.n_label AS BIGINT) AS n_label,
  m.s1d / m.n_label AS label_mean,
  m.s2d / m.n_label - (m.s1d / m.n_label) * (m.s1d / m.n_label) AS label_var,
  (CAST(b.sq AS DOUBLE) - m.s1d / m.n_label)
    * (CAST(b.sq AS DOUBLE) - m.s1d / m.n_label)
    > {_OUT_K2} * (m.s2d / m.n_label - (m.s1d / m.n_label) * (m.s1d / m.n_label))
    AS is_outlier
FROM base b JOIN mom m USING (label)
""",
    survey_ref=(
        "beyond-reference: embedding outlier filter — per-label exact "
        "moments over quantized squared norms, z-score verdict without "
        "evaluating sqrt"
    ),
)
def vector_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag embedding outliers per label: ``is_outlier`` is true iff the
    vector's quantized squared norm deviates from its label's mean by
    more than 2 standard deviations — computed as
    ``dev^2 > 4 * var`` so no square root is evaluated. One verdict row
    per corpus vector with the label's (n, mean, var) carried for audit.

    100-TB shape: the squared norm is a row-local fold (zip-free
    transform+sum inside codegen, zero Python); the moments groupBy
    partial-aggregates to #labels groups — the shuffle carries (label,
    n, sum, sum-of-squares) per task, never vectors; the base relation
    is persisted once and feeds both the moments pass and the verdict
    join (plan-pinned single scan), and the #labels-sized moments side
    broadcasts at runtime via AQE. Sums go through DECIMAL(38) so the
    moments stay exact to ~1e12 vectors per label before the one
    double conversion both engines round identically."""
    e = load(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        "label",
        _dot_q(
            F.col("embedding"), F.col("embedding"), scale=_OUT_QSCALE
        ).alias("sq"),
    ).persist()
    # fail-loud bound check: sq*sq below is BIGINT x BIGINT and Spark WRAPS
    # on overflow (DuckDB errors) — guard so an out-of-contract corpus
    # (norm^2 > ~3e3) fails identically on both engines (_OUT_SQ_MAX note)
    sq_guarded = F.when(
        F.col("sq") > F.lit(_OUT_SQ_MAX),
        F.raise_error(
            "vector_outlier_filter: quantized squared norm exceeds the "
            "BIGINT-safe square bound (~3.04e9) — raise the moment "
            "arithmetic to DECIMAL before squaring for this corpus"
        ).cast("bigint"),
    ).otherwise(F.col("sq"))
    mom = base.groupBy("label").agg(
        F.count("*").alias("n_label"),
        F.sum(F.col("sq").cast("decimal(38,0)")).cast("double").alias("s1d"),
        F.sum((sq_guarded * sq_guarded).cast("decimal(38,0)"))
        .cast("double")
        .alias("s2d"),
    )
    mean = F.col("s1d") / F.col("n_label")
    var = F.col("s2d") / F.col("n_label") - mean * mean
    dev = F.col("sq").cast("double") - mean
    out = base.join(mom, "label").select(
        "vec_id",
        "label",
        F.col("sq").cast("bigint").alias("sq"),
        F.col("n_label").cast("bigint").alias("n_label"),
        mean.alias("label_mean"),
        var.alias("label_var"),
        (dev * dev > _OUT_K2 * var).alias("is_outlier"),
    )
    return owns_caches(out, base)


# --- r11: semantic decontamination (eval-suite embedding sweep) -------------

#: eval-suite membership: every 25th vec_id, CAPPED at the first 512 eval
#: slots — the cap is inert on every gate corpus (max eval id here is well
#: under 12800) but bounds the driver-side collect by a CONSTANT at any
#: corpus size: an eval suite is a small external artifact by definition,
#: and the cap is what keeps that assumption structural rather than hoped.
_DECON_EVAL_MOD = 25
_DECON_EVAL_CAP_ID = _DECON_EVAL_MOD * 512
_DECON_TAU = 0.35
_DECON_EVAL_SQL = (
    f"(vec_id % {_DECON_EVAL_MOD} = 0 AND vec_id < {_DECON_EVAL_CAP_ID})"
)


def decon_best_literal(evals: list):
    """The literal-arm sweep as ONE shared Column: max (cosine, -eval_id)
    struct over the baked eval-suite literals, evaluated against the
    frame's `embedding`/`sq` columns. A pure narrow expression — zero
    shuffle, zero state — which is exactly what makes the STREAMING twin
    (`streaming.events.semantic_decon_stream`) legal in any output mode;
    batch and stream consume this same spec so they cannot disagree on a
    verdict."""
    structs = [
        f"named_struct('cos', {_cos_to_cent_sql(vec)}, 'neid', {-eid})"
        for eid, vec in evals
    ]
    # greatest requires >= 2 args (ADVICE r11) — a 1-vector eval suite is
    # legal (same guard as vector_centroid_classifier), an empty one is a
    # caller error worth naming rather than a parse blowup.
    if not structs:
        raise ValueError(
            "decon_best_literal: empty eval suite — nothing to sweep"
        )
    return F.expr(
        f"greatest({', '.join(structs)})" if len(structs) > 1 else structs[0]
    )



@register(
    "vector_semantic_decontaminate",
    oracle=f"""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding AS ee,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS csq
  FROM embeddings WHERE {_DECON_EVAL_SQL}
),
corpus AS (
  SELECT vec_id, label, embedding,
    {_DOT_SQL.format(a="embedding", b="embedding")} AS sq
  FROM embeddings WHERE NOT {_DECON_EVAL_SQL}
),
scored AS (
  SELECT c.vec_id, c.label, e.eval_id,
    {_IVF_COS.format(d=_DOT_SQL.format(a="c.embedding", b="e.ee"), sa="c.sq", sb="e.csq")} AS cos,
    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      {_IVF_COS.format(d=_DOT_SQL.format(a="c.embedding", b="e.ee"), sa="c.sq", sb="e.csq")} DESC,
      e.eval_id ASC) AS rn
  FROM corpus c CROSS JOIN ev e
)
SELECT vec_id, label, eval_id, cos AS cosine
FROM scored WHERE rn = 1 AND cos >= {_DECON_TAU}
""",
    survey_ref=(
        "beyond-reference: SEMANTIC decontamination — corpus embeddings "
        "swept against a broadcast eval-suite, the embedding-space twin "
        "of text_decontaminate"
    ),
)
def vector_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination: flag corpus vectors whose best
    cosine against ANY eval-suite embedding reaches τ — the
    embedding-space twin of the 8-gram `text_decontaminate` pass
    (paraphrased leaks don't share grams but do share neighborhoods).
    Emits only the flagged rows with their best-matching eval id and the
    exact cosine (ties broken eval_id-ascending in both engines).

    100-TB shape: the eval suite is a driver-side CONSTANT (bounded ≤512
    by the membership rule, like trained centroids or classifier
    weights), so the corpus never joins another corpus-sized relation.
    Two value-exact arms share the quantized-cosine spec, dispatched on
    suite size exactly like `ivf_assign_cells`: up to
    `_DECON_LITERAL_MAX_K` (64) eval vectors bake into a
    zero-exchange greatest-over-structs
    narrow expression (sf0.001/sf0.01 take this arm); above that, K
    broadcast eval rows crossJoin the corpus and collapse under a
    map-side-combining max(struct(cos, -eval_id)) — ONE vec_id exchange
    total (sf0.1 takes this arm, so both plans stay gate-exercised). The
    Δ-sized flagged output is the only thing downstream ever sees."""
    # r16: widen the single-split gate-scale scan — the suite-sized
    # greatest-over-structs sweep was serializing on one task (2.37x
    # best-of-3). The literal arm's zero-EXCHANGE claim is a 100-TB
    # property: above cores×maxPartitionBytes the widen is a no-op and
    # the plan is exchange-free again (test_plan_audit pins the widened
    # small-SF shape as ≤ 1 round-robin exchange, no join/agg exchange).
    # r17 (ADVICE pattern): the eval-row COLLECT runs on the RAW scan —
    # on the widened frame it executed the round-robin exchange as its
    # own job; the list is .sort()ed, so the values are order-insensitive.
    raw = load(spark, sf_dir, "embeddings")
    e = widen_small_scan(raw)
    is_eval = (F.col("vec_id") % _DECON_EVAL_MOD == 0) & (
        F.col("vec_id") < _DECON_EVAL_CAP_ID
    )
    evals = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in raw.filter(is_eval).select("vec_id", "embedding").collect()
    ]
    evals.sort()
    corpus = e.filter(~is_eval).select(
        "vec_id",
        "label",
        "embedding",
        _dot_q(F.col("embedding"), F.col("embedding")).alias("sq"),
    )
    if len(evals) <= _DECON_LITERAL_MAX_K:
        best = corpus.select(
            "vec_id", "label", decon_best_literal(evals).alias("m")
        )
    else:
        rows = [
            (eid, vec, _quantized_dot_py(vec, vec)) for eid, vec in evals
        ]
        ev_df = spark.createDataFrame(
            rows, "eval_id int, ee array<double>, csq bigint"
        ).limit(len(rows))  # fixed cardinality documented for the hint
        cos = _safe_cosine(
            _dot_q(F.col("embedding"), F.col("ee")), F.col("sq"), F.col("csq")
        )
        best = (
            corpus.crossJoin(F.broadcast(ev_df))
            .groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(
                        cos.alias("cos"),
                        (-F.col("eval_id")).cast("int").alias("neid"),
                    )
                ).alias("m"),
                F.first("label").alias("label"),
            )
            .select("vec_id", "label", "m")
        )
    return best.filter(F.col("m.cos") >= F.lit(_DECON_TAU)).select(
        "vec_id",
        "label",
        (-F.col("m.neid")).cast("bigint").alias("eval_id"),
        F.col("m.cos").alias("cosine"),
    )
