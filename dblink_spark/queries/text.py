"""Text-analysis operators over `documents` — language ID (stopword
heuristic), quality scoring, token counting, fingerprinting. Beyond-reference
pipeline family; everything is built-in string functions (JVM-side, no UDFs)
with an exactly-mirroring DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from dblink_spark.queries import load, owns_caches, register, widen_small_scan

_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "on"]


@register(
    "text_token_count",
    oracle="""
SELECT lang, source, COUNT(*) AS n_docs,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM documents GROUP BY lang, source
""",
    survey_ref="beyond-reference: token counting (whitespace tokenizer)",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts per (lang, source) corpus slice."""
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum(toks).cast("double") / F.count("*")).alias("avg_tokens"),
    )


# GPT-2-style pre-tokenizer regex, restricted to constructs Java regex and
# DuckDB's RE2 evaluate IDENTICALLY: ASCII classes only (unicode property
# classes differ between engines; even \s differs — Java includes \x0B,
# RE2 does not — so whitespace is an explicit class), no lookarounds,
# alternation ordered longest-first so contractions win over letter runs.
# Non-ASCII codepoints fall into the punctuation-run class in both engines
# (each matches per codepoint on BMP text).
_BPE_REGEX = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^A-Za-z0-9 \t\n\f\r]+|[ \t\n\f\r]+"
)
#: SQL-quoted twin (apostrophes doubled for the single-quoted literal)
_BPE_REGEX_SQL = _BPE_REGEX.replace("'", "''")


@register(
    "text_token_count_bpe",
    oracle=f"""
SELECT lang, source, COUNT(*) AS n_docs,
  CAST(SUM(len(regexp_extract_all(text, '{_BPE_REGEX_SQL}'))) AS BIGINT)
    AS total_bpe_tokens,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
  CAST(SUM(len(regexp_extract_all(text, '{_BPE_REGEX_SQL}'))) AS DOUBLE)
    / SUM(len(string_split(text, ' '))) AS bpe_per_ws_token
FROM documents GROUP BY lang, source
""",
    survey_ref="beyond-reference: token counting (BPE-style pre-tokenizer regex) — the token-budget estimator a training pipeline runs corpus-wide",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style token counts per (lang, source): the GPT-2 pre-tokenizer
    split (contractions | space-prefixed letter runs | digit runs |
    punctuation runs | whitespace runs) counts the units a byte-pair
    encoder would start from — a far better token-budget estimate than
    whitespace words (emitted alongside as the ratio).

    100-TB shape: one `regexp_extract_all` + `size` per row inside
    whole-stage codegen (no UDF, no explode — counting never materializes
    the token array per row beyond the expression), then an ordinary
    partial-aggregated groupBy. The regex is ASCII-class-only so Spark
    (Java regex) and the DuckDB oracle (RE2) agree codepoint-for-codepoint;
    the edge corpus (unicode, digit-leads, empty docs) pins that."""
    d = load(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_REGEX), F.lit(0)))
    ws = F.size(F.split("text", " "))
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(bpe).cast("bigint").alias("total_bpe_tokens"),
        F.sum(ws).cast("bigint").alias("total_ws_tokens"),
        (F.sum(bpe).cast("double") / F.sum(ws)).alias("bpe_per_ws_token"),
    )


@register(
    "text_quality_score",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, lang,
    len(string_split(text, ' ')) AS n_tokens,
    length(text) AS n_chars_m,
    len(list_filter(string_split(text, ' '),
        x -> x IN ({", ".join("'" + w + "'" for w in _STOPWORDS)}))) AS n_stop
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
  CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
  CAST(n_chars_m AS DOUBLE) / n_tokens AS avg_token_len,
  (CASE WHEN n_tokens >= 10 THEN 0.5 ELSE 0.0 END)
    + (CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.05 THEN 0.3 ELSE 0.0 END)
    + (CASE WHEN CAST(n_chars_m AS DOUBLE) / n_tokens BETWEEN 3.0 AND 12.0 THEN 0.2 ELSE 0.0 END)
    AS quality_score
FROM feats WHERE n_tokens > 0
""",
    survey_ref="beyond-reference: quality scoring (length/stopword heuristics)",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based document quality score from cheap features (the
    Gopher/C4-style filter shape): token count, stopword ratio, mean token
    length — all whole-stage-codegen expressions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    feats = d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_m"),
        n_stop.alias("n_stop"),
    ).filter("n_tokens > 0")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    avg_len = F.col("n_chars_m").cast("double") / F.col("n_tokens")
    score = (
        F.when(F.col("n_tokens") >= 10, 0.5).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.3).otherwise(0.0)
        + F.when((avg_len >= 3.0) & (avg_len <= 12.0), 0.2).otherwise(0.0)
    )
    return feats.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        avg_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


@register(
    "text_lang_id",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
    len(list_filter(string_split(text, ' '), x -> x IN ('the','and','of','is'))) AS hits_en,
    len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','es'))) AS hits_es,
    len(list_filter(string_split(text, ' '), x -> x IN ('le','et','de','est'))) AS hits_fr
  FROM documents
),
pred AS (
  SELECT doc_id, lang,
    CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
         WHEN hits_es >= hits_fr THEN 'es' ELSE 'fr' END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, COUNT(*) AS n_docs FROM pred GROUP BY lang, pred_lang
""",
    survey_ref="beyond-reference: language ID (stopword-hit heuristic)",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language classifier; output is the confusion table
    against the labeled lang column."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def hits(words):
        return F.size(F.filter(toks, lambda x: x.isin(*words)))

    scored = d.select(
        "doc_id",
        "lang",
        hits(["the", "and", "of", "is"]).alias("hits_en"),
        hits(["el", "la", "de", "es"]).alias("hits_es"),
        hits(["le", "et", "de", "est"]).alias("hits_fr"),
    )
    pred = scored.select(
        "lang",
        F.when(
            (F.col("hits_en") >= F.col("hits_es")) & (F.col("hits_en") >= F.col("hits_fr")),
            "en",
        )
        .when(F.col("hits_es") >= F.col("hits_fr"), "es")
        .otherwise("fr")
        .alias("pred_lang"),
    )
    return pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n_docs"))


@register(
    "text_fingerprint",
    oracle="""
WITH fp AS (
  SELECT doc_id, lang,
    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_fp
  FROM documents
)
SELECT prefix_fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc
FROM fp GROUP BY prefix_fp HAVING COUNT(*) > 1
""",
    survey_ref="beyond-reference: document fingerprinting (content-defined prefix)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix fingerprint (first 8 tokens) — groups boilerplate-headed
    documents the exact hash misses."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.slice(F.split("text", " "), 1, 8), " "))
    return (
        d.groupBy(fp.alias("prefix_fp"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc"))
        .filter("n_docs > 1")
    )


@register(
    "text_gopher_rules",
    oracle="""
WITH feats AS (
  SELECT doc_id, lang, source,
    len(string_split(text, ' ')) AS n_words,
    CAST(length(replace(text, ' ', '')) AS DOUBLE)
      / len(string_split(text, ' ')) AS mean_word_len,
    len(list_filter(['the','and','of','to','a','in','is','on'],
        s -> list_contains(string_split(text, ' '), s))) AS stop_hits,
    CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
      / len(string_split(text, ' ')) AS symbol_ratio
  FROM documents
)
SELECT doc_id, lang, source, CAST(n_words AS INT) AS n_words,
  mean_word_len, CAST(stop_hits AS INT) AS stop_hits, symbol_ratio,
  (n_words BETWEEN 20 AND 100000
    AND mean_word_len BETWEEN 3.0 AND 10.0
    AND stop_hits >= 2
    AND symbol_ratio < 0.1) AS gopher_pass
FROM feats
""",
    survey_ref=(
        "beyond-reference: Gopher-style quality-rule filter "
        "(Rae et al. 2021 heuristics: word-count bounds, mean word length, "
        "stopword presence, symbol ratio)"
    ),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher quality rules — the standard pre-training corpus
    filter: word-count window, mean word length window, >= 2 distinct
    stopwords present, low symbol-to-word ratio. All built-in string
    functions (whole-stage codegen); at 100 TB this is a pure map stage —
    no shuffle, no UDF."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_words = F.size(w)
    mean_word_len = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in _STOPWORDS]),
            lambda s: F.array_contains(w, s),
        )
    )
    symbol_ratio = (
        F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    ).cast("double") / n_words
    feats = d.select(
        "doc_id",
        "lang",
        "source",
        n_words.cast("int").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        stop_hits.cast("int").alias("stop_hits"),
        symbol_ratio.alias("symbol_ratio"),
    )
    return feats.withColumn(
        "gopher_pass",
        F.col("n_words").between(20, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("stop_hits") >= 2)
        & (F.col("symbol_ratio") < 0.1),
    )


@register(
    "text_repetition",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
  FROM words, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
),
top AS (
  SELECT doc_id, MAX(cnt) AS top_bigram_count, CAST(SUM(cnt) AS BIGINT) AS n_bigrams
  FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, g)
  GROUP BY doc_id
),
dw AS (
  SELECT doc_id, len(w) AS n_words,
         len(list_distinct(w)) AS n_distinct_words
  FROM words
)
SELECT d.doc_id, CAST(d.n_words AS INT) AS n_words,
  CAST(d.n_distinct_words AS DOUBLE) / d.n_words AS distinct_word_ratio,
  CAST(t.top_bigram_count AS INT) AS top_bigram_count,
  CAST(t.top_bigram_count AS DOUBLE) / t.n_bigrams AS top_bigram_ratio,
  (CAST(t.top_bigram_count AS DOUBLE) / t.n_bigrams > 0.18
    OR CAST(d.n_distinct_words AS DOUBLE) / d.n_words < 0.3) AS repetitive
FROM dw d JOIN top t ON d.doc_id = t.doc_id
""",
    survey_ref=(
        "beyond-reference: repetition detection (Gopher-style top n-gram "
        "fraction + distinct-word ratio)"
    ),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: most-frequent-bigram share and
    distinct-word ratio, flagging template/spam-like docs. The bigram
    explode is linear in corpus size and aggregates by (doc_id, gram) —
    partial aggregation keeps the shuffle proportional to distinct grams
    per doc, not raw tokens; no UDFs anywhere."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    words = d.select("doc_id", w.alias("w"))
    # Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — on a
    # single-token doc the transform would then index element 2 of a
    # 1-element array (ANSI crash; caught by the edge corpus). Guard to an
    # empty offset array for docs with < 2 tokens, matching the oracle's
    # range(), which IS empty there.
    offs = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = words.select(
        "doc_id",
        F.explode(
            F.transform(
                offs,
                lambda i: F.concat_ws(
                    " ", F.element_at("w", i), F.element_at("w", i + 1)
                ),
            )
        ).alias("g"),
    )
    top = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_bigram_count"),
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
        )
    )
    dw = words.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct_words"),
    )
    out = dw.join(top, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        (F.col("n_distinct_words").cast("double") / F.col("n_words")).alias(
            "distinct_word_ratio"
        ),
        F.col("top_bigram_count").cast("int").alias("top_bigram_count"),
        (
            F.col("top_bigram_count").cast("double") / F.col("n_bigrams")
        ).alias("top_bigram_ratio"),
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_bigram_ratio") > 0.18) | (F.col("distinct_word_ratio") < 0.3),
    )


@register(
    "text_decontaminate",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, source, md5(array_to_string(t[i:i+7], ' ')) AS g
  FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
hits AS (
  SELECT gr.doc_id, COUNT(DISTINCT gr.g) AS n_tainted
  FROM grams gr JOIN bench b ON b.g = gr.g
  WHERE gr.source <> 'src0'
  GROUP BY gr.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(h.n_tainted, 0) AS BIGINT) AS n_tainted,
  COALESCE(h.n_tainted, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
LEFT JOIN hits h ON h.doc_id = d.doc_id
""",
    survey_ref="beyond-reference: benchmark decontamination (8-gram overlap flagging) — the eval-leak guard every training-data pipeline runs",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing any
    whitespace 8-gram with the benchmark corpus (here: the ``src0``
    source stands in for the held-out eval suite). Output per non-benchmark
    doc: ``(doc_id, n_tainted_grams, contaminated)``.

    100-TB shape: n-grams are generated ROW-LOCALLY with higher-order
    functions (``transform`` over a ``sequence`` of offsets — no UDF, no
    token-explode shuffle for gram construction); the benchmark gram set is
    small by nature (eval suites are MBs, not TBs), so AQE broadcasts the
    distinct-gram side unhinted and the only real shuffle is the per-doc
    hit aggregation. The md5 gram keys make the check order- and
    engine-stable (and let a production pipeline persist the benchmark
    gram set once and reuse it across corpus versions)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= 8, F.sequence(F.lit(1), n - 7)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 8)))
    )
    exploded = d.select(
        "doc_id", "source", F.explode(grams).alias("g")
    )
    bench = exploded.filter(F.col("source") == "src0").select("g").distinct()
    hits = (
        exploded.filter(F.col("source") != "src0")
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_tainted"))
    )
    return (
        d.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tainted", F.lit(0)).cast("long").alias("n_tainted"),
            (F.coalesce("n_tainted", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ONE spec for the word-8-gram occurrence relation (doc_id, i, g): the
# boilerplate DETECTOR (text_boilerplate_grams) consumes (doc_id, g); the
# span SURGEON (text_strip_boilerplate) also needs the 1-based start i to
# excise the covered token positions. Both build from this helper so a
# gram-width or hashing change cannot drift between the two (the
# _CHUNK_TOK_CTE single-spec discipline).
def _gram_occurrences(d: DataFrame, width: int = 8) -> DataFrame:
    """Row-local word-n-gram build: ``(doc_id, i, g)`` with i the 1-based
    start token position and g the md5 of the space-joined gram. No UDF,
    no shuffle — higher-order transform over a sequence of offsets, then
    one posexplode. Default width 8 (the detector spec every consumer
    shares); the confirmation pass (`text_strip_confirmed_spans`) probes
    at width 4."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= width, F.sequence(F.lit(1), n - (width - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, width)))
    )
    return d.select("doc_id", F.posexplode(grams).alias("pos0", "g")).select(
        "doc_id", (F.col("pos0") + 1).cast("int").alias("i"), "g"
    )


@register(
    "text_boilerplate_grams",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS g
  FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
),
boiler AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
hits AS (
  SELECT gr.doc_id, COUNT(*) AS n_boiler
  FROM grams gr JOIN boiler b USING (g) GROUP BY gr.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(COALESCE(h.n_boiler, 0) AS BIGINT) AS n_boiler,
  CASE WHEN COALESCE(t.n_grams, 0) > 0
       THEN CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / t.n_grams
       ELSE 0.0 END AS boiler_frac
FROM documents d
LEFT JOIN tot t ON t.doc_id = d.doc_id
LEFT JOIN hits h ON h.doc_id = d.doc_id
""",
    survey_ref=(
        "beyond-reference: corpus-internal boilerplate detection — word "
        "8-grams shared across >= 2 distinct documents, per-doc "
        "boilerplate fraction (the C4/CCNet repeated-span filter family)"
    ),
)
def text_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal boilerplate scoring: a word 8-gram occurring in at
    least 2 DISTINCT documents is 'boilerplate' (headers, footers,
    templates, licensing blurbs — the spans C4/CCNet-style pipelines strip
    because cross-document repetition is machine-generated with
    overwhelming probability); each document reports its total gram count,
    boilerplate-gram count, and the fraction. Downstream filters drop or
    re-weight high-fraction docs exactly like `text_gopher_rules` rows.

    Same engine-exactness discipline as `text_decontaminate`: md5 gram
    keys, exact integer counts, ONE IEEE division for the fraction.

    100-TB shape: gram construction is ROW-LOCAL (higher-order
    ``transform`` over a ``sequence`` of offsets — no UDF, no shuffle to
    build grams); the boilerplate set needs one explode + groupBy(gram)
    with a distinct-doc count (partial aggs map-side), and true
    boilerplate is a tiny fraction of distinct grams, so the gram->doc
    back-join broadcasts under AQE; the per-doc rollup is one more
    groupBy(doc_id). No quadratic path at any corpus size."""
    d = load(spark, sf_dir, "documents")
    # the exploded gram table feeds THREE consumers (boilerplate set, per-doc
    # totals, per-doc hits) — persist so the tokenize+gram+explode pass over
    # the corpus runs once, not three times (caller-owns-cache contract)
    exploded = _gram_occurrences(d).select("doc_id", "g").persist()
    boiler = (
        exploded.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    tot = exploded.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        exploded.join(boiler, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    n_grams = F.coalesce("n_grams", F.lit(0)).cast("long")
    n_boiler = F.coalesce("n_boiler", F.lit(0)).cast("long")
    out = (
        d.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            n_boiler.alias("n_boiler"),
            F.when(n_grams > 0, n_boiler.cast("double") / n_grams)
            .otherwise(F.lit(0.0))
            .alias("boiler_frac"),
        )
    )
    return owns_caches(out, exploded)  # caller releases after materializing


# Shared excision skeleton (oracle side): given a ``hits`` CTE of flagged
# 8-gram start positions (doc_id, i), excise the covered tokens and emit
# the conserved-count output — ONE copy consumed by both span surgeons
# (cross-doc text_strip_boilerplate, within-doc text_dedup_repeated_ngrams)
# so the coverage/reassembly rules cannot drift between them.
_GRAMS_CTE = """tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id, i, md5(array_to_string(t[i:i+7], ' ')) AS g
  FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
)"""

# cover-from-hits prefix: flagged 8-gram starts -> distinct covered token
# positions. The fixed-granularity surgeons excise this set directly; the
# maximal-span surgeon (text_strip_maximal_spans) interposes a
# gaps-and-islands run-merge + length gate between this and the tail.
_COVER_FROM_HITS_SQL_T = """{name} AS (
  SELECT DISTINCT doc_id, i + dd AS p FROM hits, UNNEST(range(0, 8)) AS v(dd)
)"""

_COVER_FROM_HITS_SQL = _COVER_FROM_HITS_SQL_T.format(name="cover")

_EXCISE_FROM_COVER_SQL = """pos AS (
  SELECT doc_id, p, t[p] AS token
  FROM tok, UNNEST(range(1, len(t) + 1)) AS w(p)
),
cleanagg AS (
  SELECT pos.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_kept,
    string_agg(pos.token, ' ' ORDER BY pos.p) AS clean_text
  FROM pos LEFT JOIN cover c ON c.doc_id = pos.doc_id AND c.p = pos.p
  WHERE c.p IS NULL GROUP BY pos.doc_id
),
rem AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed FROM cover GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM tok)
SELECT d.doc_id,
  CAST(COALESCE(tt.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
  COALESCE(k.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN tot tt ON tt.doc_id = d.doc_id
LEFT JOIN cleanagg k ON k.doc_id = d.doc_id
LEFT JOIN rem r ON r.doc_id = d.doc_id"""

_EXCISE_TAIL_SQL = _COVER_FROM_HITS_SQL + ",\n" + _EXCISE_FROM_COVER_SQL


def _cover_from_hits(hits: DataFrame) -> DataFrame:
    """Spark twin of ``_COVER_FROM_HITS_SQL``: flagged 8-gram starts
    ``(doc_id, i)`` -> distinct covered positions ``(doc_id, p)`` — 8
    rows per hit, linear in flagged spans, never in corpus tokens."""
    return hits.select(
        "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + 7)).alias("p")
    ).distinct()


def _excise_by_hits(d: DataFrame, hits: DataFrame) -> DataFrame:
    """Spark twin of ``_EXCISE_TAIL_SQL``: given flagged 8-gram starts
    ``(doc_id, i)``, build the per-doc covered-position mask (8 rows per
    hit — linear in flagged spans, never in corpus tokens), then excise
    ROW-LOCALLY with a higher-order filter against the sorted mask (no
    token-level shuffle). Emits
    ``(doc_id, n_tokens, n_kept, n_removed, clean_text)`` with the
    structural conservation ``n_kept + n_removed == n_tokens``."""
    return _excise_by_cover(d, _cover_from_hits(hits))


def _excise_by_cover(d: DataFrame, cover: DataFrame) -> DataFrame:
    """Spark twin of ``_EXCISE_FROM_COVER_SQL``: given the covered-position
    relation ``(doc_id, p)`` (distinct), excise those token positions
    row-locally and emit the shared conserved-count schema."""
    removed = cover.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("p")).alias("rm")
    )
    joined = d.select("doc_id", "text").join(removed, "doc_id", "left")
    toks = F.split("text", " ")
    rm = F.coalesce(F.col("rm"), F.array().cast("array<int>"))
    kept = F.filter(toks, lambda x, j: ~F.array_contains(rm, (j + 1).cast("int")))
    has_text = F.col("text").isNotNull()
    n_tokens = F.when(has_text, F.size(toks)).otherwise(F.lit(0)).cast("long")
    return joined.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (n_tokens - F.size(rm)).cast("long").alias("n_kept"),
        F.size(rm).cast("long").alias("n_removed"),
        F.when(has_text, F.array_join(kept, " ")).otherwise(F.lit("")).alias(
            "clean_text"
        ),
    )


@register(
    "text_strip_boilerplate",
    oracle=f"""
WITH {_GRAMS_CTE},
boiler AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN boiler b USING (g)
),
{_EXCISE_TAIL_SQL}
""",
    survey_ref=(
        "beyond-reference: repeated-substring REMOVAL emitting cleaned "
        "text (Lee et al. exact-substring-dedup surface over the "
        "text_boilerplate_grams detector)"
    ),
)
def text_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span surgery on the boilerplate detector's output: every token
    covered by ANY word-8-gram that occurs in >= 2 distinct documents is
    excised, and the document is re-emitted as its surviving tokens in
    original order — the Lee-et-al-style exact substring dedup surface
    (here: strip ALL occurrences of cross-document spans; the keep-first
    variant is `dedup_paragraphs`). Emits
    ``(doc_id, n_tokens, n_kept, n_removed, clean_text)`` with the
    conservation invariant ``n_kept + n_removed == n_tokens`` carried IN
    the result columns (covered positions are a distinct subset of
    ``1..n_tokens``, so the equality is structural — the edge suite
    asserts it).

    100-TB shape:
    - the ``(doc_id, i, g)`` occurrence relation is built row-locally
      (shared _gram_occurrences spec) and persisted — it feeds the
      boilerplate-set aggregate and the hit probe, so the corpus
      tokenizes once;
    - the boilerplate set is a map-side-combinable groupBy(g) with a
      distinct-doc count; true boilerplate is a tiny fraction of distinct
      grams, so the hit join broadcasts under AQE;
    - coverage positions explode 8 rows per HIT (linear in flagged spans,
      not in corpus), and the per-doc removal mask is one groupBy(doc_id)
      whose collect_set is bounded by the document's own length;
    - the final excision is ROW-LOCAL: a higher-order filter drops tokens
      whose 1-based position sits in the sorted mask (O(L·|mask|) inside
      the row — no token-level shuffle, which would dominate at corpus
      scale)."""
    d = load(spark, sf_dir, "documents")
    exploded = _gram_occurrences(d).persist()
    boiler = (
        exploded.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    # same (doc_id, i) cannot repeat (one gram per start), so no distinct
    hits = exploded.join(boiler, "g").select("doc_id", "i")
    return owns_caches(_excise_by_hits(d, hits), exploded)


@register(
    "text_dedup_repeated_ngrams",
    oracle=f"""
WITH {_GRAMS_CTE},
firsts AS (
  SELECT doc_id, g, MIN(i) AS first_i FROM grams GROUP BY doc_id, g
),
hits AS (
  SELECT gr.doc_id, gr.i
  FROM grams gr JOIN firsts f ON f.doc_id = gr.doc_id AND f.g = gr.g
  WHERE gr.i > f.first_i
),
{_EXCISE_TAIL_SQL}
""",
    survey_ref=(
        "beyond-reference: WITHIN-document repeated-n-gram removal — the "
        "self-repetition surgery twin of text_strip_boilerplate (Lee et "
        "al. within-doc pass; detection-only twin is text_repetition)"
    ),
)
def text_dedup_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-repetition surgery: every NON-FIRST occurrence of a word
    8-gram *within the same document* has its span excised, and the doc
    re-emits as the surviving tokens (the within-doc half of the
    exact-substring-dedup family; `text_repetition` only scores the
    repetition, this removes it). Keep-first is by start position; for
    SELF-OVERLAPPING runs (e.g. one token repeated 10 times) the excised
    later spans overlap the kept first span, so removal wins on shared
    tokens — a deliberate conservative bias (degenerate runs collapse
    hard), pinned by the edge suite. Emits the shared conserved-count
    schema ``(doc_id, n_tokens, n_kept, n_removed, clean_text)``.

    100-TB shape: same skeleton as `text_strip_boilerplate` (shared
    `_excise_by_hits` / ``_EXCISE_TAIL_SQL`` spec) except the flag rule is
    per-(doc, gram) — the groupBy key includes doc_id, so the aggregate is
    even better-conditioned (no cross-doc hot grams possible), and
    everything downstream is linear in flagged spans."""
    d = load(spark, sf_dir, "documents")
    exploded = _gram_occurrences(d).persist()
    firsts = exploded.groupBy("doc_id", "g").agg(F.min("i").alias("first_i"))
    hits = (
        exploded.join(firsts, ["doc_id", "g"])
        .filter(F.col("i") > F.col("first_i"))
        .select("doc_id", "i")
    )
    return owns_caches(_excise_by_hits(d, hits), exploded)


# --- r11: MAXIMAL-span substring removal (Lee et al. semantics) ------------
# The fixed-granularity surgeons above excise every position covered by a
# flagged 8-gram, so a 40-token boilerplate block and an 8-token idiom are
# treated identically. The production exact-substring-dedup pass (Lee et
# al. 2022, "Deduplicating Training Data Makes Language Models Better")
# removes only repeated spans ABOVE a length threshold (~50 tokens there).
# Here: merge runs of consecutive covered positions into MAXIMAL spans
# (gaps-and-islands over the covered-position relation — covered positions
# of overlapping/adjacent shared grams coalesce into one island), then
# excise only islands of >= _SPAN_MIN_TOKENS tokens. An isolated shared
# 8-gram covers 8 positions < 16 -> kept; any shared substring of >= 16
# tokens -> its full extent excised.
_SPAN_MIN_TOKENS = 16


@register(
    "text_strip_maximal_spans",
    oracle=f"""
WITH {_GRAMS_CTE},
boiler AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN boiler b USING (g)
),
{_COVER_FROM_HITS_SQL_T.format(name="rawcover")},
isl AS (
  SELECT doc_id, p,
    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM rawcover
),
spans AS (
  SELECT doc_id, grp FROM isl GROUP BY doc_id, grp
  HAVING COUNT(*) >= {_SPAN_MIN_TOKENS}
),
cover AS (
  SELECT i2.doc_id, i2.p FROM isl i2 JOIN spans s USING (doc_id, grp)
),
{_EXCISE_FROM_COVER_SQL}
""",
    survey_ref=(
        "beyond-reference: maximal repeated-span removal above a length "
        "threshold — the Lee-et-al exact-substring-dedup semantics "
        "(VERDICT r10 'What's missing' #3); fixed-granularity twin is "
        "text_strip_boilerplate"
    ),
)
def text_strip_maximal_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length exact-substring dedup: positions covered by
    cross-document 8-grams (the `text_strip_boilerplate` detector) are
    run-merged into MAXIMAL spans, and only spans of at least
    {min_tokens} tokens are excised — a 40-token licensing block
    disappears while an 8-token idiom survives, the distinction the
    fixed-granularity surgeons cannot make. Emits the shared
    conserved-count schema ``(doc_id, n_tokens, n_kept, n_removed,
    clean_text)`` with ``n_kept + n_removed == n_tokens``.

    100-TB shape: everything upstream of the run-merge is the shared
    skeleton (one persisted tokenize+gram pass feeding detector and
    probe; covered positions explode 8 rows per HIT — linear in flagged
    spans, not corpus tokens). The run-merge itself is gaps-and-islands:
    ONE window exchange on doc_id over the Δ-sized cover relation (each
    doc's covered positions are bounded by its own length, so no hot
    partition), whose hash partitioning the island aggregate REUSES
    (grouping on (doc_id, grp) is clustered by the doc_id partitioning);
    the qualifying-island back-join is (doc_id, grp)-keyed and AQE
    broadcasts the island side when small. Excision stays row-local —
    tokens never shuffle.

    Documented limit (VERDICT r11 'What's missing' #4): detection is at
    8-gram granularity, so a long near-duplicate block with a token edit
    every <= 7 tokens produces NO covered positions at all and escapes
    entirely (true Lee-et-al uses suffix arrays). Two cheap
    approximation tiers exist: `text_strip_gapped_spans` (islands
    separated by <= {gap} uncovered positions merge before the length
    gate, bridging sparse edits that leave grams between them) and
    `text_strip_confirmed_spans` (r13: a 4-gram confirmation probe
    extends 8-gram-anchored islands through regions edited every <= 7
    tokens, where no intact 8-gram survives at all)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    exploded = _gram_occurrences(d).persist()
    boiler = (
        exploded.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = exploded.join(boiler, "g").select("doc_id", "i")
    raw = _cover_from_hits(hits)
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = raw.select(
        "doc_id", "p", (F.col("p") - F.row_number().over(w)).alias("grp")
    )
    spans = (
        isl.groupBy("doc_id", "grp")
        .agg(F.count("*").alias("span_len"))
        .filter(F.col("span_len") >= _SPAN_MIN_TOKENS)
        .select("doc_id", "grp")
    )
    cover = isl.join(spans, ["doc_id", "grp"]).select("doc_id", "p")
    return owns_caches(_excise_by_cover(d, cover), exploded)


#: gapped-merge tolerance (text_strip_gapped_spans): islands separated by
#: <= this many uncovered positions merge into one span before the length
#: gate. 7 = one token short of the 8-gram granularity, so a block whose
#: edits come every 8+ tokens (leaving detectable grams between edits)
#: run-merges across each single-token edit, while genuinely separate
#: boilerplate islands (>= one full gram of fresh text apart) stay apart.
_SPAN_GAP_TOLERANCE = 7

text_strip_maximal_spans.__doc__ = text_strip_maximal_spans.__doc__.format(
    min_tokens=_SPAN_MIN_TOKENS, gap=_SPAN_GAP_TOLERANCE
)


@register(
    "text_strip_gapped_spans",
    oracle=f"""
WITH {_GRAMS_CTE},
boiler AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN boiler b USING (g)
),
{_COVER_FROM_HITS_SQL_T.format(name="rawcover")},
flagged AS (
  SELECT doc_id, p,
    CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
           <= {_SPAN_GAP_TOLERANCE + 1} THEN 0 ELSE 1 END AS newgrp
  FROM rawcover
),
isl AS (
  SELECT doc_id, p,
    SUM(newgrp) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
),
spans AS (
  SELECT doc_id, MIN(p) AS lo, MAX(p) AS hi
  FROM isl GROUP BY doc_id, grp
  HAVING MAX(p) - MIN(p) + 1 >= {_SPAN_MIN_TOKENS}
),
cover AS (
  SELECT s.doc_id, CAST(u.p AS INTEGER) AS p
  FROM spans s, UNNEST(range(s.lo, s.hi + 1)) AS u(p)
),
{_EXCISE_FROM_COVER_SQL}
""",
    survey_ref=(
        "beyond-reference: gap-tolerant maximal-span removal — the cheap "
        "approximation of suffix-array substring dedup for near-dup "
        "blocks with sparse token edits (VERDICT r11 'What's missing' "
        "#4; exact-island twin is text_strip_maximal_spans)"
    ),
)
def text_strip_gapped_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-tolerant variable-length substring dedup: covered positions
    run-merge across gaps of up to {gap} UNCOVERED positions before the
    {min_tokens}-token length gate, and the WHOLE merged span — bridged
    gap tokens included — is excised. This is the cheap approximation of
    suffix-array dedup for the block `text_strip_maximal_spans`
    documents as its limit: a 40-token licensing paragraph with one
    edited token every ~10 tokens still carries detectable 8-grams
    between edits, and the single-token holes they leave in the cover
    bridge instead of splitting the span. Gaps of {gap_plus} or more
    (at least one full fresh gram's worth of text) still separate —
    genuinely distinct islands never merge. Emits the shared
    conserved-count schema ``(doc_id, n_tokens, n_kept, n_removed,
    clean_text)``.

    100-TB shape: identical skeleton to the exact-island surgeon (one
    persisted tokenize+gram pass; Δ-sized cover relation; tokens never
    shuffle) — the tolerance adds one LAG pass over the SAME doc_id
    window partitioning the running-sum group id already needs (one
    exchange, two window ops that reuse one sort); spans collapse to
    (lo, hi) pairs and re-explode linearly in excised volume only. The
    bridged positions are disjoint across groups by construction (groups
    are separated by > {gap} uncovered positions), so the cover needs no
    dedup and the counts stay conserved."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    exploded = _gram_occurrences(d).persist()
    boiler = (
        exploded.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = exploded.join(boiler, "g").select("doc_id", "i")
    raw = _cover_from_hits(hits)
    w = Window.partitionBy("doc_id").orderBy("p")
    newgrp = F.when(
        F.col("p") - F.lag("p").over(w) <= _SPAN_GAP_TOLERANCE + 1, F.lit(0)
    ).otherwise(F.lit(1))
    isl = raw.select("doc_id", "p", newgrp.alias("newgrp")).select(
        "doc_id",
        "p",
        F.sum("newgrp")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    spans = (
        isl.groupBy("doc_id", "grp")
        .agg(F.min("p").alias("lo"), F.max("p").alias("hi"))
        .filter(F.col("hi") - F.col("lo") + 1 >= _SPAN_MIN_TOKENS)
    )
    cover = spans.select(
        "doc_id", F.explode(F.sequence("lo", "hi")).alias("p")
    )
    return owns_caches(_excise_by_cover(d, cover), exploded)


text_strip_gapped_spans.__doc__ = text_strip_gapped_spans.__doc__.format(
    min_tokens=_SPAN_MIN_TOKENS,
    gap=_SPAN_GAP_TOLERANCE,
    gap_plus=_SPAN_GAP_TOLERANCE + 1,
)


@register(
    "text_strip_confirmed_spans",
    oracle=f"""
WITH {_GRAMS_CTE},
boiler AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN boiler b USING (g)
),
{_COVER_FROM_HITS_SQL_T.format(name="rawcover")},
anchors AS (SELECT DISTINCT doc_id FROM rawcover),
g4 AS (
  SELECT tok.doc_id, i, md5(array_to_string(t[i:i+3], ' ')) AS g
  FROM tok JOIN anchors a ON a.doc_id = tok.doc_id,
       UNNEST(range(1, len(t) - 2)) AS u4(i)
),
weak AS (
  SELECT DISTINCT g FROM (
    SELECT o.doc_id, o.i, o.g
    FROM g4 o JOIN rawcover c
      ON c.doc_id = o.doc_id AND c.p BETWEEN o.i AND o.i + 3
    GROUP BY o.doc_id, o.i, o.g HAVING COUNT(*) = 4
  )
),
weakpos AS (
  SELECT DISTINCT o.doc_id, o.i + dd AS p
  FROM g4 o JOIN weak wk ON wk.g = o.g, UNNEST(range(0, 4)) AS v4(dd)
),
unioned AS (
  SELECT doc_id, p, MAX(strong) AS strong FROM (
    SELECT doc_id, p, 1 AS strong FROM rawcover
    UNION ALL
    SELECT doc_id, p, 0 AS strong FROM weakpos
  ) GROUP BY doc_id, p
),
flagged AS (
  SELECT doc_id, p, strong,
    CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
           <= {_SPAN_GAP_TOLERANCE + 1} THEN 0 ELSE 1 END AS newgrp
  FROM unioned
),
isl AS (
  SELECT doc_id, p, strong,
    SUM(newgrp) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
),
spans AS (
  SELECT doc_id, MIN(p) AS lo, MAX(p) AS hi
  FROM isl GROUP BY doc_id, grp
  HAVING MAX(p) - MIN(p) + 1 >= {_SPAN_MIN_TOKENS} AND MAX(strong) = 1
),
cover AS (
  SELECT s.doc_id, CAST(u.p AS INTEGER) AS p
  FROM spans s, UNNEST(range(s.lo, s.hi + 1)) AS u(p)
),
{_EXCISE_FROM_COVER_SQL}
""",
    survey_ref=(
        "beyond-reference: 4-gram-confirmed span removal — extends "
        "8-gram-anchored islands through edit-dense regions a token edit "
        "every <= 7 tokens hides from the 8-gram detector entirely "
        "(VERDICT r12 missing #4 / task 6; the next approximation step "
        "toward suffix-array exact-substring dedup after "
        "text_strip_gapped_spans)"
    ),
)
def text_strip_confirmed_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-gram-CONFIRMED span dedup: closes the miss class
    `text_strip_gapped_spans` documents — a near-duplicate block whose
    token edits come every <= 7 tokens carries NO intact cross-doc
    8-gram, so gram-level detection sees nothing at all. The confirmation
    pass recovers it with bounded extra work and without 4-gram false
    positives ever creating spans on their own:

    1. STRONG evidence: the usual cross-doc 8-gram cover (exactly the
       gapped surgeon's detector).
    2. WEAK evidence, derived relationally from strong: the distinct
       4-grams lying WHOLLY INSIDE an 8-covered span anywhere in the
       corpus — i.e. sub-grams of text the corpus already proved is
       boilerplate (the md5 gram keys make textual sub-slicing
       impossible, so the sub-gram set is computed as a position join:
       4-gram occurrence (doc, i) qualifies when all of i..i+3 are
       covered). An edit-dense copy's clean runs between edits are
       precisely such sub-grams.
    3. Weak 4-gram hits are probed ONLY in anchor documents (>= 1 strong
       covered position) and merge into islands under the same {gap}-gap
       run-merge; a merged span qualifies only if it contains >= 1
       STRONG position and spans >= {min_tokens} tokens — weak evidence
       extends islands, never creates them.

    Remaining miss class (documented): a block with NO intact 8-gram
    anywhere in the corpus (every copy edit-dense, or edits every <= 3
    tokens killing 4-grams too) still escapes — that tier needs
    suffix-array machinery, not gram probes.

    100-TB shape: the 8-gram skeleton is unchanged (one persisted
    tokenize+gram pass, Δ-sized cover). The additions are all
    anchor-bounded: the 4-gram relation is built AFTER a left-semi
    against the Δ-sized anchor-doc set (never over the full corpus), the
    weak-set derivation joins it to the Δ-sized cover on (doc_id, range)
    keys, and the weak probe is one more equi-join on the gram key.
    Tokens still never shuffle; excision stays row-local."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    exploded = _gram_occurrences(d).persist()
    boiler = (
        exploded.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = exploded.join(boiler, "g").select("doc_id", "i")
    raw = _cover_from_hits(hits).persist()  # strong cover; feeds 3 consumers
    anchors = raw.select("doc_id").distinct()
    occ4 = (
        _gram_occurrences(d, width=4)
        .join(anchors, "doc_id", "left_semi")
        .persist()
    )
    # weak gram set: 4-gram occurrences whose full [i, i+3] window sits
    # inside the strong cover (count == 4 against the distinct positions)
    inside = (
        occ4.alias("o")
        .join(
            raw.alias("c"),
            (F.col("o.doc_id") == F.col("c.doc_id"))
            & F.col("c.p").between(F.col("o.i"), F.col("o.i") + 3),
        )
        .groupBy("o.doc_id", "o.i", "o.g")
        .agg(F.count("*").alias("nc"))
        .filter(F.col("nc") == 4)
    )
    weak = inside.select("g").distinct()
    weakpos = (
        occ4.join(weak, "g")
        .select("doc_id", F.explode(F.sequence("i", F.col("i") + 3)).alias("p"))
        .distinct()
    )
    unioned = (
        raw.select("doc_id", "p", F.lit(1).alias("strong"))
        .unionByName(weakpos.select("doc_id", "p", F.lit(0).alias("strong")))
        .groupBy("doc_id", "p")
        .agg(F.max("strong").alias("strong"))
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    newgrp = F.when(
        F.col("p") - F.lag("p").over(w) <= _SPAN_GAP_TOLERANCE + 1, F.lit(0)
    ).otherwise(F.lit(1))
    isl = unioned.select(
        "doc_id", "p", "strong", newgrp.alias("newgrp")
    ).select(
        "doc_id",
        "p",
        "strong",
        F.sum("newgrp")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    spans = (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("p").alias("lo"),
            F.max("p").alias("hi"),
            F.max("strong").alias("has_strong"),
        )
        .filter(
            (F.col("hi") - F.col("lo") + 1 >= _SPAN_MIN_TOKENS)
            & (F.col("has_strong") == 1)
        )
    )
    cover = spans.select(
        "doc_id", F.explode(F.sequence("lo", "hi")).alias("p")
    )
    return owns_caches(_excise_by_cover(d, cover), exploded, raw, occ4)


text_strip_confirmed_spans.__doc__ = text_strip_confirmed_spans.__doc__.format(
    min_tokens=_SPAN_MIN_TOKENS, gap=_SPAN_GAP_TOLERANCE
)


#: ladder tier (r14): a width-5 gram shared by MORE than this many
#: distinct docs is treated as a stock phrase, not copy evidence — the
#: source-overlap two-pass ubiquity discipline applied to span detection.
_LADDER_UBIQUITY_CAP = 8

#: minimum DISTINCT rare-gram starts inside an island before it may become
#: a span — the density gate that keeps chance collisions of natural
#: phrases from ever creating spans (6 rare shared 5-grams clustering in
#: one >= 16-token window does not happen by accident).
_LADDER_MIN_EVIDENCE = 6


@register(
    "text_strip_ladder_spans",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
),
g5 AS (
  SELECT doc_id, i, md5(array_to_string(t[i:i+4], ' ')) AS g
  FROM tok, UNNEST(range(1, len(t) - 3)) AS u(i)
),
rare AS (
  SELECT g FROM g5 GROUP BY g
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_LADDER_UBIQUITY_CAP}
),
hits5 AS (
  SELECT DISTINCT o.doc_id, o.i FROM g5 o JOIN rare r USING (g)
),
rawcover AS (
  SELECT DISTINCT doc_id, i + dd AS p
  FROM hits5, UNNEST(range(0, 5)) AS v(dd)
),
flagged AS (
  SELECT doc_id, p,
    CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
           <= {_SPAN_GAP_TOLERANCE + 1} THEN 0 ELSE 1 END AS newgrp
  FROM rawcover
),
isl AS (
  SELECT doc_id, p,
    SUM(newgrp) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
),
spans AS (
  SELECT doc_id, lo, hi FROM (
    SELECT i2.doc_id, i2.grp, MIN(i2.p) AS lo, MAX(i2.p) AS hi,
           COUNT(h.i) AS n_ev
    FROM isl i2 LEFT JOIN hits5 h
      ON h.doc_id = i2.doc_id AND h.i = i2.p
    GROUP BY i2.doc_id, i2.grp
  ) _s
  WHERE hi - lo + 1 >= {_SPAN_MIN_TOKENS} AND n_ev >= {_LADDER_MIN_EVIDENCE}
),
cover AS (
  SELECT s.doc_id, CAST(u.p AS INTEGER) AS p
  FROM spans s, UNNEST(range(s.lo, s.hi + 1)) AS u(p)
),
{_EXCISE_FROM_COVER_SQL}
""",
    survey_ref=(
        "beyond-reference: ubiquity-capped 5-gram ladder span removal — "
        "closes the NO-ANCHOR miss class text_strip_confirmed_spans "
        "documents (a duplicated block with no intact 8-gram in ANY "
        "copy; VERDICT r13 task 4)"
    ),
)
def text_strip_ladder_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ladder-tier span dedup: catches the miss class every 8-gram-anchored
    surgeon shares — a duplicated block whose EVERY copy is edited at
    least once per 8 tokens, so no intact cross-doc 8-gram exists
    anywhere and `text_strip_confirmed_spans` never anchors. Detection
    drops to width-5 grams, where the false-positive pressure of natural
    language is real, and answers it with three gates instead of one:

    1. RARITY (ubiquity cap): a 5-gram counts as copy evidence only when
       shared by 2..{ubiq} distinct docs. Stock phrases ('at the end of
       the') blow past the cap and are discarded up front — the
       two-pass capped-universe discipline `q_docs_source_overlap`
       established, applied to spans.
    2. DENSITY: an island (same {gap}-gap run-merge as the sibling
       surgeons) must contain >= {ev} DISTINCT rare-gram starts.
    3. LENGTH: the merged span must cover >= {min_tokens} tokens.

    A real edit-dense copy passes all three trivially (a 60-token block
    edited every 7 tokens still carries ~2 shared 5-grams per inter-edit
    run — ~16 evidence starts); a chance cluster of >= {ev} rare shared
    5-grams inside one window essentially never occurs naturally.

    Remaining miss class (the ladder's own documented floor): edits every
    <= 4 tokens in every copy kill 5-grams too, and a viral block whose
    every pair of copies is edit-dense AND which appears in more than
    {ubiq} docs loses its evidence to the ubiquity cap (in practice such
    blocks carry >= 2 verbatim copies and anchor tier 1). Either is
    genuine suffix-array territory (Lee et al.'s exact machinery) —
    tracked in COVERAGE.md, out of gram-ladder reach by construction.

    100-TB shape: the width-5 gram table is the SAME O(corpus tokens)
    row count as the 8-gram table every sibling already builds — one
    tokenize+gram pass, one groupBy(g) with partial aggs. At gate scale
    the ubiquity-capped rare set broadcasts under AQE; at web scale the
    Zipf tail puts a large DISTINCT-gram count in the 2..8-doc band, so
    the back-join becomes an ordinary hash exchange on the gram key —
    still one linear shuffle, never quadratic (the cap's job at scale is
    killing the dense stock-phrase rows, which is what bounds both the
    join fan-out and the false-positive pressure). Islands/evidence are
    windowed per doc_id (spillable buffers); excision is row-local.
    Tokens never cross an exchange."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    occ5 = _gram_occurrences(d, width=5).persist()
    rare = (
        occ5.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(
            (F.col("nd") >= 2) & (F.col("nd") <= _LADDER_UBIQUITY_CAP)
        )
        .select("g")
    )
    hits5 = occ5.join(rare, "g").select("doc_id", "i").distinct().persist()
    rawcover = hits5.select(
        "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + 4)).alias("p")
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("p")
    newgrp = F.when(
        F.col("p") - F.lag("p").over(w) <= _SPAN_GAP_TOLERANCE + 1, F.lit(0)
    ).otherwise(F.lit(1))
    isl = rawcover.select("doc_id", "p", newgrp.alias("newgrp")).select(
        "doc_id",
        "p",
        F.sum("newgrp")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    spans = (
        isl.alias("i2")
        .join(
            hits5.alias("h"),
            (F.col("h.doc_id") == F.col("i2.doc_id"))
            & (F.col("h.i") == F.col("i2.p")),
            "left",
        )
        .groupBy("i2.doc_id", "i2.grp")
        .agg(
            F.min("i2.p").alias("lo"),
            F.max("i2.p").alias("hi"),
            F.count("h.i").alias("n_ev"),
        )
        .filter(
            (F.col("hi") - F.col("lo") + 1 >= _SPAN_MIN_TOKENS)
            & (F.col("n_ev") >= _LADDER_MIN_EVIDENCE)
        )
    )
    cover = spans.select(
        "doc_id", F.explode(F.sequence("lo", "hi")).alias("p")
    )
    return owns_caches(_excise_by_cover(d, cover), occ5, hits5)


text_strip_ladder_spans.__doc__ = text_strip_ladder_spans.__doc__.format(
    ubiq=_LADDER_UBIQUITY_CAP,
    ev=_LADDER_MIN_EVIDENCE,
    gap=_SPAN_GAP_TOLERANCE,
    min_tokens=_SPAN_MIN_TOKENS,
)


#: template tier (r15): width-5 grams in MORE docs than the ladder cap but
#: at most this many are the "template band" — too ubiquitous to be rare
#: copy evidence, too rare to be stock phrases with certainty. Past this
#: bound a gram is discarded as a stock phrase (and the back-join fan-out
#: stays bounded at 64 rows per gram by construction).
_TEMPLATE_UBIQUITY_MAX = 64


@register(
    "text_strip_template_spans",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
),
g5 AS (
  SELECT doc_id, i, md5(array_to_string(t[i:i+4], ' ')) AS g
  FROM tok, UNNEST(range(1, len(t) - 3)) AS u(i)
),
band AS (
  SELECT g FROM g5 GROUP BY g
  HAVING COUNT(DISTINCT doc_id)
    BETWEEN {_LADDER_UBIQUITY_CAP + 1} AND {_TEMPLATE_UBIQUITY_MAX}
),
hits5 AS (
  SELECT DISTINCT o.doc_id, o.i, o.g FROM g5 o JOIN band b USING (g)
),
rawcover AS (
  SELECT DISTINCT doc_id, i + dd AS p
  FROM hits5, UNNEST(range(0, 5)) AS v(dd)
),
flagged AS (
  SELECT doc_id, p,
    CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
           <= {_SPAN_GAP_TOLERANCE + 1} THEN 0 ELSE 1 END AS newgrp
  FROM rawcover
),
isl AS (
  SELECT doc_id, p,
    SUM(newgrp) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
),
islgrams AS (
  SELECT i2.doc_id, i2.grp, i2.p, h.i, h.g
  FROM isl i2 LEFT JOIN hits5 h
    ON h.doc_id = i2.doc_id AND h.i = i2.p
),
stats AS (
  SELECT doc_id, grp, MIN(p) AS lo, MAX(p) AS hi, COUNT(i) AS n_ev
  FROM islgrams GROUP BY doc_id, grp
),
conf AS (
  SELECT doc_id, grp, MAX(n_match) AS best FROM (
    SELECT ig.doc_id, ig.grp, o.doc_id AS od,
           COUNT(DISTINCT ig.g) AS n_match
    FROM (SELECT DISTINCT doc_id, grp, g FROM islgrams
          WHERE g IS NOT NULL) ig
    JOIN hits5 o ON o.g = ig.g AND o.doc_id <> ig.doc_id
    GROUP BY ig.doc_id, ig.grp, o.doc_id
  ) _m GROUP BY doc_id, grp
),
spans AS (
  SELECT s.doc_id, s.lo, s.hi
  FROM stats s JOIN conf c ON c.doc_id = s.doc_id AND c.grp = s.grp
  WHERE s.hi - s.lo + 1 >= {_SPAN_MIN_TOKENS}
    AND s.n_ev >= {_LADDER_MIN_EVIDENCE}
    AND c.best >= {_LADDER_MIN_EVIDENCE}
),
cover AS (
  SELECT s.doc_id, CAST(u.p AS INTEGER) AS p
  FROM spans s, UNNEST(range(s.lo, s.hi + 1)) AS u(p)
),
{_EXCISE_FROM_COVER_SQL}
""",
    survey_ref=(
        "beyond-reference: template-band span removal — closes the "
        "past-the-ubiquity-cap miss class the ladder documents and "
        "LADDER_RESIDUAL_r15.json measures at miss=1.00 (a slot-edited "
        "template duplicated in more than 8 docs loses its width-5 "
        "evidence to the rarity cap; VERDICT r14 task 5)"
    ),
)
def text_strip_template_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-tier span dedup: the fifth rung of the surgeon ladder,
    closing the ubiquity-cap miss class the ladder documents (and r15
    MEASURES at miss=1.00 — LADDER_RESIDUAL_r15.json): a block duplicated
    in MORE than {ubiq} docs whose every copy is slot-edited (per-doc
    values at fixed positions — 'Posted by X on Y' boilerplate, licensing
    headers with per-file fields) shares width-5 grams across ALL copies,
    so every gram's ubiquity lands past the ladder's rarity cap and tier
    4 discards the evidence.

    Detection runs in the TEMPLATE BAND — grams in {ubiq}+1..{tmax}
    distinct docs. That band is where mid-frequency natural phrases also
    live, so the false-positive answer is one gate stronger than the
    ladder's:

    1. BAND (bounded fan-out): grams in more than {tmax} docs are
       discarded as stock phrases — which also caps the confirmation
       join's per-gram fan-out at {tmax} by construction.
    2. DENSITY + LENGTH (the family gates): >= {ev} distinct band-gram
       starts per island, merged span >= {min_tokens} tokens.
    3. CONFIRMATION (the template-vs-phrase-chain discriminator): some
       SINGLE other doc must share >= {ev} distinct grams of this
       island's own gram set. A chain of unrelated mid-frequency idioms
       covers positions but its grams' doc sets don't intersect in any
       one doc; a real template's co-travel by definition.

    Tier bands are adjacent and disjoint: 2..{ubiq} docs -> ladder,
    {ubiq}+1..{tmax} -> this tier, past {tmax} -> discarded (a block
    with that many edit-dense copies has, in practice, >= 2 verbatim
    copies and anchors tier 1; the residual is documented).

    100-TB shape: the SAME one-pass O(corpus tokens) width-5 gram build
    the ladder makes (one tokenize+gram pass, one groupBy(g) with
    partial aggs); the band filter bounds every downstream join — the
    back-join fan-out and the confirmation join are both <= {tmax} rows
    per gram, and the dense stock-phrase rows die in the aggregate
    before any join. Islands/evidence/confirmation are windowed or
    grouped per doc_id (spillable); excision is row-local. Tokens never
    cross an exchange."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    occ5 = _gram_occurrences(d, width=5).persist()
    band = (
        occ5.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(
            (F.col("nd") > _LADDER_UBIQUITY_CAP)
            & (F.col("nd") <= _TEMPLATE_UBIQUITY_MAX)
        )
        .select("g")
    )
    hits5 = occ5.join(band, "g").select("doc_id", "i", "g").distinct().persist()
    rawcover = hits5.select(
        "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + 4)).alias("p")
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("p")
    newgrp = F.when(
        F.col("p") - F.lag("p").over(w) <= _SPAN_GAP_TOLERANCE + 1, F.lit(0)
    ).otherwise(F.lit(1))
    isl = rawcover.select("doc_id", "p", newgrp.alias("newgrp")).select(
        "doc_id",
        "p",
        F.sum("newgrp")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    islgrams = (
        isl.alias("i2")
        .join(
            hits5.alias("h"),
            (F.col("h.doc_id") == F.col("i2.doc_id"))
            & (F.col("h.i") == F.col("i2.p")),
            "left",
        )
        .select(
            F.col("i2.doc_id").alias("doc_id"),
            F.col("i2.grp").alias("grp"),
            F.col("i2.p").alias("p"),
            F.col("h.i").alias("i"),
            F.col("h.g").alias("g"),
        )
        .persist()
    )
    stats = islgrams.groupBy("doc_id", "grp").agg(
        F.min("p").alias("lo"), F.max("p").alias("hi"),
        F.count("i").alias("n_ev"),
    )
    conf = (
        islgrams.filter(F.col("g").isNotNull())
        .select("doc_id", "grp", "g")
        .distinct()
        .alias("ig")
        .join(
            hits5.alias("o"),
            (F.col("o.g") == F.col("ig.g"))
            & (F.col("o.doc_id") != F.col("ig.doc_id")),
        )
        .groupBy("ig.doc_id", "ig.grp", "o.doc_id")
        .agg(F.count_distinct("ig.g").alias("n_match"))
        .groupBy("ig.doc_id", "ig.grp")
        .agg(F.max("n_match").alias("best"))
        .select(
            F.col("ig.doc_id").alias("doc_id"),
            F.col("ig.grp").alias("grp"),
            "best",
        )
    )
    spans = (
        stats.join(conf, ["doc_id", "grp"])
        .filter(
            (F.col("hi") - F.col("lo") + 1 >= _SPAN_MIN_TOKENS)
            & (F.col("n_ev") >= _LADDER_MIN_EVIDENCE)
            & (F.col("best") >= _LADDER_MIN_EVIDENCE)
        )
    )
    cover = spans.select(
        "doc_id", F.explode(F.sequence("lo", "hi")).alias("p")
    )
    return owns_caches(_excise_by_cover(d, cover), occ5, hits5, islgrams)


text_strip_template_spans.__doc__ = text_strip_template_spans.__doc__.format(
    ubiq=_LADDER_UBIQUITY_CAP,
    tmax=_TEMPLATE_UBIQUITY_MAX,
    ev=_LADDER_MIN_EVIDENCE,
    min_tokens=_SPAN_MIN_TOKENS,
)


# --- r11: Bloom-filter decontamination (the broadcast-bitset scale arm) ----
#
# `text_decontaminate` joins every training gram against the benchmark gram
# set — correct, and fine while the benchmark side broadcasts. The
# production-scale arm replaces the join with a BLOOM FILTER: k bit
# positions per gram, a bitset sized to the benchmark, membership tested
# row-locally against the broadcast bits — the doc-gram table never joins
# anything. Bloom filters have NO false negatives (every truly tainted
# gram is flagged — the safety direction for decontamination) and a
# documented false-positive rate ~ fill^k (over-flagging only costs a
# little extra dropped data).
#
# Engine-exactness: the k=4 positions are the 4 disjoint 16-bit quarters
# of the gram md5's first 16 hex chars (m = 2^16 bits, no modulo needed),
# and "bit p is set" is definitionally "p is in the set-position set", so
# the DuckDB oracle replays membership with 4 IN-subqueries against the
# same distinct-position set — bit-identical verdicts by construction.
_BLOOM_M = 65536  # 2^16 bits -> a 4-hex-char quarter IS a position
_BLOOM_K = 4


def _bloom_positions(gcol):
    """The k=4 bit positions of one gram md5 — disjoint 16-bit quarters,
    so no two positions of a gram are correlated by construction."""
    return [
        F.conv(F.substring(gcol, 1 + 4 * j, 4), 16, 10).cast("long")
        for j in range(_BLOOM_K)
    ]


_BLOOM_POS_SQL = [
    f"('0x' || substr({{g}}, {1 + 4 * j}, 4))::BIGINT" for j in range(_BLOOM_K)
]


@register(
    "text_bloom_decontaminate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, source, md5(array_to_string(t[i:i+7], ' ')) AS g
  FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
pos AS (
  SELECT DISTINCT unnest([{", ".join(p.format(g="g") for p in _BLOOM_POS_SQL)}]) AS p
  FROM bench
),
member AS (
  SELECT DISTINCT gr.doc_id, gr.g
  FROM grams gr
  WHERE gr.source <> 'src0'
    AND {" AND ".join(f"{p.format(g='gr.g')} IN (SELECT p FROM pos)" for p in _BLOOM_POS_SQL)}
),
hits AS (
  SELECT doc_id, COUNT(*) AS n_bloom FROM member GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(h.n_bloom, 0) AS BIGINT) AS n_bloom_hits,
  COALESCE(h.n_bloom, 0) > 0 AS flagged
FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
LEFT JOIN hits h ON h.doc_id = d.doc_id
""",
    survey_ref=(
        "beyond-reference: Bloom-filter decontamination — the broadcast-"
        "bitset scale arm of text_decontaminate (row-local membership, no "
        "join of the doc-gram table; no false negatives, FPR ~ fill^4)"
    ),
)
def text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a Bloom filter: the benchmark's
    8-gram md5s set k=4 bits each in a 2^16-bit bitset (positions = the
    four disjoint 16-bit quarters of the digest); every training gram is
    then tested ROW-LOCALLY against the broadcast bits, and a doc is
    ``flagged`` iff any gram has all four bits set. Supersets the exact
    join's verdicts (no false negatives — the safety direction; the edge
    suite pins flagged ⊇ contaminated against `text_decontaminate`), with
    FPR ~ fill^4 — at gate fill (~10%) that is ~1e-4 per gram, and a
    production deployment sizes m to the benchmark (~10 bits/gram for
    ~1e-4) exactly like `bits_for_corpus` sizes band widths.

    100-TB shape — what the Bloom arm buys over the exact join: the
    doc-gram relation NEVER joins anything — membership is a narrow
    filter against literal broadcast bits, so the only shuffle left is
    the per-doc hit rollup; the bitset is O(m) bits regardless of corpus
    size. The build side here collects distinct set-positions (bounded
    by m — a model-weights boundary like the IVF centroids; 8 KiB at
    this m) and bakes the bitset into the plan as ONE string literal
    split at runtime; at production m the build becomes a distributed
    word-wise OR aggregate broadcast as a variable, same contract."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= 8, F.sequence(F.lit(1), n - 7)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 8)))
    )
    exploded = d.select("doc_id", "source", F.explode(grams).alias("g"))
    set_pos = {
        r["p"]
        for r in exploded.filter(F.col("source") == "src0")
        .select(F.explode(F.array(*_bloom_positions(F.col("g")))).alias("p"))
        .distinct()
        .collect()
    }
    bitstr = "".join(
        "1" if p in set_pos else "0" for p in range(_BLOOM_M)
    )
    bits = F.split(F.lit(bitstr), "")
    member = None
    for pos in _bloom_positions(F.col("g")):
        test = F.element_at(bits, (pos + 1).cast("int")) == "1"
        member = test if member is None else (member & test)
    hits = (
        exploded.filter(F.col("source") != "src0")
        .filter(member)
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_bloom"))
    )
    return (
        d.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom", F.lit(0)).cast("long").alias("n_bloom_hits"),
            (F.coalesce("n_bloom", F.lit(0)) > 0).alias("flagged"),
        )
    )


@register(
    "text_vocab_topk",
    oracle="""
WITH toks AS (
  SELECT COALESCE(lang, 'und') AS lang, UNNEST(list_distinct(
    list_filter(string_split(text, ' '), x -> x <> ''))) AS token
  FROM documents
),
df AS (
  SELECT lang, token, COUNT(*) AS doc_freq FROM toks GROUP BY lang, token
),
ranked AS (
  SELECT lang, token, doc_freq,
    ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY doc_freq DESC, token ASC
    ) AS rnk
  FROM df
)
SELECT lang, CAST(rnk AS INT) AS rnk, token, CAST(doc_freq AS BIGINT) AS doc_freq
FROM ranked WHERE rnk <= 20
""",
    survey_ref=(
        "beyond-reference: per-language vocabulary induction — top-20 "
        "tokens by document frequency (stopword/vocab discovery), "
        "WindowGroupLimit rank-limited window"
    ),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: the 20 most document-frequent tokens per
    language — the corpus-profiling pass that seeds stopword lists,
    language-specific quality heuristics, and tokenizer health checks.
    Deterministic tie-break (doc_freq DESC, token ASC) so both engines
    rank identically; NULL languages form the 'und' stratum; empty tokens
    from repeated spaces are excluded on both sides.

    100-TB shape: per-document token DEDUP is row-local
    (``array_distinct`` inside the row — no count_distinct shuffle state),
    so document frequency is a plain count after one explode+groupBy with
    map-side partial aggregation; the rank<=20 window rides Spark's
    WindowGroupLimit push-down (per-group top-k without a full sort of the
    vocabulary, same plan shape pinned for `q_docs_top_quality_per_lang`)."""
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    )
    exploded = d.select(
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.explode(toks).alias("token"),
    )
    df_counts = exploded.groupBy("lang", "token").agg(
        F.count("*").alias("doc_freq")
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("doc_freq"), F.col("token").asc()
    )
    return (
        df_counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select(
            "lang",
            F.col("rnk").cast("int").alias("rnk"),
            "token",
            F.col("doc_freq").cast("long").alias("doc_freq"),
        )
    )


#: context-window chunking: 128-token windows, stride 96 (32-token overlap)
_CHUNK_LEN = 128
_CHUNK_STRIDE = 96

# The chunking spec in SQL, ONE copy shared by every oracle that re-derives
# chunks (text_chunk_windows, text_pack_shard_totals) — a rule change
# edited in one oracle but not the other would make the pack gate silently
# test a different chunking than the one produced.
_CHUNK_TOK_CTE = "SELECT doc_id, string_split(text, ' ') AS t FROM documents"
_CHUNK_STARTS_SQL = (
    f"UNNEST(range(1, GREATEST(len(t) - {_CHUNK_LEN - _CHUNK_STRIDE}, 1) + 1, "
    f"{_CHUNK_STRIDE})) AS u(i)"
)
_CHUNK_IDX_SQL = f"(i - 1) // {_CHUNK_STRIDE}"
_CHUNK_NTOK_SQL = f"CAST(LEAST({_CHUNK_LEN}, len(t) - i + 1) AS BIGINT)"


@register(
    "text_chunk_windows",
    oracle=f"""
WITH tok AS (
  {_CHUNK_TOK_CTE}
)
SELECT doc_id,
  {_CHUNK_IDX_SQL} AS chunk_idx,
  array_to_string(t[i:i+{_CHUNK_LEN - 1}], ' ') AS chunk_text,
  {_CHUNK_NTOK_SQL} AS n_tokens
FROM tok,
  {_CHUNK_STARTS_SQL}
""",
    survey_ref="beyond-reference: context-window chunking (sequence-packing prep) — fixed token windows with overlap, row-local",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed 128-token windows with a 96-token
    stride (32-token overlap) — the chunking step that precedes sequence
    packing / embedding in a training pipeline. Emits
    ``(doc_id, chunk_idx, chunk_text, n_tokens)``; the final partial window
    keeps its true token count. A start is generated only while the
    PREVIOUS window does not already reach the end of the document
    (``start <= n_tokens - (window - stride)``), so a doc that fits one
    window yields exactly one chunk and no fully-overlapped tail chunks
    duplicate training data (caught by tests/test_query_edge_corpora.py on
    a 127-token doc).

    100-TB shape: window starts come from ``sequence`` and the text from
    ``slice`` + ``concat_ws`` inside one generator projection — all
    JVM-side, zero shuffles, output row count = ceil(tokens/stride) per doc
    (data-size-proportional, no driver involvement). ``posexplode``
    provides the chunk index for free."""
    d = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - F.lit(_CHUNK_LEN - _CHUNK_STRIDE), F.lit(1)),
        F.lit(_CHUNK_STRIDE),
    )
    gen = d.select(
        "doc_id",
        t.alias("t"),
        n.alias("n"),
        F.posexplode(starts).alias("chunk_idx", "i"),
    )
    return gen.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("t", F.col("i"), _CHUNK_LEN)).alias("chunk_text"),
        F.least(F.lit(_CHUNK_LEN), F.col("n") - F.col("i") + 1)
        .cast("long")
        .alias("n_tokens"),
    )


_PACK_BUDGET, _PACK_SHARDS = 256, 8

#: chunk key + md5 shard assignment in SQL, shared by the two packing
#: oracles (same single-spec discipline as _CHUNK_TOK_CTE above)
_PACK_KEY_SQL = "CAST(doc_id AS VARCHAR) || '#' || CAST(chunk_idx AS VARCHAR)"
_PACK_SHARD_SQL = (
    f"('0x' || substr(md5({_PACK_KEY_SQL}), 1, 8))::BIGINT % {_PACK_SHARDS}"
)

# First-fit bin index over the running fills list: 1-based position of the
# first bin with room (this DuckDB's list_position returns 0, not NULL, on
# no-match — NULLIF normalizes). Appears three times in the recursive member
# because a recursive CTE cannot LATERAL-bind a scalar.
_FFD_POS_SQL = (
    "NULLIF(list_position(list_transform(p.fills, "
    f"f -> f + o.n_tokens <= {_PACK_BUDGET}), true), 0)"
)


@register(
    "text_pack_sequences",
    # Full bit-exact replay of the sharded-FFD packing (VERDICT r8 task 2 —
    # this was the inventory's one rows-only entry since r5). FFD is
    # sequential per shard, but SEQUENTIAL IS EXPRESSIBLE as a recursive
    # CTE that walks each shard's (tokens DESC, key) order carrying the
    # running bin-fills LIST as state: item pos+1 goes into the first bin
    # with room (list_position over the fills) else opens a new one.
    # Shards are gate-scale-small (~60 chunks each at sf0.01), so the
    # recursion depth is trivial; the operator's 100-TB path is the Arrow
    # kernel, this SQL exists only to verify it value-for-value.
    oracle=f"""
WITH RECURSIVE tok AS (
  {_CHUNK_TOK_CTE}
),
chunks AS (
  SELECT doc_id,
    {_CHUNK_IDX_SQL} AS chunk_idx,
    {_CHUNK_NTOK_SQL} AS n_tokens
  FROM tok,
    {_CHUNK_STARTS_SQL}
),
keyed AS (
  SELECT {_PACK_KEY_SQL} AS chunk_key, {_PACK_SHARD_SQL} AS shard, n_tokens
  FROM chunks
),
ordered AS (
  SELECT shard, chunk_key, n_tokens,
    ROW_NUMBER() OVER (
      PARTITION BY shard ORDER BY n_tokens DESC, chunk_key
    ) AS pos
  FROM keyed
),
pack AS (
  SELECT shard, pos, chunk_key, n_tokens,
    CAST(0 AS BIGINT) AS bin_idx,
    [n_tokens] AS fills
  FROM ordered WHERE pos = 1
  UNION ALL
  SELECT o.shard, o.pos, o.chunk_key, o.n_tokens,
    CAST(COALESCE({_FFD_POS_SQL}, len(p.fills) + 1) - 1 AS BIGINT) AS bin_idx,
    CASE WHEN {_FFD_POS_SQL} IS NULL
         THEN list_append(p.fills, o.n_tokens)
         ELSE list_transform(range(1, len(p.fills) + 1),
                i -> CASE WHEN i = {_FFD_POS_SQL}
                          THEN p.fills[i] + o.n_tokens ELSE p.fills[i] END)
    END AS fills
  FROM pack p JOIN ordered o ON o.shard = p.shard AND o.pos = p.pos + 1
)
SELECT p.shard, p.bin_idx, p.chunk_key, p.n_tokens,
  CAST(b.bin_fill AS BIGINT) AS bin_fill
FROM pack p
JOIN (
  SELECT shard, bin_idx, SUM(n_tokens) AS bin_fill FROM pack GROUP BY 1, 2
) b USING (shard, bin_idx)
""",
    survey_ref="beyond-reference: sequence packing (sharded first-fit-decreasing) — the padding-minimization step after chunking",
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the context-window chunks into 256-token training sequences via
    sharded FFD (operators/packing.py): one row per chunk with its
    (shard, bin) assignment and the bin's fill. Deterministic: md5-derived
    shard keys + (tokens DESC, key) FFD order — identical results across
    partitionings, retries, and cluster sizes. The oracle replays the
    packing decision-for-decision (see the register comment); the carried
    ``bin_fill`` equals the bin's member-token sum by the fill-consistency
    invariant, which is how the oracle recovers it without final-state
    bookkeeping."""
    from dblink_spark.operators.packing import pack_sequences

    chunks = text_chunk_windows(spark, sf_dir).select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("key"), "n_tokens"
    )
    return pack_sequences(
        chunks, "key", "n_tokens", budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )


@register(
    "text_pack_shard_totals",
    oracle=f"""
WITH tok AS (
  {_CHUNK_TOK_CTE}
),
chunks AS (
  SELECT doc_id,
    {_CHUNK_IDX_SQL} AS chunk_idx,
    {_CHUNK_NTOK_SQL} AS n_tokens
  FROM tok,
    {_CHUNK_STARTS_SQL}
),
sharded AS (
  SELECT {_PACK_SHARD_SQL} AS shard, n_tokens
  FROM chunks
)
SELECT shard,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  TRUE AS bins_ok, TRUE AS fill_ok, TRUE AS fill_consistent
FROM sharded GROUP BY shard
""",
    survey_ref="beyond-reference: sequence-packing invariants under the hash gate (conservation + bin bounds); companion to text_pack_sequences (full FFD replay since r9)",
)
def text_pack_shard_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated invariant projection of the FFD packing (closing the r5
    gap where the packing path was rows-only + pytest): the ASSIGNMENT is
    order-dependent and not SQL-expressible, but its CONSERVATION LAWS are
    — so this query runs the real packing and emits per shard

    - ``n_chunks`` / ``total_tokens``: recomputed exactly by the oracle
      from the INPUT via the same chunking + md5-shard spec (a dropped or
      duplicated chunk anywhere in the chunk->shard->kernel pipeline
      breaks the hash);
    - ``bins_ok``: bins >= n_oversize + ceil(non-oversize tokens/budget)
      (the bin-count lower bound);
    - ``fill_ok``: every bin without an oversize chunk fills <= budget;
    - ``fill_consistent``: each bin's carried ``bin_fill`` equals the sum
      of its members' tokens (constant within the bin).

    The three booleans are contract-as-data (oracle pins TRUE), the two
    counts are exact — so the gate fails on conservation violations AND on
    kernel-logic regressions. Same plan as `text_pack_sequences` plus two
    map-side-combinable aggregations."""
    from dblink_spark.operators.packing import pack_sequences

    chunks = text_chunk_windows(spark, sf_dir).select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("key"), "n_tokens"
    )
    packed = pack_sequences(
        chunks, "key", "n_tokens", budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )
    bins = packed.groupBy("shard", "bin_idx").agg(
        F.count("*").alias("n_chunks_bin"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("bin_fill").alias("fill_min"),
        F.max("bin_fill").alias("fill_max"),
        F.max("n_tokens").alias("max_chunk"),
    )
    oversize = F.col("max_chunk") > _PACK_BUDGET
    per_shard = bins.groupBy("shard").agg(
        F.sum("n_chunks_bin").cast("long").alias("n_chunks"),
        F.sum("bin_tokens").cast("long").alias("total_tokens"),
        F.count("*").alias("n_bins"),
        F.sum(F.when(oversize, 1).otherwise(0)).alias("n_oversize"),
        F.sum(F.when(~oversize, F.col("bin_tokens")).otherwise(0)).alias(
            "tok_non_over"
        ),
        F.max(F.when(~oversize, F.col("fill_max")).otherwise(0)).alias(
            "max_fill_non_over"
        ),
        F.min(
            (F.col("fill_min") == F.col("fill_max"))
            & (F.col("fill_min") == F.col("bin_tokens"))
        ).alias("fill_consistent"),
    )
    return per_shard.select(
        "shard",
        "n_chunks",
        "total_tokens",
        (
            F.col("n_bins")
            >= F.col("n_oversize")
            + F.ceil(F.col("tok_non_over") / F.lit(_PACK_BUDGET))
        ).alias("bins_ok"),
        (F.col("max_fill_non_over") <= _PACK_BUDGET).alias("fill_ok"),
        "fill_consistent",
    )


# ---------------------------------------------------------------------------
# PII redaction — the scrub step a training-data build runs before release.
# Both engines compile the SAME pattern text: simple character classes,
# counted quantifiers, alternation, and ASCII \b only — valid and identical
# in meaning under Java regex (Spark) and RE2 (DuckDB); no lookaround, no
# backrefs, no unicode classes (Java \b is unicode-aware but the patterns
# only ever border ASCII digits, where the engines agree).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Phone: optional +CC, then (NNN) / NNN with a REQUIRED separator between
# the 3-3-4 groups — separators are what distinguish a phone from a bare
# digit run (bare 10-digit runs fall through to <NUM>, 7-digit local
# numbers are a documented false negative: too collision-prone with
# quantities/ids to mask by shape alone).
_PII_PHONE = r"(\+[0-9]{1,2}[ ])?(\([0-9]{3}\)[ ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}"
# IPv4: exact dotted quad with range-checked octets and \b fences. A
# version string like "v1.2.3.4" never matches (no word boundary after a
# word char); a BARE "1.2.3.4" is indistinguishable from an IP by shape
# and is masked — the conservative choice for a pre-release scrub.
_PII_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_PII_IPV4 = rf"\b({_PII_OCTET}\.){{3}}{_PII_OCTET}\b"
_PII_LONGNUM = r"[0-9]{9,}"
# scrub order: email -> phone -> ipv4 -> longnum. Each count runs on the
# output of the previous pass so one piece of PII yields exactly one typed
# mask (a digit-bearing email is one <EMAIL>, not an <EMAIL> plus a <NUM>;
# a separator-formatted phone is one <PHONE>, its groups never re-counted
# as digit runs).
_PII_PASSES = [
    ("n_emails", _PII_EMAIL, "<EMAIL>"),
    ("n_phones", _PII_PHONE, "<PHONE>"),
    ("n_ipv4", _PII_IPV4, "<IP>"),
    ("n_longnums", _PII_LONGNUM, "<NUM>"),
]


def _pii_oracle_sql() -> str:
    # nested CTE chain: s0 adds t0 (email-scrubbed), s1 adds t1, ...
    ctes, src = [], "documents"
    for i, (_cnt, pat, mask) in enumerate(_PII_PASSES):
        base = "text" if i == 0 else f"t{i - 1}"
        ctes.append(
            f"s{i} AS (SELECT *, regexp_replace({base}, '{pat}', '{mask}', 'g')"
            f" AS t{i} FROM {src})"
        )
        src = f"s{i}"
    n = len(_PII_PASSES) - 1
    count_cols = []
    for i, (cnt, pat, _mask) in enumerate(_PII_PASSES):
        base = "text" if i == 0 else f"t{i - 1}"
        count_cols.append(
            f"CAST(len(regexp_extract_all({base}, '{pat}')) AS INT) AS {cnt}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT doc_id, lang,\n  "
        + ",\n  ".join(count_cols)
        + f",\n  md5(t{n}) AS redacted_fp,\n"
        + f"  CAST(length(t{n}) - length(text) AS BIGINT) AS chars_delta\n"
        + f"FROM s{n}"
    )


@register(
    "text_pii_redact",
    oracle=_pii_oracle_sql(),
    survey_ref=(
        "beyond-reference: PII redaction scrub (email + phone + IPv4 + "
        "long-digit-run masking) — the pre-release step of a training-data "
        "pipeline"
    ),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: emails, separator-formatted phone numbers,
    dotted-quad IPv4 addresses, then 9+-digit runs replaced by typed mask
    tokens (in that order — each count runs on the previous pass's output),
    emitting match counts, the scrubbed-text fingerprint, and the length
    delta. On a clean corpus the fingerprint equals md5(text) — the gate
    therefore pins NO FALSE POSITIVES on every fixture doc, while the
    adversarial edge corpus pins the true-positive behavior (emails with
    digits, phones in 3 separator styles, 7-digit locals NOT masked, IPs at
    octet-range and word boundaries, version strings NOT masked, runs at
    the 8/9 boundary, masks adjacent to punctuation).

    100-TB shape: pure map stage — four JVM regexp passes, no shuffle, no
    UDF; projection pushdown reads only (doc_id, lang, text)."""
    d = load(spark, sf_dir, "documents")
    counts, scrubbed = [], F.col("text")
    for cnt, pat, mask in _PII_PASSES:
        counts.append(F.regexp_count(scrubbed, F.lit(pat)).cast("int").alias(cnt))
        scrubbed = F.regexp_replace(scrubbed, F.lit(pat), F.lit(mask))
    return d.select(
        "doc_id",
        "lang",
        *counts,
        F.md5(scrubbed).alias("redacted_fp"),
        (F.length(scrubbed) - F.length("text")).cast("long").alias("chars_delta"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM quality scoring (CCNet-family): per-doc negative log-likelihood
# under a bigram model trained on a corpus split. The engine-exactness
# problem (log is transcendental; JVM Math.log and libm differ in the last
# ulp — the documented exp() gotcha) is solved by quantizing log-probs to
# 1/16-bit resolution with PURE integer/rational arithmetic:
#
#   qlp(c, t) = floor(16 * log2(c / t))   computed EXACTLY as
#     s  = smallest integer with (c << s) >= t   (bit-length + one compare)
#     r  = (c << s) / t                          (one IEEE division, [1, 2))
#     j  = #{ i in 1..15 : r >= 2^(i/16) }       (literal double thresholds)
#     qlp = -16*s + j
#
# Every step is bit-identical across engines: bit lengths via bin(),
# shifts, one correctly-rounded division on identical integers, and
# comparisons against identical literals — no transcendental is ever
# EVALUATED at query time in either engine (the 2^(i/16) constants are
# Python-computed once and embedded as exact round-trip literals; verified
# equal to floor(16*log2(c/t)) across the integer grid in
# tests/test_query_edge_corpora.py).
_LM_TOPV = 50_000  # model size cap -> broadcastable at any corpus size
_LM_OOV_QLP = -320  # backoff for unseen bigrams: 16 * log2(2^-20)
_LM_TRAIN_PRED = "doc_id % 4 <> 0"  # 75% training split, engine-stable
_LM_THRESHOLDS = [2 ** (i / 16) for i in range(1, 16)]

_LM_J_SQL = " + ".join(
    f"(CASE WHEN r >= {th!r} THEN 1 ELSE 0 END)" for th in _LM_THRESHOLDS
)

#: the Spark twin of `_LM_J_SQL` as ONE expr string (r16, guide §1.2): the
#: 15-term F.when chain cost ~8 py4j round trips per threshold on every
#: consumer's frame BUILD; the doubles round-trip exactly through
#: CAST('repr' AS DOUBLE) (a bare SQL decimal literal would parse as
#: DECIMAL in Spark), so after constant folding the expression tree is
#: literal-identical to the old chain
_LM_J_SPARK_SQL = " + ".join(
    f"(CASE WHEN r >= CAST('{th!r}' AS DOUBLE) THEN 1 ELSE 0 END)"
    for th in _LM_THRESHOLDS
)


# The LM scoring pipeline as ONE shared CTE body: `lmscored` is the
# per-doc (doc_id, n_bigrams, n_oov, sum_qlp16) relation every
# LM-based consumer reads — the NLL report and the CCNet bucket
# assignment extend the SAME spec, so they cannot disagree on the
# model, the split, or the quantization. Spark twin: `_lm_scored`.
_LM_SCORED_CTES = f"""tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bigram
  FROM tok, UNNEST(range(1, len(t))) AS u(i)
),
cb AS (
  SELECT w1, bigram, COUNT(*) AS c FROM bg
  WHERE {_LM_TRAIN_PRED} GROUP BY 1, 2
),
cw AS (SELECT w1, SUM(c) AS tw FROM cb GROUP BY w1),
mtop AS (
  SELECT cb.bigram, cb.c, cw.tw FROM cb JOIN cw USING (w1)
  ORDER BY cb.c DESC, cb.bigram LIMIT {_LM_TOPV}
),
m1 AS (
  SELECT bigram, c, tw, length(bin(tw)) - length(bin(c)) AS s0 FROM mtop
),
m2 AS (
  SELECT *, CASE WHEN (c << s0) >= tw THEN s0 ELSE s0 + 1 END AS s FROM m1
),
m3 AS (
  SELECT *, CAST((c << s) AS DOUBLE) / CAST(tw AS DOUBLE) AS r FROM m2
),
model AS (SELECT bigram, -16 * s + ({_LM_J_SQL}) AS qlp FROM m3),
per_doc AS (
  SELECT bg.doc_id,
    COUNT(*) AS n_bigrams,
    SUM(CASE WHEN m.qlp IS NULL THEN 1 ELSE 0 END) AS n_oov,
    SUM(COALESCE(m.qlp, {_LM_OOV_QLP})) AS sum_qlp16
  FROM bg LEFT JOIN model m USING (bigram)
  GROUP BY bg.doc_id
),
lmscored AS (
  SELECT d.doc_id,
    CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
    CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
    CAST(COALESCE(p.sum_qlp16, 0) AS BIGINT) AS sum_qlp16
  FROM (SELECT doc_id FROM documents) d LEFT JOIN per_doc p USING (doc_id)
)"""


def _lm_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of `_LM_SCORED_CTES` — the per-doc
    (doc_id, n_bigrams, n_oov, sum_qlp16) LM-scoring relation shared by
    the NLL report and the CCNet bucket assignment (one model, one split,
    one quantization).

    Model-based quality scoring, the most common signal after heuristics
    (CCNet's wikipedia-LM perplexity filter): train a bigram LM on the
    ``doc_id % 4 != 0`` split, score EVERY doc's mean negative
    log-likelihood in 1/16-bit units — ``nll_bits`` is bits-per-bigram
    (perplexity = 2^nll_bits), low = fluent/in-distribution, high =
    OOV-heavy or repetitive garbage; NULL for docs with < 2 tokens.
    Unseen bigrams take a fixed 2^-20 backoff. See the module comment
    above `_LM_TOPV` for the exact-quantization construction.

    100-TB shape:
    - the MODEL is the only cross-doc state: one explode+groupBy over the
      train split (map-side partial aggregation; shuffle volume is bounded
      by distinct bigrams per task, not corpus rows), prefix totals
      re-aggregated from the already-tiny bigram-count table (no second
      corpus pass), top-V via TakeOrdered (per-partition top-V, then
      merge) — bounded at {_LM_TOPV} rows, i.e. broadcast weights;
    - scoring is ONE corpus pass: row-local bigram explode (zip_with over
      adjacent slices, zero Python), broadcast hash join against the
      model, groupBy(doc_id) with partial aggregation;
    - production trains once and writes the model table to parquet; the
      in-query derivation exists so the oracle can replay end-to-end.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), n - 1),
        F.slice(toks, F.lit(2), n - 1),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat_ws(" ", a, b).alias("bigram")
        ),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.bigram"
    )
    cb = (
        bg.filter(F.col("doc_id") % 4 != 0)
        .groupBy("w1", "bigram")
        .agg(F.count("*").alias("c"))
    )
    # prefix totals from the aggregated table, NOT a second corpus pass
    cw = cb.groupBy("w1").agg(F.sum("c").alias("tw"))
    mtop = (
        cb.join(cw, "w1")
        .orderBy(F.desc("c"), F.asc("bigram"))
        .limit(_LM_TOPV)
    )
    m = (
        mtop.withColumn(
            "s0", (F.length(F.bin("tw")) - F.length(F.bin("c"))).cast("int")
        )
        .withColumn(
            "s",
            F.when(
                F.expr("shiftleft(c, s0)") >= F.col("tw"), F.col("s0")
            ).otherwise(F.col("s0") + 1),
        )
        .withColumn(
            "r", F.expr("shiftleft(c, s)").cast("double") / F.col("tw").cast("double")
        )
    )
    model = m.select(
        "bigram",
        (-16 * F.col("s") + F.expr(_LM_J_SPARK_SQL)).cast("long").alias("qlp"),
    )
    per_doc = (
        bg.join(F.broadcast(model), "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("qlp").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.sum(F.coalesce("qlp", F.lit(_LM_OOV_QLP))).alias("sum_qlp16"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("sum_qlp16", F.lit(0)).cast("long").alias("sum_qlp16"),
        )
    )


@register(
    "text_lm_bigram_nll",
    oracle=f"""
WITH {_LM_SCORED_CTES}
SELECT doc_id, n_bigrams, n_oov, sum_qlp16,
  CASE WHEN n_bigrams > 0
       THEN CAST(-sum_qlp16 AS DOUBLE) / CAST(16 * n_bigrams AS DOUBLE)
  END AS nll_bits
FROM lmscored
""",
    survey_ref=(
        "beyond-reference: n-gram LM quality scoring (CCNet-family) — "
        "per-doc bigram negative log-likelihood under a train-split model, "
        "integer-quantized log-probs so no transcendental is evaluated at "
        "query time in either engine"
    ),
)
def text_lm_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered NLL report over the shared `_lm_scored` relation:
    nll_bits = -sum_qlp16 / (16 * n_bigrams) — bits-per-bigram
    (perplexity = 2^nll_bits), NULL for docs with < 2 tokens. See
    `_lm_scored` for the model construction and the 100-TB shape."""
    return _lm_scored(spark, sf_dir).select(
        "doc_id",
        "n_bigrams",
        "n_oov",
        "sum_qlp16",
        F.when(
            F.col("n_bigrams") > 0,
            (-F.col("sum_qlp16")).cast("double")
            / (16 * F.col("n_bigrams")).cast("double"),
        ).alias("nll_bits"),
    )



# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: top-5 terms per document by tf * idf, with the
# idf's log2 quantized by the SAME pure-integer construction as the bigram
# LM above (see the comment over `_LM_TOPV`) so no transcendental is
# evaluated at query time in either engine:
#
#   idf16(df, N) = -qlp(df, N) = 16*s - j   (ceil-quantized 16*log2(N/df);
#   s, r, j exactly as in the LM construction with c=df, t=N)
#
# A token appearing in every doc gets idf16 = 0 and never ranks; rare
# tokens rank by an integer score tf * idf16, exact in any engine.
_TFIDF_TOPK = 5


@register(
    "text_tfidf_topk",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
i1 AS (
  SELECT token, df, n_docs,
    length(bin(n_docs)) - length(bin(df)) AS s0
  FROM dfreq, n
),
i2 AS (
  SELECT *, CASE WHEN (df << s0) >= n_docs THEN s0 ELSE s0 + 1 END AS s
  FROM i1
),
i3 AS (
  SELECT *, CAST((df << s) AS DOUBLE) / CAST(n_docs AS DOUBLE) AS r FROM i2
),
idf AS (SELECT token, df, 16 * s - ({_LM_J_SQL}) AS idf16 FROM i3),
scored AS (
  SELECT t.doc_id, t.token, t.tf, i.df, i.idf16,
    t.tf * i.idf16 AS score,
    ROW_NUMBER() OVER (PARTITION BY t.doc_id
      ORDER BY t.tf * i.idf16 DESC, t.token) AS rn
  FROM tf t JOIN idf i USING (token)
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
  CAST(idf16 AS BIGINT) AS idf16, CAST(score AS BIGINT) AS score,
  CAST(rn AS INT) AS rn
FROM scored WHERE rn <= {_TFIDF_TOPK}
""",
    survey_ref=(
        "beyond-reference: tf-idf keyword extraction — top-k terms per doc "
        "with integer-quantized idf so ranking is engine-exact"
    ),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} keywords per document by tf-idf: term frequency counted
    ROW-LOCALLY (distinct tokens of a doc paired with their in-doc counts
    via higher-order functions — the (doc, token) pair relation is built
    without any shuffle), document frequency aggregated once over the
    per-doc distinct relation, idf quantized to 1/16-bit by the LM's
    pure-integer log2 construction, and the integer score ``tf * idf16``
    ranked per doc with a deterministic (score desc, token asc)
    tie-break.

    100-TB shape: ONE corpus tokenize pass persisted and shared by the
    df aggregate and the scoring join (plan-pinned single scan); the df
    shuffle carries (token, count) partials — vocab-sized after map-side
    combine, not corpus-sized; the idf relation stays vocab-sized and
    equi-joins back (AQE broadcasts it when it fits); the final top-k
    rides WindowGroupLimit, so each map task forwards at most {k} rows
    per doc to the rank exchange. The corpus-docs count is the one
    driver-side scalar (the same bounded model boundary every trained
    operator uses)."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    # r16 (guide §1.2 per-task work): (token, tf) pairs by sorted-run
    # counting — sort the token array once, find run starts, and each
    # run's length IS the tf. The previous form scanned the full token
    # array once per DISTINCT token (`size(filter(toks, x == t))`),
    # O(distinct x tokens) per doc — quadratic in document length, ~3x
    # slower at this corpus's 54-token/23-distinct docs and far worse on
    # long documents. Same (token, tf) multiset per doc (runs in the
    # sorted array are exactly the occurrence counts), so the exploded
    # relation is row-identical; only the struct-array ORDER inside the
    # row differs (sorted vs first-occurrence), which explode erases.
    tf_rel = (
        d.select("doc_id", F.expr("sort_array(split(text, ' '))").alias("s"))
        .select(
            "doc_id",
            "s",
            F.expr(
                "filter(sequence(1, size(s)), "
                "i -> i = 1 OR element_at(s, i) != element_at(s, i - 1))"
            ).alias("st"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(st, (stv, k) -> named_struct("
                    "'token', element_at(s, stv), "
                    "'tf', CAST((coalesce(try_element_at(st, k + 2), "
                    "size(s) + 1) - stv) AS BIGINT)))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.token", F.col("p.tf").alias("tf"))
        .persist()
    )
    s0_py = n_docs.bit_length()
    dfreq = tf_rel.groupBy("token").agg(F.count("*").alias("df"))
    i2 = dfreq.withColumn(
        "s0", (F.lit(s0_py) - F.length(F.bin("df"))).cast("int")
    ).withColumn(
        "s",
        F.when(
            F.expr(f"shiftleft(df, s0) >= {n_docs}L"), F.col("s0")
        ).otherwise(F.col("s0") + 1),
    )
    i3 = i2.withColumn(
        "r", F.expr("shiftleft(df, s)").cast("double") / F.lit(float(n_docs))
    )
    idf = i3.select(
        "token",
        "df",
        (16 * F.col("s") - F.expr(_LM_J_SPARK_SQL)).cast("long").alias("idf16"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    scored = (
        tf_rel.join(idf, "token")
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            "idf16",
            (F.col("tf") * F.col("idf16")).alias("score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOPK)
        .select(
            "doc_id",
            "token",
            "tf",
            F.col("df").cast("long").alias("df"),
            "idf16",
            F.col("score").cast("long").alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )
    )
    return owns_caches(scored, tf_rel)


text_tfidf_topk.__doc__ = text_tfidf_topk.__doc__.format(k=_TFIDF_TOPK)


# --- r11: CCNet head/middle/tail perplexity bucketing -----------------------
#
# The step CCNet actually ships after LM scoring: split the corpus into
# HEAD (most fluent third), MIDDLE, TAIL by perplexity terciles, then
# train preferentially on head+middle. The tercile thresholds come from a
# histogram CDF over a BOUNDED integer key — never a global sort — and the
# cut is bucket-granular (an entire tie key lands on one side).
#
# Key: ppl_key = ((-sum_qlp16) * 16) DIV n_bigrams — positive integers
# (qlp16 <= 0 by construction), so integer division truncates identically
# in both engines (floor-vs-truncate only diverges on negatives); the x16
# keeps 1/256-bit granularity so tie buckets stay narrow. Low key = low
# NLL = fluent = head. Docs with no bigrams cannot be scored and are
# defined into the tail (NULL ppl_key rides along).


@register(
    "q_docs_ccnet_bucket",
    oracle=f"""
WITH {_LM_SCORED_CTES},
keyed AS (
  SELECT doc_id, n_bigrams,
    CASE WHEN n_bigrams > 0
         THEN ((-sum_qlp16) * 16) // n_bigrams END AS ppl_key
  FROM lmscored
),
hist AS (
  SELECT ppl_key, COUNT(*) AS cnt FROM keyed
  WHERE ppl_key IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT ppl_key,
    SUM(cnt) OVER (ORDER BY ppl_key ASC ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(cnt) OVER () AS tot
  FROM hist
),
thr AS (
  SELECT MIN(CASE WHEN cum * 3 >= tot THEN ppl_key END) AS t1,
         MIN(CASE WHEN cum * 3 >= 2 * tot THEN ppl_key END) AS t2
  FROM cum
)
SELECT k.doc_id, k.n_bigrams,
  CAST(k.ppl_key AS BIGINT) AS ppl_key,
  CASE WHEN k.ppl_key IS NULL THEN 'tail'
       WHEN k.ppl_key <= t.t1 THEN 'head'
       WHEN k.ppl_key <= t.t2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM keyed k CROSS JOIN thr t
""",
    survey_ref=(
        "beyond-reference: CCNet head/middle/tail perplexity bucketing — "
        "tercile thresholds via histogram CDF over the integer NLL key, "
        "no global sort, bucket-granular cuts"
    ),
)
def q_docs_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's corpus split: every document lands in HEAD (most fluent
    tercile by LM perplexity), MIDDLE, or TAIL — the partition the
    pipeline then samples preferentially from. Consumes the SAME
    `_lm_scored` relation as `text_lm_bigram_nll` (one model, one split,
    one quantization — the two queries cannot disagree on a doc's score),
    keyed by the exact positive-integer ppl_key (see the module comment:
    negatives never enter an integer division, so truncate-vs-floor
    cannot split the engines). Unscorable docs (< 2 tokens) are defined
    into the tail.

    100-TB shape: the threshold never sorts the corpus — the
    `q_docs_quality_quantile_gate` discipline: one partial-aggregating
    groupBy over the bounded ppl_key domain (~8k buckets), a
    single-partition window over the HISTOGRAM only, and a 1-row
    threshold frame (``.limit(1)`` documents the cardinality) broadcast
    back over the persisted keyed relation, which feeds the histogram
    AND the verdict in one scan. The tercile rule is pure integer
    (cum*3 >= tot — no division at all); cuts are bucket-granular, so a
    tie key never splits across buckets (pinned: the laws are recomputed
    from the query's own output in the edge suite)."""
    keyed = (
        _lm_scored(spark, sf_dir)
        .select(
            "doc_id",
            "n_bigrams",
            F.when(
                F.col("n_bigrams") > 0,
                F.expr("((-sum_qlp16) * 16) div n_bigrams"),
            ).alias("ppl_key"),
        )
        .persist()
    )
    hist = (
        keyed.filter(F.col("ppl_key").isNotNull())
        .groupBy("ppl_key")
        .agg(F.count("*").alias("cnt"))
    )
    w_cum = Window.orderBy(F.col("ppl_key").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        "ppl_key",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
    )
    thr = F.broadcast(
        cum.agg(
            F.min(
                F.when(F.col("cum") * 3 >= F.col("tot"), F.col("ppl_key"))
            ).alias("t1"),
            F.min(
                F.when(F.col("cum") * 3 >= 2 * F.col("tot"), F.col("ppl_key"))
            ).alias("t2"),
        ).limit(1)
    )
    out = keyed.crossJoin(thr).select(
        "doc_id",
        "n_bigrams",
        F.col("ppl_key").cast("bigint").alias("ppl_key"),
        F.when(F.col("ppl_key").isNull(), F.lit("tail"))
        .when(F.col("ppl_key") <= F.col("t1"), F.lit("head"))
        .when(F.col("ppl_key") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    return owns_caches(out, keyed)


# --- r11: cross-source gram-overlap matrix ----------------------------------


#: ubiquity cap for the overlap universe: a gram present in MORE distinct
#: sources than this is template boilerplate ("all rights reserved"), not
#: evidence two specific sources mirror each other — and it is also the
#: quadratic blowup (a gram in S sources contributes S(S-1)/2 pairs, so
#: an uncapped universe costs O(S²) per boilerplate gram at million-source
#: scale). The cap bounds per-gram pair fan-out at C(8,2)=28 AND sharpens
#: the signal; singletons (n_src=1) carry no overlap information either.
_OVERLAP_MAX_SRC = 8


@register(
    "q_docs_source_overlap",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, COALESCE(source, 'unk') AS src,
         string_split(text, ' ') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT src, md5(array_to_string(t[i:i+7], ' ')) AS g
  FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
),
pg AS (SELECT g, COUNT(*) AS n_src FROM grams GROUP BY g),
uni AS (SELECT g FROM pg WHERE n_src BETWEEN 2 AND {_OVERLAP_MAX_SRC}),
gs AS (SELECT g, src FROM grams JOIN uni USING (g)),
per_src AS (SELECT src, COUNT(*) AS n_grams FROM gs GROUP BY src),
shared AS (
  SELECT a.src AS src1, b.src AS src2, COUNT(*) AS shared_grams
  FROM gs a JOIN gs b ON a.g = b.g AND a.src < b.src
  GROUP BY 1, 2
)
SELECT s.src1, s.src2, CAST(s.shared_grams AS BIGINT) AS shared_grams,
  CAST(p1.n_grams AS BIGINT) AS n_grams_1,
  CAST(p2.n_grams AS BIGINT) AS n_grams_2,
  CAST((1000 * s.shared_grams) // LEAST(p1.n_grams, p2.n_grams) AS BIGINT)
    AS overlap_milli
FROM shared s
JOIN per_src p1 ON p1.src = s.src1
JOIN per_src p2 ON p2.src = s.src2
""",
    survey_ref=(
        "beyond-reference: cross-source gram-overlap matrix — the "
        "mirror-detection audit run before mixing, ubiquity-capped so "
        "boilerplate grams can neither blow up the pair join nor fake "
        "similarity"
    ),
)
def q_docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources mirror each other: for every source pair sharing at
    least one DISCRIMINATIVE word-8-gram (present in 2..8 distinct
    sources — see `_OVERLAP_MAX_SRC`), the shared-gram count, each side's
    universe size, and an exact integer containment score
    1000·shared / min(n1, n2) — the audit a mixture design runs before
    setting per-source rates, because two near-mirror crawls double-count
    everything downstream. Uses the SAME whitespace-8-gram/md5 spec as
    the boilerplate and decontamination families.

    100-TB shape (two-pass universe build, VERDICT r11 task 1): the gram
    build is row-local (higher-order transform, the `_gram_occurrences`
    construction with the source carried along); ONE corpus-sized
    exchange dedupes it to the distinct (gram, source) relation, which
    persists and feeds everything downstream. The ubiquity filter runs
    as a plain `count(*)` per gram over that relation — constant
    aggregation state per key, so a template gram present in a MILLION
    sources costs one counter, never a million-element set buffer — and
    a left-semi join restricts the relation to the 2..8 universe BEFORE
    any `collect_set` runs: every set the final aggregate materializes
    is ≤ `_OVERLAP_MAX_SRC` elements by construction. Pairs then EXPLODE
    ROW-LOCALLY from each gram's own ≤8-element array — never a
    self-join on the gram relation — with per-gram fan-out bounded at
    C(8,2)=28. The per-source denominators and the pair rollup aggregate
    the same persisted universe relation; everything after the collapse
    is |pairs|-sized. The oracle reaches the identical result through
    the textbook count-filter-join formulation (same two-pass shape)."""
    # r16: widen the single-split gate-scale scan — the row-local 8-gram
    # md5 build (the query's dominant stage) was serializing on one task
    # (2.35x best-of-3; a guaranteed no-op at scale, see widen_small_scan)
    d = widen_small_scan(load(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= 8, F.sequence(F.lit(1), n - 7)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 8)))
    )
    gsrc = d.select(
        F.coalesce("source", F.lit("unk")).alias("src"),
        F.explode(grams).alias("g"),
    )
    # Pass 1: distinct (gram, source) occurrences — the Δ-sized relation
    # every downstream consumer reads (persisted; ONE corpus exchange).
    gs = gsrc.distinct().persist()
    # Pass 2: bounded-state ubiquity pre-count (a counter per gram, NOT a
    # set), then semi-join so collect_set only ever sees 2..8-source
    # grams — the hot-key aggregation-state fix for VERDICT r11 task 1.
    ubiq = gs.groupBy("g").agg(F.count("*").alias("n_src")).filter(
        (F.col("n_src") >= 2) & (F.col("n_src") <= _OVERLAP_MAX_SRC)
    )
    uni = gs.join(ubiq.select("g"), "g", "left_semi").persist()
    per_gram = uni.groupBy("g").agg(
        F.sort_array(F.collect_set("src")).alias("srcs")
    )
    per_src = uni.groupBy("src").agg(F.count("*").alias("n_grams"))
    pair_structs = F.flatten(
        F.transform(
            "srcs",
            lambda s1, i: F.transform(
                F.slice(
                    F.col("srcs"), i + 2, F.size("srcs") - i - 1
                ),
                lambda s2: F.struct(s1.alias("src1"), s2.alias("src2")),
            ),
        )
    )
    shared = (
        per_gram.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.src1").alias("src1"), F.col("p.src2").alias("src2"))
        .agg(F.count("*").alias("shared_grams"))
    )
    p1 = per_src.select(
        F.col("src").alias("src1"), F.col("n_grams").alias("n_grams_1")
    )
    p2 = per_src.select(
        F.col("src").alias("src2"), F.col("n_grams").alias("n_grams_2")
    )
    out = (
        shared.join(p1, "src1")
        .join(p2, "src2")
        .select(
            "src1",
            "src2",
            F.col("shared_grams").cast("bigint").alias("shared_grams"),
            F.col("n_grams_1").cast("bigint").alias("n_grams_1"),
            F.col("n_grams_2").cast("bigint").alias("n_grams_2"),
            F.expr(
                "(1000 * shared_grams) div least(n_grams_1, n_grams_2)"
            ).cast("bigint").alias("overlap_milli"),
        )
    )
    return owns_caches(out, gs, uni)


# --- r12: content-defined chunking (shift-resistant dedup substrate) -------
#
# Fixed-grid chunking (text_chunk_windows) breaks on INSERTION: one token
# prepended to a document shifts every window boundary, so two
# 99%-identical documents share ~zero fixed chunks. Content-defined
# chunking (the Rabin/LBFS/FastCDC family) cuts where a rolling hash of
# the LOCAL window hits a pattern — boundaries are functions of nearby
# content only, so an edit perturbs at most the chunks it touches and
# everything downstream re-aligns. The polynomial hash over a 4-token
# window is exact BIGINT (28-bit token ints, base 31 — max value ~2^45,
# no modulus anywhere), and a position cuts when the hash is divisible by
# 64 (expected chunk ~64 tokens).
_CDC_WINDOW = 4
_CDC_BASE = 31
_CDC_MASK = 64


@register(
    "text_cdc_chunks",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
),
ints AS (
  SELECT doc_id, t, len(t) AS n,
    list_transform(t, x -> ('0x' || substr(md5(x), 1, 7))::BIGINT) AS c
  FROM tok
),
cuts AS (
  SELECT doc_id, t, n,
    list_sort(list_distinct(
      [0] || list_transform(
        list_filter(
          CASE WHEN n >= {_CDC_WINDOW}
               THEN range(1, n - {_CDC_WINDOW} + 2) ELSE [] END,
          i -> (c[i] * {_CDC_BASE ** 3} + c[i + 1] * {_CDC_BASE ** 2}
                + c[i + 2] * {_CDC_BASE} + c[i + 3]) % {_CDC_MASK} = 0
        ),
        i -> i + {_CDC_WINDOW} - 1
      ) || [n]
    )) AS b
  FROM ints
),
chunks AS (
  SELECT doc_id, n,
    md5(array_to_string(t[b[j] + 1 : b[j + 1]], ' ')) AS fp
  FROM cuts, UNNEST(range(1, len(b))) AS u(j)
),
shared AS (
  SELECT fp FROM chunks GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT c.doc_id, CAST(MAX(c.n) AS BIGINT) AS n_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_chunks,
  CAST((1000 * SUM(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END))
       // COUNT(*) AS BIGINT) AS dup_milli
FROM chunks c LEFT JOIN shared s ON s.fp = c.fp
GROUP BY c.doc_id
""",
    survey_ref=(
        "beyond-reference: content-defined chunking (Rabin/FastCDC "
        "family) — shift-resistant chunk fingerprints; the dedup "
        "substrate fixed-grid windows (text_chunk_windows) cannot be"
    ),
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: each document splits at positions where
    the exact polynomial hash of the local {w}-token window is divisible
    by {mask} (expected chunk ~{mask} tokens), each chunk gets an md5
    fingerprint, and the per-doc report counts chunks whose fingerprint
    recurs in at least one OTHER document —
    ``(doc_id, n_tokens, n_chunks, n_dup_chunks, dup_milli)``. Because
    boundaries depend on nearby content only, an insertion re-aligns
    instead of shifting every boundary: the edge suite pins that a
    one-token prepend leaves most chunks shared where the fixed grid
    shares none — the property that makes CDC the dedup substrate for
    storage and crawl pipelines. Sub-{w}-token documents form one chunk.

    100-TB shape: the whole chunk build is ROW-LOCAL higher-order-
    function work (token ints from one md5 each, per-position hashes,
    filter, slice — no explode before the chunk relation, no Python);
    the only corpus-sized exchanges are the chunk-fingerprint rollup
    (map-side combining on fp) and the verdict join back to the Δ-sized
    per-doc chunk relation. The hash is pure BIGINT (max ~2^45 — no
    modulus, no overflow, bit-identical across engines by
    construction)."""
    d = load(spark, sf_dir, "documents")
    w, b3, b2, b1 = (
        _CDC_WINDOW,
        _CDC_BASE ** 3,
        _CDC_BASE ** 2,
        _CDC_BASE,
    )
    # STAGED columns: each array (tokens, token ints, boundaries) is
    # computed ONCE per row and referenced by name — inlining the `c`
    # transform into the four element_at calls per position would make
    # the hash pass O(n^2) md5 work per document (measured: 50s vs ~2s
    # at sf0.001)
    staged = (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .withColumn("c", F.transform("toks", lambda t: _cdc_tok_int(t)))
    )
    pos = F.when(
        F.col("n") >= w, F.sequence(F.lit(1), F.col("n") - w + 1)
    ).otherwise(F.array().cast("array<int>"))
    cc = F.col("c")

    def _h(i):
        return (
            F.element_at(cc, i) * b3
            + F.element_at(cc, i + 1) * b2
            + F.element_at(cc, i + 2) * b1
            + F.element_at(cc, i + 3)
        )

    cut_after = F.transform(
        F.filter(pos, lambda i: _h(i) % _CDC_MASK == 0),
        lambda i: i + w - 1,
    )
    staged = staged.withColumn(
        "b",
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.array(F.lit(0)), cut_after.cast("array<int>"),
                    F.array(F.col("n")),
                )
            )
        ),
    )
    bounds = F.col("b")
    fps = F.transform(
        F.sequence(F.lit(1), F.size(bounds) - 1),
        lambda j: F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("toks"),
                    F.element_at(bounds, j) + 1,
                    F.element_at(bounds, j + 1) - F.element_at(bounds, j),
                ),
            )
        ),
    )
    per_doc = (
        staged.select(
            "doc_id", F.col("n").alias("n_tokens"), F.explode(fps).alias("fp")
        )
        .persist()
    )
    shared = (
        per_doc.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp", F.lit(True).alias("is_dup"))
    )
    out = (
        per_doc.join(shared, "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(
                F.when(F.col("is_dup"), 1).otherwise(0)
            ).cast("bigint").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_chunks",
            "n_dup_chunks",
            F.expr("(1000 * n_dup_chunks) DIV n_chunks").cast("bigint").alias(
                "dup_milli"
            ),
        )
    )
    return owns_caches(out, per_doc)


def _cdc_tok_int(t):
    """28-bit integer per token from its md5's first 7 hex chars — small
    enough that the 4-term base-31 polynomial stays ~2^45 (exact BIGINT,
    no modulus)."""
    return F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint")


text_cdc_chunks.__doc__ = text_cdc_chunks.__doc__.format(
    w=_CDC_WINDOW, mask=_CDC_MASK
)
