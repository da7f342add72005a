"""Text-analysis operators over `documents` — language ID (stopword
heuristic), quality scoring, token counting, fingerprinting. Beyond-reference
pipeline family; everything is built-in string functions (JVM-side, no UDFs)
with an exactly-mirroring DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dblink_spark.queries import load, register

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
