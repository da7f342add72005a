"""Multimodal pipeline queries over the ``documents`` fixture.

These exercise the real ``mapInPandas`` kernels in
:mod:`dblink_spark.operators.multimodal` end-to-end: the oracle recomputes
the same deterministic byte math in SQL, so a hash match proves the binary
plumbing (encode → Arrow batch → numpy kernel → Arrow → aggregate) is
byte-exact — not just row-counted.

The fixture text is pure ASCII (driver-generated), so DuckDB's
char-oriented ``ord(substr(...))`` equals the UTF-8 byte value; the Spark
side always works on true bytes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dblink_spark.operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    frame_sample,
)
from dblink_spark.queries import load, register

_MEDIA_TYPE_SQL = "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]"


@register(
    "multimodal_bytes_stats",
    oracle=f"""
SELECT {_MEDIA_TYPE_SQL} AS media_type,
  COUNT(*) AS n_items,
  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
  CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
FROM documents
GROUP BY media_type
""",
    survey_ref="beyond-reference: multimodal binary columns + typed metadata",
)
def multimodal_bytes_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata rollup per media type — exercises attach_media's binary +
    struct metadata derivation (pure Catalyst, no Python)."""
    m = attach_media(load(spark, sf_dir, "documents"))
    return m.groupBy(F.col("media_meta.media_type").alias("media_type")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("media")).cast("bigint").alias("total_bytes"),
        F.max(F.length("media")).cast("bigint").alias("max_bytes"),
    )


@register(
    "multimodal_decode_stats",
    oracle=f"""
WITH decoded AS (
  SELECT {_MEDIA_TYPE_SQL} AS media_type,
    strlen(text) AS n_samples,
    list_sum(list_transform(range(1, strlen(text) + 1),
                            i -> ord(substr(text, CAST(i AS INT), 1)))) AS byte_sum
  FROM documents
)
SELECT media_type,
  COUNT(*) AS n_items,
  CAST(SUM(n_samples) AS BIGINT) AS total_samples,
  CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum
FROM decoded GROUP BY media_type
""",
    survey_ref="beyond-reference: multimodal decode kernel (mapInPandas)",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates the Arrow-batched decode kernel's per-item signal stats;
    a hash match proves the kernel saw the exact payload bytes."""
    decoded = decode_media(attach_media(load(spark, sf_dir, "documents")))
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_samples").cast("bigint").alias("total_samples"),
        F.sum("byte_sum").cast("bigint").alias("total_byte_sum"),
    )


_FRAME, _STRIDE = 256, 192


@register(
    "multimodal_frame_index",
    oracle=f"""
WITH f AS (
  SELECT doc_id, strlen(text) AS nb,
    CAST((strlen(text) - 1) // {_STRIDE} + 1 AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, n_frames,
  CAST(list_sum(list_transform(range(0, n_frames),
    k -> LEAST({_FRAME}, nb - k * {_STRIDE}))) AS BIGINT) AS total_frame_bytes
FROM f
ORDER BY doc_id
""",
    survey_ref="beyond-reference: frame sampling (video keyframe / audio window)",
)
def multimodal_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping frame extraction (256-byte frames, stride 192) with the
    frames kept nested; verifies offsets and tail-frame truncation."""
    framed = frame_sample(
        attach_media(load(spark, sf_dir, "documents")),
        frame_size=_FRAME,
        stride=_STRIDE,
    )
    return framed.select(
        "doc_id",
        "n_frames",
        F.aggregate(
            F.transform("frames", lambda fr: F.length(fr).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_frame_bytes"),
    ).orderBy("doc_id")


@register(
    "multimodal_feature_extract",
    oracle=None,  # byte-histogram floats aren't practical to replicate in SQL
    survey_ref="beyond-reference: multimodal feature extraction (embedding-kernel shape)",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type mean of the 8-dim byte-histogram features — the shape
    a model-inference kernel would have (rows-only driver check)."""
    feats = extract_features(attach_media(load(spark, sf_dir, "documents")), dim=8)
    return (
        feats.select(
            "media_type", F.posexplode("features").alias("pos", "val")
        )
        .groupBy("media_type", "pos")
        .agg(F.avg("val").alias("mean_weight"))
        .orderBy("media_type", "pos")
    )
