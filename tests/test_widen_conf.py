"""`queries.widen_small_scan` (r17 ADVICE close): the widen trigger reads
the session's ACTUAL spark.sql.files.maxPartitionBytes instead of a 128 MB
literal, so a deployment that tunes the split size moves the trigger with
it. `_parse_bytes` handles Spark's byte-string conf forms."""

from __future__ import annotations

import pytest

from dblink_spark.queries import _parse_bytes, widen_small_scan


@pytest.mark.parametrize(
    "s,expected",
    [
        ("134217728b", 134217728),
        ("128m", 128 << 20),
        ("128MB", 128 << 20),
        ("1g", 1 << 30),
        ("2GB", 2 << 30),
        ("512k", 512 << 10),
        ("64kb", 64 << 10),
        ("1t", 1 << 40),
        ("12345", 12345),
        (" 128m ", 128 << 20),
    ],
)
def test_parse_bytes(s, expected):
    assert _parse_bytes(s) == expected


def test_widen_respects_tuned_split_size(spark, tmp_path):
    """With a 1-byte split conf, cores x split covers nothing, so the
    widen must be a NO-OP (same plan object semantics: no repartition);
    with the default it fires on a tiny single-row-group file."""
    import pyspark.sql.functions as F

    p = str(tmp_path / "tiny.parquet")
    spark.range(1000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
    ).coalesce(1).write.mode("overwrite").parquet(p)
    d = spark.read.parquet(p)
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "1b")
        narrow = widen_small_scan(d)
        assert "REPARTITION_BY_NUM" not in narrow._jdf.queryExecution().toString()
        spark.conf.set(key, "128m")
        wide = widen_small_scan(d)
        assert "REPARTITION_BY_NUM" in wide._jdf.queryExecution().toString()
    finally:
        spark.conf.set(key, old)
