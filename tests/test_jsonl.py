"""JSONL corpus ingest (sources/jsonl.py): lossless roundtrip against the
parquet fixture, malformed-line quarantine, and compressed shards."""

from __future__ import annotations

import gzip
import os

import pytest

from dblink_spark.sources.jsonl import (
    corrupt_line_stats,
    read_jsonl,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _rowset(df):
    return {
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.select("doc_id", "text", "lang", "source", "n_chars").collect()
    }


def test_roundtrip_lossless(spark, docs, tmp_path):
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out)
    assert _rowset(back) == _rowset(docs)


def test_gzip_shards_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "docs_gz")
    write_jsonl(docs.repartition(4), out, compression="gzip")
    assert any(f.endswith(".json.gz") for f in os.listdir(out))
    back = read_jsonl(spark, out)
    assert _rowset(back) == _rowset(docs)


def test_malformed_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        '{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}',
        "{this is not json",
        '{"doc_id": 2, "text": "ok two", "lang": "en", "source": "s", "n_chars": 6}',
        '["wrong", "shape"]',
    ]
    p.write_text("\n".join(lines) + "\n")

    dropped = read_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in dropped.collect()) == [1, 2]

    kept = read_jsonl(spark, str(p), keep_corrupt=True)
    stats = corrupt_line_stats(kept).collect()[0]
    assert stats["n_lines"] == 4
    assert stats["n_corrupt"] == 2
    good = [r["doc_id"] for r in kept.filter("_corrupt_record IS NULL").collect()]
    assert sorted(good) == [1, 2]
