"""Adversarial edge-corpus oracle checks: the driver gate runs the fixture
corpus; this module runs the SAME Spark-vs-DuckDB comparison on crafted
documents — empty text, single token, exact window-boundary token counts,
multi-byte unicode, repeated spaces — for the queries whose logic is most
sensitive to tokenization and offsets. A divergence that the benign fixture
can't expose fails here."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from dblink_spark.queries import REGISTRY
from tools.oracle_check import compare

# 128-token window / 96 stride boundaries, empty-ish strings, unicode,
# consecutive spaces (empty tokens), and a token that begins with digits
# (hash-prefix separator probe).
_DOCS = [
    (0, "", "en", "src1"),
    (1, "solo", "en", "src1"),
    (2, " ".join(f"w{i}" for i in range(96)), "en", "src2"),     # = stride
    (3, " ".join(f"w{i}" for i in range(127)), "en", "src2"),    # window-1
    (4, " ".join(f"w{i}" for i in range(128)), "de", "src3"),    # = window
    (5, " ".join(f"w{i}" for i in range(129)), "de", "src3"),    # window+1
    (6, "héllo wörld é́ naïve café", "fr", "src4"),    # multibyte
    (7, "a  b   c", "en", "src4"),                                # empty toks
    (8, "12x 1 2x 12 x", "en", "src5"),                           # digit-lead
    (9, " ".join(f"w{i}" for i in range(224)) + " tail", "en", "src5"),
]

_QUERIES = [
    "text_chunk_windows",
    "q_docs_sample_split",
    "text_token_count",
    "dedup_exact",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus") / "dir"
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in _DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _QUERIES)
def test_edge_corpus_matches_oracle(name, spark, edge_dir, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, edge_dir).toPandas()
    odf = duck.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name} on edge corpus: {problems}"
    assert len(sdf) > 0


def test_chunking_window_boundaries(spark, edge_dir):
    """Exact-boundary docs chunk as the spec says: <=128 tokens -> one
    chunk; 129 tokens -> two (second = the 33-token overlap tail)."""
    out = REGISTRY["text_chunk_windows"].fn(spark, edge_dir)
    per_doc = {
        r["doc_id"]: r["cnt"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_doc[0] == 1  # empty text -> one empty chunk
    # docs that FIT one window -> exactly one chunk (incl. the 127/128
    # boundary cases that previously emitted a fully-overlapped tail)
    assert per_doc[2] == 1 and per_doc[3] == 1 and per_doc[4] == 1
    assert per_doc[5] == 2  # 129 tokens: [1..128] + 33-token tail [97..129]
    assert per_doc[9] == 3  # 225 tokens: starts 1, 97, 193
    tail = (
        out.filter((F.col("doc_id") == 5) & (F.col("chunk_idx") == 1))
        .collect()[0]
    )
    assert tail["n_tokens"] == 129 - 96
