"""JSONL (newline-delimited JSON) ingest/egress for document corpora.

Beyond-reference source format: large-scale training corpora ship as
sharded ``.jsonl``/``.jsonl.gz``, one document object per line. Design for
100 TB:

- the reader takes an EXPLICIT schema — schema inference on JSON is a
  full extra pass over the data (and type-unstable across shards);
- malformed lines route to a ``_corrupt_record`` column (PERMISSIVE) or
  drop (DROPMALFORMED) instead of failing the job — at corpus scale a few
  broken lines per shard are a certainty, not an exception;
- compressed shards decode transparently (codec from the file extension)
  and files split per-line for parallelism (uncompressed / splittable
  codecs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: schema of the documents fixture (TESTDATA.md)
DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with an enforced schema.

    ``keep_corrupt=True`` appends a ``_corrupt_record`` string column
    holding the raw line for rows that failed to parse (PERMISSIVE mode —
    quarantine-and-continue); otherwise malformed lines are dropped
    (DROPMALFORMED) and well-formed rows flow through untouched."""
    full_schema = schema + (", _corrupt_record string" if keep_corrupt else "")
    reader = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE" if keep_corrupt else "DROPMALFORMED")
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a corpus as JSONL shards (one object per line, one file per
    partition — shard count is controlled by the caller's partitioning)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def corrupt_line_stats(df_with_corrupt: DataFrame) -> DataFrame:
    """Quarantine summary for a ``keep_corrupt=True`` read: rows parsed vs
    rows quarantined — the ingest health signal a pipeline monitors.

    Spark disallows JSON-scan queries whose referenced columns are ONLY the
    corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and Catalyst
    prunes aggregates that are later dropped — so the data-column probe
    stays in the output (rows whose first field parsed), which keeps the
    scan legal without caching the corpus."""
    data_cols = [c for c in df_with_corrupt.columns if c != "_corrupt_record"]
    return df_with_corrupt.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.count(F.col(data_cols[0])).alias(f"n_{data_cols[0]}_parsed"),
    )
