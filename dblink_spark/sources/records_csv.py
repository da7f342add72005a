"""CSV sources/sinks for records and cluster files.

- ``read_records_csv`` — the reference's input scan (ref: Project.scala:173-180):
  header required, all matching attributes read as strings, malformed rows
  dropped, configurable null sentinel.
- ``write_clusters_csv`` / ``read_clusters_csv`` — one comma-joined cluster
  per line (ref: analysis/package.scala:99-108 sink, :36-42 scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_records_csv(
    spark: SparkSession,
    path: str,
    record_id_col: str,
    matching_cols: list[str],
    file_id_col: str | None = None,
    null_value: str | None = None,
) -> DataFrame:
    """Load an input CSV as ``(rec_id string, file_id string, <attrs...>)``.

    All columns are read as strings (no inferSchema — the model
    dictionary-encodes every attribute anyway, and string-typed reads make
    the scan schema stable across files). ``mode=DROPMALFORMED`` and the
    null sentinel match the reference (ref: Project.scala:175-179;
    docs/configuration.md:67-72). When ``file_id_col`` is absent every
    record gets file id "0" (single-file deduplication mode).

    Catalyst prunes unreferenced CSV columns at the scan (ReadSchema lists
    only rec/file/matching columns).
    """
    reader = (
        spark.read.option("header", "true")
        .option("mode", "DROPMALFORMED")
        .option("inferSchema", "false")
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    df = reader.csv(path)
    cols = [F.col(record_id_col).cast("string").alias("rec_id")]
    if file_id_col is not None:
        cols.append(F.col(file_id_col).cast("string").alias("file_id"))
    else:
        cols.append(F.lit("0").alias("file_id"))
    cols += [F.col(c).alias(c) for c in matching_cols]
    return df.select(*cols)


def write_clusters_csv(clusters: DataFrame, path: str, sep: str = ", ") -> None:
    """One line per cluster: members joined by ``sep``
    (ref: analysis/package.scala:99-108 via saveAsTextFile). Distributed
    text write — no driver collect."""
    col = clusters.columns[0]
    clusters.select(
        F.array_join(F.col(col).cast("array<string>"), sep).alias("value")
    ).write.mode("overwrite").text(path)


def read_clusters_csv(spark: SparkSession, path: str, sep: str = ", ") -> DataFrame:
    """Read a cluster-per-line file back to ``cluster array<string>``
    (ref: analysis/package.scala:36-42)."""
    return spark.read.text(path).select(
        F.split(F.col("value"), F.lit(sep)).alias("cluster")
    )
