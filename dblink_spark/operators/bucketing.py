"""Bucketed tables: co-located, shuffle-free joins for 100-TB fact tables.

At scale, the dominant cost of a fact⋈fact equi-join is shuffling both
sides. Spark's bucketing writes each table pre-hash-partitioned (and
optionally sorted) by the join key into a fixed number of buckets; a join
of two tables bucketed on the same key with the same bucket count reads
bucket i of each side into the same task and sort-merge-joins with ZERO
Exchange in the plan — the 100-TB pattern for repeatedly-joined tables
(events⋈users every pipeline run, chain⋈truth every evaluation).

The reference has no bucketing notion (its state co-location is the KD-tree
partitioner, §2.10); this is the storage-level analogue for the analytic
tables. Bucketed tables require the session catalog (``saveAsTable``); the
``path`` option keeps the data external at the caller's location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str | list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed (and by default
    sorted) by ``key``. Joins/aggregations on ``key`` against any table
    bucketed with the SAME key and bucket count are shuffle-free; sorting
    additionally removes the per-task Sort before a merge join.

    Choose ``num_buckets`` so one bucket of the LARGER table fits an
    executor's read chunk (~128-512 MB compressed): e.g. a 10-TB table at
    4096 buckets reads ~2.5 GB/bucket — coarse enough to schedule, fine
    enough to parallelize."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).option("path", path)
    w = w.bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket spec only
    survives via the table metadata — a plain ``spark.read.parquet`` of the
    same files would NOT know the layout and would shuffle again)."""
    return spark.table(table)
