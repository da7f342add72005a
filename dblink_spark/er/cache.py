"""RecordsCache: dataset statistics + dictionary encoding.

The reference gathers per-file sizes, per-attribute value counts, and
missing counts in a single RDD foreach with map-accumulators
(ref: RecordsCache.scala:74-106) and encodes records via a broadcast
string→id map (ref: RecordsCache.scala:120-134).

Spark-first rebuild:
- statistics are DataFrame aggregations (whole-stage codegen, map-side
  partial aggregation — the accumulator pattern is exactly what Catalyst
  generates for groupBy().count());
- dictionary encoding is a broadcast hash join per attribute against the
  per-attribute dimension table (value, id), missing → -1 via coalesce.
  All joins fuse into one stage; nothing leaves the JVM.

The resulting `RecordsCache` (attribute indexes + file sizes) is a small
Python object broadcast into the MCMC kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dblink_spark.er.attributes import Attribute, BetaParams
from dblink_spark.er.index import AttributeIndex, build_attribute_index


@dataclass
class RecordsCache:
    attributes: list[Attribute]
    indexes: list[AttributeIndex]
    file_sizes: dict[str, int]
    missing_counts: dict[tuple[str, int], int]  # (file_id, attr_id) -> count

    @property
    def num_records(self) -> int:
        return sum(self.file_sizes.values())

    @property
    def num_attributes(self) -> int:
        return len(self.attributes)

    @property
    def file_ids(self) -> list[str]:
        return sorted(self.file_sizes)

    def distortion_priors(self) -> list[BetaParams]:
        return [a.distortion_prior for a in self.attributes]


def build_records_cache(
    records: DataFrame,
    attributes: list[Attribute],
    expected_max_cluster_size: int = 10,
) -> RecordsCache:
    """Gather stats and build per-attribute indexes.

    `records` schema: rec_id string, file_id string, and one string column
    per matching attribute (nulls = missing).
    """
    attr_names = [a.name for a in attributes]

    # per-file sizes + per-(file, attr) missing counts in ONE aggregation job
    agg_exprs = [F.count("*").alias("__n")]
    for i, name in enumerate(attr_names):
        agg_exprs.append(
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0)).alias(f"__miss_{i}")
        )
    stats = records.groupBy("file_id").agg(*agg_exprs).collect()
    file_sizes = {r["file_id"]: r["__n"] for r in stats}
    missing_counts = {
        (r["file_id"], i): r[f"__miss_{i}"]
        for r in stats
        for i in range(len(attr_names))
        if r[f"__miss_{i}"]
    }

    # per-attribute domains: one groupBy-count per attribute (jobs run over
    # the cached records projection; each is a single shuffle of |domain| rows)
    indexes = []
    powers = range(1, expected_max_cluster_size + 1)
    for attr in attributes:
        dom = (
            records.select(F.col(attr.name).alias("value"))
            .filter(F.col("value").isNotNull())
            .groupBy("value")
            .agg(F.count("*").cast("double").alias("weight"))
        )
        indexes.append(build_attribute_index(dom, attr.sim_fn, precache_powers=powers))

    return RecordsCache(
        attributes=attributes,
        indexes=indexes,
        file_sizes=file_sizes,
        missing_counts=missing_counts,
    )


def encode_records(records: DataFrame, cache: RecordsCache) -> DataFrame:
    """Dictionary-encode record attribute values to dense int ids.

    Returns: rec_id string, file_id string, values array<int> (missing = -1).
    Encoding joins are broadcast hash joins against tiny dimension tables
    (ref semantics: RecordsCache.scala:120-134, valueIdxOf per attribute).
    """
    spark = records.sparkSession
    out = records
    id_cols = []
    for attr_id, (attr, idx) in enumerate(zip(cache.attributes, cache.indexes)):
        dim = spark.createDataFrame(
            [(str(v), int(i)) for i, v in enumerate(idx.values)],
            f"__v_{attr_id} string, __id_{attr_id} int",
        )
        out = out.join(
            F.broadcast(dim), on=out[attr.name] == dim[f"__v_{attr_id}"], how="left"
        )
        id_cols.append(F.coalesce(F.col(f"__id_{attr_id}"), F.lit(-1)))
    return out.select(
        F.col("rec_id").cast("string").alias("rec_id"),
        F.col("file_id").cast("string").alias("file_id"),
        F.array(*id_cols).alias("values"),
    )


def with_file_id(records: DataFrame, file_id_col: str | None) -> DataFrame:
    """Normalize the optional file-identifier column (ref: State.scala:359-375
    defaults fileId to "0" when absent)."""
    if file_id_col is None:
        return records.withColumn("file_id", F.lit("0"))
    return records.withColumn("file_id", F.col(file_id_col).cast("string"))
