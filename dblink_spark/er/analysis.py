"""Cluster representation conversions + baseline clusterers.

Clusters are DataFrames with a `cluster array<string>` column (sorted
members); membership is (rec_id string, ent_id). All DataFrame-native
(ref: analysis/package.scala, analysis/baselines.scala).
"""

from __future__ import annotations

from itertools import combinations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def canonicalize_pairwise_links(pairs: DataFrame) -> DataFrame:
    """Order each pair, reject self-links, dedupe
    (ref: analysis/package.scala:15-27, P4)."""
    r1, r2 = F.col("rec1"), F.col("rec2")
    filtered = pairs.filter(r1 != r2)
    return filtered.select(
        F.least(r1, r2).alias("rec1"), F.greatest(r1, r2).alias("rec2")
    ).distinct()


def clusters_to_pairwise_links(clusters: DataFrame) -> DataFrame:
    """All within-cluster pairs (ref: analysis/package.scala:70-75, G8).

    Implemented as explode + self-join on a cluster key with rec1 < rec2 —
    shuffle-partitioned by cluster, no driver-side combinations."""
    keyed = clusters.select(
        F.md5(F.col("cluster").cast("string")).alias("__ck"),
        F.explode("cluster").alias("rec"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, (F.col("a.__ck") == F.col("b.__ck")) & (F.col("a.rec") < F.col("b.rec")))
        .select(F.col("a.rec").alias("rec1"), F.col("b.rec").alias("rec2"))
        .distinct()
    )


def membership_to_clusters(membership: DataFrame) -> DataFrame:
    """(rec_id, ent_id) -> clusters (ref: analysis/package.scala:52-63, G6)."""
    return (
        membership.groupBy("ent_id")
        .agg(F.sort_array(F.collect_set("rec_id")).alias("cluster"))
        .select("cluster")
    )


def clusters_to_membership(clusters: DataFrame) -> DataFrame:
    """Clusters -> (rec_id, synthetic ent_id)
    (ref: analysis/package.scala:77-84, G7)."""
    # id must be assigned BEFORE exploding: nondeterministic expressions in the
    # same projection as a generator are evaluated once per *generated* row,
    # which would put every member in its own cluster.
    return (
        clusters.select(
            F.monotonically_increasing_id().alias("ent_id"), "cluster"
        )
        .select("ent_id", F.explode("cluster").alias("rec_id"))
        .select("rec_id", "ent_id")
    )


def exact_match_clusters(records: DataFrame, attr_names: list[str]) -> DataFrame:
    """Baseline: group records agreeing on every matching attribute
    (ref: analysis/baselines.scala:26-32, G9)."""
    key = F.concat_ws("", *[F.coalesce(F.col(a), F.lit("")) for a in attr_names])
    return (
        records.groupBy(key.alias("__key"))
        .agg(F.sort_array(F.collect_set("rec_id")).alias("cluster"))
        .select("cluster")
    )


def near_match_clusters(
    records: DataFrame, attr_names: list[str], num_disagree: int = 1
) -> DataFrame:
    """Blocking baseline: for every way of dropping `num_disagree` attributes,
    group by the remainder; union of (overlapping) clusters
    (ref: analysis/baselines.scala:40-54, G10)."""
    out = None
    for keep in combinations(attr_names, len(attr_names) - num_disagree):
        key = F.concat_ws("", *[F.coalesce(F.col(a), F.lit("")) for a in keep])
        grouped = (
            records.groupBy(key.alias("__key"))
            .agg(F.sort_array(F.collect_set("rec_id")).alias("cluster"))
            .select("cluster")
        )
        out = grouped if out is None else out.unionByName(grouped)
    return out.distinct()
