"""Evaluation metrics: pairwise precision/recall/F, contingency table,
adjusted Rand index (ref: analysis/PairwiseMetrics.scala,
BinaryConfusionMatrix.scala, ClusteringContingencyTable.scala,
ClusteringMetrics.scala). All reductions are DataFrame aggregations."""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class ConfusionMatrix:
    tp: int
    fp: int
    fn: int

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else float("nan")

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else float("nan")

    def f_beta(self, beta: float = 1.0) -> float:
        p, r = self.precision, self.recall
        b2 = beta * beta
        d = b2 * p + r
        return (1 + b2) * p * r / d if d else float("nan")


def pairwise_confusion(predicted_pairs: DataFrame, true_pairs: DataFrame) -> ConfusionMatrix:
    """Full-outer join on canonical pairs with presence flags
    (ref: PairwiseMetrics.scala:44-52 + BinaryConfusionMatrix.scala:45-70)."""
    p = predicted_pairs.select("rec1", "rec2", F.lit(True).alias("__pred"))
    t = true_pairs.select("rec1", "rec2", F.lit(True).alias("__true"))
    joined = p.join(t, ["rec1", "rec2"], "full_outer")
    row = joined.agg(
        F.sum(F.when(F.col("__pred") & F.col("__true"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("__pred") & F.col("__true").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("__pred").isNull() & F.col("__true"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    return ConfusionMatrix(tp=row["tp"] or 0, fp=row["fp"] or 0, fn=row["fn"] or 0)


def contingency_table(pred_membership: DataFrame, true_membership: DataFrame) -> DataFrame:
    """Sparse clustering contingency table via inner join on rec_id
    (ref: ClusteringContingencyTable.scala:56-65, J2)."""
    p = pred_membership.select("rec_id", F.col("ent_id").alias("pred_uid"))
    t = true_membership.select("rec_id", F.col("ent_id").alias("true_uid"))
    return (
        p.join(t, "rec_id")
        .groupBy("pred_uid", "true_uid")
        .agg(F.count("*").alias("n_common"))
    )


def adjusted_rand_index(table: DataFrame) -> float:
    """ARI from the sparse contingency table — three aggregations + driver
    formula (ref: ClusteringMetrics.scala:42-83, E5)."""
    comb2 = lambda c: (c * (c - 1) / 2)  # noqa: E731

    total_comb = table.agg(
        F.sum(comb2(F.col("n_common"))).alias("s"),
        F.sum("n_common").alias("n"),
    ).collect()[0]
    pred_comb = (
        table.groupBy("pred_uid")
        .agg(F.sum("n_common").alias("c"))
        .agg(F.sum(comb2(F.col("c"))).alias("s"))
        .collect()[0]["s"]
    )
    true_comb = (
        table.groupBy("true_uid")
        .agg(F.sum("n_common").alias("c"))
        .agg(F.sum(comb2(F.col("c"))).alias("s"))
        .collect()[0]["s"]
    )
    total = float(total_comb["s"] or 0)
    n = float(total_comb["n"] or 0)
    expected = float(pred_comb) * float(true_comb) / comb2(n) if n >= 2 else 0.0
    max_index = (float(pred_comb) + float(true_comb)) / 2.0
    if max_index == expected:
        # Degenerate: both clusterings are all-singletons (or single-cluster)
        # and therefore identical — ARI is 1 by convention (sklearn agrees).
        return 1.0
    return (total - expected) / (max_index - expected)


@dataclass
class PairwiseMetrics:
    confusion: ConfusionMatrix

    @property
    def precision(self) -> float:
        return self.confusion.precision

    @property
    def recall(self) -> float:
        return self.confusion.recall

    @property
    def f1(self) -> float:
        return self.confusion.f_beta(1.0)


def evaluate_pairwise(predicted_clusters: DataFrame, true_clusters: DataFrame) -> PairwiseMetrics:
    """P/R/F1 over within-cluster pairs (ref: PairwiseMetrics.scala:54-63, E3)."""
    from dblink_spark.er.analysis import clusters_to_pairwise_links

    return PairwiseMetrics(
        pairwise_confusion(
            clusters_to_pairwise_links(predicted_clusters),
            clusters_to_pairwise_links(true_clusters),
        )
    )


def evaluate_clustering(predicted_clusters: DataFrame, true_clusters: DataFrame) -> float:
    """Adjusted Rand index between two clusterings (ref: E4+E5)."""
    from dblink_spark.er.analysis import clusters_to_membership

    return adjusted_rand_index(
        contingency_table(
            clusters_to_membership(predicted_clusters),
            clusters_to_membership(true_clusters),
        )
    )
