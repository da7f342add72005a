"""Entity-space partitioning: k-d tree over attribute values.

Reference semantics (ref: partitioning/KDTreePartitioner.scala:28-105,
DomainSplitter.scala:42-110, MutableBST.scala):

- numLevels splits -> 2^numLevels leaf partitions;
- at each level, cycle through the configured attributes;
- per tree node, gather the weighted histogram of the split attribute's
  values over the entities in that node, then split the weighted domain
  in two: LPT greedy for domains <= 30 values, sorted weighted-median
  otherwise; warn when split quality <= 0.9.

Spark-first fit: the per-node histograms are one DataFrame aggregation per
level (groupBy(node, value).sum(weight)) instead of a map-accumulator
foreach — the shuffle carries only |nodes|x|domain| rows. The fitted tree is
a tiny Python object captured in kernel closures.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


class PartitionFunction:
    """fit(entity-values DataFrame) + vectorized partition-id lookup
    (ref trait: partitioning/PartitionFunction.scala:24-42)."""

    @property
    def num_partitions(self) -> int:
        raise NotImplementedError

    def fit(self, ent_values: DataFrame) -> None:
        raise NotImplementedError

    def __call__(self, entities: np.ndarray) -> np.ndarray:
        """entities: (N, A) int matrix -> (N,) partition ids."""
        raise NotImplementedError


class SinglePartition(PartitionFunction):
    """numLevels = 0: everything in partition 0."""

    @property
    def num_partitions(self) -> int:
        return 1

    def fit(self, ent_values: DataFrame) -> None:
        pass

    def __call__(self, entities: np.ndarray) -> np.ndarray:
        return np.zeros(entities.shape[0], dtype=np.int64)


@dataclass
class _Split:
    attr_id: int
    # median split: go right if value > split_value
    split_value: int | None = None
    # LPT split: go right if value in right_set
    right_set: frozenset | None = None

    def go_right(self, col: np.ndarray) -> np.ndarray:
        if self.right_set is not None:
            return np.isin(col, np.fromiter(self.right_set, dtype=np.int64))
        return col > self.split_value


def split_domain(values: np.ndarray, weights: np.ndarray) -> tuple[_Split, float]:
    """Split a weighted domain in two (ref: DomainSplitter.scala:42-110).
    Returns the split rule (attr filled by caller) and the split quality."""
    half = weights.sum() / 2.0
    if len(values) <= 30:
        # LPT greedy over decreasing weights (ref LPTDomainSplitter)
        order = np.argsort(-weights, kind="stable")
        left_w = right_w = 0.0
        right = set()
        for i in order:
            if left_w >= right_w:
                right.add(int(values[i]))
                right_w += float(weights[i])
            else:
                left_w += float(weights[i])
        quality = 1.0 - abs(left_w - half) / half if half > 0 else 1.0
        return _Split(-1, right_set=frozenset(right)), quality
    # sorted weighted-median (ref RanDomainSplitter)
    order = np.argsort(values, kind="stable")
    vs, ws = values[order], weights[order]
    cum = 0.0
    i = 0
    while cum <= half and i < len(vs) - 1:
        cum += float(ws[i])
        i += 1
    quality = 1.0 - abs(cum - half) / half if half > 0 else 1.0
    return _Split(-1, split_value=int(vs[i])), quality


class KDTreePartitioner(PartitionFunction):
    """k-d tree with 2^num_levels leaves (ref: KDTreePartitioner.scala)."""

    def __init__(self, num_levels: int, attribute_ids: list[int]):
        if num_levels < 0:
            raise ValueError("num_levels must be non-negative")
        if num_levels > 0 and not attribute_ids:
            raise ValueError("attribute_ids must be non-empty when num_levels > 0")
        self.num_levels = num_levels
        self.attribute_ids = list(attribute_ids)
        # splits[level][node_index_within_level] -> _Split (complete binary tree)
        self.splits: list[list[_Split | None]] = []

    @property
    def num_partitions(self) -> int:
        return 2**self.num_levels

    def fit(self, ent_values: DataFrame) -> None:
        """One DataFrame aggregation job per level: histogram of the split
        attribute per current leaf node."""
        if self.num_levels == 0:
            return
        self.splits = []
        spark_df = ent_values  # column: ent_values array<int>
        attrs = self.attribute_ids
        for level in range(self.num_levels):
            attr_id = attrs[level % len(attrs)]
            fitted = self  # closure snapshot of splits so far

            hist = (
                spark_df.withColumn(
                    "__node", _node_id_column(self.splits, F.col("ent_values"))
                )
                .withColumn("__val", F.col("ent_values")[attr_id])
                .groupBy("__node", "__val")
                .count()
                .collect()
            )
            by_node: dict[int, list[tuple[int, float]]] = {}
            for r in hist:
                by_node.setdefault(r["__node"], []).append((r["__val"], float(r["count"])))
            level_splits: list[_Split | None] = [None] * (2**level)
            for node, vw in by_node.items():
                values = np.array([v for v, _ in vw], dtype=np.int64)
                weights = np.array([w for _, w in vw], dtype=np.float64)
                split, quality = split_domain(values, weights)
                split.attr_id = attr_id
                if quality <= 0.9:
                    logger.warning(
                        "Poor quality split (%.1f%%) at level %d node %d",
                        quality * 100, level, node,
                    )
                level_splits[node] = split
            # nodes with no data: degenerate split (everything goes left)
            for i, s in enumerate(level_splits):
                if s is None:
                    level_splits[i] = _Split(attr_id, split_value=np.iinfo(np.int64).max)
            self.splits.append(level_splits)

    def __call__(self, entities: np.ndarray) -> np.ndarray:
        node = np.zeros(entities.shape[0], dtype=np.int64)
        for level_splits in self.splits:
            right = np.zeros(entities.shape[0], dtype=bool)
            for node_idx, split in enumerate(level_splits):
                mask = node == node_idx
                if not mask.any():
                    continue
                col = entities[mask, split.attr_id]
                right[mask] = split.go_right(col)
            node = node * 2 + right
        return node


def _node_id_column(splits: list, ent_values_col) -> F.Column:
    """Build a Column expression computing the current leaf node id from the
    splits fitted so far — keeps the per-level histogram fully JVM-side."""
    node = F.lit(0)
    for level_splits in splits:
        go_right = F.lit(False)
        for node_idx, split in enumerate(level_splits):
            val = ent_values_col[split.attr_id]
            if split.right_set is not None:
                cond = val.isin(*[int(x) for x in split.right_set]) if split.right_set else F.lit(False)
            else:
                cond = val > F.lit(int(split.split_value))
            go_right = F.when(node == node_idx, cond).otherwise(go_right)
        node = node * 2 + go_right.cast("long")
    return node


class SimplePartitioner(PartitionFunction):
    """Block on one attribute, LPT bin-packing values into n partitions
    (ref: partitioning/SimplePartitioner.scala:33-52, LPTScheduler.scala)."""

    def __init__(self, attr_id: int, n_partitions: int):
        self.attr_id = attr_id
        self._n = n_partitions
        self.value_to_partition: dict[int, int] = {}

    @property
    def num_partitions(self) -> int:
        return self._n

    def fit(self, ent_values: DataFrame) -> None:
        hist = (
            ent_values.withColumn("__val", F.col("ent_values")[self.attr_id])
            .groupBy("__val")
            .count()
            .collect()
        )
        values = np.array([r["__val"] for r in hist], dtype=np.int64)
        weights = np.array([float(r["count"]) for r in hist])
        self.value_to_partition = lpt_schedule(values, weights, self._n)

    def __call__(self, entities: np.ndarray) -> np.ndarray:
        col = entities[:, self.attr_id]
        out = np.zeros(col.shape[0], dtype=np.int64)
        for i, v in enumerate(col):
            out[i] = self.value_to_partition.get(int(v), 0)
        return out


def lpt_schedule(values: np.ndarray, weights: np.ndarray, n_bins: int) -> dict[int, int]:
    """Longest-processing-time greedy assignment (ref: LPTScheduler.scala:38-85)."""
    import heapq

    heap = [(0.0, b) for b in range(n_bins)]
    heapq.heapify(heap)
    order = np.argsort(-weights, kind="stable")
    assignment = {}
    for i in order:
        load, b = heapq.heappop(heap)
        assignment[int(values[i])] = b
        heapq.heappush(heap, (load + float(weights[i]), b))
    return assignment
