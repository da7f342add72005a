"""Banded range join: pairs within a bounded distance on an ordering key.

``band_join(left, right, on, by, delta)`` returns every (left, right) pair
with equal ``by`` key and ``|left.on − right.on| <= delta``.

A naive inequality join is planned as a per-key nested loop (O(N·M) per
key). The scale formulation **blocks by bucket**: each side is assigned to
``floor(on / delta)``; a qualifying pair's buckets can differ by at most 1,
so the left side is expanded to its 3 candidate buckets (b−1, b, b+1) and
the join becomes a plain equi-join on ``(by, bucket)`` + a final band
filter. Join fan-out is bounded by local density (rows per bucket), never
by total key cardinality — the same blocking idea the dedup family uses
for similarity joins, applied to the time axis.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    delta: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Equi-join on (by, delta-bucket ± 1) then exact band filter.

    Output columns: every left column prefixed ``left_prefix``, every right
    column prefixed ``right_prefix``.
    """
    if delta <= 0:
        raise ValueError("delta must be positive")

    bucket = F.floor(F.col(on) / F.lit(delta))
    l_exp = left.select(
        F.col(by).alias("__by"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("__bucket"),
        F.struct(*left.columns).alias("__l"),
    )
    r_b = right.select(
        F.col(by).alias("__by"),
        bucket.alias("__bucket"),
        F.struct(*right.columns).alias("__r"),
    )
    joined = l_exp.join(r_b, ["__by", "__bucket"]).filter(
        F.abs(F.col(f"__l.{on}") - F.col(f"__r.{on}")) <= delta
    )
    out = [F.col(f"__l.{c}").alias(f"{left_prefix}{c}") for c in left.columns]
    out += [F.col(f"__r.{c}").alias(f"{right_prefix}{c}") for c in right.columns]
    return joined.select(*out)
