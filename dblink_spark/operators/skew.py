"""Skew-mitigation aggregation: two-stage salted groupBy.

A groupBy on a skewed key funnels every row of a hot key through ONE
reducer — at 100 TB a handful of hot keys (a viral user, an "unknown"
country, a default enum) serializes the whole stage. The classic fix is
salting: stage 1 groups by (keys..., salt) so each hot key's rows spread
over ``n_salts`` reducers and combine into at most ``n_salts`` partial
rows; stage 2 merges the tiny partial table by the real keys. Total work
is unchanged, the critical path shrinks by ~n_salts, and the extra
shuffle moves only ``|distinct keys| * n_salts`` rows.

Only decomposable aggregates participate (count/sum/min/max and avg via
sum+count): their merge is exact, so the result is row-for-row identical
to the plain groupBy — which is exactly how the oracle gates it. Spark's
AQE skew handling covers *joins*; aggregation skew still needs this
pattern (map-side partial aggregation already helps, but only when the
upstream partitioning spreads the hot key's rows, which a prior shuffle
on the same key defeats).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: op -> (stage1 aggregate, stage2 merge aggregate)
_OPS = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    exprs: dict[str, tuple[str, "Column | str"]],
    n_salts: int = 16,
    salt_col: "str | Column | None" = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``exprs``: output column -> (op, input column/Column) with op in
    {count, sum, min, max}. The stage-2 merge input is bounded by
    ``n_distinct_keys * n_salts`` rows regardless of input size. Results
    are exactly the plain ``df.groupBy(keys).agg(...)`` (all ops
    decomposable; sums should be DECIMAL for exactness).

    The salt must be DETERMINISTIC per row: with a nondeterministic salt
    (e.g. ``monotonically_increasing_id``), a stage retried after a fetch
    failure can re-salt recomputed rows differently while other reducers'
    partial outputs are reused — dropping or double-counting rows (the
    SPARK-23207 class of bug). So:

    - pass ``salt_col`` naming a stable unique-id column when you have one
      (an event id, a primary key) — best spread, retry-safe;
    - otherwise the salt is ``hash(all input columns)``: a pure function
      of row content, so recomputation always re-derives the same salt.
      Fully duplicated rows then share a salt; if a hot key's rows are
      near-identical across EVERY column, supply ``salt_col`` instead.
    """
    for out, (op, _) in exprs.items():
        if op not in _OPS:
            raise ValueError(f"{out}: op {op!r} not decomposable (use {set(_OPS)})")
    if salt_col is not None:
        basis = [F.col(salt_col) if isinstance(salt_col, str) else salt_col]
    else:
        # hash() rejects MapType inputs, so exclude map columns from the
        # default row-content basis (map-only rows would have no basis —
        # then a salt_col is required)
        hashable = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() != "map"
        ]
        if not hashable:
            raise ValueError(
                "no hashable columns for the default salt (all columns are "
                "maps) — pass salt_col"
            )
        basis = [F.col(c) for c in hashable]
    salt = F.pmod(F.hash(*basis), F.lit(n_salts))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _OPS[op][0](col).alias(f"__p_{out}")
                for out, (op, col) in exprs.items()
            ]
        )
    )
    return stage1.groupBy(*keys).agg(
        *[
            _OPS[op][1](F.col(f"__p_{out}")).alias(out)
            for out, (op, _) in exprs.items()
        ]
    )
