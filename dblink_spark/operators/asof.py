"""As-of join — a core time-series operator Spark's DataFrame API lacks.

``asof_join(left, right, on, by)``: for each left row, attach the single
right row with the greatest ``on`` value ≤ the left's, within the same
``by`` partition (the "latest observation at or before t" join of market
data, attribution, and slowly-changing dimensions).

Implementation is the **union + window** formulation, not a range join:

1. tag both inputs and union them (one relation, schema-aligned),
2. one window per ``by`` key ordered by (on, tag) carries
   ``last(right payload struct, ignoreNulls)`` — the running latest right
   row — and each left row reads it. The payload travels as ONE struct so
   a match is atomic (per-column carry could stitch together different
   right rows when payload columns are legitimately NULL).

Scale shape: exactly ONE shuffle (the window's partitioning by the ``by``
key), no N×M candidate pairs, no inequality-join nested loops. A range
join (``l.on >= r.on``) would force a cartesian-per-key plan; the union
trick stays sort-merge shaped, which survives a 100× scale-up. Right rows
sort before left rows at equal timestamps, so ties resolve to
"at or before" (inclusive) semantics — matching DuckDB's ASOF JOIN
(the oracle for the gate query).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` (and ``on``)
    from the latest ``right`` row with ``right.on <= left.on`` and equal
    ``by`` — NULLs when no such row exists.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    payload = value_cols + [on]

    r_struct = F.struct(*[F.col(c) for c in payload])
    r_tag = right.select(
        F.lit(0).alias("__is_left"),
        F.col(on).alias("__on"),
        F.col(by).alias("__by"),
        r_struct.alias("__r"),
    )
    r_type = r_tag.schema["__r"].dataType
    l_tag = left.select(
        F.lit(1).alias("__is_left"),
        F.col(on).alias("__on"),
        F.col(by).alias("__by"),
        F.lit(None).cast(r_type).alias("__r"),
        F.struct(*left.columns).alias("__l"),
    )
    unioned = l_tag.unionByName(
        r_tag.withColumn("__l", F.lit(None).cast(l_tag.schema["__l"].dataType))
    )

    # right rows (__is_left=0) sort first at equal __on → inclusive "<="
    w = (
        Window.partitionBy("__by")
        .orderBy("__on", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left", "__l", F.last("__r", ignorenulls=True).over(w).alias("__m")
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols]
    out_cols.append(F.col(f"__m.{on}").alias(f"{on}{suffix}"))
    return carried.filter("__is_left = 1").select(*out_cols)
