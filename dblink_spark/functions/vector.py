"""Vector column functions over ``array<numeric>`` columns.

All are higher-order-function folds (``zip_with`` / ``aggregate``) that run
inside whole-stage codegen — no Python, no explode (exploding a 64-dim
vector multiplies row count by 64 before a shuffle).

``quantized_dot`` is the cross-engine-exact form used by the oracle-gated
queries: each elementwise product is floored at 1e-9 resolution and summed
as BIGINT, so the result is a deterministic integer regardless of
accumulation order or engine (see dblink_spark.queries.vectors docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

Q_SCALE = 1_000_000_000.0


def dot_product(a, b) -> Column:
    """Float dot product (order-dependent at the last ulp — use
    quantized_dot where cross-engine exactness matters)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def quantized_dot(a, b, scale: float = Q_SCALE) -> Column:
    """Order-insensitive exact dot product: BIGINT sum of
    ``floor(x*y*scale)``."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(scale)).cast(
                "bigint"
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def l2_norm(v) -> Column:
    return F.sqrt(dot_product(v, v))


def cosine_similarity(a, b) -> Column:
    """Float cosine; NULL-safe only as far as the inputs are."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
