"""Custom operators that go beyond built-in DataFrame primitives.

Each is a composition of DataFrame ops where semantics allow, an
Arrow-batched pandas kernel only where they don't:

- :mod:`.asof` — as-of (nearest-preceding) join via union + window: ONE
  shuffle, no range cross-product.
- :mod:`.rangejoin` — banded |a-b| <= delta join via delta-bucket blocking
  -> equi-join.
- :mod:`.components` — connected components over a pair DataFrame
  (alternating large-star/small-star, O(log n) rounds): the pair->cluster
  closure every dedup pipeline ends with.
- :mod:`.skew` — two-stage salted aggregation for hot grouping keys.
- :mod:`.bucketing` — bucketed+sorted external tables; co-located joins and
  bucket-key aggregations run with zero Exchange.
- :mod:`.packing` — sequence packing (sharded first-fit-decreasing):
  deterministic bin assignment of chunks into fixed token budgets.
- :mod:`.multimodal` — binary media columns with typed metadata; decode /
  feature-extract / resize / frame-sample as Arrow-batched pandas kernels
  over ``mapInPandas``.
"""

from dblink_spark.operators.asof import asof_join  # noqa: F401
from dblink_spark.operators.bucketing import (  # noqa: F401
    read_bucketed,
    save_bucketed,
)
from dblink_spark.operators.components import connected_components  # noqa: F401
from dblink_spark.operators.packing import pack_sequences  # noqa: F401
from dblink_spark.operators.rangejoin import band_join  # noqa: F401
from dblink_spark.operators.skew import salted_aggregate  # noqa: F401
