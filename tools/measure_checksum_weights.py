"""Re-measure the per-entry cost of one inventory-checksum digest at
sf0.1 — the balancing signal for the shard split (`_SHARD_WEIGHTS` in
dblink_spark/queries/inventory.py).

Methodology (same as the r15 sweep the weights were frozen from): for
each rotated entry, build the SINGLE-ENTRY digest frame (the query's own
plan funneled through the canonical-row md5 aggregate — exactly the
subtree the checksum slot unions) and time `.collect()`, best of N reps
(default 2), one entry at a time in a single session. Output: a sorted
"name": ms map ready to paste into `_SHARD_WEIGHTS`, plus the projected
LPT split totals under the new weights.

Usage: python tools/measure_checksum_weights.py [reps]
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from dblink_spark.queries import REGISTRY  # noqa: E402
from dblink_spark.queries.inventory import (  # noqa: E402
    CHECKSUM_KINDS,
    _canon_spark,
)
from dblink_spark.session import get_spark  # noqa: E402


def single_entry_digest(spark, sf_dir: str, name: str):
    df = REGISTRY[name].fn(spark, sf_dir)
    kinds = dict(CHECKSUM_KINDS[name])
    row = F.concat_ws(
        "\x1f", *[_canon_spark(c, k) for c, k in sorted(kinds.items())]
    )
    return (
        df.select(row.alias("r"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.md5(
                F.array_join(F.sort_array(F.collect_list("r")), "\x1e")
            ).alias("digest"),
        )
        .select(F.lit(name).alias("query"), "n_rows", "digest")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("measure_checksum_weights")
    spark.sparkContext.setLogLevel("ERROR")
    weights: dict[str, int] = {}
    for name in sorted(CHECKSUM_KINDS):
        best = float("inf")
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"weight: {name}")
            t0 = time.monotonic()
            single_entry_digest(spark, sf_dir, name).collect()
            best = min(best, time.monotonic() - t0)
        weights[name] = int(round(best * 1000))
        print(f"# {name}: {weights[name]} ms", file=sys.stderr)

    print(json.dumps(weights, indent=2, sort_keys=True))

    # projected LPT split under the NEW weights (mirrors _shard_names)
    shards: tuple[list[str], list[str]] = ([], [])
    totals = [0.0, 0.0]
    for n in sorted(weights, key=lambda n: (-weights[n], n)):
        i = 0 if totals[0] <= totals[1] else 1
        shards[i].append(n)
        totals[i] += weights[n]
    print(
        f"# projected split: A={totals[0] / 1000:.1f}s "
        f"({len(shards[0])} entries)  B={totals[1] / 1000:.1f}s "
        f"({len(shards[1])} entries)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
