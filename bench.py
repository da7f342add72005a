"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice; the second (warm) timing is reported, since the
first run pays one-off JVM/codegen costs that a long-lived cluster amortizes.
Timing forces full materialization via a count on a cheap projection
(df.toPandas would add driver transfer that a real pipeline writes to
parquet instead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q_top_customers",
    "q_events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "ann_topk_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dblink_spark.queries import REGISTRY
    from dblink_spark.session import get_spark

    spark = get_spark("dblink_spark_bench")
    spark.sparkContext.setLogLevel("WARN")

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        best = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
