"""One-off: re-measure 300k-record distributed-ER partition scaling after
the r5 floor work (broadcast cache + p-wide iteration shuffle), to refresh
the numbers quoted in tests/test_paper_scale.py and bench.py docstrings.

Run: python tools/measure_300k_scaling.py [n_records] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from dblink_spark.er.attributes import (
        Attribute,
        BetaParams,
        ConstantSim,
        LevenshteinSim,
    )
    from dblink_spark.er.cache import build_records_cache
    from dblink_spark.er.datagen import make_rldata
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import assign_partitions, init_state, transition
    from dblink_spark.session import get_spark

    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("er_300k_scaling")
    spark.sparkContext.setLogLevel("WARN")

    pdf = make_rldata(
        n_records=n_records, dup_fraction=0.2, missing_fraction=0.02, seed=11
    )
    records = (
        spark.createDataFrame(pdf.drop(columns=["ent_id"]))
        .withColumn("file_id", F.lit("0"))
        .repartition(32)
    )
    attrs = [
        Attribute("by", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bm", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bd", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("fname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
        Attribute("lname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
    ]
    cache = build_records_cache(records, attrs, expected_max_cluster_size=10)
    s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=99)
    # constant-work host-load canary (r8, shared with bench.py): absolute
    # s/iter drifts >2x with host load across sessions — quote the ratios,
    # and divide absolutes by the canary before cross-session comparison
    from bench import _canary

    print(f"# canary (start): {_canary(spark, warm=True):.2f}s")
    base = None
    for p in (1, 2, 4, 8):
        if p == 1:
            pf = SinglePartition()
        else:
            pf = KDTreePartitioner(
                num_levels=p.bit_length() - 1, attribute_ids=[3, 4, 0]
            )
            pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        s = assign_partitions(s0, pf, pf.num_partitions)
        s = transition(s, "PCG-I")  # warm into block format
        t0 = time.time()
        for _ in range(n_iters):
            s = transition(s, "PCG-I")
        sec = (time.time() - t0) / n_iters
        if base is None:
            base = sec
        print(
            f"# {n_records} records, p={p}: {sec:.2f} s/iter "
            f"({base / sec:.2f}x vs 1 partition)"
        )
    print(f"# canary (end): {_canary(spark):.2f}s")


if __name__ == "__main__":
    main()
