"""Paper-scale E2E: a ~300k-record synthetic through the DISTRIBUTED path.

The reference claims multi-hundred-thousand-record datasets end-to-end with
near-linear partition scaling (README headline). This runs an RLdata-shaped
300k synthetic through the Spark ``applyInArrow`` kernels (the path a >2M
record dataset takes automatically; forced here by calling ``transition``
directly), KD-tree 4 partitions, PCG-I, and asserts the chain invariants
hold and the partitions stay balanced.

Throughput context (local[32], re-measured after the r5 floor work —
broadcast cache + p-wide iteration shuffle; tools/measure_300k_scaling.py,
best of two 3-5-iteration runs): ~7.5 / 2.9 / 1.7 / 1.5 s per iteration at
1 / 2 / 4 / 8 partitions (2.6x / 4.3x / 5.1x vs one partition; single-
partition timings vary ±15% run-to-run since one 300k-cluster kernel is a
multi-second single thread). The distributed path beats the driver-local
sequential kernels from 2 partitions up at this scale. `bench.py`
(`paper_scale_spark_path`) tracks the 1-vs-4-partition numbers per round
at 100k, where r5 measured 0.49 -> 1.35 it/s (2.7x).

Record count is tunable via SPARK_GRAFT_PAPER_N for slower machines.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

N_RECORDS = int(os.environ.get("SPARK_GRAFT_PAPER_N", "300000"))


@pytest.mark.slow
def test_paper_scale_spark_path_e2e(spark):
    from pyspark.sql import functions as F

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

    pdf = make_rldata(
        n_records=N_RECORDS, dup_fraction=0.2, missing_fraction=0.02, seed=11
    )
    records = (
        spark.createDataFrame(pdf.drop(columns=["ent_id"]))
        .withColumn("file_id", F.lit("0"))
        .repartition(16)
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

    kd = KDTreePartitioner(num_levels=2, attribute_ids=[3, 4, 0])
    kd.fit(s0.df.filter("NOT is_summary").select("ent_values"))
    s = assign_partitions(s0, kd, kd.num_partitions)

    sizes = {
        r["partition_id"]: r["count"]
        for r in s.df.filter("NOT is_summary").groupBy("partition_id").count().collect()
    }
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) < 2 * min(sizes.values()), (
        f"KD-tree must balance the entity space at scale: {sizes}"
    )

    for _ in range(2):
        s = transition(s, "PCG-I")
    assert s.iteration == 2
    assert np.isfinite(s.summary.log_likelihood)

    rows = s.df.filter("NOT is_summary").select("rec_ids").collect()
    all_recs = [r for row in rows for r in row["rec_ids"]]
    assert len(all_recs) == N_RECORDS, "every record survives the shuffle"
    assert len(set(all_recs)) == N_RECORDS, "records partition across clusters"
    # population conserved across cluster migration
    assert len(rows) == N_RECORDS
