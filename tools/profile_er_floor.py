"""Decompose the distributed-ER per-iteration cost at paper scale.

VERDICT r4 task 5: at 100k records the Spark path gives only 1.53x at 4
partitions (0.46 -> 0.702 it/s); at 300k it's 4.2x at 8. This tool splits
one iteration into additive components so the fixed floor can be attacked
(or shown irreducible):

  - ``floor``      two-stage shuffle job with trivial data (scheduling cost)
  - ``summary``    collect of the in-band summary rows off a checkpointed df
  - ``identity``   full transition wiring but a no-op kernel (transport:
                   Arrow marshal + shuffle + localCheckpoint, zero compute)
  - ``real``       the actual transition
  - ``kernel_cpu`` driver-side run_fused_sweeps on the same partition states
                   (pure compute, no Spark)

Run: python tools/profile_er_floor.py [n_records] [partitions...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
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
from dblink_spark.er import state as st
from dblink_spark.session import get_spark


def timeit(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    parts = [int(p) for p in sys.argv[2:]] or [1, 4]
    spark = get_spark("er_floor_profile")
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
    s0 = st.init_state(spark, records, cache, SinglePartition(), 1, seed=99)

    # shuffle-job floor: two stages, 32 buckets, trivial rows
    def floor_job():
        spark.range(0, 32, 1, 32).groupBy((F.col("id") % 32).alias("k")).agg(
            F.count("*")
        ).collect()

    print(f"floor(two-stage shuffle job): {timeit(floor_job):.3f}s")

    real_sweeps = st.run_fused_sweeps
    for p in parts:
        if p == 1:
            pf = SinglePartition()
        else:
            pf = KDTreePartitioner(
                num_levels=p.bit_length() - 1, attribute_ids=[3, 4, 0]
            )
            pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        s = st.assign_partitions(s0, pf, pf.num_partitions)
        s = st.transition(s, "PCG-I")  # warm into block format
        s = st.transition(s, "PCG-I")

        # summary-only: job over the checkpointed block_df, no shuffle/kernel
        t_summary = timeit(lambda: st.collect_summary(s.block_df, cache))
        print(f"p={p} summary-only collect: {t_summary:.3f}s")

        # identity kernel: full wiring, zero compute
        st.run_fused_sweeps = lambda ps, *a, **k: ps
        try:
            t0 = time.time()
            s = st.transition(s, "PCG-I")  # transition CONSUMES its input
            t_identity = time.time() - t0
            t0 = time.time()
            s = st.transition(s, "PCG-I")
            t_identity2 = time.time() - t0
        finally:
            st.run_fused_sweeps = real_sweeps
        print(
            f"p={p} identity transition: {t_identity:.3f}s / {t_identity2:.3f}s"
            " (transport + floor)"
        )

        # real transitions
        for i in range(3):
            t0 = time.time()
            s = st.transition(s, "PCG-I")
            print(f"p={p} real transition #{i}: {time.time() - t0:.3f}s")

        # pure kernel compute on the driver over the same states
        tbl_rows = s.block_df.filter("NOT is_summary").collect()
        import pyarrow as pa

        states = []
        for r in tbl_rows:
            one = s.block_df.filter(
                (F.col("partition_id") == r["partition_id"]) & ~F.col("is_summary")
            )
            tbl = pa.Table.from_pandas(one.toPandas())
            states.append(
                (r["partition_id"], st._blocks_to_partition_state(tbl, 5))
            )
        theta = s.theta

        def cpu():
            for pid, ps in states:
                real_sweeps(ps, cache, theta, "PCG-I", s.current_seed, p, pid, 1)

        t_cpu = timeit(cpu, n=2)
        per = []
        for pid, ps in states:
            t0 = time.time()
            real_sweeps(ps, cache, theta, "PCG-I", s.current_seed, p, pid, 1)
            per.append((pid, time.time() - t0, len(ps.entities)))
        print(
            f"p={p} kernel cpu serial-total: {t_cpu:.3f}s; per-partition "
            + ", ".join(f"pid{pid}:{t:.3f}s({n}cl)" for pid, t, n in per)
        )


if __name__ == "__main__":
    main()
