"""Measure multi-partition sweep fusion AT SCALE (VERDICT r14 task 1).

rl10k p=4 showed fusion amortizing the ~0.157s/iter plan+job FLOOR
(8→52 it/s at k=1→8), but at 1M records the floor is noise next to the
kernels — what fusion amortizes there is the per-iteration migration
SHUFFLE (the state only exchanges at job boundaries) plus the summary
job. The win and the quality cost can both differ from rl10k, so this
script measures both:

1. THROUGHPUT: sec/iter at p=8/16/32 for k=1/2/4/8, every point through
   the same ``transition_multisweep`` call path (k=1 included, so the
   baseline shares the methodology), and an interleaved constant-work
   canary bracketing each point (host-load adjudication — within-session
   RATIOS are the signal, absolutes are weather). The k points are
   INTERLEAVED in round-robin cycles and each k reports the median of
   its per-cycle readings: a sequential one-shot-per-k sweep conflates
   the chain's own state drift (the fresh→equilibrium transient makes
   later sweeps costlier) with the k effect — the first run of this tool
   did exactly that and its k ordering was unreadable.

2. QUALITY at one configuration (p=8): two chains from the SAME initial
   state and the SAME seed stream (transition_multisweep advances
   current_seed by n_sweeps*p — identical arithmetic to k unfused
   transitions), one at k=1 and one at k=8, run for an EQUAL sweep
   count, then final-state pairwise F1/ARI against the synthetic ground
   truth. This is an early-chain equal-sweep comparison (the 1M chain is
   nowhere near equilibrium at this length) — it reads the k=8 cadence
   relaxation's marginal cost at this scale, not the converged posterior.

r16 (VERDICT r15 task 2): the r15 artifact carried 2 readings per (p,k)
cell with 3-4x spreads on some 16p/32p cells — enough to support the
k=2-saturation recommendation but not "erodes at k=8" as a settled
fact. Cycles are now a CLI arg defaulting to 3 (median of 3+ readings
per cell, like every other probe), quality_sweeps=0 skips the
early-chain quality section (superseded by the kept-sample measurement
in tools/measure_1m_fused_quality.py), and the artifact name is
versioned by the tag argument so cross-round diffs never compare
different-cycle methodologies as the same.

Usage:  python tools/measure_1m_multisweep.py [n_records] [sweeps_per_point] [quality_sweeps] [n_cycles] [tag]
Writes: BENCH_1M_MULTISWEEP_<tag>.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sweeps_per_point = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    quality_sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_cycles = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    tag = sys.argv[5] if len(sys.argv) > 5 else "r16"

    import numpy as np

    import bench
    from dblink_spark.er.datagen import make_rldata
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import (
        assign_partitions,
        init_state,
        transition_multisweep,
    )
    from dblink_spark.session import get_spark

    spark = get_spark("dblink_1m_multisweep")
    spark.sparkContext.setLogLevel("WARN")

    # Build the problem KEEPING ground truth (bench._make_er_problem drops
    # ent_id; the quality section needs it).
    from pyspark.sql import functions as F

    from dblink_spark.er.attributes import (
        Attribute,
        BetaParams,
        ConstantSim,
        LevenshteinSim,
    )
    from dblink_spark.er.cache import build_records_cache

    t0 = time.time()
    pdf = make_rldata(
        n_records=n_records, dup_fraction=0.2, missing_fraction=0.02, seed=17
    )
    truth_pdf = pdf[["rec_id", "ent_id"]].copy()
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
    s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=31)
    build_s = round(time.time() - t0, 1)
    print(f"# problem build {build_s}s", file=sys.stderr, flush=True)

    out: dict = {
        "n_records": n_records,
        "sweeps_per_point": sweeps_per_point,
        "quality_sweeps": quality_sweeps,
        "n_cycles": n_cycles,
        "build_sec": build_s,
        "methodology": (
            "every k through transition_multisweep (k=1 = same call path); "
            f"k points interleaved round-robin over {n_cycles} cycles, "
            "median per k (chain-state drift lands on every k equally); "
            "per-point canary; within-session ratios are the signal"
        ),
    }

    import statistics as st
    bench._canary(spark, warm=True)
    fitted: dict[int, KDTreePartitioner] = {}
    for p in (8, 16, 32):
        pf = KDTreePartitioner(
            num_levels=p.bit_length() - 1, attribute_ids=[3, 4, 0]
        )
        pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        fitted[p] = pf
        s = assign_partitions(s0, pf, pf.num_partitions)
        s = transition_multisweep(s, "PCG-I", 1)  # warm this p
        readings: dict[int, list[float]] = {k: [] for k in (1, 2, 4, 8)}
        cans: dict[int, list[float]] = {k: [] for k in (1, 2, 4, 8)}
        for cyc in range(n_cycles):
            for k in (1, 2, 4, 8):
                jobs = max(sweeps_per_point // k, 1)
                can = bench._canary(spark)
                t0 = time.time()
                for _ in range(jobs):
                    s = transition_multisweep(s, "PCG-I", k)
                spi = (time.time() - t0) / (k * jobs)
                readings[k].append(spi)
                cans[k].append(can)
                print(
                    f"# p={p} cycle={cyc} k={k}: {spi:.2f} s/iter "
                    f"({k * jobs} sweeps; canary {can:.2f}s)",
                    file=sys.stderr, flush=True,
                )
        k1_spi = st.median(readings[1])
        for k in (1, 2, 4, 8):
            spi = st.median(readings[k])
            out[f"ms_{p}p_k{k}_sec_per_iter"] = round(spi, 3)
            out[f"ms_{p}p_k{k}_readings"] = [round(x, 3) for x in readings[k]]
            out[f"ms_{p}p_k{k}_canaries"] = cans[k]
            if k > 1:
                out[f"ms_{p}p_k{k}_speedup_vs_k1"] = round(k1_spi / spi, 3)

    # ---- quality at p=8: equal-sweep k=1 vs k=8 chains, same seed stream
    from dblink_spark.er.analysis import membership_to_clusters
    from dblink_spark.er.metrics import evaluate_clustering, evaluate_pairwise

    truth = None
    if quality_sweeps > 0:
        truth = membership_to_clusters(
            spark.createDataFrame(truth_pdf).select(
                "rec_id", F.col("ent_id").cast("string").alias("ent_id")
            )
        ).cache()
        truth.count()

    def final_state_quality(k: int) -> dict:
        s = assign_partitions(s0, fitted[8], 8)
        jobs = quality_sweeps // k
        t0 = time.time()
        for _ in range(jobs):
            s = transition_multisweep(s, "PCG-I", k)
        dt = round(time.time() - t0, 1)
        pred = (
            s.df.filter("NOT is_summary AND size(rec_ids) > 0")
            .select(F.col("rec_ids").alias("cluster"))
        )
        pw = evaluate_pairwise(pred, truth)
        ari = evaluate_clustering(pred, truth)
        print(
            f"# quality p=8 k={k}: {k * jobs} sweeps in {dt}s -> "
            f"F1 {pw.f1:.4f} (P {pw.precision:.4f} R {pw.recall:.4f}) "
            f"ARI {ari:.4f}",
            file=sys.stderr, flush=True,
        )
        return {
            "sweeps": k * jobs,
            "wall_sec": dt,
            "f1": round(pw.f1, 4),
            "precision": round(pw.precision, 4),
            "recall": round(pw.recall, 4),
            "ari": round(ari, 4),
        }

    if quality_sweeps > 0:
        out["quality_8p_k1"] = final_state_quality(1)
        out["quality_8p_k8"] = final_state_quality(8)
        out["quality_note"] = (
            "equal-sweep final-state comparison from the same init + seed "
            "stream; early-chain (not converged) — reads the k=8 cadence "
            "relaxation's marginal cost at 1M, not the posterior"
        )
    else:
        out["quality_note"] = (
            "quality section skipped (quality_sweeps=0): kept-sample "
            "quality under the recommended k=2 is measured by "
            "tools/measure_1m_fused_quality.py (BENCH_1M_FUSEDQ_*)"
        )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, f"BENCH_1M_MULTISWEEP_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
