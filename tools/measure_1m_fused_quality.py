"""Kept-sample quality at 1M under the RECOMMENDED k=2 sweep fusion
(VERDICT r15 task 1).

The r15 fusion artifact measured 1M THROUGHPUT thoroughly (k=2 wins
1.63x/1.42x/1.42x at p=8/16/32) but quality only at 64 sweeps — an
early-chain final-state reading, far from any regime a user keeps
samples in. rl10k showed fusion's quality cost appears only near
convergence, so the "kernel-bound 1M+ chains -> k=2" recommendation
needs a kept-sample number from the longest 1M chain the host affords.

What this measures: TWO production-path chains (``sampler.sample`` with
burn-in + thinning, distributed p=8, chain parquet on disk) forked from
the SAME initial state (init_state seed 31) and consuming the same
seed-stream arithmetic (transition_multisweep advances current_seed by
n_sweeps * p — identical for k=1 and k=2 at matched sweep counts):

- chain A: multisweep_k=1 (exact reference cadence, the baseline)
- chain B: multisweep_k=2 (the recommended 1M config: θ + migration on
  a 2-sweep cadence)

both for the SAME total sweep count (matched-sweep comparison), then
sMPC over the kept samples (most_probable_clusters ->
shared_most_probable_clusters — the reference's point estimate,
LinkageChain.scala:52-109) scored F1/ARI against the synthetic ground
truth. Chain length adapts to the host: a short timed probe picks the
largest total sweep count that fits ``wall_budget_min`` (floor 150,
cap 400), so a quiet host buys a longer chain rather than idle time.

The chains are seeded and deterministic; the QUALITY numbers are exact
re-runnable facts. Wall times are recorded with bracketing canaries but
are incidental (throughput already has its own artifact).

Usage: python tools/measure_1m_fused_quality.py [n_records] [wall_budget_min]
Writes: BENCH_1M_FUSEDQ_r16.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    wall_budget_min = float(sys.argv[2]) if len(sys.argv) > 2 else 75.0

    from pyspark.sql import functions as F

    import bench
    from dblink_spark.er.analysis import membership_to_clusters
    from dblink_spark.er.attributes import (
        Attribute,
        BetaParams,
        ConstantSim,
        LevenshteinSim,
    )
    from dblink_spark.er.cache import build_records_cache
    from dblink_spark.er.chain import (
        most_probable_clusters,
        shared_most_probable_clusters,
    )
    from dblink_spark.er.datagen import make_rldata
    from dblink_spark.er.metrics import evaluate_clustering, evaluate_pairwise
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.sampler import SamplerOptions, sample
    from dblink_spark.er.state import (
        assign_partitions,
        init_state,
        transition_multisweep,
    )
    from dblink_spark.session import get_spark

    spark = get_spark("dblink_1m_fused_quality")
    spark.sparkContext.setLogLevel("WARN")

    # Same problem as the throughput artifact (BENCH_1M_MULTISWEEP_r15):
    # make_rldata seed 17, dup 0.2, missing 0.02; init seed 31; p=8 via
    # KDTree on (fname, lname, by).
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
    part = KDTreePartitioner(num_levels=3, attribute_ids=[3, 4, 0])
    part.fit(s0.df.filter("NOT is_summary").select("ent_values"))
    build_s = round(time.time() - t0, 1)
    print(f"# problem build {build_s}s", file=sys.stderr, flush=True)

    truth = membership_to_clusters(
        spark.createDataFrame(truth_pdf).select(
            "rec_id", F.col("ent_id").cast("string").alias("ent_id")
        )
    ).cache()
    truth.count()

    bench._canary(spark, warm=True)

    # ---- adaptive chain length: probe s/iter on a throwaway fork, then
    # pick the largest total sweep count fitting the wall budget. The
    # unfused chain costs ~spi/iter, the fused ~spi/1.4 (the measured
    # p=8 k=2 win), so total wall ≈ N * spi * (1 + 1/1.4) + eval.
    sp = assign_partitions(s0, part, 8)
    sp = transition_multisweep(sp, "PCG-I", 1)  # warm the p=8 shuffle path
    tp = time.time()
    probe_sweeps = 4
    sp = transition_multisweep(sp, "PCG-I", probe_sweeps)
    spi = (time.time() - tp) / probe_sweeps
    del sp
    budget_s = wall_budget_min * 60.0
    n_total = int(budget_s / (spi * (1 + 1 / 1.4)))
    n_total = max(150, min(400, n_total))
    thin = 10
    burnin = (n_total // 3) // thin * thin
    sample_size = (n_total - burnin) // thin
    n_total = burnin + sample_size * thin
    print(
        f"# probe {spi:.2f} s/iter -> chain length {n_total} sweeps "
        f"(burnin {burnin}, thin {thin}, {sample_size} kept)",
        file=sys.stderr, flush=True,
    )

    out: dict = {
        "n_records": n_records,
        "num_partitions": 8,
        "probe_sec_per_iter": round(spi, 2),
        "total_sweeps": n_total,
        "burnin": burnin,
        "thinning": thin,
        "kept_samples": sample_size,
        "build_sec": build_s,
        "methodology": (
            "production sampler.sample() chains forked from the same "
            "init_state(seed=31), matched total sweep count, sMPC over "
            "kept samples scored vs synthetic truth; quality numbers are "
            "seed-deterministic, walls are weather (canaries recorded)"
        ),
    }

    def run_chain(k: int) -> dict:
        tmp = tempfile.mkdtemp(prefix=f"fusedq_k{k}_")
        st = assign_partitions(s0, part, 8)
        can0 = bench._canary(spark)
        t0 = time.time()
        st = sample(
            st,
            sample_size=sample_size,
            options=SamplerOptions(
                sampler="PCG-I",
                burnin_interval=burnin,
                thinning_interval=thin,
                multisweep_k=k,
                local_exec_max_records=0,  # force the distributed path
            ),
            output_path=tmp,
        )
        wall = round(time.time() - t0, 1)
        can1 = bench._canary(spark)
        assert st.iteration == n_total, (st.iteration, n_total)
        from dblink_spark.er.sampler import read_linkage_chain

        chain = read_linkage_chain(spark, tmp)
        smpc = shared_most_probable_clusters(most_probable_clusters(chain))
        pw = evaluate_pairwise(smpc, truth)
        ari = evaluate_clustering(smpc, truth)
        res = {
            "k": k,
            "wall_sec": wall,
            "canary_before": can0,
            "canary_after": can1,
            "f1": round(pw.f1, 4),
            "precision": round(pw.precision, 4),
            "recall": round(pw.recall, 4),
            "ari": round(ari, 4),
        }
        print(
            f"# k={k}: {n_total} sweeps in {wall}s -> sMPC F1 {pw.f1:.4f} "
            f"(P {pw.precision:.4f} R {pw.recall:.4f}) ARI {ari:.4f} "
            f"[canaries {can0:.2f}/{can1:.2f}]",
            file=sys.stderr, flush=True,
        )
        return res

    out["quality_k1"] = run_chain(1)
    out["quality_k2"] = run_chain(2)
    out["f1_delta_k2_minus_k1"] = round(
        out["quality_k2"]["f1"] - out["quality_k1"]["f1"], 4
    )
    out["ari_delta_k2_minus_k1"] = round(
        out["quality_k2"]["ari"] - out["quality_k1"]["ari"], 4
    )
    if max(out["quality_k1"]["recall"], out["quality_k2"]["recall"]) < 0.5:
        out["reading"] = (
            "transient-regime reading: at this chain length both cadences "
            "are still deep in the mixing transient (heavily under-linked) "
            "- this measures the longest chain the host affords, not the "
            "converged posterior; practical consequence: for kept samples "
            "at this scale prefer multisweepBurninK + multisweepK=1 (the "
            "burn-in takes the fusion win, kept samples stay on the exact "
            "k=1 cadence)"
        )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "BENCH_1M_FUSEDQ_r16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
