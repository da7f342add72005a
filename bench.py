"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed three times; the best timing is reported, since the
first runs pay one-off JVM/codegen costs that a long-lived cluster amortizes
(and local[32] timings are load-noisy at the sub-second scale).
Timing forces full materialization via a count on a cheap projection
(df.toPandas would add driver transfer that a real pipeline writes to
parquet instead).

r6 comparability notes (vs BENCH_r05 and earlier):
- persisted intermediates are RELEASED between reps (caller-owns-cache
  contract), so queries that persist (minhash/simhash/bottomk and the
  components/survivors built on bottomk) now report honest COLD cost —
  r5's best-of-3 reused the sketch cache across reps for those entries;
- dedup_embedding_cosine is retired (the scaled variant supersedes it);
- er_mcmc_iters_per_sec times a 200-iteration (>=1s) window instead of a
  10-iteration ~30ms one (the r5 flag was measurement-floor noise).
These are also emitted in the JSON as "notes".
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
    "q14_promo_revenue",
    "q18_large_orders",
    "q_events_sessionize",
    "q_events_asof_attribution",
    "q_events_error_click_band",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "ann_topk_cosine",
]

# r4: remaining dedup/text/ANN families — timed and reported per-query, but
# kept OUT of the headline total so round-over-round totals stay comparable
# with r1-r3 (their own baseline starts this round).
EXTENDED_QUERIES = [
    "dedup_simhash",
    "dedup_bottomk_jaccard",
    # r6: dedup_embedding_cosine (fixed-width LSH demo, ~N^2/16 candidates)
    # retired from the registry — dedup_embedding_cosine_scaled (in
    # R5_QUERIES) is the superseding scale path. extended_total therefore
    # drops by that query's ~3.6s vs r5; compare per-query, not the total.
    "ann_lsh_bucketed",
    "ann_ivf",
    "text_gopher_rules",
    "text_repetition",
]

# r6: queries added this round (trained-IVF gate, packing invariant gate,
# BPE-style token counting, end-to-end corpus-prep composition).
R6_QUERIES = [
    "ann_ivf_trained",
    "text_pack_shard_totals",
    "text_token_count_bpe",
    "pipeline_corpus_prep",
    "text_pii_redact",
    "q_docs_top_quality_per_lang",
    # first benched r6 (rotated past the driver-gate window this round)
    "q_events_bucket_rollup",
    "q_events_value_quantiles",
]

# r5: queries added (or first benched) this round — their own total, their
# own baseline; "combined_total" (headline + extended) is the one number
# comparable with r4 (8.796 + 11.917 = 20.713s).
R5_QUERIES = [
    "dedup_embedding_cosine_scaled",
    "dedup_components",
    "dedup_survivors",
    "q_events_value_quantiles_approx",
    "q_events_user_distinct_approx",
    "sketch_count_min",
    "hybrid_search",
    "text_decontaminate",
    "q_docs_sample_split",
    "text_chunk_windows",
    "text_pack_sequences",
    "q_events_json_props",
    "multimodal_resize_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dblink_spark.queries import REGISTRY
    from dblink_spark.session import get_spark

    spark = get_spark("dblink_spark_bench")
    spark.sparkContext.setLogLevel("WARN")

    names = [
        n for n in BENCH_QUERIES + EXTENDED_QUERIES + R5_QUERIES + R6_QUERIES
        if n in REGISTRY
    ]
    timings: dict[str, float] = {}
    for name in names:
        timings[name], n = _time_query(spark, sf_dir, name)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings[n] for n in BENCH_QUERIES if n in timings), 3),
        "unit": "sec",
        "queries": timings,
        "extended_total": round(
            sum(timings[n] for n in EXTENDED_QUERIES if n in timings), 3
        ),
        "r5_total": round(sum(timings[n] for n in R5_QUERIES if n in timings), 3),
        "r6_total": round(sum(timings[n] for n in R6_QUERIES if n in timings), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    out["combined_total"] = round(out["value"] + out["extended_total"], 3)
    out["notes"] = [
        "r6: persisted intermediates released between reps -> dedup-family "
        "timings are honest-cold (r5 best-of-3 reused the sketch cache)",
        "r6: dedup_embedding_cosine retired (scaled variant supersedes)",
        "r6: er_mcmc probe window 10 -> 200 iters (r5 flag was noise on a "
        "~30ms measurement)",
        "r6: sketch builds (bottom-k/minhash/simhash) rewritten row-local — "
        "zero token-table shuffles at scale; local sf0.1 cost shifts from "
        "shuffle stages to per-row array ops (bottom-k consumers ~0.5s "
        "slower here, minhash faster; the removed shuffles are the "
        "100-TB-dominant term)",
    ]
    try:
        out["er_mcmc_iters_per_sec"] = round(mcmc_iters_per_sec(spark), 3)
        # r6 methodology change: 200-iter (>=1s) window replaces the 10-iter
        # ~30ms window of r4/r5; the r5 377->277 flag was measurement-floor
        # noise (isolated same-code trials: 184/293/323 it/s). Values before
        # r6 are not comparable; the marker records the window the probe
        # ACTUALLY timed so bench_diff can detect any future change too.
        out["er_mcmc_probe_iters"] = mcmc_iters_per_sec.last_window_iters
    except Exception as e:  # never let the ER probe break the contract line
        print(f"# er bench skipped: {e}", file=sys.stderr)
    try:
        out.update(rl10k_partition_scaling(spark))
    except Exception as e:
        print(f"# rl10k bench skipped: {e}", file=sys.stderr)
    try:
        out.update(paper_scale_spark_path(spark))
    except Exception as e:
        print(f"# paper-scale bench skipped: {e}", file=sys.stderr)
    _diff_vs_last_round(out, spark, sf_dir)
    print(json.dumps(out))


def _time_query(spark, sf_dir: str, name: str, reps: int = 3):
    """Best-of-``reps`` wall time for one registered query + its row count.
    Persisted intermediates are released between reps (caller-owns-cache
    contract, `dblink_spark.queries.release_caches`) so repeated invocations
    in this long-lived session don't accumulate cache entries."""
    from dblink_spark.queries import REGISTRY, release_caches

    fn = REGISTRY[name].fn
    best, n = None, 0
    for _ in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        release_caches(df)
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def _diff_vs_last_round(out: dict, spark=None, sf_dir: str | None = None) -> None:
    """Surface round-over-round query regressions mechanically: compare this
    run against the newest committed BENCH_r{N}.json (stderr only — the
    stdout contract stays one JSON line, and a regression must not fail the
    bench itself; tools/bench_diff.py is the exit-code gate).

    r6: each flagged query is immediately RE-TIMED in isolation (best-of-3,
    same process, after the full sweep) and the result lands in the JSON as
    ``regressions: [{query, prev, sweep, isolated}]`` — so a noise flag
    carries its own adjudicating evidence instead of needing a judge re-run
    (r5's minhash 1.92x flag re-timed at 0.65-0.75s, i.e. noise)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))

    def _round_no(path: str) -> int:
        # tolerate stray files matching the glob (e.g. BENCH_rerun.json):
        # non-numeric suffixes sort first instead of crashing the key — the
        # stdout one-JSON-line contract must survive any filename
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(path))
        return int(m.group(1)) if m else -1

    rounds = [p for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
              if _round_no(p) >= 0]
    rounds.sort(key=_round_no)
    if not rounds:
        return
    try:
        from tools.bench_diff import NOISE_FLOOR_SEC

        with open(rounds[-1]) as f:
            prev = json.load(f).get("parsed", {})
        # queries whose r5-and-earlier "best" reused a persisted
        # intermediate across reps: their committed baselines are WARM
        # numbers while r6+ measures cold (caches released between reps) —
        # a flag against an old round for these is a comparability
        # artifact unless the isolated re-time ALSO regressed vs its own
        # r6+ baseline
        warm_baseline = {
            "dedup_minhash_lsh", "dedup_simhash", "dedup_bottomk_jaccard",
            "pairwise_metrics", "dedup_components", "dedup_survivors",
        }
        prev_notes = prev.get("notes", [])
        prev_is_cold = any("honest-cold" in n for n in prev_notes)
        flagged = []
        prev_queries = prev.get("queries", {})
        for name, t_new in out["queries"].items():
            t_old = prev_queries.get(name)
            if t_old and t_new > 1.5 * t_old and t_new > NOISE_FLOOR_SEC:
                entry = {"query": name, "prev": t_old, "sweep": t_new}
                if spark is not None and sf_dir is not None:
                    entry["isolated"], _ = _time_query(spark, sf_dir, name)
                if name in warm_baseline and not prev_is_cold:
                    entry["baseline_warm_cache"] = True
                flagged.append(entry)
        missing = sorted(set(prev_queries) - set(out["queries"]))
        base = os.path.basename(rounds[-1])
        if flagged or missing:
            out["regressions"] = flagged
            if missing:
                out["queries_retired"] = missing
            msgs = [
                f"{e['query']}: {e['prev']:.3f}s -> {e['sweep']:.3f}s"
                + (f" (isolated {e['isolated']:.3f}s)" if "isolated" in e else "")
                for e in flagged
            ] + [f"{m}: missing from this run" for m in missing]
            print(f"# REGRESSION vs {base}: " + "; ".join(msgs), file=sys.stderr)
        else:
            print(f"# no query regressions vs {base} (1.5x gate)", file=sys.stderr)
    except Exception as e:  # diagnostic only — never break the bench line
        print(f"# bench diff skipped: {e}", file=sys.stderr)


def paper_scale_spark_path(spark, n_records: int = 100_000, n_iters: int = 3) -> dict:
    """Partition scaling of the distributed ``applyInPandas``/``applyInArrow``
    path at a scale where kernels dominate the per-iteration job floor —
    the regime the reference's near-linear-scaling headline claim is about
    (ref: /root/reference README; multi-hundred-thousand-record datasets).

    100k synthetic RLdata-shaped records, KD-tree 4 partitions vs single
    partition, PCG-I. At 300k records the same harness measured 1/2/4/8
    partitions at ~7.5/2.9/1.7/1.5 s/iter after the r5 floor work
    (2.6x/4.3x/5.1x vs one partition; tools/measure_300k_scaling.py),
    beating the driver-local sequential kernels from 2 partitions up; the
    bench uses 100k so the per-round cost stays bounded."""
    import tempfile  # noqa: F401 - symmetry with rl10k probe

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
    out = {"er_paper_n_records": n_records}
    for p in (1, 4):
        if p == 1:
            pf = SinglePartition()
        else:
            pf = KDTreePartitioner(
                num_levels=p.bit_length() - 1, attribute_ids=[3, 4, 0]
            )
            pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        s = assign_partitions(s0, pf, pf.num_partitions)
        if p > 1:
            sizes = [
                r["count"]
                for r in s.df.filter("NOT is_summary")
                .groupBy("partition_id")
                .count()
                .collect()
            ]
            out["er_paper_max_partition_clusters"] = int(max(sizes))
        s = transition(s, "PCG-I")  # warm
        t0 = time.time()
        for _ in range(n_iters):
            s = transition(s, "PCG-I")
        rate = n_iters / (time.time() - t0)
        out[f"er_paper_spark_{p}part_iters_per_sec"] = round(rate, 3)
        print(
            f"# er_paper({n_records}): {rate:.3f} it/s at {p} partition(s) "
            f"(distributed path)", file=sys.stderr,
        )
    return out


def rl10k_partition_scaling(spark, n_iters: int = 20) -> dict:
    """Throughput on the reference's flagship RLdata10000 workload
    (examples/RLdata10000.conf: PCG-I, KD-tree numLevels=1 on fname_c1),
    on BOTH execution paths:

    - driver-local kernels (what the sampler picks for <=2M-record chains):
      1 partition fused vs the configured 2 partitions;
    - the distributed Spark ``applyInPandas`` path at 1/2/4 partitions —
      the partition-scaling axis the dblink paper headlines (BASELINE.md).
      Forced via ``transition()`` directly (equivalent to
      ``SamplerOptions(local_exec_max_records=0)``).

    Expected shape at THIS problem size: the Spark path speeds up 1→2
    partitions (parallel kernel tasks) then plateaus, because the
    per-iteration fixed cost (job scheduling + Arrow shuffle of the state +
    lazy-checkpoint materialization + summary job, ~0.5s on local[32])
    dominates once the ~50ms/partition kernels shrink below it. That floor
    is why the sampler routes driver-sized problems local; the distributed
    path pays off when per-partition kernel time >> job floor (see the
    paper-scale probe, `paper_scale_spark_path`)."""
    conf = "/root/reference/examples/RLdata10000.conf"
    csv_path = "/root/reference/examples/RLdata10000.csv"
    if not (os.path.exists(conf) and os.path.exists(csv_path)):
        return {}
    import tempfile

    from dblink_spark.config import load_config
    from dblink_spark.er.cache import build_records_cache
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import (
        assign_partitions,
        init_state,
        transition,
        transition_fused,
        transition_local,
    )
    from dblink_spark.project import Project

    cfg = load_config(conf)
    d = cfg["dblink"]
    d["data"]["path"] = csv_path
    tmp = tempfile.mkdtemp(prefix="bench_rl10k_")
    d["outputPath"] = tmp + "/"
    d["checkpointPath"] = tmp + "/ckpt"
    project = Project.from_config(spark, cfg)
    records = project.records().select("rec_id", "file_id", *project.attr_names)
    cache = build_records_cache(
        records, project.matching_attrs, project.expected_max_cluster_size
    )
    s0 = init_state(
        spark, records, cache, SinglePartition(), 1, seed=project.random_seed,
        population_size=project.population_size,
    )

    s1 = transition_fused(s0, "PCG-I", 2)  # warm
    t0 = time.time()
    transition_fused(s1, "PCG-I", n_iters)
    one_part = n_iters / (time.time() - t0)

    part = project.build_partitioner()
    part.fit(s0.df.filter("NOT is_summary").select("ent_values"))
    s2 = assign_partitions(s0, part, part.num_partitions)
    s2 = transition_local(s2, "PCG-I")  # warm (collects df -> local parts)
    t0 = time.time()
    for _ in range(n_iters):
        s2 = transition_local(s2, "PCG-I")
    two_part = n_iters / (time.time() - t0)
    print(
        f"# er_rl10k: {one_part:.1f} it/s 1-part, {two_part:.1f} it/s "
        f"{part.num_partitions}-part (driver-local kernels)", file=sys.stderr,
    )
    out = {
        "er_rl10k_1part_iters_per_sec": round(one_part, 2),
        "er_rl10k_2part_iters_per_sec": round(two_part, 2),
    }

    # Distributed applyInPandas path, 1/2/4 partitions (10 timed iterations
    # each — the per-iteration cost is ~10x the driver-local path here).
    kd_order = [
        project.attr_names.index(a)
        for a in (
            project.partitioner_cfg.get("parameters", {}).get(
                "matchingAttributes"
            )
            or project.attr_names
        )
    ]
    spark_iters = max(n_iters // 2, 1)
    for p in (1, 2, 4):
        if p == 1:
            pf = SinglePartition()
        else:
            pf = KDTreePartitioner(
                num_levels=p.bit_length() - 1, attribute_ids=kd_order
            )
            pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        s = assign_partitions(s0, pf, pf.num_partitions)
        s = transition(s, "PCG-I")  # warm
        rate = 0.0
        for _ in range(2):  # best-of-2: these short probes are load-noisy
            t0 = time.time()
            for _ in range(spark_iters):
                s = transition(s, "PCG-I")
            rate = max(rate, spark_iters / (time.time() - t0))
        out[f"er_rl10k_spark_{p}part_iters_per_sec"] = round(rate, 2)
        print(
            f"# er_rl10k_spark: {rate:.2f} it/s at {p} partition(s) "
            f"(distributed applyInPandas path)", file=sys.stderr,
        )
    return out


def mcmc_iters_per_sec(spark, n_records: int = 300, n_iters: int = 200) -> float:
    """ER-engine throughput probe (BASELINE.md planned metric): PCG-I
    transitions/sec on an RLdata-shaped synthetic, single partition.
    No in-repo reference number exists (the reference publishes none), so
    this is regression-tracked round over round.

    METHODOLOGY CHANGE (r6): n_iters 10 -> 200. The old probe timed ONE
    10-iteration fused sweep — a 27-36ms window on local[32], where the
    r4->r5 "regression" (377->277 it/s) is ~10ms of scheduler/GC jitter:
    three isolated fresh-session runs of the identical r5 code gave
    184/293/323 it/s. With a >=1s window the probe is stable run-to-run
    (~148-152 it/s steady-state across isolated trials); numbers before r6
    are not comparable to numbers after."""
    from pyspark.sql import functions as F

    from dblink_spark.er.attributes import Attribute, BetaParams, ConstantSim, LevenshteinSim
    from dblink_spark.er.cache import build_records_cache
    from dblink_spark.er.datagen import make_rldata
    from dblink_spark.er.partition import SinglePartition
    from dblink_spark.er.state import init_state, transition

    pdf = make_rldata(n_records=n_records, dup_fraction=0.2, missing_fraction=0.02, seed=7)
    records = spark.createDataFrame(pdf).withColumn("file_id", F.lit("0"))
    attrs = [
        Attribute("by", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bm", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bd", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("fname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
        Attribute("lname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
    ]
    cache = build_records_cache(records, attrs, expected_max_cluster_size=10)
    state = init_state(spark, records, cache, SinglePartition(), 1, seed=123)
    state = transition(state, "PCG-I")  # warm (codegen + arrow setup)
    # effective sampler cadence: thinning 10 via fused sweeps (the
    # single-partition fast path used by sample())
    from dblink_spark.er.state import transition_fused

    reps = n_iters // 10 or 1
    best = None
    for _ in range(2):  # best-of-2: first rep still pays Arrow/codegen warmup
        t0 = time.time()
        for _ in range(reps):
            state = transition_fused(state, "PCG-I", 10)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    iters = 10 * reps
    print(f"# er_mcmc: {iters} fused PCG-I iters on {n_records} recs in {best:.2f}s (best of 2)", file=sys.stderr)
    # exposed so main() can record the ACTUAL window in the payload —
    # bench_diff only compares rates measured under the same window, and a
    # hardcoded marker would go stale if n_iters ever changes
    mcmc_iters_per_sec.last_window_iters = iters
    return iters / best


if __name__ == "__main__":
    main()
