"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line on stdout.

OUTPUT CONTRACT (r7): the driver captures only the LAST ~2000 characters of
stdout — r6's single line outgrew that window and the committed artifact
lost its own headline number (BENCH_r06.json: "parsed": null). So stdout is
now a COMPACT payload (headline per-query dict + totals + the ER probe
medians, guarded to stay under the capture window), and the FULL payload
(every timed query, notes, regressions, per-window probe rates) is written
to BENCH_FULL_LATEST.json next to this file. tools/bench_diff.py follows
the compact payload's "full" pointer automatically.

Each query is executed three times; the best timing is reported, since the
first runs pay one-off JVM/codegen costs that a long-lived cluster amortizes
(and local[32] timings are load-noisy at the sub-second scale).
Timing forces full materialization via a count on a cheap projection
(df.toPandas would add driver transfer that a real pipeline writes to
parquet instead).

ER probes report the MEDIAN of 3 independent timing windows plus the
min..max spread (r7: committed r6 probe numbers were 30-40% below an
isolated re-run — sweep contamination; a single window cannot be trusted
to ±30% on local[32], see COVERAGE.md).
"""

from __future__ import annotations

import json
import os
import statistics
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
    "ann_lsh_bucketed",
    "ann_ivf_untrained_baseline",
    "text_gopher_rules",
    "text_repetition",
]

# Deliberately removed/renamed query names, with the reason — the ONLY names
# bench_diff waives when they disappear from a new run. Anything else
# missing is a gate failure (an accidental drop — e.g. a typo silently
# filtered by the REGISTRY membership check — must not pass as retirement).
RETIRED_QUERIES = {
    "dedup_embedding_cosine": (
        "r6: fixed-width LSH demo retired; dedup_embedding_cosine_scaled "
        "supersedes it"
    ),
    "ann_ivf": (
        "r7: renamed ann_ivf_untrained_baseline — the trained quantizer "
        "(ann_ivf_trained) is the canonical IVF entry"
    ),
    "q_inventory_checksum": (
        "r15: renamed q_inventory_checksum_a — the shard membership was "
        "rebalanced by measured per-entry cost (the r14 registration-order "
        "split read 23.4s vs 7.9s), and a membership change means the "
        "digest means something different, so the slot name versions "
        "(r14 ADVICE); both slots now carry an in-band _shard_spec marker "
        "row so future membership changes flip the hash gate visibly"
    ),
}

# r6: queries added that round (trained-IVF gate, packing invariant gate,
# BPE-style token counting, end-to-end corpus-prep composition).
R6_QUERIES = [
    "ann_ivf_trained",
    "text_pack_shard_totals",
    "text_token_count_bpe",
    "pipeline_corpus_prep",
    "text_pii_redact",
    "q_docs_top_quality_per_lang",
    "q_events_bucket_rollup",
    "q_events_value_quantiles",
]

# r8: queries added this round (LSH recall contract gate; corpus-internal
# boilerplate detection).
R8_QUERIES = [
    "ann_lsh_recall",
    "text_boilerplate_grams",
    "q_docs_lang_rebalance",
    "text_vocab_topk",
    "vector_random_projection",
]

# r9: queries added this round (incremental cross-snapshot dedup, bigram-LM
# quality scoring, exact-k per-source caps).
R9_QUERIES = [
    "dedup_incremental_minhash",
    "text_lm_bigram_nll",
    "q_docs_source_cap",
]

# r10: queries added this round (paragraph-level exact dedup, repeated-
# substring removal, token-budget mixing, perceptual-hash image dedup,
# crawl-delta extraction, deterministic training order, SemDeDup-style
# semantic dedup, nearest-centroid classifier filtering, corpus-level
# quality-quantile gating, source-level domain filtering, mixture/epoch
# recipe, tf-idf keyword extraction, embedding outlier filtering).
R10_QUERIES = [
    "dedup_paragraphs",
    "text_strip_boilerplate",
    "text_dedup_repeated_ngrams",
    "q_docs_token_budget_mix",
    "multimodal_phash_dedup",
    "q_docs_snapshot_diff",
    "q_docs_training_order",
    "dedup_semantic",
    "vector_centroid_classifier",
    "q_docs_quality_quantile_gate",
    "q_docs_domain_filter",
    "q_docs_mixture_recipe",
    "text_tfidf_topk",
    "vector_outlier_filter",
]

# r11: the 25-query round-11 family — TPC-H correlated-subquery shapes
# (Q7/Q10/Q15/Q17/Q21/Q22 + RANGE-frame moving revenue), events analytics
# (funnel/retention/gap-fill/anomaly/RFM), and the pipeline/curation
# additions (maximal spans, classifier holdout, URL dedup, alpha mixture,
# drift, bloom + semantic decontamination, CCNet buckets, Neyman/CUBE,
# quality-weighted sampling, source overlap, dedup bias audit).
R11_QUERIES = [
    "text_strip_maximal_spans",
    "vector_classifier_holdout",
    "dedup_url_canonical",
    "q_docs_alpha_mixture",
    "q_docs_snapshot_drift",
    "text_bloom_decontaminate",
    "q_events_funnel",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_blamed_supplier",
    "q22_dormant_accounts",
    "q7_nation_volume",
    "q_orders_moving_revenue",
    "q_events_retention",
    "q_docs_neyman_allocation",
    "q_docs_inventory_cube",
    "vector_semantic_decontaminate",
    "q_events_gap_fill",
    "q_events_hourly_anomaly",
    "q_docs_ccnet_bucket",
    "q_docs_source_overlap",
    "q_docs_quality_weighted_sample",
    "q10_returned_items",
    "q_docs_dedup_bias_audit",
    "q_events_rfm",
]

# r12: the six shapes completing the classic TPC-H set (Q2/Q8/Q9/Q11/Q12/
# Q20, adapted where the fixtures lack partsupp/shipmode — see each
# docstring).
R12_QUERIES = [
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_shipping",
    "q20_dominant_suppliers",
    "text_strip_gapped_spans",
    "q_events_transition_matrix",
    "q_events_engagement_gini",
    "text_cdc_chunks",
]

# r14: the no-anchor span closer (VERDICT r13 task 4).
R14_QUERIES = [
    "text_strip_ladder_spans",
]

# r15: the past-the-ubiquity-cap template closer (VERDICT r14 task 5 —
# LADDER_RESIDUAL_r15.json measured the class at miss=1.00).
R15_QUERIES = [
    "text_strip_template_spans",
]

# r16 (optimization round): the near-dup hand-off gate entry added by the
# interrupted r16 build round was registered but never timed — added here
# so the k=64/t=0.3 configuration's cost is tracked like its 0.99 twin.
R16_QUERIES = [
    "dedup_neardup_handoff",
]

# Gate infrastructure (NOT pipeline queries): timed and reported as
# gate_overhead_sec, excluded from every query total (VERDICT r7 task 4 —
# q_inventory_checksum re-times 21 queries already timed individually;
# folding it into a query total double-counts verification as work).
GATE_QUERIES = [
    "q_inventory_checksum_a",
    "q_inventory_checksum_b",
]

# Explicit baseline re-bases (VERDICT r7 task 3 / next-round #2): the named
# query's round-over-round comparison point is pinned here instead of the
# newest committed payload. Used when the committed history's number was
# measured under a retired methodology (e.g. the r5 warm-cache "best" that
# kept flagging the same honest-cold queries two rounds running). The map
# is recorded in the payload (``rebased_baselines``) so the artifact shows
# the comparison point it was judged against.
REBASED_BASELINES: dict[str, dict] = {
    "dedup_bottomk_jaccard": {
        "baseline": 1.918,
        "as_of": "r7",
        "reason": (
            "r5's 0.679s best reused a persisted sketch across reps (warm); "
            "honest-cold r7 sweep median is the comparable point (isolated "
            "re-time that round: 2.235s)"
        ),
    },
    "dedup_survivors": {
        "baseline": 4.003,
        "as_of": "r7",
        "reason": (
            "r5's 2.257s best reused cached components across reps (warm); "
            "honest-cold r7 sweep median is the comparable point (isolated "
            "re-time that round: 4.616s)"
        ),
    },
}

# r5: queries added (or first benched) that round — their own total, their
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

def _active_rebased_baselines() -> dict[str, dict]:
    """REBASED_BASELINES minus expired pins (ADVICE r8): a pin applies only
    while the newest committed payload predates-or-equals its ``as_of``
    round — once a post-rebase payload exists, THAT payload was measured
    under the honest-cold methodology and becomes the normal comparison
    point, so a gradual regression can no longer hide behind the static
    pin. Both the payload's ``rebased_baselines`` key (what bench_diff
    waives against) and _diff_vs_last_round read this, never the raw
    constant."""
    history = _payload_history()
    if not history:
        return dict(REBASED_BASELINES)
    prev_round = history[0][0]
    return {
        n: m
        for n, m in REBASED_BASELINES.items()
        if prev_round <= int(m["as_of"].lstrip("r"))
    }


FULL_PAYLOAD_FILE = "BENCH_FULL_LATEST.json"
# the driver's stdout tail capture is ~2000 chars (measured: BENCH_r05/r06
# both carry exactly 2000); stay well inside it
COMPACT_LINE_BUDGET = 1800


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dblink_spark.queries import REGISTRY
    from dblink_spark.session import get_spark

    spark = get_spark("dblink_spark_bench")
    spark.sparkContext.setLogLevel("WARN")

    all_names = (
        BENCH_QUERIES + EXTENDED_QUERIES + R5_QUERIES + R6_QUERIES
        + R8_QUERIES + R9_QUERIES + R10_QUERIES + R11_QUERIES
        + R12_QUERIES + R14_QUERIES + R15_QUERIES + R16_QUERIES
        + GATE_QUERIES
    )
    unknown = [n for n in all_names if n not in REGISTRY]
    if unknown:
        # a typo here must fail loudly, never silently shrink the bench set
        # (ADVICE r6: missing-from-run used to be indistinguishable from a
        # deliberate retirement)
        raise SystemExit(f"bench names not in REGISTRY: {unknown}")
    canary_start = _canary(spark, warm=True)
    timings: dict[str, float] = {}
    for name in all_names:
        timings[name], n = _time_query(spark, sf_dir, name)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings[n] for n in BENCH_QUERIES), 3),
        "unit": "sec",
        "queries": timings,
        "extended_total": round(sum(timings[n] for n in EXTENDED_QUERIES), 3),
        "r5_total": round(sum(timings[n] for n in R5_QUERIES), 3),
        "r6_total": round(sum(timings[n] for n in R6_QUERIES), 3),
        "r8_total": round(sum(timings[n] for n in R8_QUERIES), 3),
        "r9_total": round(sum(timings[n] for n in R9_QUERIES), 3),
        "r10_total": round(sum(timings[n] for n in R10_QUERIES), 3),
        "r11_total": round(sum(timings[n] for n in R11_QUERIES), 3),
        "r12_total": round(sum(timings[n] for n in R12_QUERIES), 3),
        "r14_total": round(sum(timings[n] for n in R14_QUERIES), 3),
        "r15_total": round(sum(timings[n] for n in R15_QUERIES), 3),
        "r16_total": round(sum(timings[n] for n in R16_QUERIES), 3),
        "gate_overhead_sec": round(sum(timings[n] for n in GATE_QUERIES), 3),
        "canary_start_sec": canary_start,
        "rebased_baselines": {
            n: m["baseline"] for n, m in _active_rebased_baselines().items()
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    out["combined_total"] = round(out["value"] + out["extended_total"], 3)
    out["notes"] = [
        "r7: stdout is the COMPACT payload (driver tail capture is ~2000 "
        "chars; r6's full line overflowed it and lost the headline) — the "
        "full payload incl. every timed query lives in BENCH_FULL_LATEST.json",
        "r7: ER probes report median-of-3 independent windows + min..max "
        "spread (committed r6 single-window numbers were 30-40% below an "
        "isolated re-run; COVERAGE.md documents the ±30% variance)",
        "r8: constant-work canary timed at sweep start and end "
        "(canary_start_sec / canary_end_sec) — the r7 judge measured 2.2x "
        "same-code host drift between sessions; read cross-round absolutes "
        "as ratios against the canary, not as bare numbers",
        "r8: q_inventory_checksum reported as gate_overhead_sec, excluded "
        "from all query totals (it re-times 21 queries already timed "
        "individually); dedup_bottomk_jaccard / dedup_survivors baselines "
        "re-based to honest-cold r7 medians (rebased_baselines key)",
        "r13: gate_overhead_sec bound (VERDICT r12 task 8): the checksum "
        "re-times every tail entry once at sf0.1, so overhead grows "
        "~linearly with rotation at the tail's mean per-query cost "
        "(observed ~0.45-0.5s/entry; 79 entries ~ 38s). Budget rule: if "
        "a rotation pushes it past 60s, shard q_inventory_checksum into "
        "two digest slots (same coverage, half the per-slot re-time) — "
        "the digest SQL is already a UNION ALL over per-query digests, "
        "so the split is mechanical",
        "r13: dedup_minhash_lsh isolated re-time (VERDICT r12 task 5): "
        "warm median 1.202s raw / 1.006s canary-normalized over 5 reps in "
        "an isolated session — the ~2x vs r1's 0.453s is REAL and is the "
        "exact-Jaccard verify stage + hot-bucket occupancy caps r1 lacked "
        "(bought correctness: r1 emitted unverified band-collision pairs); "
        "plan re-read this round, no redundant exchange to recover",
    ]
    try:
        med, spread, windows = mcmc_iters_per_sec(spark)
        out["er_mcmc_iters_per_sec"] = med
        out["er_mcmc_spread"] = spread
        out["er_mcmc_window_rates"] = windows
        out["er_mcmc_probe_iters"] = mcmc_iters_per_sec.last_window_iters
        # statistic marker alongside the window length: bench_diff only
        # compares rates measured under the same (window, statistic) pair
        # (ADVICE r7 — r6's best-of-2 vs r7's median-of-3 shared iters=200
        # and would otherwise diff as same-methodology). r14: equilibrium
        # methodology (600-sweep pre-advance) — pre-r14 medians sampled
        # the fresh-chain transient and read ~30-50% higher; not
        # comparable, hence the new marker.
        out["er_mcmc_probe_stat"] = "median3_equilibrium_r14"
    except Exception as e:  # never let the ER probe break the contract line
        print(f"# er bench skipped: {e}", file=sys.stderr)
    try:
        out.update(rl10k_partition_scaling(spark))
    except Exception as e:
        print(f"# rl10k bench skipped: {e}", file=sys.stderr)
    try:
        out.update(rl10k_linkage_quality(spark))
    except Exception as e:
        print(f"# rl10k quality probe skipped: {e}", file=sys.stderr)
    try:
        out.update(rl10k_multisweep_quality(spark))
    except Exception as e:
        print(f"# rl10k multisweep quality probe skipped: {e}", file=sys.stderr)
    try:
        out.update(rl500_linkage_quality(spark))
    except Exception as e:
        print(f"# rl500 quality probe skipped: {e}", file=sys.stderr)
    try:
        out.update(paper_scale_spark_path(spark))
    except Exception as e:
        print(f"# paper-scale bench skipped: {e}", file=sys.stderr)
    try:
        out.update(paper_scale_multisweep(spark))
    except Exception as e:
        print(f"# paper-scale multisweep probe skipped: {e}", file=sys.stderr)
    try:
        out.update(er_iteration_floor_breakdown(spark))
    except Exception as e:
        print(f"# iter-floor breakdown skipped: {e}", file=sys.stderr)
    try:
        out.update(pair_table_amortization(spark, sf_dir))
    except Exception as e:
        print(f"# pair-table amortization probe skipped: {e}", file=sys.stderr)
    try:
        out.update(er_1m_partition_scaling(spark))
    except Exception as e:
        print(f"# 1M-chain bench skipped: {e}", file=sys.stderr)
    try:
        out.update(streaming_pipeline_probe(spark, sf_dir))
    except Exception as e:
        print(f"# streaming probe skipped: {e}", file=sys.stderr)
    out["canary_end_sec"] = _canary(spark)
    out["canary_drift"] = round(out["canary_end_sec"] / canary_start, 2)
    canary_mean = (canary_start + out["canary_end_sec"]) / 2
    out["canary_mean_sec"] = round(canary_mean, 3)
    out["canary_ref_sec"] = CANARY_REF_SEC
    out["canary_ref_source"] = CANARY_REF_SOURCE
    # Executable drift cap (VERDICT r14 task 4): when the run's own canary
    # exceeds DEGRADED_CANARY_FACTOR x the idle-host reference, the
    # methodology notes already say raw numbers are unreadable (r14's
    # committed local artifact ran at x1.69 and needed a hand re-time to
    # adjudicate) — so the payload now CARRIES the verdict: degraded_host
    # rides in both the full and compact payloads, and the committed-
    # artifact rule is "re-run on a quieter host before committing a
    # BENCH_LOCAL_r*.json that is stamped degraded".
    if canary_mean > DEGRADED_CANARY_FACTOR * CANARY_REF_SEC:
        out["degraded_host"] = True
        print(
            f"# DEGRADED HOST: canary mean {canary_mean:.3f}s > "
            f"{DEGRADED_CANARY_FACTOR}x ref {CANARY_REF_SEC}s — raw "
            "timings in this payload are not readable cross-round; re-run "
            "isolated on a quiet host before committing it as a "
            "BENCH_LOCAL artifact", file=sys.stderr,
        )
    # load-corrected headline: what this sweep's total reads as at the
    # reference (idle-host) canary speed; bench_diff compares THIS when
    # both payloads carry it (raw value stays the primary metric key)
    out["value_canary_norm"] = round(
        out["value"] * CANARY_REF_SEC / canary_mean, 3
    )
    print(
        f"# canary: start {canary_start:.2f}s end {out['canary_end_sec']:.2f}s "
        f"(drift x{out['canary_drift']:.2f}) — divide probe times by the "
        f"nearer canary before cross-round comparison", file=sys.stderr,
    )
    _diff_vs_last_round(out, spark, sf_dir)

    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, FULL_PAYLOAD_FILE)
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# full payload -> {full_path}", file=sys.stderr)
    print(json.dumps(_compact(out, timings)))


# sized so the probe runs ~2s on an idle local[32] host: long enough to be
# far above the scheduler-jitter noise floor, short enough to run twice per
# sweep without moving the sweep's own duration
_CANARY_ROWS = 8_000_000_000

#: Reference canary time: the r8 clean isolated run's mean canary
#: (BENCH_LOCAL_r08.json: start 1.549s / end 1.421s -> 1.485s), i.e. "this
#: host, idle". ``value_canary_norm`` = headline x (REF / this run's canary
#: mean) — the load-corrected headline (VERDICT r8 task 5: the committed r8
#: sweep's 7.93s normalized to ~6.3s against the clean run's 6.56s; the 2x
#: gate and bench_diff should compare load-free numbers). The raw value is
#: always retained alongside.
CANARY_REF_SEC = 1.485

#: Drift cap for committed artifacts (VERDICT r14 task 4): a sweep whose
#: mean canary exceeds this multiple of CANARY_REF_SEC is stamped
#: ``degraded_host: true`` in both payloads — the in-code form of the
#: methodology note that raw numbers measured under that much host load
#: are unreadable (r14's local artifact carried drift x1.69 and its raw
#: headline misread by ~+15% vs the quiet-host truth).
DEGRADED_CANARY_FACTOR = 1.2

#: Where CANARY_REF_SEC came from (ADVICE r9: the constant is host-specific
#: — value_canary_norm's ABSOLUTE numbers are only meaningful on that host;
#: cross-round ratios are fine anywhere since REF cancels). Recorded in the
#: payload so a payload measured elsewhere is self-describing.
CANARY_REF_SOURCE = (
    "BENCH_LOCAL_r08.json clean isolated run on the round-8 judge container "
    "(local[32]); absolutes are host-specific, cross-round ratios portable"
)


def _canary(spark, warm: bool = False) -> float:
    """Constant-work host-load probe: one narrow aggregation over
    ``spark.range`` — no IO, no Python, one partial-agg exchange. The SAME
    work every round, so any cross-round/cross-session timing comparison
    can be read as a ratio against it (the r7 judge measured 2.2x host
    drift between same-day sessions with identical code; absolutes on a
    shared local[32] host are weather). ``warm=True`` pays the one-off
    codegen/JVM warmup before the measured run (sweep-start call only)."""
    from pyspark.sql import functions as F

    def _run() -> float:
        t0 = time.time()
        # mod BEFORE multiply and again before the sum: keeps every
        # intermediate far inside int64 under ANSI mode at any row count
        spark.range(_CANARY_ROWS, numPartitions=32).select(
            F.sum(((F.col("id") % 1000003) * 2654435) % 7919).alias("s")
        ).collect()
        return time.time() - t0

    if warm:
        _run()
    return round(_run(), 3)


def _compact(out: dict, timings: dict[str, float]) -> dict:
    """The stdout payload: headline queries + totals + probe medians, with a
    pointer to the full file. Hard-guarded under COMPACT_LINE_BUDGET — if a
    future key addition overflows, secondary probe keys are dropped
    front-first from ``droppable`` (least-load-bearing first) rather than
    truncating the line mid-JSON again; if that still isn't enough, the
    per-query dict goes (totals + the full-file pointer survive)."""
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "queries": {n: timings[n] for n in BENCH_QUERIES},
        "extended_total": out["extended_total"],
        "r5_total": out["r5_total"],
        "r6_total": out["r6_total"],
        "r8_total": out["r8_total"],
        "r9_total": out["r9_total"],
        "r10_total": out["r10_total"],
        "r11_total": out["r11_total"],
        "gate_overhead_sec": out["gate_overhead_sec"],
        "combined_total": out["combined_total"],
        "n_queries_timed": len(timings),
        "full": FULL_PAYLOAD_FILE,
    }
    for k in (
        "canary_start_sec", "canary_end_sec", "canary_drift",
        "canary_mean_sec", "value_canary_norm", "degraded_host",
    ):
        if k in out:
            compact[k] = out[k]
    for k in (
        "er_mcmc_iters_per_sec",
        "er_mcmc_probe_iters",
        "er_mcmc_probe_stat",
        "er_mcmc_spread",
        "er_rl10k_f1",
        "er_rl10k_ari",
        "er_rl10k_multisweep_f1",
        "er_rl10k_multisweep_ari",
        # r15: the RECOMMENDED config's kept-sample quality, pinned per
        # round alongside the pessimal full-chain k=8 pin (VERDICT r14
        # task 2 — the number users act on is now the number re-measured)
        "er_rl10k_burninfused_f1",
        "er_rl10k_burninfused_ari",
        # r16: the reference's OTHER flagship example pinned at full
        # length per round (VERDICT r15 task 6), like rl10k's pin
        "er_rl500_f1",
        "er_rl500_ari",
        "er_rl10k_1part_iters_per_sec",
        "er_rl10k_2part_iters_per_sec",
        # the two fused-path spreads named by VERDICT r9 "wrong" #2: their
        # point estimates overlap across rounds (1.65x apparent deltas are
        # noise) and the committed artifact must show that on its own
        "er_rl10k_1part_spread",
        "er_rl10k_2part_spread",
        "er_rl10k_spark_1part_iters_per_sec",
        "er_rl10k_spark_2part_iters_per_sec",
        "er_rl10k_spark_4part_iters_per_sec",
        # spreads ride along with the medians (VERDICT r9 task 6: the
        # committed compact artifact must make partition-scaling noise
        # adjudicable on its own — a bare median with 2x host drift isn't)
        "er_rl10k_spark_1part_spread",
        "er_rl10k_spark_4part_spread",
        # r14: multi-partition sweep fusion — it/s must scale with k as
        # the ~0.157s/iter plan+job floor amortizes (VERDICT r13 task 3)
        "er_rl10k_multisweep4p_k1_iters_per_sec",
        "er_rl10k_multisweep4p_k2_iters_per_sec",
        "er_rl10k_multisweep4p_k4_iters_per_sec",
        "er_rl10k_multisweep4p_k8_iters_per_sec",
        "er_rl10k_multisweep4p_k8_spread",
        "er_paper_spark_1part_iters_per_sec",
        "er_paper_spark_4part_iters_per_sec",
        "er_paper_spark_8part_iters_per_sec",
        "er_paper_spark_16part_iters_per_sec",
        "er_paper_spark_1part_spread",
        "er_paper_spark_4part_spread",
        "er_paper_spark_16part_spread",
        # r16: burn-in fusion at paper scale (VERDICT r15 task 8) — the
        # job-floor-bound regime's k recommendation, within-session
        "er_paper_multisweep8p_k8_speedup_vs_k1",
        "er_paper_multisweep16p_k8_speedup_vs_k1",
        "pairtable_build_save_sec",
        "pairtable_consumers_total_sec",
        "compstable_consumers_total_sec",
        "er_iterfloor_plan_sec",
        "er_iterfloor_job_sec",
        "er_iterfloor_python_job_floor_sec",
        "er_iterfloor_jvm_job_floor_sec",
        "er_1m_8part_sec_per_iter",
        "er_1m_16part_sec_per_iter",
        "er_1m_32part_sec_per_iter",
        "er_1m_8part_sec_per_iter_norm",
        "er_1m_16part_sec_per_iter_norm",
        "er_1m_32part_sec_per_iter_norm",
        "er_1m_max_partition_clusters",
        "er_1m_8part_max_partition_clusters",
        "er_1m_16part_max_partition_clusters",
        "er_1m_32part_max_partition_clusters",
        # r15: 1M sweep fusion — the within-session ratios are the signal
        "er_1m_multisweep8p_k1_sec_per_iter",
        "er_1m_multisweep8p_k8_sec_per_iter",
        # r17 (VERDICT r16 task 8): the k-speedup ratio cells left the
        # compact artifact — chain-state drift dominates them (r16
        # 3-cycle re-measure), so a per-round ratio straddling 1.0 reads
        # as a regression signal it is not; the absolutes + the
        # non-comparative marker stay in the full payload
        # r17 (VERDICT r16 task 6): the streaming family's bench surface
        "streaming_sessionize_sec",
        "streaming_neardup_sec",
    ):
        if k in out:
            compact[k] = out[k]
    # drop priority: first entry goes first (ADVICE r7: .pop() from the end
    # made the actual order the reverse of the documented one)
    droppable = [
        # r15: the key set outgrew the budget and the per-query dict was
        # sacrificed (the one thing the compact line exists to carry) —
        # redundant/derivable probe keys now drop first: legacy dup,
        # per-point balance (full file), ARIs that equal their F1 twin
        # every round, interior k points (endpoints tell the story)
        "er_1m_max_partition_clusters",
        "er_1m_16part_max_partition_clusters",
        "er_1m_32part_max_partition_clusters",
        "er_1m_8part_max_partition_clusters",
        # r16 additions drop early: the ARI equals its F1 twin on every
        # deterministic chain so far, and the 16p fusion point is the
        # secondary arm of the paper-scale probe (8p is the headline)
        "er_rl500_ari",
        "er_paper_multisweep16p_k8_speedup_vs_k1",
        "er_rl10k_multisweep_ari",
        "er_rl10k_burninfused_ari",
        "er_rl10k_multisweep4p_k2_iters_per_sec",
        "er_rl10k_multisweep4p_k4_iters_per_sec",
        "er_1m_multisweep8p_k4_speedup_vs_k1",
        "er_1m_multisweep8p_k8_sec_per_iter",
        # r17: the streaming probe's trend lives in the full payload; its
        # compact copies drop ahead of the ER scaling medians
        "streaming_neardup_sec",
        "streaming_sessionize_sec",
        "er_mcmc_probe_iters",
        "compstable_consumers_total_sec",
        "er_1m_8part_sec_per_iter_norm",
        "er_1m_16part_sec_per_iter_norm",
        "er_1m_32part_sec_per_iter_norm",
        "pairtable_build_save_sec",
        "pairtable_consumers_total_sec",
        "er_iterfloor_jvm_job_floor_sec",
        "er_iterfloor_python_job_floor_sec",
        "er_mcmc_spread",
        "er_paper_spark_1part_spread",
        "er_paper_spark_16part_spread",
        "er_rl10k_spark_1part_spread",
        "er_paper_spark_1part_iters_per_sec",
        "er_paper_spark_8part_iters_per_sec",
        # a point estimate and its spread drop TOGETHER (a bare median
        # with no spread is exactly the misreading this payload fixes)
        "er_rl10k_2part_spread",
        "er_rl10k_2part_iters_per_sec",
        "er_rl10k_1part_spread",
        "er_rl10k_1part_iters_per_sec",
        "er_rl10k_spark_2part_iters_per_sec",
        "er_rl10k_spark_1part_iters_per_sec",
        # the 4-part spreads drop LAST among probe extras: they adjudicate
        # the headline scaling endpoints
        "er_rl10k_spark_4part_spread",
        "er_paper_spark_4part_spread",
    ]
    while len(json.dumps(compact)) > COMPACT_LINE_BUDGET and droppable:
        compact.pop(droppable.pop(0), None)
    if len(json.dumps(compact)) > COMPACT_LINE_BUDGET:
        # last resort (ADVICE r7: never emit an over-budget line — that is
        # exactly the silent tail-truncation failure this payload exists to
        # fix): sacrifice the per-query dict, keep totals + the full pointer
        compact["queries"] = {}
        compact["queries_dropped"] = "over_line_budget_see_full"
        print(
            "# WARNING: compact payload over budget even after probe-key "
            "drops; per-query dict moved to the full file only",
            file=sys.stderr,
        )
    return compact


def _time_query(spark, sf_dir: str, name: str, reps: int = 3):
    """Best-of-``reps`` wall time for one registered query + its row count.
    Persisted intermediates are released between reps (caller-owns-cache
    contract via the `materialized` scope) so repeated invocations in this
    long-lived session don't accumulate cache entries."""
    from dblink_spark.queries import REGISTRY, materialized

    fn = REGISTRY[name].fn
    best, n = None, 0
    for _ in range(reps):
        t0 = time.time()
        with materialized(fn(spark, sf_dir)) as df:
            n = df.count()
            dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def _median_windows(run_window, n_windows: int = 3):
    """Run ``run_window() -> rate`` n times; return (median, "min..max",
    [rates]). The committed artifact must reproduce within ~15% on an
    isolated re-run (VERDICT r6 task 2) — a single window cannot promise
    that on local[32]."""
    rates = [run_window() for _ in range(n_windows)]
    med = statistics.median(rates)
    spread = f"{min(rates):.3g}..{max(rates):.3g}"
    return round(med, 3), spread, [round(r, 3) for r in rates]


def _payload_history() -> list[tuple[int, dict, str]]:
    """Usable bench payloads as (round, payload, filename), newest first.
    Prefers the committed full local artifact (BENCH_LOCAL_r{N}.json, raw
    payload) over the driver's tail-parsed BENCH_r{N}.json — r6's driver
    artifact carries "parsed": null (truncated tail) and is unusable. The
    filename rides along so regression labels can NAME the comparison
    payload (VERDICT r8 "wrong" #3: "vs r8" read as cross-round when the
    baseline was the intra-round BENCH_LOCAL_r08)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    by_round: dict[int, tuple[dict, str]] = {}
    for pattern, wrapped in (("BENCH_r*.json", True), ("BENCH_LOCAL_r*.json", False)):
        for path in glob.glob(os.path.join(here, pattern)):
            m = re.fullmatch(
                r"BENCH(?:_LOCAL)?_r(\d+)\.json", os.path.basename(path)
            )
            if not m:
                continue
            try:
                with open(path) as f:
                    data = json.load(f)
            except Exception:
                continue
            payload = data.get("parsed") if wrapped else data
            if isinstance(payload, dict) and "queries" in payload:
                # local full artifacts overwrite driver tails (same loop
                # order: BENCH_r* first, BENCH_LOCAL_r* second)
                by_round[int(m.group(1))] = (payload, os.path.basename(path))
    return sorted(
        ((r, p, f) for r, (p, f) in by_round.items()), key=lambda t: -t[0]
    )


def _diff_vs_last_round(out: dict, spark=None, sf_dir: str | None = None) -> None:
    """Surface round-over-round query regressions mechanically: compare this
    run against the newest usable committed payload (stderr only — stdout
    stays one JSON line; tools/bench_diff.py is the exit-code gate).

    Each flagged query is immediately RE-TIMED in isolation (best-of-3, same
    process, after the full sweep) and lands in the payload as
    ``regressions: [{query, prev, sweep, isolated}]`` — a noise flag carries
    its own adjudicating evidence.

    ``queries_retired`` is derived ONLY from the explicit RETIRED_QUERIES
    constant (ADVICE r6): an accidental drop lands in ``queries_missing``
    and fails the bench_diff gate.

    ``baseline_warm_cache`` (the r5→r6 warm-vs-cold comparability flag) is
    only set when the isolated re-time is ALSO within threshold of the
    newest honest-cold baseline for that query — a genuine regression
    confirmed by the isolated re-time is never waived (ADVICE r6)."""
    history = _payload_history()
    if not history:
        return
    prev_round, prev, prev_file = history[0]
    try:
        from tools.bench_diff import NOISE_FLOOR_SEC

        # queries whose r5-and-earlier "best" reused a persisted
        # intermediate across reps (warm baselines, cold from r6 on)
        warm_baseline = {
            "dedup_minhash_lsh", "dedup_simhash", "dedup_bottomk_jaccard",
            "pairwise_metrics", "dedup_components", "dedup_survivors",
        }
        prev_is_cold = any("honest-cold" in n for n in prev.get("notes", []))

        def _cold_ref(name: str) -> float | None:
            """Newest committed time for ``name`` measured under the
            honest-cold methodology (notes carry the marker from r6 on)."""
            for _, payload, _fname in history:
                notes = payload.get("notes", [])
                cold = any(
                    "honest-cold" in n or "COMPACT payload" in n for n in notes
                )
                if cold and name in payload.get("queries", {}):
                    return payload["queries"][name]
            return None

        flagged = []
        prev_queries = prev.get("queries", {})
        active_pins = _active_rebased_baselines()
        for name, t_new in out["queries"].items():
            rebase = active_pins.get(name)
            if rebase is not None:
                # explicit re-base (VERDICT r7): compare against the pinned
                # honest-cold number, not whatever methodology the newest
                # committed payload happened to use
                t_old = rebase["baseline"]
            else:
                t_old = prev_queries.get(name)
            if t_old and t_new > 1.5 * t_old and t_new > NOISE_FLOOR_SEC:
                entry = {"query": name, "prev": t_old, "sweep": t_new}
                if rebase is not None:
                    entry["rebased_baseline_as_of"] = rebase["as_of"]
                if spark is not None and sf_dir is not None:
                    entry["isolated"], _ = _time_query(spark, sf_dir, name)
                if name in warm_baseline and not prev_is_cold and rebase is None:
                    cold = _cold_ref(name)
                    isolated = entry.get("isolated", t_new)
                    if cold is None or isolated <= 1.5 * cold:
                        entry["baseline_warm_cache"] = True
                    else:
                        entry["cold_baseline"] = cold
                flagged.append(entry)
        missing = sorted(set(prev_queries) - set(out["queries"]))
        retired = [m for m in missing if m in RETIRED_QUERIES]
        dropped = [m for m in missing if m not in RETIRED_QUERIES]
        # name the FILE, not just the round (VERDICT r8 "wrong" #3: "vs r8"
        # labeled an intra-round BENCH_LOCAL_r08 comparison as cross-round)
        base = prev_file
        out["diff_baseline_file"] = prev_file
        if flagged or missing:
            out["regressions"] = flagged
            if retired:
                out["queries_retired"] = retired
            if dropped:
                out["queries_missing"] = dropped
            msgs = [
                f"{e['query']}: {e['prev']:.3f}s -> {e['sweep']:.3f}s"
                + (f" (isolated {e['isolated']:.3f}s)" if "isolated" in e else "")
                for e in flagged
            ] + [f"{m}: MISSING from this run (not in RETIRED_QUERIES)" for m in dropped]
            if msgs:
                print(f"# REGRESSION vs {base}: " + "; ".join(msgs), file=sys.stderr)
            if retired:
                print(f"# retired vs {base}: {retired}", file=sys.stderr)
        else:
            print(f"# no query regressions vs {base} (1.5x gate)", file=sys.stderr)
    except Exception as e:  # diagnostic only — never break the bench line
        print(f"# bench diff skipped: {e}", file=sys.stderr)


def _make_er_problem(spark, n_records: int, seed: int, dup_fraction: float = 0.2):
    """Shared probe scaffolding: RLdata-shaped synthetic -> records frame +
    attribute spec + records cache (the same 5-attribute schema every ER
    probe uses)."""
    from pyspark.sql import functions as F

    from dblink_spark.er.attributes import (
        Attribute,
        BetaParams,
        ConstantSim,
        LevenshteinSim,
    )
    from dblink_spark.er.cache import build_records_cache
    from dblink_spark.er.datagen import make_rldata

    pdf = make_rldata(
        n_records=n_records, dup_fraction=dup_fraction,
        missing_fraction=0.02, seed=seed,
    )
    if "ent_id" in pdf.columns:
        pdf = pdf.drop(columns=["ent_id"])
    records = (
        spark.createDataFrame(pdf).withColumn("file_id", F.lit("0")).repartition(32)
    )
    attrs = [
        Attribute("by", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bm", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bd", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("fname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
        Attribute("lname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
    ]
    cache = build_records_cache(records, attrs, expected_max_cluster_size=10)
    return records, attrs, cache


def paper_scale_spark_path(spark, n_records: int = 100_000, n_iters: int = 3) -> dict:
    """Partition scaling of the distributed ``applyInPandas``/``applyInArrow``
    path at a scale where kernels dominate the per-iteration job floor —
    the regime the reference's near-linear-scaling headline claim is about
    (ref: /root/reference README; multi-hundred-thousand-record datasets).

    100k synthetic RLdata-shaped records, KD-tree partitioning, PCG-I;
    median of 3 independent ``n_iters``-iteration windows per point (r7
    variance fix). At 300k records the same harness measured 1/2/4/8
    partitions at ~7.5/2.9/1.7/1.5 s/iter after the r5 floor work
    (tools/measure_300k_scaling.py).

    r15 (VERDICT r14 task 6): extended from p=1/4 to p=1/4/8/16 with a
    per-point balance reading (``er_paper_{p}part_max_partition_clusters``)
    so the near-linear-scaling story is pinned WITHIN-session at the
    paper's own scale between rl10k and 1M — read the points as ratios
    (the shared canary brackets the sweep), and read a stalling ratio
    against the balance numbers: speedup flattens when max/mean partition
    population diverges or the per-iteration job floor dominates the
    shrinking per-partition kernels."""
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import assign_partitions, init_state, transition

    records, attrs, cache = _make_er_problem(spark, n_records, seed=11)
    s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=99)
    out = {"er_paper_n_records": n_records}
    for p in (1, 4, 8, 16):
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
            out[f"er_paper_{p}part_max_partition_clusters"] = int(max(sizes))
            if p == 4:  # legacy key, kept so cross-round diffs line up
                out["er_paper_max_partition_clusters"] = int(max(sizes))
        s = transition(s, "PCG-I")  # warm
        state_box = [s]

        def _window() -> float:
            t0 = time.time()
            for _ in range(n_iters):
                state_box[0] = transition(state_box[0], "PCG-I")
            return n_iters / (time.time() - t0)

        med, spread, rates = _median_windows(_window)
        out[f"er_paper_spark_{p}part_iters_per_sec"] = med
        out[f"er_paper_spark_{p}part_spread"] = spread
        print(
            f"# er_paper({n_records}): {med:.3f} it/s at {p} partition(s) "
            f"(median of 3 windows, {spread})", file=sys.stderr,
        )
    return out


def paper_scale_multisweep(spark, n_records: int = 100_000) -> dict:
    """Burn-in sweep fusion at paper scale (VERDICT r15 task 8): the r15
    p=16 flattening at 100k is JOB-FLOOR-bound — exactly the regime where
    k=8 burn-in fusion wins at rl10k — so this probe measures k=1 vs k=8
    at p=8/16 within one session to either extend the k-by-regime
    recommendation down to 100k or bound it.

    Methodology matches the 1M artifact (er-perf r15): every point runs
    through ``transition_multisweep`` (k=1 = same call path), and the two
    k values are INTERLEAVED round-robin over 3 cycles with the median per
    k — a sequential per-k pass conflates the chain's fresh→equilibrium
    drift with the k effect. 16 sweeps per reading."""
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import (
        assign_partitions,
        init_state,
        transition_multisweep,
    )

    records, attrs, cache = _make_er_problem(spark, n_records, seed=11)
    s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=99)
    out = {"er_paper_multisweep_n_records": n_records}
    for p in (8, 16):
        pf = KDTreePartitioner(
            num_levels=p.bit_length() - 1, attribute_ids=[3, 4, 0]
        )
        pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        s = assign_partitions(s0, pf, p)
        s = transition_multisweep(s, "PCG-I", 1)  # warm this p
        readings: dict[int, list[float]] = {1: [], 8: []}
        for _cyc in range(3):
            for k in (1, 8):
                jobs = 16 // k
                t0 = time.time()
                for _ in range(jobs):
                    s = transition_multisweep(s, "PCG-I", k)
                readings[k].append((k * jobs) / (time.time() - t0))
        k1 = statistics.median(readings[1])
        k8 = statistics.median(readings[8])
        out[f"er_paper_multisweep{p}p_k1_iters_per_sec"] = round(k1, 2)
        out[f"er_paper_multisweep{p}p_k8_iters_per_sec"] = round(k8, 2)
        out[f"er_paper_multisweep{p}p_k8_speedup_vs_k1"] = round(k8 / k1, 2)
        out[f"er_paper_multisweep{p}p_k1_readings"] = [
            round(x, 2) for x in readings[1]
        ]
        out[f"er_paper_multisweep{p}p_k8_readings"] = [
            round(x, 2) for x in readings[8]
        ]
        print(
            f"# er_paper_multisweep({n_records}): p={p} k=1 {k1:.2f} it/s, "
            f"k=8 {k8:.2f} it/s ({k8 / k1:.2f}x; interleaved medians of 3)",
            file=sys.stderr,
        )
    return out


def pair_table_amortization(spark, sf_dir: str) -> dict:
    """VERDICT r12 task 2 / missing #1: MEASURE the shared-pairs seam.

    The gate entries `dedup_components` / `dedup_survivors` /
    `q_docs_dedup_bias_audit` each rebuild the same verified pair
    relation in-session (~4.6-5.0s each at sf0.1 — deliberately, every
    gate entry is a self-contained (spark, sf_dir) -> frame program).
    A production snapshot builds the pair table ONCE, persists it
    (`sources.dedup_index.save_pair_table`), and runs every consumer
    off the parquet scan. This probe times exactly that: one
    build+save, then each consumer against the loaded table — the
    "second consumer ~free" claim as numbers in the payload, next to
    the sweep's self-contained timings for the same three queries."""
    import shutil
    import tempfile

    from dblink_spark.queries import REGISTRY, release_caches
    from dblink_spark.queries.dedup import bottomk_sketch_pairs, load
    from dblink_spark.sources.dedup_index import (
        load_pair_table,
        save_pair_table,
    )

    tmp = tempfile.mkdtemp(prefix="bench_pairtable_")
    out: dict = {}
    try:
        t0 = time.time()
        pairs = bottomk_sketch_pairs(
            load(spark, sf_dir, "documents"), k=8, threshold=0.99
        )
        save_pair_table(pairs, tmp)
        release_caches(pairs)
        out["pairtable_build_save_sec"] = round(time.time() - t0, 3)
        shared = load_pair_table(spark, tmp)
        total = 0.0
        for name in (
            "dedup_components", "dedup_survivors", "q_docs_dedup_bias_audit"
        ):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir, pairs=shared).count()
            dt = round(time.time() - t0, 3)
            out[f"pairtable_{name}_sec"] = dt
            total += dt
        out["pairtable_consumers_total_sec"] = round(total, 3)
        # second tier (r13): persist the CLOSURE too — survivors + audit
        # off the loaded comps table should now cost only their own
        # aggregation/join work
        from dblink_spark.operators.components import connected_components
        from dblink_spark.sources.dedup_index import (
            load_comps_table, save_comps_table,
        )

        ctmp = tempfile.mkdtemp(prefix="bench_compstable_")
        try:
            t0 = time.time()
            save_comps_table(
                connected_components(shared, "doc1", "doc2"), ctmp
            )
            out["compstable_build_save_sec"] = round(time.time() - t0, 3)
            comps = load_comps_table(spark, ctmp)
            ctotal = 0.0
            for name in ("dedup_survivors", "q_docs_dedup_bias_audit"):
                t0 = time.time()
                REGISTRY[name].fn(spark, sf_dir, comps=comps).count()
                dt = round(time.time() - t0, 3)
                out[f"compstable_{name}_sec"] = dt
                ctotal += dt
            out["compstable_consumers_total_sec"] = round(ctotal, 3)
            print(
                f"# compstable: closure build+save "
                f"{out['compstable_build_save_sec']}s, 2 consumers off the "
                f"shared closure {ctotal:.3f}s total", file=sys.stderr,
            )
        finally:
            shutil.rmtree(ctmp, ignore_errors=True)
        out["pairtable_note"] = (
            "one persisted pair build feeds all three closure consumers "
            "(pairtable_*), and one persisted CLOSURE feeds the two "
            "component consumers (compstable_* — r13, the second tier); "
            "compare against the same queries' self-contained sweep "
            "timings (which rebuild everything per entry by design). "
            "pairtable deltas = the amortized pair build; compstable "
            "deltas additionally amortize the large-star/small-star "
            "rounds, leaving only each consumer's own aggregation/join "
            "work"
        )
        print(
            f"# pairtable: build+save {out['pairtable_build_save_sec']}s, "
            f"3 consumers off the shared table {total:.3f}s total",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def er_iteration_floor_breakdown(spark) -> dict:
    """VERDICT r12 task 1: decompose the distributed-ER per-iteration cost
    into DRIVER PLAN (θ draw + salt column + kernel cloudpickle + lazy
    localCheckpoint Catalyst planning) vs the ONE Spark JOB (scan →
    shuffle → Python kernels → checkpoint materialization → summary
    collect), alongside the two STRUCTURAL floors measured with the exact
    same exec conf: a JVM-only two-stage job and a trivial
    ``applyInPandas`` job (plan reused, identity kernel, 4 groups).

    The structural story this makes adjudicable: before r13, a trivial
    python job cost ~0.21s on this host because PySpark's worker loop
    re-parses every sys.path zip's central directory on EVERY task
    (``importlib.invalidate_caches`` → CPython 3.11's unguarded
    ``zipimport``; ~140 ms of worker CPU per task, profiled). The
    stat-guard backport (``operators/workerboot.py``) cuts the trivial
    python job to ~0.09s, and the ER iteration's job phase rides the
    same floor — the residual gap between ``job`` and
    ``python_job_floor`` is Arrow serde + kernel compute + checkpoint
    materialization, and the gap between plan and ~0 is Catalyst+py4j,
    the same 1-job-per-iteration cadence the reference pays
    (State.scala:78-99)."""
    import statistics as _st

    from pyspark.sql import functions as F

    from dblink_spark.er import state as st
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import assign_partitions, init_state, transition

    records, attrs, cache = _make_er_problem(spark, 10_000, seed=11)
    s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=99)
    pf = KDTreePartitioner(num_levels=2, attribute_ids=[3, 4, 0])
    pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
    s = assign_partitions(s0, pf, pf.num_partitions)
    s = transition(s, "PCG-I")
    s = transition(s, "PCG-I")
    plans, jobs = [], []
    for _ in range(7):
        sink: dict[str, float] = {}
        s = transition(s, "PCG-I", phase_sink=sink)
        plans.append(sink["plan"])
        jobs.append(sink["job"])

    # structural floors under the iteration's exact exec conf (width 4,
    # AQE coalescing off); the python identity kernel applies the same
    # workerboot guard the real kernels do, so this measures the floor
    # the iteration actually rides
    from dblink_spark.operators.workerboot import make_worker_boot

    boot = make_worker_boot()

    def _identity(pdf):
        boot()
        return pdf

    out: dict = {}
    with st._kernel_exec_conf(spark, shuffle_partitions=4):
        df4 = spark.range(0, 4, 1, 4).withColumn("k", F.col("id") % 4)
        jvm_plan = df4.groupBy("k").agg(F.count("*"))
        py_plan = df4.groupBy("k").applyInPandas(_identity, "id long, k long")
        for _ in range(3):  # warm pool workers through the boot guard
            jvm_plan.collect()
            py_plan.collect()

        def _med(fn, n=7):
            ts = []
            for _ in range(n):
                t0 = time.time()
                fn()
                ts.append(time.time() - t0)
            return _st.median(ts)

        out["er_iterfloor_jvm_job_floor_sec"] = round(
            _med(lambda: jvm_plan.collect()), 3
        )
        out["er_iterfloor_python_job_floor_sec"] = round(
            _med(lambda: py_plan.collect()), 3
        )
    out["er_iterfloor_plan_sec"] = round(_st.median(plans), 3)
    out["er_iterfloor_job_sec"] = round(_st.median(jobs), 3)
    out["er_iterfloor_plan_secs"] = [round(x, 3) for x in plans]
    out["er_iterfloor_job_secs"] = [round(x, 3) for x in jobs]
    out["er_iterfloor_note"] = (
        "rl10k 4-part transition split driver-plan vs job; floors share "
        "the exec conf; job ~ python_job_floor + serde/kernels/ckpt — "
        "1 python job per iteration is the structural cadence "
        "(workerboot.py halved the pre-r13 floor)"
    )
    print(
        f"# er_iterfloor: plan {out['er_iterfloor_plan_sec']}s + job "
        f"{out['er_iterfloor_job_sec']}s per iter; floors jvm "
        f"{out['er_iterfloor_jvm_job_floor_sec']}s / python "
        f"{out['er_iterfloor_python_job_floor_sec']}s", file=sys.stderr,
    )
    return out


def er_1m_partition_scaling(spark, n_records: int = 1_000_000, n_iters: int = 6) -> dict:
    """1M-record distributed chain at p=8 vs p=16 vs p=32 (VERDICT r6
    task 7, extended to 32 parts per VERDICT r11 task 7: 13→9.7 s/iter at
    8→16 suggested headroom). Reports the MEDIAN sec/iter per
    point plus every iteration's own wall time (``..._iter_secs``) — the r7
    judge measured 2.2x same-code host drift between sessions, so a single
    committed number with no spread is unreadable (VERDICT r7 "what's
    wrong" #2); the per-iteration times cost nothing, each iteration is
    already driven individually. Also reports the max partition population —
    the per-partition memory ceiling (SURVEY §4: "spill is not handled"; a
    partition's packed state must fit one Arrow batch; see
    ``er/state.py`` partition-budget guard). Read cross-round absolutes as
    ratios against the canary probe, not as bare numbers."""
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import assign_partitions, init_state, transition

    t0 = time.time()
    records, attrs, cache = _make_er_problem(spark, n_records, seed=17)
    build_s = time.time() - t0
    s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=31)
    out = {
        "er_1m_n_records": n_records,
        "er_1m_cache_build_sec": round(build_s, 1),
        # methodology marker (r13): median over SIX iterations (was 3) —
        # cross-round diffs on these keys straddle that boundary
        "er_1m_probe_stat": "median6_r13",
    }
    for p in (8, 16, 32):
        pf = KDTreePartitioner(
            num_levels=p.bit_length() - 1, attribute_ids=[3, 4, 0]
        )
        pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        s = assign_partitions(s0, pf, pf.num_partitions)
        # balance alongside every point (r11 task 7): the per-partition
        # memory ceiling AND the straggler bound — speedup stalls when
        # max/mean diverges, so the number must ride with the timing
        sizes = [
            r["count"]
            for r in s.df.filter("NOT is_summary")
            .groupBy("partition_id")
            .count()
            .collect()
        ]
        out[f"er_1m_{p}part_max_partition_clusters"] = int(max(sizes))
        if p == 16:  # legacy key, kept so cross-round diffs line up
            out["er_1m_max_partition_clusters"] = int(max(sizes))
        s = transition(s, "PCG-I")  # warm
        # Per-point host-load bracket (VERDICT r12 task 4 / "wrong" #3: two
        # rounds of 16p medians inflated by host stalls needed hand
        # adjudication): the SAME constant-work canary the sweep uses,
        # timed immediately before each point's iterations, plus a
        # canary-normalized median — a stalled slot now carries its own
        # evidence (inflated canary => inflated median is load, not code).
        point_canary = _canary(spark)
        out[f"er_1m_{p}part_canary_sec"] = point_canary
        iter_secs = []
        for _ in range(n_iters):
            t0 = time.time()
            s = transition(s, "PCG-I")
            iter_secs.append(round(time.time() - t0, 2))
        # r13: SIX iterations per point (was 3) — two isolated clean-
        # canary probes at 16p produced [9.4, 8.5, 9.2, 2.2, 2.2, 2.1]
        # and [15.2, 5.4, 6.2, 22.5, 27.2, 28.3]: per-iteration times at
        # 1M swing 3-5x within a single window with no stable phase
        # structure, so a 3-sample median was adjudicating host weather.
        # The median over 6 plus the per-point canary plus the full
        # array is the honest committed shape. (The same probes DID
        # nail something reproducible: retired checkpoints were leaking
        # ~60 MB/iteration — fixed in er/state.py:_release_state_df,
        # storage now flat at one live checkpoint.)
        spi = statistics.median(iter_secs)
        out[f"er_1m_{p}part_sec_per_iter"] = round(spi, 2)
        out[f"er_1m_{p}part_sec_per_iter_norm"] = round(
            spi * CANARY_REF_SEC / point_canary, 2
        )
        out[f"er_1m_{p}part_iter_secs"] = iter_secs
        print(
            f"# er_1m: {spi:.2f} s/iter at {p} partitions "
            f"(median of {iter_secs}; point canary {point_canary:.2f}s, "
            f"norm {out[f'er_1m_{p}part_sec_per_iter_norm']:.2f})",
            file=sys.stderr,
        )
        if p == 8:
            # r15 (VERDICT r14 task 1): multisweep where it matters — at
            # 1M the per-job floor is noise next to the kernels, but
            # fusing k sweeps per job ALSO amortizes the migration
            # SHUFFLE (the state only exchanges at job boundaries), so
            # the win has a different mechanism than rl10k's job-floor
            # story. Same call path for every k (k=1 included, so the
            # baseline shares the methodology), 8 sweeps per point,
            # within-session ratios are the signal (absolutes are host
            # weather; the per-point canary brackets them). The
            # quality cost at this scale is measured out-of-band by
            # tools/measure_1m_multisweep.py (equal-sweep-count k=1 vs
            # k=8 chains) — too long for a per-round probe. The k points
            # INTERLEAVE in two round-robin cycles and each k reports
            # the median of its readings: a sequential one-shot-per-k
            # sweep conflates the chain's own state drift (fresh chains
            # sweep faster than mixed ones — the adjudicated
            # equilibrium-transient effect) with the k effect.
            from dblink_spark.er.state import transition_multisweep

            ms = s  # reuse the warmed p=8 chain state
            readings: dict[int, list[float]] = {k: [] for k in (1, 2, 4, 8)}
            for _cyc in range(2):
                for k in (1, 2, 4, 8):
                    jobs = max(8 // k, 1)
                    t0 = time.time()
                    for _ in range(jobs):
                        ms = transition_multisweep(ms, "PCG-I", k)
                    readings[k].append((time.time() - t0) / (k * jobs))
            k1_spi = statistics.median(readings[1])
            for k in (1, 2, 4, 8):
                spi_k = statistics.median(readings[k])
                out[f"er_1m_multisweep8p_k{k}_sec_per_iter"] = round(spi_k, 2)
                out[f"er_1m_multisweep8p_k{k}_iter_secs"] = [
                    round(x, 2) for x in readings[k]
                ]
                if k > 1:
                    out[f"er_1m_multisweep8p_k{k}_speedup_vs_k1"] = round(
                        k1_spi / spi_k, 2
                    )
                print(
                    f"# er_1m_multisweep: k={k} -> {spi_k:.2f} s/iter at 8 "
                    f"partitions (median of {readings[k]}, interleaved "
                    f"cycles)", file=sys.stderr,
                )
            # r17 (VERDICT r16 task 8, carrying r15 "wrong" #1): these
            # cells are CHAIN-STATE-DRIFT dominated — the r16 3-cycle
            # re-measure (BENCH_1M_MULTISWEEP_r16.json) found k=2/k=4
            # statistically indistinguishable and k=8 straddling 1.0,
            # with fresh-chain reads up to 5x faster than mixed-chain
            # reads at the same k. Two in-bench cycles cannot support a
            # cross-round ordering, so the payload says so in-band, and
            # the speedup ratios no longer ride in the COMPACT artifact
            # (the surface cross-round comparisons are made from).
            out["er_1m_multisweep8p_note"] = (
                "non-comparative across rounds: chain-state drift "
                "dominates (see BENCH_1M_MULTISWEEP_r16.json); the "
                "adjudicated claim lives in COVERAGE.md"
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

    All points are the MEDIAN of 3 independent windows (r7 variance fix).

    Expected shape at THIS problem size: the Spark path speeds up 1→2
    partitions (parallel kernel tasks) then plateaus, because the
    per-iteration fixed cost (job scheduling + Arrow shuffle of the state +
    lazy-checkpoint materialization + summary job, ~0.5s on local[32])
    dominates once the ~50ms/partition kernels shrink below it. That floor
    is why the sampler routes driver-sized problems local; the distributed
    path pays off when per-partition kernel time >> job floor (see
    `paper_scale_spark_path`)."""
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
    out = {}

    s1 = transition_fused(s0, "PCG-I", 2)  # warm
    state_box = [s1]

    def _fused_window() -> float:
        t0 = time.time()
        state_box[0] = transition_fused(state_box[0], "PCG-I", n_iters)
        return n_iters / (time.time() - t0)

    med, spread, _ = _median_windows(_fused_window)
    out["er_rl10k_1part_iters_per_sec"] = med
    out["er_rl10k_1part_spread"] = spread

    part = project.build_partitioner()
    part.fit(s0.df.filter("NOT is_summary").select("ent_values"))
    s2 = assign_partitions(s0, part, part.num_partitions)
    s2 = transition_local(s2, "PCG-I")  # warm (collects df -> local parts)
    local_box = [s2]

    def _local_window() -> float:
        t0 = time.time()
        for _ in range(n_iters):
            local_box[0] = transition_local(local_box[0], "PCG-I")
        return n_iters / (time.time() - t0)

    med2, spread2, _ = _median_windows(_local_window)
    out["er_rl10k_2part_iters_per_sec"] = med2
    out["er_rl10k_2part_spread"] = spread2
    print(
        f"# er_rl10k: {med:.1f} it/s 1-part ({spread}), {med2:.1f} it/s "
        f"{part.num_partitions}-part ({spread2}) [driver-local kernels, "
        f"median of 3]", file=sys.stderr,
    )

    # Distributed applyInPandas path, 1/2/4 partitions (10 timed iterations
    # per window — the per-iteration cost is ~10x the driver-local path).
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
        box = [s]

        def _spark_window() -> float:
            t0 = time.time()
            for _ in range(spark_iters):
                box[0] = transition(box[0], "PCG-I")
            return spark_iters / (time.time() - t0)

        medp, spreadp, _ = _median_windows(_spark_window)
        out[f"er_rl10k_spark_{p}part_iters_per_sec"] = medp
        out[f"er_rl10k_spark_{p}part_spread"] = spreadp
        print(
            f"# er_rl10k_spark: {medp:.2f} it/s at {p} partition(s) "
            f"(median of 3 windows, {spreadp})", file=sys.stderr,
        )

    # r14 (VERDICT r13 task 3): multi-partition sweep fusion at p=4 —
    # transition_multisweep runs k kernel sweeps per Spark job, amortizing
    # the measured ~0.157s/iter plan+job floor k× (the floor, not the
    # kernels, dominates rl10k at p=4). k=1 is bit-parity with
    # transition() (pinned in tests/test_er_mcmc.py); k>1 relaxes
    # migration/θ to a k-sweep cadence (documented chain-semantics
    # difference). Every window times ~16 sweeps so the k points compare
    # like for like.
    from dblink_spark.er.state import transition_multisweep

    pf4 = KDTreePartitioner(num_levels=2, attribute_ids=kd_order)
    pf4.fit(s0.df.filter("NOT is_summary").select("ent_values"))
    for k in (1, 2, 4, 8):
        s = assign_partitions(s0, pf4, pf4.num_partitions)
        s = transition_multisweep(s, "PCG-I", k)  # warm
        box = [s]
        jobs = max(16 // k, 1)

        def _ms_window() -> float:
            t0 = time.time()
            for _ in range(jobs):
                box[0] = transition_multisweep(box[0], "PCG-I", k)
            return (k * jobs) / (time.time() - t0)

        medk, spreadk, _ = _median_windows(_ms_window)
        out[f"er_rl10k_multisweep4p_k{k}_iters_per_sec"] = medk
        out[f"er_rl10k_multisweep4p_k{k}_spread"] = spreadk
        print(
            f"# er_rl10k_multisweep: k={k} -> {medk:.2f} it/s at 4 "
            f"partitions (median of 3 windows, {spreadk})", file=sys.stderr,
        )
    return out


def rl10k_linkage_quality(spark) -> dict:
    """Model-QUALITY probe (VERDICT r8 task 7): pairwise F1 and adjusted
    Rand index on the reference's flagship RLdata10000 workload, recorded
    in the payload so linkage-quality drift is tracked round-over-round
    like perf — previously these lived only as pytest thresholds
    (tests/test_rldata10k_parity.py pins >0.70/>0.70; the full-length
    measured point is F1=0.764 / ARI=0.764).

    Runs the reference config END TO END (1,000 iterations, sMPC cutoff
    100 — identical to the parity test, ~15s fused on an idle host). The
    chain is fully seeded and deterministic, so these numbers are EXACT
    round-over-round unless sampler/kernel semantics changed — any delta
    at all is a semantic diff to explain, not timing noise
    (er_rl10k_quality_chain records the methodology for bench_diff
    comparability)."""
    conf = "/root/reference/examples/RLdata10000.conf"
    csv_path = "/root/reference/examples/RLdata10000.csv"
    if not (os.path.exists(conf) and os.path.exists(csv_path)):
        return {}
    import tempfile

    from dblink_spark.config import load_config
    from dblink_spark.project import Project

    cfg = load_config(conf)
    d = cfg["dblink"]
    d["data"]["path"] = csv_path
    tmp = tempfile.mkdtemp(prefix="bench_rl10k_quality_")
    d["outputPath"] = tmp + "/"
    d["checkpointPath"] = tmp + "/ckpt"
    res = Project.from_config(spark, cfg).run()
    pw = res["evaluate"]["pairwise"]
    # methodology marker DERIVED from the loaded config (ADVICE r9: a
    # hardcoded literal would falsely claim chain comparability if the
    # external conf's iterations/cutoff/seed ever differ from the literal)
    steps = {s["name"]: s.get("parameters", {}) for s in d["steps"]}
    n_iters = steps["sample"]["sampleSize"] * max(
        int(steps["sample"].get("thinningInterval", 1)), 1
    ) + int(steps["sample"].get("burninInterval", 0))
    marker = (
        f"{n_iters}it-smpc{steps['evaluate']['lowerIterationCutoff']}"
        f"-seed{d['randomSeed']}"
    )
    out = {
        "er_rl10k_f1": round(pw["f1"], 4),
        "er_rl10k_precision": round(pw["precision"], 4),
        "er_rl10k_recall": round(pw["recall"], 4),
        "er_rl10k_ari": round(
            res["evaluate"]["cluster"]["adjusted_rand_index"], 4
        ),
        "er_rl10k_quality_chain": marker,
    }
    print(
        f"# er_rl10k quality: F1 {out['er_rl10k_f1']:.3f} "
        f"(P {out['er_rl10k_precision']:.3f} R {out['er_rl10k_recall']:.3f}) "
        f"ARI {out['er_rl10k_ari']:.3f} [deterministic seeded chain]",
        file=sys.stderr,
    )
    return out


def rl500_linkage_quality(spark) -> dict:
    """RLdata500 quality pin at the reference's FULL configured length
    (VERDICT r15 task 6): the reference's other flagship example
    (examples/RLdata500.conf — 1,000 iterations, thinning 10, sMPC
    cutoff 100, seed 319158) run end-to-end per round with exact P/R/F1/
    ARI recorded in the payload, exactly like rl10k's pin. The parity
    test (tests/test_rldata_parity.py) asserts >-thresholds at this
    length; this pin records the exact seeded-chain values so any
    kernel-semantics drift shows as a bit-level delta round-over-round.
    The chain is driver-local (500 records) — cost is seconds."""
    conf = "/root/reference/examples/RLdata500.conf"
    csv_path = "/root/reference/examples/RLdata500.csv"
    if not (os.path.exists(conf) and os.path.exists(csv_path)):
        return {}
    import tempfile

    from dblink_spark.config import load_config
    from dblink_spark.project import Project

    cfg = load_config(conf)
    d = cfg["dblink"]
    d["data"]["path"] = csv_path
    tmp = tempfile.mkdtemp(prefix="bench_rl500_quality_")
    d["outputPath"] = tmp + "/"
    d["checkpointPath"] = tmp + "/ckpt"
    t0 = time.time()
    res = Project.from_config(spark, cfg).run()
    dt = round(time.time() - t0, 1)
    pw = res["evaluate"]["pairwise"]
    steps = {s["name"]: s.get("parameters", {}) for s in d["steps"]}
    n_iters = steps["sample"]["sampleSize"] * max(
        int(steps["sample"].get("thinningInterval", 1)), 1
    ) + int(steps["sample"].get("burninInterval", 0))
    out = {
        "er_rl500_f1": round(pw["f1"], 4),
        "er_rl500_precision": round(pw["precision"], 4),
        "er_rl500_recall": round(pw["recall"], 4),
        "er_rl500_ari": round(
            res["evaluate"]["cluster"]["adjusted_rand_index"], 4
        ),
        "er_rl500_quality_chain": (
            f"{n_iters}it-smpc{steps['evaluate']['lowerIterationCutoff']}"
            f"-seed{d['randomSeed']}"
        ),
        "er_rl500_run_sec": dt,
    }
    print(
        f"# er_rl500 quality: F1 {out['er_rl500_f1']:.3f} "
        f"(P {out['er_rl500_precision']:.3f} R {out['er_rl500_recall']:.3f}) "
        f"ARI {out['er_rl500_ari']:.3f} ({dt}s full 1000-it chain)",
        file=sys.stderr,
    )
    return out


def streaming_pipeline_probe(spark, sf_dir: str) -> dict:
    """r17 (VERDICT r16 task 6): the streaming family gets a bench
    surface. Two timed drains of the sf fixtures through the flagship
    stateful paths with ``trigger(availableNow)`` (process everything,
    then stop) into a memory sink, best of 2 per path:

    - ``streaming_sessionize_sec``: the events fixture through
      `read_event_stream` + `sessionize_stream` (session_window state).
    - ``streaming_neardup_sec``: the documents fixture through
      `near_dedup_doc_stream_banded` (2 chained
      dropDuplicatesWithinWatermark stages over row-local MinHash band
      keys — the stream twin of the batch LSH).

    These are WALL seconds for a full availableNow drain (source listing +
    state store + sink), not per-row throughput; the value is the
    round-over-round trend, which the streaming family previously had no
    measurement for. stream==batch parity stays pinned in
    tests/test_streaming*.py — this probe only times."""
    import tempfile

    from dblink_spark.streaming.events import (
        near_dedup_doc_stream_banded,
        read_event_stream,
        run_to_memory_sink,
        sessionize_stream,
    )

    # the file stream source requires a DIRECTORY; the fixtures are single
    # read-only files, so stage each behind a symlink in a temp dir (the
    # local filesystem lists through symlinks; no bytes are copied)
    stage = tempfile.mkdtemp(prefix="bench_stream_src_")
    for table in ("events", "documents"):
        d = os.path.join(stage, table)
        os.makedirs(d, exist_ok=True)
        os.symlink(
            os.path.join(sf_dir, f"{table}.parquet"),
            os.path.join(d, "part-000.parquet"),
        )

    out = {}
    best_sess = float("inf")
    best_near = float("inf")
    n_sess = n_near = 0
    for rep in range(2):
        spark.sparkContext.setJobDescription("bench: streaming sessionize")
        table = f"bench_stream_sessions_{rep}"
        t0 = time.monotonic()
        run_to_memory_sink(
            sessionize_stream(
                read_event_stream(spark, os.path.join(stage, "events"))
            ),
            table,
        )
        best_sess = min(best_sess, time.monotonic() - t0)
        n_sess = spark.table(table).count()
        spark.catalog.dropTempView(table)

        spark.sparkContext.setJobDescription("bench: streaming near-dedup")
        docs = (
            spark.readStream.schema(
                "doc_id bigint, text string, lang string, source string, "
                "n_chars bigint"
            )
            .format("parquet")
            .load(os.path.join(stage, "documents"))
            # a synthetic-but-deterministic arrival time: the fixture has
            # no timestamp column and the watermark operator needs one
            .selectExpr(
                "*", "timestamp_micros(doc_id * 1000000) AS event_time"
            )
        )
        table = f"bench_stream_neardup_{rep}"
        t0 = time.monotonic()
        run_to_memory_sink(near_dedup_doc_stream_banded(docs), table)
        best_near = min(best_near, time.monotonic() - t0)
        n_near = spark.table(table).count()
        spark.catalog.dropTempView(table)
    spark.sparkContext.setJobDescription(None)
    out["streaming_sessionize_sec"] = round(best_sess, 3)
    out["streaming_neardup_sec"] = round(best_near, 3)
    out["streaming_neardup_survivors"] = n_near
    print(
        f"# streaming probe: sessionize {best_sess:.2f}s ({n_sess} closed "
        f"sessions), banded near-dedup {best_near:.2f}s ({n_near} "
        "survivors) — availableNow drain, best of 2",
        file=sys.stderr,
    )
    return out


def rl10k_multisweep_quality(spark) -> dict:
    """Model-quality check for the r14 multisweep relaxation: the SAME
    reference RLdata10000 config, run end-to-end on the DISTRIBUTED
    2-partition path with ``multisweepK=8`` (θ and migration on an
    8-sweep cadence) — if the documented chain-semantics relaxation cost
    linkage quality, it would show here as F1/ARI falling out of the
    parity band (the unfused chain measures 0.764/0.764; the pytest
    floor is 0.70/0.70). The chain is seeded but NOT comparable
    bit-for-bit to the unfused one (different θ RNG cadence), so the
    committed number is a quality band check, not a determinism pin.

    r14 baseline readings (isolated): 0.725 at k=2, 0.713 at k=8, and a
    2000-iteration k=8 chain lands 0.703 — the cadence relaxation costs
    ~0.05 F1 at this scale and longer chains do not buy it back, which
    is why the docstring recommends k>1 for throughput-bound phases and
    k=1 for kept samples. This probe pins the k=8 point per round so
    the trade-off cannot silently worsen.

    r15 (VERDICT r14 task 2): the probe ALSO runs the RECOMMENDED
    configuration per round — ``multisweepBurninK=8`` + k=1 kept samples
    (burn-in fused for throughput, every kept sample at exact reference
    cadence) — as ``er_rl10k_burninfused_f1/ari``. Until now that number
    (0.772 isolated, r14) lived only in a docstring and a test comment
    while the bench re-measured just the pessimal full-chain k=8 pin;
    the config users are told to run is now the config the bench
    re-measures."""
    conf = "/root/reference/examples/RLdata10000.conf"
    csv_path = "/root/reference/examples/RLdata10000.csv"
    if not (os.path.exists(conf) and os.path.exists(csv_path)):
        return {}
    import tempfile

    from dblink_spark.config import load_config
    from dblink_spark.project import Project

    def _run_chain(params: dict) -> tuple[dict, float]:
        cfg = load_config(conf)
        d = cfg["dblink"]
        d["data"]["path"] = csv_path
        tmp = tempfile.mkdtemp(prefix="bench_rl10k_ms_")
        d["outputPath"] = tmp + "/"
        d["checkpointPath"] = tmp + "/ckpt"
        for s in d["steps"]:
            if s.get("name") == "sample":
                s.setdefault("parameters", {}).update(params)
                s["parameters"]["localExecMaxRecords"] = 0  # force distributed
        t0 = time.time()
        res = Project.from_config(spark, cfg).run()
        return res, round(time.time() - t0, 1)

    res, dt = _run_chain({"multisweepK": 8})
    pw = res["evaluate"]["pairwise"]
    out = {
        "er_rl10k_multisweep_f1": round(pw["f1"], 4),
        "er_rl10k_multisweep_ari": round(
            res["evaluate"]["cluster"]["adjusted_rand_index"], 4
        ),
        "er_rl10k_multisweep_chain": "1000it-k8-distributed-2part",
        "er_rl10k_multisweep_run_sec": dt,
    }
    print(
        f"# er_rl10k multisweep k=8 quality: F1 "
        f"{out['er_rl10k_multisweep_f1']:.3f} ARI "
        f"{out['er_rl10k_multisweep_ari']:.3f} "
        f"({out['er_rl10k_multisweep_run_sec']}s end-to-end)",
        file=sys.stderr,
    )
    res, dt = _run_chain({"multisweepBurninK": 8, "multisweepK": 1})
    pw = res["evaluate"]["pairwise"]
    out.update(
        {
            "er_rl10k_burninfused_f1": round(pw["f1"], 4),
            "er_rl10k_burninfused_ari": round(
                res["evaluate"]["cluster"]["adjusted_rand_index"], 4
            ),
            "er_rl10k_burninfused_chain": (
                "1000it-burnink8-keptk1-distributed-2part"
            ),
            "er_rl10k_burninfused_run_sec": dt,
        }
    )
    print(
        f"# er_rl10k burn-in-fused (k=8 burnin, k=1 kept) quality: F1 "
        f"{out['er_rl10k_burninfused_f1']:.3f} ARI "
        f"{out['er_rl10k_burninfused_ari']:.3f} "
        f"({out['er_rl10k_burninfused_run_sec']}s end-to-end)",
        file=sys.stderr,
    )
    return out


def mcmc_iters_per_sec(spark, n_records: int = 300, n_iters: int = 200):
    """ER-engine throughput probe (BASELINE.md planned metric): PCG-I
    transitions/sec on an RLdata-shaped synthetic, single partition.
    No in-repo reference number exists (the reference publishes none), so
    this is regression-tracked round over round.

    Window: 200 fused iterations (>=1s — the r6 methodology; the old
    10-iteration ~30ms window made r5's "regression" out of scheduler
    jitter). r7: median of 3 windows + spread instead of best-of-2.
    Returns (median_rate, spread, window_rates)."""
    from dblink_spark.er.partition import SinglePartition
    from dblink_spark.er.state import init_state, transition, transition_fused

    records, attrs, cache = _make_er_problem(spark, n_records, seed=7)
    state = init_state(spark, records, cache, SinglePartition(), 1, seed=123)
    state = transition(state, "PCG-I")  # warm (codegen + arrow setup)
    reps = n_iters // 10 or 1
    box = [state]

    def _window() -> float:
        t0 = time.time()
        for _ in range(reps):
            box[0] = transition_fused(box[0], "PCG-I", 10)
        return (10 * reps) / (time.time() - t0)

    # discard one extra warmup window: the first fused sweep still pays
    # Arrow/codegen setup (the old best-of-2 existed for the same reason)
    _window()
    # r14 (VERDICT r13 nit 2, adjudicated by tools/confirm_fused_decay.py):
    # the in-artifact monotone window decay ([156.6, 128.3, 98.7] it/s in
    # r13) was the chain's fresh->equilibrium TRANSIENT, not accumulation —
    # isolated probes show RSS flat (+0.4 MB over 28 windows), canary
    # flat, rates RECOVERING after dips, and a fresh chain sweeping
    # ~30-50% faster than a mixed one (a mixed chain's candidate sets are
    # genuinely bigger). Pre-advancing ~600 sweeps parks the chain at
    # equilibrium so all three measured windows sample the same regime
    # (isolated: [110, 102, 113, 107, 100, 94] post-advance, no trend).
    for _ in range(600 // (10 * reps) or 1):
        _window()
    med, spread, rates = _median_windows(_window)
    iters = 10 * reps
    print(
        f"# er_mcmc: {iters}-iter fused windows on {n_records} recs: "
        f"median {med:.1f} it/s ({spread})", file=sys.stderr,
    )
    # exposed so main() can record the ACTUAL window in the payload —
    # bench_diff only compares rates measured under the same window
    mcmc_iters_per_sec.last_window_iters = iters
    return med, spread, rates


if __name__ == "__main__":
    main()
