"""Composite inventory checksum — puts the rotated (beyond-window) queries
back under the driver's independent gate with ONE registry slot.

The driver's correctness gate records only the first 50 ``queries()``
entries, so SQL-expressible TPC-H/events shapes rotate into a tail that is
hash-verified per round only by the repo's own tools (tools/driver_sim.py,
tools/oracle_check.py). The checksum slots (``q_inventory_checksum_a`` /
``_b``) close that externality
(VERDICT r6 task 4): each emits one row per rotated query —
``(query, n_rows, digest)`` where ``digest`` is the md5 of the sorted
canonical row strings of that query's FULL result (0x1f/0x1e-separated) —
and the oracle recomputes the same digest in DuckDB over the same
query SQL. A value change anywhere in any rotated query flips its digest
on whichever engine diverged, and the driver's hash gate catches it.

Reference analogue: every reference step is driven by one config entry
(ref: ProjectSteps.scala:34-36) — one registered entry here likewise
drives the whole rotated set.

Canonical serialization (must be bit-identical across engines):
- strings / ints: CAST AS VARCHAR (integer-to-string agrees everywhere);
- doubles: CAST(floor(x * 1e6) AS BIGINT) — multiply and floor are single
  correctly-rounded IEEE ops on the already bit-identical doubles, and the
  integral result casts identically (Spark truncates, DuckDB rounds —
  identical on integral input). The 1e6 scale keeps |x*1e6| far below
  2^63 for every value these queries can produce at gate scale (largest:
  sf0.1 revenue sums ~1e10 -> 1e16);
- timestamps (NTZ): an explicit second-precision format string
  (date_format / strftime) — these columns carry date-precision values;
- NULLs: a '<NULL>' sentinel after canonicalization;
- columns are ordered BY NAME in both engines, rows sorted as raw UTF-8
  byte strings (Spark sort_array and DuckDB VARCHAR ORDER BY both compare
  binary), then joined with the ASCII separator control characters —
  0x1f between columns, 0x1e between rows (ADVICE r7: using '|' for both
  roles made the serialization ambiguous for '|'-bearing strings; no
  covered column can contain 0x1f/0x1e, they never appear in the
  fixtures' text domains) — and md5'd. Empty results digest md5('') via
  COALESCE on the DuckDB side (string_agg over zero rows is NULL there).

This is a GATE query: it runs every rotated query at sf0.01 and funnels
each result through one collect_list per query — fine at gate scale by
construction, NOT a 100-TB path (the rotated queries themselves are the
scale paths; their plans are pinned by tests/test_plan_audit.py).

r14: the digest is SHARDED into two registry slots — the single slot had
grown to ~35s of driver-window time at ~0.45-0.5s per rotated entry,
against the documented shard-at-60s rule.

r15 (VERDICT r14 task 3 + ADVICE): the r14 registration-order split was
lopsided (23.4s vs 7.9s at sf0.1 — per-entry cost varies 15x, 0.2s to
5.1s), so the split is now by MEASURED per-entry cost (``_SHARD_WEIGHTS``,
frozen from an isolated sf0.1 sweep this round; LPT-greedy assignment,
deterministic) — each slot carries ~half the observed cost and stays well
under the 60s rule as the tail grows. Because that changes each slot's
MEMBERSHIP (and therefore its digest) the slots are versioned: shard A is
registered as ``q_inventory_checksum_a`` (the r7-r14 name
``q_inventory_checksum`` is retired — ADVICE r14: old-vs-new artifacts
must not diff as same-methodology), and BOTH slots now carry an in-band
``_shard_spec:<slot>`` marker row (member count + md5 of the
comma-joined sorted member names, computed independently by both
engines) so any future membership change flips the driver's hash gate
visibly instead of silently re-labeling a different digest.
"""

from __future__ import annotations

import statistics
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dblink_spark.queries import REGISTRY, register

# (column -> kind) per covered query, frozen from the oracle result schema
# (DuckDB DESCRIBE at generation time). Kinds: s=string, i=integer,
# f=double, t=timestamp, b=boolean (both engines render 'true'/'false'
# under a VARCHAR cast). The Spark side asserts its runtime schema against
# this map, so silent drift fails loudly instead of hashing garbage.
CHECKSUM_KINDS: dict[str, list[tuple[str, str]]] = {
    "q4_order_priority": [("orderpriority", "s"), ("order_count", "i")],
    "q13_customer_distribution": [("c_count", "i"), ("custdist", "i")],
    "q14_promo_revenue": [
        ("promo_rev", "f"), ("total_rev", "f"), ("promo_revenue", "f"),
    ],
    "q16_idle_parts": [("brand", "s"), ("idle_parts", "i")],
    "q19_brand_band_revenue": [("revenue", "f")],
    "q_events_type_pivot": [
        ("user_id", "i"), ("click", "i"), ("error", "i"),
        ("purchase", "i"), ("signup", "i"), ("view", "i"),
    ],
    "q_customer_setops": [("cohort", "s"), ("n", "i")],
    "q_events_error_click_band": [
        ("l_event_id", "i"), ("l_user_id", "i"), ("l_ts_us", "i"),
        ("r_event_id", "i"), ("r_ts_us", "i"),
    ],
    "q_events_type_stats_salted": [
        ("event_type", "s"), ("n_events", "i"), ("total_value", "f"),
        ("first_us", "i"), ("last_us", "i"),
    ],
    "q_events_bucket_rollup": [
        ("hour_bucket", "i"), ("event_type", "s"), ("n_events", "i"),
        ("n_users", "i"), ("total_value", "f"),
    ],
    "q_events_value_quantiles": [
        ("event_type", "s"), ("n", "i"), ("p50", "f"), ("p90", "f"),
        ("p99", "f"),
    ],
    "q5_local_supplier_volume": [("nation", "s"), ("revenue", "f")],
    "q18_large_orders": [
        ("name", "s"), ("orderkey", "i"), ("orderdate", "t"),
        ("totalprice", "f"), ("total_qty", "f"),
    ],
    "q3_shipping_priority": [
        ("orderkey", "i"), ("revenue", "f"), ("orderdate", "t"),
    ],
    "q1_pricing_summary": [
        ("l_returnflag", "s"), ("l_linestatus", "s"), ("sum_qty", "f"),
        ("sum_base_price", "f"), ("sum_disc_price", "f"),
        ("sum_charge", "f"), ("avg_qty", "f"), ("avg_price", "f"),
        ("avg_disc", "f"), ("count_order", "i"),
    ],
    "q6_forecast_revenue": [("revenue", "f")],
    "q_top_customers": [
        ("name", "s"), ("mktsegment", "s"), ("total_spend", "f"),
        ("n_orders", "i"), ("rank", "i"),
    ],
    "q_orders_rollup": [
        ("o_orderstatus", "s"), ("o_orderpriority", "s"),
        ("n_orders", "i"), ("total_price", "f"),
    ],
    "q_events_sessionize": [
        ("user_id", "i"), ("session_id", "i"), ("n_events", "i"),
        ("duration_us", "i"),
    ],
    "q_events_asof_attribution": [
        ("event_id", "i"), ("user_id", "i"), ("ts_us", "i"),
        ("value_asof", "f"), ("ts_us_asof", "i"),
    ],
    "vector_norms_by_label": [
        ("label", "i"), ("n_vectors", "i"), ("total_sq_norm", "i"),
    ],
    "ann_ivf_untrained_baseline": [
        ("query_id", "i"), ("neighbor_id", "i"), ("cosine", "f"),
        ("rank", "i"),
    ],
    "sketch_count_min": [
        ("row_idx", "i"), ("col_idx", "i"), ("cnt", "i"),
    ],
    "q_events_json_props": [
        ("event_type", "s"), ("n", "i"), ("sum_k", "i"), ("min_k", "i"),
        ("max_k", "i"), ("n_missing", "i"),
    ],
    "multimodal_resize_stats": [
        ("media_type", "s"), ("n_items", "i"), ("total_pixel_sum", "i"),
    ],
    "text_chunk_windows": [
        ("doc_id", "i"), ("chunk_idx", "i"), ("chunk_text", "s"),
        ("n_tokens", "i"),
    ],
    "q_docs_sample_split": [
        ("doc_id", "i"), ("source", "s"), ("sample_key", "s"),
        ("split", "s"),
    ],
    "text_decontaminate": [
        ("doc_id", "i"), ("n_tainted", "i"), ("contaminated", "b"),
    ],
    "hybrid_search": [
        ("query_id", "i"), ("doc_id", "i"), ("lang", "s"),
        ("cosine", "f"), ("rank", "i"),
    ],
    "dedup_exact": [
        ("text_hash", "s"), ("n_docs", "i"), ("keep_doc", "i"),
        ("max_doc", "i"),
    ],
    "text_token_count": [
        ("lang", "s"), ("source", "s"), ("n_docs", "i"),
        ("total_tokens", "i"), ("total_chars", "i"), ("avg_tokens", "f"),
    ],
    "text_fingerprint": [
        ("prefix_fp", "s"), ("n_docs", "i"), ("keep_doc", "i"),
    ],
    "multimodal_bytes_stats": [
        ("media_type", "s"), ("n_items", "i"), ("total_bytes", "i"),
        ("max_bytes", "i"),
    ],
    "text_lang_id": [
        ("lang", "s"), ("pred_lang", "s"), ("n_docs", "i"),
    ],
    "most_common_priority": [
        ("custkey", "i"), ("priority", "s"), ("n", "i"),
    ],
    "iteration_filter": [
        ("event_type", "s"), ("n_events", "i"), ("n_users", "i"),
    ],
    "pairwise_links": [
        ("rec1", "i"), ("rec2", "i"), ("nationkey", "i"),
    ],
    "multimodal_frame_index": [
        ("doc_id", "i"), ("n_frames", "i"), ("total_frame_bytes", "i"),
    ],
    "q_events_user_distinct_approx": [
        ("event_type", "s"), ("n_exact", "i"), ("approx_ok", "b"),
    ],
    "pair_canonicalize": [("rec1", "i"), ("rec2", "i")],
    "dict_encode": [("value", "s"), ("value_id", "i"), ("prob", "f")],
    "cluster_size_distribution": [
        ("cluster_size", "i"), ("n_clusters", "i"),
    ],
    "membership_to_clusters": [
        ("ent_id", "i"), ("cluster_hash", "s"), ("cluster_size", "i"),
    ],
    "text_pack_shard_totals": [
        ("shard", "i"), ("n_chunks", "i"), ("total_tokens", "i"),
        ("bins_ok", "b"), ("fill_ok", "b"), ("fill_consistent", "b"),
    ],
    "ann_lsh_recall": [
        ("n_queries", "i"), ("n_returned_total", "i"),
        ("recall_ok", "b"), ("buckets_ok", "b"),
    ],
    "multimodal_decode_stats": [
        ("media_type", "s"), ("n_items", "i"), ("total_samples", "i"),
        ("total_byte_sum", "i"),
    ],
    "multimodal_feature_extract": [
        ("media_type", "s"), ("pos", "i"), ("n_items", "i"),
        ("sum_scaled", "i"), ("mean_weight", "f"),
    ],
    "ann_lsh_bucketed": [
        ("bucket", "i"), ("n_pairs", "i"), ("total_dot", "i"),
    ],
    "dedup_bottomk_jaccard": [
        ("doc1", "i"), ("doc2", "i"), ("sketch_jaccard", "f"),
    ],
    "text_repetition": [
        ("doc_id", "i"), ("n_words", "i"), ("distinct_word_ratio", "f"),
        ("top_bigram_count", "i"), ("top_bigram_ratio", "f"),
        ("repetitive", "b"),
    ],
    "ann_topk_cosine": [
        ("query_id", "i"), ("neighbor_id", "i"), ("label", "i"),
        ("cosine", "f"), ("rank", "i"),
    ],
    "dedup_simhash": [
        ("doc_id", "i"), ("n_near_dups", "i"), ("min_partner", "i"),
    ],
    "text_token_count_bpe": [
        ("lang", "s"), ("source", "s"), ("n_docs", "i"),
        ("total_bpe_tokens", "i"), ("total_ws_tokens", "i"),
        ("bpe_per_ws_token", "f"),
    ],
    "text_gopher_rules": [
        ("doc_id", "i"), ("lang", "s"), ("source", "s"), ("n_words", "i"),
        ("mean_word_len", "f"), ("stop_hits", "i"), ("symbol_ratio", "f"),
        ("gopher_pass", "b"),
    ],
    "vector_random_projection": [
        ("vec_id", "i"), ("label", "i"), ("d0", "i"), ("d1", "i"),
        ("d2", "i"), ("d3", "i"), ("d4", "i"), ("d5", "i"), ("d6", "i"),
        ("d7", "i"),
    ],
    "text_boilerplate_grams": [
        ("doc_id", "i"), ("n_grams", "i"), ("n_boiler", "i"),
        ("boiler_frac", "f"),
    ],
    "q_events_value_quantiles_approx": [
        ("event_type", "s"), ("n", "i"), ("p50_ok", "b"), ("p90_ok", "b"),
        ("p99_ok", "b"),
    ],
    "dedup_embedding_cosine_scaled": [
        ("v1", "i"), ("v2", "i"), ("cosine", "f"),
    ],
    "q_docs_lang_rebalance": [
        ("doc_id", "i"), ("lang", "s"), ("sample_key", "s"),
    ],
    "text_pack_sequences": [
        ("shard", "i"), ("bin_idx", "i"), ("chunk_key", "s"),
        ("n_tokens", "i"), ("bin_fill", "i"),
    ],
    "distinct_counts": [
        ("n_customers", "i"), ("n_statuses", "i"), ("n_priorities", "i"),
        ("n_orders", "i"),
    ],
    "dataset_stats": [
        ("file_id", "s"), ("n_records", "i"), ("n_langs", "i"),
        ("missing_text", "i"), ("total_chars", "i"), ("min_id", "i"),
        ("max_id", "i"),
    ],
    "near_match_blocking": [("block_key", "s"), ("n_members", "i")],
    "adjusted_rand_index": [("ari", "f")],
    "text_vocab_topk": [
        ("lang", "s"), ("rnk", "i"), ("token", "s"), ("doc_freq", "i"),
    ],
    "dedup_components": [("doc_id", "i"), ("component", "i")],
    "dedup_survivors": [
        ("component", "i"), ("n_members", "i"), ("survivor", "i"),
        ("max_len", "i"),
    ],
    "text_pii_redact": [
        ("doc_id", "i"), ("lang", "s"), ("n_emails", "i"),
        ("n_phones", "i"), ("n_ipv4", "i"), ("n_longnums", "i"),
        ("redacted_fp", "s"), ("chars_delta", "i"),
    ],
    # r12 rotations: the six mature r11 TPC-H shapes (the new
    # Q2/Q8/Q9/Q11/Q12/Q20 family takes their head slots)
    "q7_nation_volume": [
        ("supp_nation", "s"), ("cust_nation", "s"), ("l_year", "i"),
        ("revenue", "f"),
    ],
    "q15_top_supplier": [
        ("suppkey", "i"), ("name", "s"), ("total_revenue", "f"),
    ],
    "q17_small_quantity_revenue": [
        ("avg_yearly", "f"), ("n_lines", "i"),
    ],
    "q21_blamed_supplier": [("name", "s"), ("numwait", "i")],
    "q22_dormant_accounts": [
        ("nationkey", "i"), ("numcust", "i"), ("totacctbal", "f"),
    ],
    "q_orders_moving_revenue": [
        ("orderkey", "i"), ("custkey", "i"), ("day_idx", "i"),
        ("trailing_30d", "f"),
    ],
    "q10_returned_items": [
        ("custkey", "i"), ("name", "s"), ("nation", "s"),
        ("revenue", "f"), ("acctbal", "f"),
    ],
    "q_events_gap_fill": [
        ("event_type", "s"), ("hr", "i"), ("n_events", "i"),
        ("total_value", "f"),
    ],
    "q_docs_snapshot_diff": [
        ("doc_id", "i"), ("status", "s"), ("old_fp", "s"),
        ("new_fp", "s"),
    ],
    "q_docs_training_order": [
        ("shard_id", "i"), ("pos", "i"), ("doc_id", "i"),
        ("ord_key", "s"),
    ],
    "text_strip_boilerplate": [
        ("doc_id", "i"), ("n_tokens", "i"), ("n_kept", "i"),
        ("n_removed", "i"), ("clean_text", "s"),
    ],
    # r14: q_events_retention rotates to the tail (its head slot funds the
    # checksum's second shard) — benched every round since r11, plan-pinned
    # (tests/test_plan_audit.py), cohort edge cases covered
    # (tests/test_query_edge_corpora.py).
    "q_events_retention": [
        ("cohort_day", "i"), ("offset_day", "i"), ("n_users", "i"),
        ("retention_milli", "i"),
    ],
    # r14: text_strip_maximal_spans rotates to the tail (its head slot
    # funds text_strip_ladder_spans) — same conserved-count schema as the
    # whole surgeon family.
    "text_strip_maximal_spans": [
        ("doc_id", "i"), ("n_tokens", "i"), ("n_kept", "i"),
        ("n_removed", "i"), ("clean_text", "s"),
    ],
    # r15: text_strip_gapped_spans rotates to the tail (its head slot
    # funds text_strip_template_spans) — same conserved-count schema.
    "text_strip_gapped_spans": [
        ("doc_id", "i"), ("n_tokens", "i"), ("n_kept", "i"),
        ("n_removed", "i"), ("clean_text", "s"),
    ],
    # r16: q_docs_top_quality_per_lang rotates to the tail (its head slot
    # funds dedup_neardup_handoff) — benched since r6, plan-pinned,
    # edge-covered; the window-rank selection shape stays head-gated via
    # q_docs_source_cap / q_docs_quality_weighted_sample.
    "q_docs_top_quality_per_lang": [
        ("lang", "s"), ("rnk", "i"), ("doc_id", "i"),
        ("quality_score", "f"), ("n_tokens", "i"),
    ],
}

_NULL = "<NULL>"
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

_SPARK_KIND = {
    "string": "s",
    "int": "i", "bigint": "i", "smallint": "i", "tinyint": "i",
    "double": "f", "float": "f",
    "timestamp": "t", "timestamp_ntz": "t",
    "boolean": "b",
}


def _canon_spark(col: str, kind: str):
    c = F.col(col)
    if kind == "f":
        e = F.floor(c * F.lit(1000000.0)).cast("bigint").cast("string")
    elif kind == "t":
        e = F.date_format(c, _TS_FMT_SPARK)
    else:
        e = c.cast("string")
    return F.coalesce(e, F.lit(_NULL))


def _canon_duck(col: str, kind: str) -> str:
    if kind == "f":
        e = f"CAST(CAST(floor({col} * 1000000.0) AS BIGINT) AS VARCHAR)"
    elif kind == "t":
        e = f"strftime({col}, '{_TS_FMT_DUCK}')"
    else:
        e = f"CAST({col} AS VARCHAR)"
    return f"COALESCE({e}, '{_NULL}')"


def _digest_sql(name: str) -> str:
    inner = REGISTRY[name].oracle
    cols = sorted(CHECKSUM_KINDS[name])
    row = " || chr(31) || ".join(_canon_duck(c, k) for c, k in cols)
    return (
        f"SELECT '{name}' AS query, CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
        f"  md5(COALESCE(string_agg(r, chr(30) ORDER BY r), '')) AS digest\n"
        f"FROM (SELECT {row} AS r FROM (\n{inner}\n) _q) _rows"
    )


#: Measured per-entry cost of one checksum digest at sf0.1 (milliseconds,
#: isolated best-of-2 sweep, r15 — the balancing signal for the shard
#: split; VERDICT r14 task 3: the registration-order split was 23.4s vs
#: 7.9s because per-entry cost spans 0.2-5.1s). These are a RELATIVE cost
#: proxy (host absolutes drift): re-measure with
#: tools/measure_checksum_weights-style sweeps when the tail grows enough
#: to matter; unmeasured names (future rotations) default to the median.
_SHARD_WEIGHTS: dict[str, int] = {
    "adjusted_rand_index": 1369,
    "ann_ivf_untrained_baseline": 1755,
    "ann_lsh_bucketed": 632,
    "ann_lsh_recall": 2270,
    "ann_topk_cosine": 725,
    "cluster_size_distribution": 305,
    "dataset_stats": 336,
    "dedup_bottomk_jaccard": 2720,
    "dedup_components": 5118,
    "dedup_embedding_cosine_scaled": 2711,
    "dedup_exact": 251,
    "dedup_simhash": 1620,
    "dedup_survivors": 4437,
    "dict_encode": 253,
    "distinct_counts": 504,
    "hybrid_search": 790,
    "iteration_filter": 342,
    "membership_to_clusters": 250,
    "most_common_priority": 551,
    "multimodal_bytes_stats": 314,
    "multimodal_decode_stats": 513,
    "multimodal_feature_extract": 700,
    "multimodal_frame_index": 539,
    "multimodal_resize_stats": 490,
    "near_match_blocking": 282,
    "pair_canonicalize": 1080,
    "pairwise_links": 313,
    "q10_returned_items": 806,
    "q13_customer_distribution": 500,
    "q14_promo_revenue": 504,
    "q15_top_supplier": 666,
    "q16_idle_parts": 397,
    "q17_small_quantity_revenue": 704,
    "q18_large_orders": 995,
    "q19_brand_band_revenue": 598,
    "q1_pricing_summary": 1049,
    "q21_blamed_supplier": 904,
    "q22_dormant_accounts": 348,
    "q3_shipping_priority": 978,
    "q4_order_priority": 397,
    "q5_local_supplier_volume": 902,
    "q6_forecast_revenue": 244,
    "q7_nation_volume": 819,
    "q_customer_setops": 388,
    "q_docs_lang_rebalance": 417,
    "q_docs_sample_split": 258,
    "q_docs_snapshot_diff": 395,
    "q_docs_training_order": 275,
    "q_events_asof_attribution": 520,
    "q_events_bucket_rollup": 485,
    "q_events_error_click_band": 393,
    "q_events_gap_fill": 516,
    "q_events_json_props": 465,
    "q_events_retention": 380,
    "q_events_sessionize": 523,
    "q_events_type_pivot": 280,
    "q_events_type_stats_salted": 369,
    "q_events_user_distinct_approx": 699,
    "q_events_value_quantiles": 449,
    "q_events_value_quantiles_approx": 435,
    "q_orders_moving_revenue": 526,
    "q_orders_rollup": 424,
    "q_top_customers": 455,
    "sketch_count_min": 251,
    "text_boilerplate_grams": 2307,
    "text_chunk_windows": 272,
    "text_decontaminate": 1884,
    "text_fingerprint": 231,
    "text_gopher_rules": 477,
    "text_lang_id": 322,
    "text_pack_sequences": 370,
    "text_pack_shard_totals": 576,
    "text_pii_redact": 685,
    "text_repetition": 849,
    "text_strip_boilerplate": 2614,
    # r15 rotation: measured same-methodology after the initial sweep
    # (single-entry frame, best of 2, isolated sf0.1)
    "text_strip_gapped_spans": 4350,
    "text_strip_maximal_spans": 3222,
    # r16 rotation: measured same-methodology (single-entry frame, best
    # of 2, isolated sf0.1)
    "q_docs_top_quality_per_lang": 1005,
    "text_token_count": 225,
    "text_token_count_bpe": 263,
    "text_vocab_topk": 339,
    "vector_norms_by_label": 201,
    "vector_random_projection": 627,
}


def _shard_names(shard: int) -> list[str]:
    """Deterministic 2-way split of the rotated set BY MEASURED COST
    (r15, VERDICT r14 task 3): LPT-greedy — walk entries heaviest-first
    (name-tiebroken), assign each to the lighter shard. Input is the
    frozen weight map, so the split is stable across sessions; a name
    missing from the map (a future rotation not yet re-measured) gets
    the median weight."""
    names = sorted(CHECKSUM_KINDS)
    default = statistics.median(_SHARD_WEIGHTS.values())
    w = {n: _SHARD_WEIGHTS.get(n, default) for n in names}
    shards: tuple[list[str], list[str]] = ([], [])
    totals = [0.0, 0.0]
    for n in sorted(names, key=lambda n: (-w[n], n)):
        i = 0 if totals[0] <= totals[1] else 1
        shards[i].append(n)
        totals[i] += w[n]
    return sorted(shards[shard])


_SHARD_LABELS = ("a", "b")


def _shard_spec(shard: int) -> tuple[str, int, str]:
    """The in-band methodology marker (r14 ADVICE): (marker-query-name,
    member count, comma-joined sorted member names). Both engines md5 the
    same spec string independently; a membership change flips the digest
    on the driver's hash gate instead of silently re-labeling the slot."""
    names = _shard_names(shard)
    return f"_shard_spec:{_SHARD_LABELS[shard]}", len(names), ",".join(names)


def _checksum_oracle(shard: int) -> str:
    marker, n, spec = _shard_spec(shard)
    marker_sql = (
        f"SELECT '{marker}' AS query, CAST({n} AS BIGINT) AS n_rows,\n"
        f"  md5('{spec}') AS digest"
    )
    return "\nUNION ALL\n".join(
        [marker_sql] + [_digest_sql(n) for n in _shard_names(shard)]
    )


def _checksum_frames(
    spark: SparkSession, sf_dir: str, shard: int
) -> DataFrame:
    names = _shard_names(shard)
    marker, n_members, spec = _shard_spec(shard)
    frames = [
        spark.range(1).select(
            F.lit(marker).alias("query"),
            F.lit(n_members).cast("long").alias("n_rows"),
            F.md5(F.lit(spec)).alias("digest"),
        )
    ]
    for name in names:
        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        kinds = dict(CHECKSUM_KINDS[name])
        actual = {
            f.name: _SPARK_KIND.get(f.dataType.simpleString(), "?")
            for f in df.schema.fields
        }
        if actual != kinds:
            raise AssertionError(
                f"{name}: result schema drifted from CHECKSUM_KINDS — "
                f"got {actual}, frozen {kinds}; regenerate the map"
            )
        row = F.concat_ws(
            "\x1f", *[_canon_spark(c, k) for c, k in sorted(kinds.items())]
        )
        frames.append(
            df.select(row.alias("r"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.md5(
                    F.array_join(F.sort_array(F.collect_list("r")), "\x1e")
                ).alias("digest"),
            )
            .select(F.lit(name).alias("query"), "n_rows", "digest")
        )
    return reduce(DataFrame.unionAll, frames)


@register(
    "q_inventory_checksum_a",
    oracle=_checksum_oracle(0),
    survey_ref=(
        "gate infrastructure: composite digest, shard A (cost-balanced LPT "
        "half of the rotated set + _shard_spec marker row; driver 50-entry "
        "window workaround; ref analogue ProjectSteps.scala:34-36 — one "
        "config entry drives each step). r15 rename of q_inventory_checksum "
        "(r14 ADVICE: the membership changed, so the slot name versions)"
    ),
)
def q_inventory_checksum_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (query, n_rows, digest) row per rotated registry entry in shard
    A, plus the ``_shard_spec:a`` membership marker row — see the module
    docstring for the canonical-serialization contract; shard B lives in
    ``q_inventory_checksum_b``."""
    return _checksum_frames(spark, sf_dir, 0)


@register(
    "q_inventory_checksum_b",
    oracle=_checksum_oracle(1),
    survey_ref=(
        "gate infrastructure: composite digest, shard B (cost-balanced LPT "
        "half of the rotated set + _shard_spec marker row — r14 split of "
        "the single slot per the shard-at-60s rule; r15 rebalanced by "
        "measured per-entry cost)"
    ),
)
def q_inventory_checksum_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard B of the rotated-set digest (see ``q_inventory_checksum_a``)."""
    return _checksum_frames(spark, sf_dir, 1)
