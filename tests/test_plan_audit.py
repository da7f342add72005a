"""Plan-shape regression tests: the properties that make queries survive a
100× scale-up, asserted against explain("formatted") via
dblink_spark.plans.audit. These fail if a refactor silently loses filter
pushdown, column pruning, a broadcast, or reintroduces a recompute storm."""

from __future__ import annotations

import pytest

from dblink_spark import queries as q
from dblink_spark.plans.audit import (
    audit_plan,
    broadcast_hinted_relations,
    formatted_plan,
    scan_infos,
)

SF_DIR = "/root/testdata/sf0.001"


def _audit(spark, name):
    return audit_plan(q.REGISTRY[name].fn(spark, SF_DIR))


class TestPushdownAndPruning:
    def test_q6_filters_reach_parquet_scan(self, spark):
        df = q.REGISTRY["q6_forecast_revenue"].fn(spark, SF_DIR)
        scans = scan_infos(formatted_plan(df))
        assert len(scans) == 1
        assert scans[0].pushed_filters, "q6 predicates must push into the scan"
        # only the 4 referenced lineitem columns read, out of 16
        assert len(scans[0].read_columns) <= 4

    def test_q1_column_pruning(self, spark):
        df = q.REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
        scans = scan_infos(formatted_plan(df))
        assert all(len(s.read_columns) <= 7 for s in scans)

    def test_iteration_filter_pushdown(self, spark):
        a = _audit(spark, "iteration_filter")
        assert a.scans_with_pushdown >= 1


class TestBroadcastStrategy:
    def test_q5_dimensions_broadcast(self, spark):
        """region/nation/supplier sides must broadcast — a shuffle join of
        lineitem against a 5-row region would be absurd at scale."""
        a = _audit(spark, "q5_local_supplier_volume")
        assert a.broadcast_joins >= 3
        assert a.sortmerge_joins == 0

    def test_q3_dimensions_broadcast(self, spark):
        a = _audit(spark, "q3_shipping_priority")
        assert a.broadcast_joins >= 2

    def test_ann_query_vectors_broadcast(self, spark):
        a = _audit(spark, "ann_topk_cosine")
        assert a.broadcast_joins >= 1


class TestBroadcastHintDiscipline:
    """A forced F.broadcast() on a relation that grows with the data is an
    OOM at 100 TB, not a slow plan. Explicit hints are allowed ONLY on
    fixed-cardinality frames: the nation (25-row) / region (5-row) dims and
    LIMIT-bounded frames (top-k query vectors). Everything that scales with
    SF must be left to AQE's runtime stats. Asserted on the analyzed
    LOGICAL plan — at small SF AQE legitimately broadcasts scaling tables
    from size stats; the anti-pattern is the *hint*, not the choice."""

    FIXED_CARDINALITY_COLS = {"n_nationkey", "r_regionkey"}

    def test_no_sf_scaling_relation_is_broadcast_hinted(self, spark):
        offenders = {}
        for name, entry in q.REGISTRY.items():
            df = entry.fn(spark, SF_DIR)
            bad = [
                col
                for col, has_limit in broadcast_hinted_relations(df)
                if col not in self.FIXED_CARDINALITY_COLS and not has_limit
            ]
            if bad:
                offenders[name] = bad
            # caller-owns-cache contract: un-released persists registered
            # here would leak into every LATER plan test via CacheManager
            # subtree substitution (observed r13: the confirmed-spans
            # cover persist changed the maximal/gapped scan counts)
            q.release_caches(df)
        assert not offenders, f"broadcast hints on SF-scaling relations: {offenders}"


class TestShuffleBudget:
    def test_dedup_exact_single_shuffle(self, spark):
        a = _audit(spark, "dedup_exact")
        assert a.exchanges == 1  # one groupBy, nothing else

    def test_minhash_lsh_no_recompute_storm(self, spark):
        """The signature table feeds 5 consumers; with persist + single
        band join the plan must stay small (regression: 21 scans / 26
        exchanges before the rewrite). r10: the hot-bucket cap's tagged
        band relation is persisted too — its three consumers (both
        self-join sides + the hot arm) read the cache, so the occupancy
        window costs ONE bands shuffle, and the self-join reuses the
        cache's band_key partitioning (measured: 6 exchanges, down from 8
        pre-cap)."""
        a = _audit(spark, "dedup_minhash_lsh")
        assert a.n_scans <= 3
        assert a.exchanges <= 7
        assert a.python_ops == 0  # tokenize/hash/verify all JVM-side

    def test_simhash_pair_join_keyed_on_band(self, spark):
        """The simhash candidate join must be keyed on the exploded
        (band_idx, band_bits) — the lang-only blocking it replaces was
        all-pairs within each language (N²/|langs| at scale)."""
        df = q.REGISTRY["dedup_simhash"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "band_bits" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_boilerplate_grams_plan(self, spark):
        """The gram pass must run once (persisted exploded table feeds the
        boiler set, totals and hits), stay JVM-side, and read only the two
        referenced document columns."""
        df = q.REGISTRY["text_boilerplate_grams"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.python_ops == 0
        assert a.n_scans <= 2  # doc_id anchor + the persisted gram source
        scans = scan_infos(formatted_plan(df))
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        ), "gram build must not read lang/source/n_chars"
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_ann_lsh_recall_candidates_are_equi_join(self, spark):
        """Candidates must form ONLY through the (band, key) hash equi-join
        — never an all-pairs scan of the corpus. Exactly two
        BroadcastNestedLoopJoin nodes are allowed (each prints twice in the
        formatted plan): the brute-recall arm's crossJoin whose build side
        is the LIMIT-bounded 8-row query set, and the 1x1 crossJoin
        stitching the two single-row agg arms."""
        df = q.REGISTRY["ann_lsh_recall"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= 4  # 2 nodes x 2 prints
        # the candidate join is keyed on (band, key)
        assert "band" in plan and "key" in plan
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
        a = audit_plan(df)
        assert a.python_ops == 0
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_q1_single_shuffle(self, spark):
        a = _audit(spark, "q1_pricing_summary")
        assert a.exchanges <= 1

    def test_ivf_trained_no_product_joins(self, spark):
        """Trained-IVF gate: cell assignment must stay a narrow literal
        expression and candidates must come from broadcast equi-joins —
        no nested-loop/cartesian anywhere, no Python ops (training is
        driver-side numpy, outside the plan)."""
        df = q.REGISTRY["ann_ivf_trained"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        a = audit_plan(df)
        assert a.python_ops == 0

    def test_pack_shard_totals_single_kernel_one_shuffle_path(self, spark):
        """Packing invariants: exactly ONE Python op (the FFD kernel) and
        the pre-kernel path is a zero-shuffle generator projection — the
        only wide ops are the shard groupBy plus the two invariant
        aggregations."""
        df = q.REGISTRY["text_pack_shard_totals"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.python_ops == 1
        assert a.exchanges <= 3

    def test_bpe_token_count_jvm_only_single_shuffle(self, spark):
        """BPE-ish counting must stay a codegen'd regexp expression (no
        UDF, no explode-materialized token arrays) with one agg shuffle."""
        a = _audit(spark, "text_token_count_bpe")
        assert a.python_ops == 0
        assert a.exchanges <= 1

    def test_embedding_dedup_keyed_on_lsh_band_not_ground_truth(self, spark):
        """The near-dup candidate join must be an equi-join on the exploded
        LSH (band_idx, band_key) — and the ground-truth `label` column must
        not appear anywhere in the plan (r02 blocked on it)."""
        df = q.REGISTRY["dedup_embedding_cosine_scaled"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "band_key" in plan
        assert "label" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestJoinShapes:
    def test_q4_semi_join_prunes_probe_columns(self, spark):
        """The semi join must read only l_orderkey+l_returnflag from
        lineitem — the EXISTS probe never needs the payload columns."""
        df = q.REGISTRY["q4_order_priority"].fn(spark, SF_DIR)
        scans = scan_infos(formatted_plan(df))
        li = [s for s in scans if "lineitem" in s.location]
        assert li and all(len(s.read_columns) <= 2 for s in li)

    def test_q16_anti_join_pushdown(self, spark):
        """The anti join's date filter must reach the lineitem scan: at
        scale the anti side is 1/72 of the table, not all of it."""
        df = q.REGISTRY["q16_idle_parts"].fn(spark, SF_DIR)
        scans = scan_infos(formatted_plan(df))
        li = [s for s in scans if "lineitem" in s.location]
        assert li and li[0].pushed_filters

    def test_q18_having_survivors_broadcast(self, spark):
        a = _audit(spark, "q18_large_orders")
        assert a.broadcast_joins >= 1
        assert a.python_ops == 0

    def test_band_join_single_shuffle_pair(self, spark):
        """band_join is one equi-join after bucket explode — no nested-loop
        (cartesian/broadcast-nested-loop) node may appear."""
        df = q.REGISTRY["q_events_error_click_band"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_asof_join_no_join_node(self, spark):
        """asof_join is union+window — it must plan with zero join
        operators (the whole point: one shuffle, no range join)."""
        df = q.REGISTRY["q_events_asof_attribution"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.broadcast_joins == 0
        assert a.sortmerge_joins == 0
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan


class TestPythonBoundary:
    def test_multimodal_kernels_are_arrow_batched(self, spark):
        """Multimodal decode runs as MapInPandas (Arrow), and only the
        kernel is Python — aggregation stays JVM-side."""
        a = _audit(spark, "multimodal_decode_stats")
        assert a.python_ops >= 1

    def test_sql_queries_have_no_python_ops(self, spark):
        for name in (
            "q1_pricing_summary",
            "q_events_sessionize",
            "dedup_simhash",
            "text_quality_score",
            "ann_topk_cosine",
        ):
            assert _audit(spark, name).python_ops == 0, name


class TestHintSubtreeAttribution:
    """Regression for the r3 ADVICE finding: a broadcast hint wrapping a
    multi-relation subtree must report ALL its relations, and a LIMIT in a
    sibling subtree must not be attributed to the hint."""

    def test_multi_relation_hint_and_sibling_limit(self, spark):
        import pyspark.sql.functions as F

        n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
        r = spark.read.parquet(f"{SF_DIR}/region.parquet")
        c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        hinted = F.broadcast(
            n.join(r, n["n_regionkey"] == r["r_regionkey"])
        )
        df = hinted.join(
            c.limit(3), hinted["n_nationkey"] == c["c_nationkey"]
        )
        rels = broadcast_hinted_relations(df)
        cols = sorted(col for col, _ in rels)
        # both relations under the hint are reported...
        assert cols == ["n_nationkey", "r_regionkey"]
        # ...the sibling (customer) is not, and its LIMIT is not
        # misattributed to the hint subtree
        assert all(not has_limit for _, has_limit in rels)

    def test_limit_inside_hint_subtree_detected(self, spark):
        import pyspark.sql.functions as F

        n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
        c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        df = F.broadcast(c.limit(8)).join(
            n, c["c_nationkey"] == n["n_nationkey"]
        )
        rels = broadcast_hinted_relations(df)
        assert rels == [("c_custkey", True)]


class TestR5QueryPlans:
    def test_sample_split_is_narrow(self, spark):
        """Deterministic sampling must be a single pruned scan: no shuffle,
        no Python, membership decided per-row (the whole point of hash
        thresholds at 100 TB)."""
        a = _audit(spark, "q_docs_sample_split")
        assert a.exchanges == 0
        assert a.python_ops == 0
        assert a.n_scans == 1

    def test_decontaminate_gram_generation_is_jvm_side(self, spark):
        """8-gram generation rides higher-order functions; the only joins
        are hash joins on the gram key (no cartesian fallback)."""
        from dblink_spark.plans.audit import formatted_plan
        import dblink_spark.queries as q

        df = q.REGISTRY["text_decontaminate"].fn(spark, SF_DIR)
        a = _audit(spark, "text_decontaminate")
        assert a.python_ops == 0
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestR6QueryPlans:
    def test_pii_redact_is_pure_map(self, spark):
        """The PII scrub must stay a single pruned scan + project: two JVM
        regexp passes, no shuffle, no Python — the 100-TB contract stated
        in its docstring."""
        a = _audit(spark, "text_pii_redact")
        assert a.exchanges == 0
        assert a.python_ops == 0
        assert a.n_scans == 1
        df = q.REGISTRY["text_pii_redact"].fn(spark, SF_DIR)
        scans = scan_infos(formatted_plan(df))
        # projection pushdown: only doc_id, lang, text read (not n_chars/source)
        assert all(len(s.read_columns) <= 3 for s in scans)

    def test_pipeline_corpus_prep_no_product_joins(self, spark):
        """The end-to-end composition must keep every join keyed (sketch
        prefix, component id, lang) — a cartesian fallback anywhere in the
        filter->dedup->survivor->yield chain would be a scale-killer. The
        closure runs at build time, so the audit covers the post-closure
        plan; pair generation itself is pinned by the dedup-family tests."""
        df = q.REGISTRY["pipeline_corpus_prep"].fn(spark, SF_DIR)
        try:
            plan = formatted_plan(df)
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
            a = audit_plan(df)
            assert a.python_ops == 0
        finally:
            q.release_caches(df)

    def test_top_quality_rank_limit_pushed_below_window(self, spark):
        """Per-group top-k must ride WindowGroupLimit: the rank<=k predicate
        prunes to k rows per group BEFORE the exchange (map side) and again
        after it — without this, the window sorts the whole corpus. Scan
        must read only the 3 referenced columns."""
        df = q.REGISTRY["q_docs_top_quality_per_lang"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert plan.count("WindowGroupLimit") >= 2  # map-side + final
        scans = scan_infos(plan)
        assert all(len(s.read_columns) <= 3 for s in scans)
        a = audit_plan(df)
        assert a.python_ops == 0

    def test_vocab_topk_rank_limit_pushed_below_window(self, spark):
        """Same WindowGroupLimit discipline for vocabulary induction: the
        rank<=20 predicate must prune per (lang) group before AND after the
        exchange, and the scan reads only (lang, text)."""
        df = q.REGISTRY["text_vocab_topk"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert plan.count("WindowGroupLimit") >= 2  # map-side + final
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"lang", "text"} for s in scans
        )
        a = audit_plan(df)
        assert a.python_ops == 0

    def test_random_projection_is_pure_narrow_map(self, spark):
        """The JL projection must be a single narrow pass: zero exchanges,
        zero Python operators, one scan reading only the three referenced
        columns — the sign matrix is plan-side literals, not data."""
        a = _audit(spark, "vector_random_projection")
        assert a.exchanges == 0
        assert a.python_ops == 0
        assert a.n_scans == 1
        df = q.REGISTRY["vector_random_projection"].fn(spark, SF_DIR)
        scans = scan_infos(formatted_plan(df))
        assert all(
            set(s.read_columns) <= {"vec_id", "label", "embedding"}
            for s in scans
        )

    def test_sketch_builds_are_row_local(self, spark):
        """The bottom-k/MinHash signature builds must stay row-local: at
        most ONE exchange (the small-input widening repartition), never the
        token-table explode->distinct->groupBy shuffles they replaced."""
        from dblink_spark.plans.audit import audit_plan, exchange_count
        from dblink_spark.queries.dedup import bottomk_sketches

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = audit_plan(bottomk_sketches(d))
        assert a.exchanges <= 1
        assert a.python_ops == 0


class TestR9QueryPlans:
    def test_incremental_dedup_reads_index_not_text(self, spark):
        """VERDICT r8 task 1 pins: (a) candidates form ONLY via the
        band_key hash equi-join (no product joins anywhere); (b) the OLD
        corpus side is READ from the persisted signature index, not
        recomputed — both its consumers (band explode + verify) must hit
        the InMemoryRelation, so the plan's parquet scans are bounded by
        the new-batch side + output anchor."""
        df = q.REGISTRY["dedup_incremental_minhash"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "band_key" in plan
        assert "InMemoryTableScan" in plan, "old index must be read, not rebuilt"
        a = audit_plan(df)
        assert a.python_ops == 0
        # new-sig cache + old-sig cache collapse their builds: at most the
        # two signature-build scans plus the new-batch output anchor
        assert a.n_scans <= 3
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_lm_model_join_is_broadcast(self, spark):
        """VERDICT r8 task 3 pins: the bigram model joins the doc-bigram
        stream as a BROADCAST hash join (the model is bounded at top-V
        rows — shuffling the corpus bigrams against it would be the 100-TB
        bottleneck), everything stays JVM-side, and the scans read only
        the columns the query touches (doc_id, text)."""
        df = q.REGISTRY["text_lm_bigram_nll"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        a = audit_plan(df)
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        ), "LM scoring must not read lang/source/n_chars"

    def test_source_cap_rank_limit_pushed_below_window(self, spark):
        """The exact-k per-source cap must ride WindowGroupLimit (rank<=k
        pruned map-side before the shuffle) — at million-source cardinality
        a full per-partition sort of the corpus would be the bottleneck."""
        df = q.REGISTRY["q_docs_source_cap"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "WindowGroupLimit" in plan
        a = audit_plan(df)
        assert a.python_ops == 0


class TestR10QueryPlans:
    def test_paragraph_dedup_plan(self, spark):
        """VERDICT r9 task 2 pins: paragraphs built row-locally from ONE
        persisted relation (no re-tokenize per consumer), first-occurrence
        selection is a map-side-combinable groupBy on the span hash (NOT a
        window rank — a hot boilerplate span must partial-aggregate, not
        sort in one task), reassembly via groupBy(doc_id), and no
        quadratic path anywhere."""
        df = q.REGISTRY["dedup_paragraphs"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # first-occurrence via partial-aggregating min(struct), not a rank
        # window over the span hash
        assert "row_number" not in plan.lower()
        assert "InMemoryTableScan" in plan, "paragraph relation must be cached"
        a = audit_plan(df)
        assert a.python_ops == 0
        # base-doc anchor + the single persisted paragraph build
        assert a.n_scans <= 2
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        ), "span surgery must not read lang/source/n_chars"
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_strip_boilerplate_plan(self, spark):
        """VERDICT r9 task 3 pins: ONE persisted gram-occurrence relation
        feeds both the boilerplate set and the hit probe (no re-tokenize),
        the excision itself is row-local (no token-level shuffle: the only
        exploded-position relation is the 8-rows-per-HIT coverage, linear
        in flagged spans), everything JVM-side, scans read only
        (doc_id, text)."""
        df = q.REGISTRY["text_strip_boilerplate"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "InMemoryTableScan" in plan, "gram relation must be cached"
        a = audit_plan(df)
        assert a.python_ops == 0
        assert a.n_scans <= 2  # doc anchor + the persisted gram build
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        ), "excision must not read lang/source/n_chars"
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_repeated_ngram_surgery_plan(self, spark):
        """Same skeleton pins as the cross-doc surgeon: one persisted gram
        relation, row-local excision (no token-level shuffle), JVM-side,
        (doc_id, text) scans only. The flag aggregate keys on
        (doc_id, g) — hot cross-doc grams structurally impossible."""
        df = q.REGISTRY["text_dedup_repeated_ngrams"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "InMemoryTableScan" in plan, "gram relation must be cached"
        a = audit_plan(df)
        assert a.python_ops == 0
        assert a.n_scans <= 2
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        )
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_token_budget_mix_windows_share_one_exchange(self, spark):
        """VERDICT r9 task 4 pins: the rank cap rides WindowGroupLimit
        (rank <= B pruned to B rows per language ON EACH MAP TASK — no
        full-corpus sort; B is deliberately under Spark's
        windowGroupLimitThreshold), and the running-sum window stacks on
        the SAME partitioning — exactly ONE exchange in the whole plan."""
        df = q.REGISTRY["q_docs_token_budget_mix"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "WindowGroupLimit" in plan, "rank cap must prune map-side"
        a = audit_plan(df)
        assert a.exchanges == 1
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "lang", "text"} for s in scans
        )

    def test_classifier_holdout_inference_is_narrow(self, spark):
        """r11 holdout pins: the returned plan is inference + rollup only
        (the fit collects at the model boundary before the plan exists) —
        scoring is a narrow greatest-over-literals pass (zero Python, no
        equi-join anywhere), the per-label rollup is one partial-agg
        exchange plus the 1-row summary's own, and the only nested-loop
        is the LIMIT-1-bounded summary broadcast back onto the L label
        rows."""
        df = q.REGISTRY["vector_classifier_holdout"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        # exactly the 1-row tot crossJoin (prints twice in formatted plans)
        assert plan.count("BroadcastNestedLoopJoin") <= 2
        a = audit_plan(df)
        assert a.python_ops == 0
        assert a.exchanges <= 3, "label rollup + summary agg, nothing more"
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"vec_id", "label", "embedding"}
            for s in scans
        )

    def test_url_canonical_single_shuffle_no_text(self, spark):
        """r11 URL dedup pins: canonicalization is row-local string work,
        the keep decision is ONE exchange on the canonical key (unordered
        window carrying count+min — not a groupBy+join-back), zero Python,
        and the scan never reads body text (the entire point of a
        metadata-first pass)."""
        df = q.REGISTRY["dedup_url_canonical"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        a = audit_plan(df)
        assert a.exchanges == 1, "one shuffle on canon_url, no more"
        assert a.python_ops == 0
        assert a.n_scans == 1
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "lang", "source"} for s in scans
        ), "body text must never be read"

    def test_maximal_span_surgery_plan(self, spark):
        """r11 maximal-span surgeon pins: the shared skeleton holds (ONE
        persisted gram relation, row-local excision, (doc_id, text) scans
        only, zero Python), and the run-merge adds exactly one
        doc_id-partitioned window whose hash partitioning the island
        aggregate reuses — no token-level shuffle anywhere."""
        df = q.REGISTRY["text_strip_maximal_spans"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "InMemoryTableScan" in plan, "gram relation must be cached"
        import re as _re

        assert _re.search(r"Window.*row_number", plan, _re.S)
        a = audit_plan(df)
        assert a.python_ops == 0
        assert a.n_scans <= 2  # doc anchor + the persisted gram build
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        ), "excision must not read lang/source/n_chars"
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_phash_candidates_only_via_band_join(self, spark):
        """VERDICT r9 task 5 pins: exactly ONE Python stage (the resize
        kernel — fingerprint unpack, banding, verify, rollup all stay
        JVM-side), the image filter prunes BEFORE that kernel (non-images
        are never decoded), and candidates form only through the band_key
        equi-join — no product join anywhere. r11: the band relation is
        occupancy-tagged (ONE window exchange the cold self-join reuses),
        so the hot-bucket star arm appears as a filter over the same
        tagged relation, not an extra shuffle."""
        df = q.REGISTRY["multimodal_phash_dedup"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "band_key" in plan
        assert "occ" in plan, "occupancy tag must ride the band relation"
        a = audit_plan(df)
        assert a.python_ops == 1, "resize kernel is the ONLY Python stage"
        assert "InMemoryTableScan" in plan, "fingerprints must be cached"
        # the doc_id % 3 image filter must sit below MapInPandas: the scan
        # (or the filter over it) happens before any Python node — assert
        # the filter exists at all and the python op count above proves no
        # second decode
        assert "% 3" in plan or "Filter" in plan
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_snapshot_diff_fingerprints_computed_before_shuffle(self, spark):
        """Crawl-delta pins: the content fingerprint (md5) is projected in
        the SCAN stage on BOTH snapshot sides, so each full-outer-join
        exchange moves (doc_id, 32-byte fp) pairs — the text column must
        never shuffle; the unchanged-row filter sits directly on the join
        so only the Δ survives; unique join key → two exchanges total, no
        product join, everything JVM-side, (doc_id, text) scans only."""
        df = q.REGISTRY["q_docs_snapshot_diff"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        a = audit_plan(df)
        assert a.exchanges == 2, "one exchange per snapshot side, no more"
        assert a.python_ops == 0
        assert a.n_scans == 2
        scans = scan_infos(plan)
        assert all(set(s.read_columns) <= {"doc_id", "text"} for s in scans)
        # the fp projection must appear BELOW each exchange: no Exchange
        # block in the formatted plan may carry the text column as input
        import re

        for block in re.findall(r"\(\d+\) Exchange\n(?:.+\n)+?", plan):
            assert "text#" not in block, (
                "text column crossed an exchange — fingerprint must be "
                "computed map-side:\n" + block
            )

    def test_training_order_is_one_sorted_shuffle(self, spark):
        """Deterministic-global-shuffle pins: EXACTLY one exchange (hash on
        shard_id) followed by an in-partition sort — the minimum any global
        shuffle must pay; the scan reads only doc_id (the order is a pure
        function of identity, no content column is touched); JVM-side."""
        df = q.REGISTRY["q_docs_training_order"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.exchanges == 1
        assert a.python_ops == 0
        assert a.n_scans == 1
        scans = scan_infos(plan)
        assert scans[0].read_columns == ["doc_id"]
        assert "hashpartitioning(shard_id" in plan

    def test_semantic_dedup_blocks_only_through_cells(self, spark):
        """SemDeDup pins: cell assignment is narrow (quantizer = literal
        centroids, so ONE parquet scan feeds the whole pass through the
        persisted cell relation), candidates form only through the cid
        equi-join (no product join), the verdict aggregate is a
        partial-aggregating groupBy (no rank window over a hot cell), and
        scans read only (vec_id, embedding)."""
        df = q.REGISTRY["dedup_semantic"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "row_number" not in plan.lower()
        assert "InMemoryTableScan" in plan, "cell relation must be cached"
        a = audit_plan(df)
        assert a.python_ops == 0
        assert a.n_scans == 1, "one assignment pass feeds all three consumers"
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"vec_id", "embedding"} for s in scans
        )
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_centroid_classifier_inference_is_zero_exchange(self, spark):
        """Model-based-filter pins: inference is a pure narrow pass —
        greatest over per-centroid cosine structs, ZERO exchanges, zero
        joins, one scan — because the fitted weights are broadcast as
        literals (the fit's shuffle lives in a separate bounded job that
        ships 640 group sums, not rows)."""
        df = q.REGISTRY["vector_centroid_classifier"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.exchanges == 0
        assert a.python_ops == 0
        assert a.n_scans == 1
        assert a.broadcast_joins == 0 and a.sortmerge_joins == 0

    def test_quantile_gate_histogram_never_sorts_corpus(self, spark):
        """Global-threshold pins: the CDF comes from a histogram groupBy
        over the bounded integer key (partial-aggregating — ONE corpus
        exchange of group counts) plus a single-partition window over the
        HISTOGRAM only; the 1-row threshold broadcasts back (the one
        legitimate nested-loop: a 1-row side); no corpus-wide sort or
        rank window; the histogram pass scans only the text column."""
        df = q.REGISTRY["q_docs_quality_quantile_gate"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.exchanges == 2, "hist groupBy + histogram window, no more"
        assert a.python_ops == 0
        assert a.n_scans == 2, "score-for-histogram + score-for-filter"
        assert "row_number" not in plan.lower()
        scans = scan_infos(plan)
        col_sets = sorted(
            (len(s.read_columns), set(s.read_columns)) for s in scans
        )
        assert col_sets[0][1] == {"text"}, "histogram pass reads text only"
        assert col_sets[1][1] == {"doc_id", "lang", "text"}

    def test_domain_filter_text_never_joins(self, spark):
        """Source-blocklist pins: the scorecard is ONE partial-aggregating
        exchange; the verdict join's corpus side carries only
        (doc_id, source) — text is read in the scorecard pass only and
        never crosses a join; the domains-sized scorecard broadcasts; no
        window, no product join."""
        df = q.REGISTRY["q_docs_domain_filter"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.exchanges == 1, "scorecard groupBy only"
        assert a.python_ops == 0
        assert a.broadcast_joins >= 1 and a.sortmerge_joins == 0
        assert "row_number" not in plan.lower()
        col_sets = sorted(
            tuple(sorted(s.read_columns)) for s in scan_infos(plan)
        )
        assert col_sets == [("doc_id", "source"), ("source", "text")]

    def test_mixture_recipe_single_corpus_exchange(self, spark):
        """Recipe pins: the corpus collapses through exactly ONE
        partial-aggregating exchange (per-stratum token sums); the
        min/count windows run over the L-row relation (the second
        exchange is the single-partition window over L rows, never the
        corpus); one scan reading (lang, text) only."""
        df = q.REGISTRY["q_docs_mixture_recipe"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.exchanges == 2, "stratum groupBy + L-row window"
        assert a.python_ops == 0
        assert a.n_scans == 1
        scans = scan_infos(formatted_plan(df))
        assert sorted(scans[0].read_columns) == ["lang", "text"]

    def test_tfidf_single_tokenize_pass_and_group_limit(self, spark):
        """TF-IDF pins: ONE corpus tokenize pass (the persisted
        (doc_id, token, tf) relation feeds the df aggregate AND the
        scoring join — InMemoryTableScan), the vocab-sized idf relation
        broadcasts, and the per-doc top-k rides WindowGroupLimit so map
        tasks forward at most k rows per doc to the rank exchange."""
        df = q.REGISTRY["text_tfidf_topk"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.n_scans == 1, "one tokenize pass feeds both consumers"
        assert "InMemoryTableScan" in plan
        assert a.exchanges == 2, "df groupBy + doc_id rank window"
        assert "WindowGroupLimit" in plan
        assert a.broadcast_joins >= 1 and a.sortmerge_joins == 0
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert sorted(scans[0].read_columns) == ["doc_id", "text"]
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_outlier_filter_moments_shuffle_only(self, spark):
        """Embedding-hygiene pins: the quantized-norm base relation is
        persisted (one parquet scan feeds moments AND verdict), the only
        exchange is the #labels-group moments aggregate, the moments side
        broadcasts back, and no window/sort touches the vectors."""
        df = q.REGISTRY["vector_outlier_filter"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.n_scans == 1
        assert "InMemoryTableScan" in plan
        assert a.exchanges == 1, "moments groupBy only"
        assert a.broadcast_joins >= 1 and a.sortmerge_joins == 0
        assert a.python_ops == 0
        assert "row_number" not in plan.lower()
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"vec_id", "label", "embedding"}
            for s in scans
        )
        from dblink_spark.queries import release_caches

        release_caches(df)


class TestR11SqlShapes:
    """The four correlated-subquery TPC-H shapes (Q15/Q17/Q21/Q22) — pins
    are the decorrelation properties that survive a 100× scale-up: the
    fact table is scanned the minimum number of times with only the
    correlation/key columns read, every filter reaches the scan, and no
    decorrelated subquery degenerates into a cartesian product. Join
    STRATEGY is deliberately unpinned (AQE broadcasts at test SF, shuffles
    at scale) except where a 1-row frame is structurally broadcast."""

    def test_q15_fact_scanned_once_via_cache(self, spark):
        """Q15: the per-supplier revenue aggregate is persisted, so the
        date-pruned lineitem scan happens exactly ONCE even though two
        consumers (MAX scalar + winner filter) read the aggregate."""
        df = q.REGISTRY["q15_top_supplier"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        scans = scan_infos(plan)
        fact = [s for s in scans if "lineitem" in s.location]
        assert len(fact) == 1, "lineitem must be scanned exactly once"
        assert fact[0].pushed_filters, "ship-date window must push down"
        assert set(fact[0].read_columns) <= {
            "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
        }
        assert "InMemoryTableScan" in plan
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_q17_correlated_avg_decorrelation(self, spark):
        """Q17: both lineitem passes (per-part aggregate + probe) read at
        most the 3 needed columns, the brand predicate pushes into BOTH
        part scans (the semi-join prune), and the exact-integer threshold
        join stays equi-keyed on l_partkey — never a product."""
        df = q.REGISTRY["q17_small_quantity_revenue"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        scans = scan_infos(plan)
        for s in scans:
            if "lineitem" in s.location:
                assert set(s.read_columns) <= {
                    "l_partkey", "l_quantity", "l_extendedprice"
                }
            if "part.parquet" in s.location:
                assert any("p_brand" in f for f in s.pushed_filters)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0

    def test_q21_exists_chain_reads_only_keys(self, spark):
        """Q21: the EXISTS/NOT-EXISTS decorrelation shuffles only
        (l_orderkey, l_suppkey, l_returnflag) — a width column (price,
        quantity) reaching any of the three lineitem scans means the
        semi/anti sides stopped pruning. The supplier inequality is a
        join residual, never a product."""
        df = q.REGISTRY["q21_blamed_supplier"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        scans = scan_infos(plan)
        fact = [s for s in scans if "lineitem" in s.location]
        assert len(fact) == 3
        for s in fact:
            assert set(s.read_columns) <= {
                "l_orderkey", "l_suppkey", "l_returnflag"
            }
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0

    def test_q22_scalar_threshold_is_one_row_broadcast(self, spark):
        """Q22: the whole-table average is a 1-row frame broadcast back
        (nested-loop against ONE row, the legal degenerate case); the
        dormancy check is an anti equi-join on the date-pruned orders scan
        reading only (o_custkey, o_orderdate)."""
        df = q.REGISTRY["q22_dormant_accounts"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        scans = scan_infos(plan)
        orders = [s for s in scans if "orders" in s.location]
        assert len(orders) == 1
        assert orders[0].pushed_filters, "dormancy cutoff must push down"
        assert set(orders[0].read_columns) <= {"o_custkey", "o_orderdate"}
        for s in scans:
            if "customer" in s.location:
                assert set(s.read_columns) <= {
                    "c_custkey", "c_nationkey", "c_acctbal"
                }
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0

    def test_q7_nation_pruning_and_key_columns(self, spark):
        """Q7: the nation broadcast + name filter prunes supplier and
        customer to 2-column key slices BEFORE the big joins; lineitem
        reads only its 5 needed columns out of 11; the pair disjunction
        never degenerates into a product."""
        df = q.REGISTRY["q7_nation_volume"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        scans = scan_infos(plan)
        for s in scans:
            if "lineitem" in s.location:
                assert set(s.read_columns) <= {
                    "l_orderkey", "l_suppkey", "l_extendedprice",
                    "l_discount", "l_shipdate",
                }
            if "customer" in s.location:
                assert set(s.read_columns) <= {"c_custkey", "c_nationkey"}
            if "supplier" in s.location:
                assert set(s.read_columns) <= {"s_suppkey", "s_nationkey"}
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0

    def test_moving_revenue_single_exchange_window(self, spark):
        """RANGE-frame window: exactly ONE exchange (hash on o_custkey) +
        the in-partition sort — the minimum for any per-key ordered
        window; one scan, 4 columns, no join anywhere."""
        df = q.REGISTRY["q_orders_moving_revenue"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.n_scans == 1
        assert a.exchanges == 1
        assert a.broadcast_joins == 0 and a.sortmerge_joins == 0
        assert a.python_ops == 0
        assert a.total_read_columns <= 4

    def test_retention_one_corpus_exchange(self, spark):
        """Cohort retention: the only corpus-sized exchange is the
        groupBy(user_id) day-set collapse — the cells aggregate and the
        cohort-base window run over the ~|days|² cell relation. Events
        scan reads exactly (ts, user_id)."""
        df = q.REGISTRY["q_events_retention"].fn(spark, SF_DIR)
        a = audit_plan(df)
        plan = formatted_plan(df)
        assert a.n_scans == 1
        assert a.exchanges <= 3  # user collapse + cell agg + cell window
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert set(scans[0].read_columns) <= {"ts", "user_id"}

    def test_neyman_one_corpus_exchange(self, spark):
        """Eval-budget allocation: one narrow scoring pass (only
        (text, lang) read — doc_id prunes away) into the per-language
        aggregate; every window (total, rank, leftover) fuses onto ONE
        single-partition exchange over the L-row stratum relation."""
        df = q.REGISTRY["q_docs_neyman_allocation"].fn(spark, SF_DIR)
        a = audit_plan(df)
        plan = formatted_plan(df)
        assert a.n_scans == 1
        assert a.exchanges == 2  # corpus groupBy + one L-row window stage
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert set(scans[0].read_columns) <= {"text", "lang"}

    def test_cube_single_exchange(self, spark):
        """CUBE inventory: Spark expands the 4 grouping sets map-side and
        partial-aggregates them through ONE exchange keyed on the bounded
        metadata domain; only (text, lang, source) is read."""
        df = q.REGISTRY["q_docs_inventory_cube"].fn(spark, SF_DIR)
        a = audit_plan(df)
        plan = formatted_plan(df)
        assert a.n_scans == 1
        assert a.exchanges == 1
        assert a.python_ops == 0
        assert "Expand" in plan
        scans = scan_infos(plan)
        assert set(scans[0].read_columns) <= {"text", "lang", "source"}

    def test_semantic_decon_literal_arm_zero_exchange(self, spark):
        """Semantic decontamination, literal arm (suite <= 64): the whole
        sweep is a narrow greatest-over-structs expression — one
        embeddings scan, no join node, no Python, and the ONLY exchange
        allowed is the r16 small-input widen (a round-robin repartition
        that exists only below cores×maxPartitionBytes; at scale the plan
        is exchange-free). No join/aggregate exchange may appear."""
        df = q.REGISTRY["vector_semantic_decontaminate"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.exchanges <= 1
        plan = formatted_plan(df)
        if a.exchanges == 1:
            assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan
        assert a.n_scans == 1
        assert a.broadcast_joins == 0 and a.sortmerge_joins == 0
        assert a.python_ops == 0

    def test_gap_fill_one_corpus_exchange_one_scan(self, spark):
        """Calendar-spine gap fill: events scan exactly ONCE into the
        persisted (type, hour) rollup — the spine bounds, type list and
        zero-fill join all read the cache; the only corpus-sized exchange
        is the rollup's map-side-combining groupBy."""
        df = q.REGISTRY["q_events_gap_fill"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.n_scans == 1, "events must be scanned exactly once"
        assert "InMemoryTableScan" in plan
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert set(scans[0].read_columns) <= {"ts", "event_type", "value"}
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_hourly_anomaly_windows_over_dense_cache(self, spark):
        """Anomaly monitor: shares the gap fill's ONE events scan (the
        persisted dense-hourly rollup), and the trailing z² window adds
        only calendar-bounded work — no second corpus pass, no Python,
        no sqrt anywhere in the plan."""
        df = q.REGISTRY["q_events_hourly_anomaly"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.n_scans == 1, "events must be scanned exactly once"
        assert "InMemoryTableScan" in plan
        assert a.python_ops == 0
        assert "SQRT" not in plan.upper()
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_ccnet_bucket_histogram_never_sorts_corpus(self, spark):
        """CCNet bucketing: the persisted keyed relation feeds histogram
        AND verdict (the expensive LM pipeline runs once); thresholds
        come from a window over the HISTOGRAM only and broadcast back —
        no corpus-wide sort/row_number anywhere, no Python."""
        df = q.REGISTRY["q_docs_ccnet_bucket"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "InMemoryTableScan" in plan
        assert a.python_ops == 0
        assert "row_number" not in plan.lower()
        assert a.broadcast_joins >= 1, "1-row threshold frame broadcasts"
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_source_overlap_pairs_explode_row_locally(self, spark):
        """Mirror-detection audit: pairs come from each gram's OWN sorted
        source array (bounded C(8,2) fan-out), never a self-join of the
        gram relation — the persisted (gram, source) relation is the one
        corpus-sized exchange and feeds ubiquity count, universe, pairs
        AND denominators. r12: the universe build is TWO-PASS — a
        bounded-state count(*) pre-filter semi-joins the relation BEFORE
        collect_set, so no set buffer ever exceeds the 8-source cap."""
        df = q.REGISTRY["q_docs_source_overlap"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.n_scans == 1, "documents scanned exactly once"
        assert "InMemoryTableScan" in plan
        assert a.python_ops == 0
        assert "CartesianProduct" not in plan
        # two-pass pin: the ubiquity filter reaches collect_set through a
        # LEFT SEMI join (count-filter-join), not a post-aggregation
        # size() filter on unbounded sets
        assert "LeftSemi" in plan
        assert "collect_set" in plan and "count(1)" in plan
        scans = scan_infos(plan)
        assert set(scans[0].read_columns) <= {"text", "source"}
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_quality_weighted_sample_is_zero_exchange(self, spark):
        """Quality-proportional sampling: score, key and membership are
        all row-local — ZERO exchanges, one scan, no join, no Python;
        the pass composes map-side with any downstream consumer."""
        df = q.REGISTRY["q_docs_quality_weighted_sample"].fn(spark, SF_DIR)
        a = audit_plan(df)
        assert a.exchanges == 0
        assert a.n_scans == 1
        assert a.broadcast_joins == 0 and a.sortmerge_joins == 0
        assert a.python_ops == 0

    def test_q10_top_k_is_take_ordered_not_global_sort(self, spark):
        """Q10: the global ranking must plan as TakeOrderedAndProject —
        a per-task k-row heap + driver merge — never a full sort
        exchange of the aggregate."""
        df = q.REGISTRY["q10_returned_items"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "TakeOrderedAndProject" in plan
        assert a.python_ops == 0
        scans = scan_infos(plan)
        for s in scans:
            if "orders" in s.location:
                assert s.pushed_filters, "date window must push down"
            if "lineitem" in s.location:
                assert s.pushed_filters, "returnflag must push down"

    def test_rfm_one_corpus_exchange(self, spark):
        """RFM: the per-user aggregate is the ONE corpus-sized exchange;
        the reference day, all three histograms and their CDF windows
        run over the persisted user-cardinality relation; scoring is a
        narrow pass over broadcast 1-row threshold frames."""
        df = q.REGISTRY["q_events_rfm"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert a.n_scans == 1, "events scanned exactly once"
        assert "InMemoryTableScan" in plan
        assert a.python_ops == 0
        assert a.broadcast_joins >= 4, "ref day + 3 threshold frames"
        from dblink_spark.queries import release_caches

        release_caches(df)


class TestR12TpchPlans:
    """Plan pins for the r12 family completing the classic TPC-H set:
    every correlated subquery decorrelates into a window or a 1-row
    broadcast (never a per-row re-aggregation), dimension pruning happens
    before the fact joins, each lineitem scan reads only the columns the
    query touches, and nothing drops to Python."""

    def _lineitem_scans(self, plan):
        return [
            s for s in scan_infos(plan) if "lineitem" in s.location
        ]

    def test_q2_correlated_min_is_window_over_offers(self, spark):
        """Q2: the per-part minimum runs as a window over the Δ-sized
        offer relation — no second lineitem aggregate, no self-join of
        offers; region pruning broadcasts before the fact."""
        df = q.REGISTRY["q2_min_cost_supplier"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        assert plan.count("(\n") == 0  # sanity: formatted mode parsed
        li = self._lineitem_scans(plan)
        assert len(li) == 1, "lineitem must be scanned exactly once"
        assert set(li[0].read_columns) <= {
            "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
        }
        assert a.broadcast_joins >= 2, "region->nation pruning broadcasts"
        import re as _re

        assert _re.search(r"Window", plan), "decorrelated min is a window"

    def test_q8_share_is_one_conditional_aggregate(self, spark):
        """Q8: numerator and denominator come from ONE aggregate pass
        (conditional sum) — a share query that scans or joins the fact
        twice is wrong at any scale."""
        df = q.REGISTRY["q8_market_share"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        li = self._lineitem_scans(plan)
        assert len(li) == 1, "one fact scan feeds both sums"
        assert set(li[0].read_columns) <= {
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
            "l_discount",
        }

    def test_q9_profit_single_fact_pass(self, spark):
        df = q.REGISTRY["q9_product_profit"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        li = self._lineitem_scans(plan)
        assert len(li) == 1
        # the name LIKE prunes the part dim, not the fact: the lineitem
        # scan carries no text predicate, the part scan carries the LIKE
        part = [s for s in scan_infos(plan) if "/part.parquet" in s.location]
        assert part and any(
            "p_name" in f for s in part for f in s.pushed_filters
        ), "LIKE must push into the part scan"

    def test_q11_scalar_threshold_broadcasts_once(self, spark):
        """Q11: the scalar total folds from the PERSISTED value relation
        and broadcasts back as a LIMIT-bounded 1-row frame — lineitem is
        scanned once, the fraction test never re-aggregates lines."""
        df = q.REGISTRY["q11_important_parts"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        assert "InMemoryTableScan" in plan, "value relation must be cached"
        li = self._lineitem_scans(plan)
        assert len(li) == 1
        assert set(li[0].read_columns) <= {
            "l_partkey", "l_suppkey", "l_extendedprice"
        }
        # exactly the 1-row total crossJoin (prints twice in formatted)
        assert 1 <= plan.count("BroadcastNestedLoopJoin") <= 2
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_q12_bands_single_join_single_agg(self, spark):
        df = q.REGISTRY["q12_priority_shipping"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        li = self._lineitem_scans(plan)
        assert len(li) == 1
        assert set(li[0].read_columns) <= {
            "l_orderkey", "l_linestatus", "l_shipdate"
        }
        # orderkey equi-join + |linestatus|-key rollup; the lateness
        # predicate is a join residual, never a second pass
        assert a.exchanges <= 3

    def test_q20_half_of_total_is_window_not_self_join(self, spark):
        """Q20: the correlated per-part total decorrelates into a window
        sum over the Δ-sized shipped relation; the date and name filters
        push into/prune before the single fact aggregate."""
        df = q.REGISTRY["q20_dominant_suppliers"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        li = self._lineitem_scans(plan)
        assert len(li) == 1
        assert any("l_shipdate" in f for f in li[0].pushed_filters), (
            "ship-year predicate must push into the fact scan"
        )
        import re as _re

        assert _re.search(r"Window", plan)

    def test_gapped_spans_reuses_one_window_sort(self, spark):
        """Gap-tolerant surgeon: identical skeleton pins as the exact
        surgeon (persisted gram relation, (doc_id, text)-only scans,
        zero Python, no products) and the tolerance's TWO window passes
        (lag + running sum) share ONE doc_id sort/exchange."""
        df = q.REGISTRY["text_strip_gapped_spans"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "InMemoryTableScan" in plan, "gram relation must be cached"
        a = audit_plan(df)
        assert a.python_ops == 0
        assert a.n_scans <= 2
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        )
        # lag + sum appear as Window nodes over the same ordering — the
        # detail section lists each once; more than 2 means a re-sort
        # slipped in between them
        import re as _re

        win_details = _re.findall(r"\(\d+\) Window", plan)
        assert 1 <= len(win_details) <= 2
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_confirmed_spans_anchor_bounded_plan(self, spark):
        """4-gram-confirmed surgeon (r13): same structural pins as its
        siblings — no products, zero Python, (doc_id, text)-only scans,
        cached gram relations — plus the anchor discipline: the 4-gram
        relation is LeftSemi-bounded to anchor docs BEFORE any weak-set
        work, so the confirmation never builds a corpus-wide 4-gram
        table."""
        df = q.REGISTRY["text_strip_confirmed_spans"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "InMemoryTableScan" in plan, "gram relations must be cached"
        a = audit_plan(df)
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        )
        assert "LeftSemi" in plan, (
            "4-gram build must be anchor-bounded (left_semi on covered "
            "docs) before the weak-set join"
        )
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_transition_matrix_one_corpus_exchange(self, spark):
        """Transition matrix: the LAG window is the ONE corpus-sized
        exchange (spillable buffer — the funnel's bot-user discipline,
        no collect_list anywhere); the pair rollup and its row-normalizing
        window run over the |types|^2 relation."""
        df = q.REGISTRY["q_events_transition_matrix"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert "collect_list" not in plan
        assert a.python_ops == 0
        assert a.n_scans == 1
        # user_id lag + (from,to) rollup + from_type window = 3 exchanges,
        # only the first corpus-sized
        assert a.exchanges <= 3

    def test_engagement_gini_histogram_only_windows(self, spark):
        """Gini audit: one corpus exchange (user rollup); both CDF
        windows and the rank-sum math run over the COUNT HISTOGRAM only
        — no rank/row_number over users, no corpus sort, 1-row output
        via a LIMIT-bounded scalar broadcast."""
        df = q.REGISTRY["q_events_engagement_gini"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        assert "row_number" not in plan.lower(), "no per-user ranking"
        assert a.n_scans <= 2  # events feeds user rollup (+ scalar arm)
        # the 1-row totals crossJoin prints twice in formatted plans
        assert 1 <= plan.count("BroadcastNestedLoopJoin") <= 2

    def test_cdc_chunks_row_local_build(self, spark):
        """CDC chunking: the whole boundary/fingerprint build is
        row-local higher-order-function work over STAGED array columns
        (no Python, no pre-chunk explode); the persisted chunk relation
        feeds the fp rollup AND the verdict join (one build)."""
        df = q.REGISTRY["text_cdc_chunks"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        a = audit_plan(df)
        assert "CartesianProduct" not in plan
        assert a.python_ops == 0
        assert "InMemoryTableScan" in plan, "chunk relation must be cached"
        assert a.n_scans <= 1
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        )
        from dblink_spark.queries import release_caches

        release_caches(df)


class TestCompstableAmortizationPins:
    """r14 (VERDICT task 6): the second amortization tier's economics
    (survivors 0.27s / audit 0.53s off the persisted closure) are
    bench-measured but were not plan-pinned — a refactor that quietly
    re-derived lineage through the sketch build would erase the tier
    while the gates stayed green. Consumers fed a LOADED comps table
    must plan as {comps parquet scan + documents scan + their own
    join/agg work} ONLY: no tokenization (Generate/explode), no band
    join, no closure rounds, no Python."""

    def _loaded_comps(self, spark, tmp_path):
        from dblink_spark.operators.components import connected_components
        from dblink_spark.queries import load, release_caches
        from dblink_spark.queries.dedup import bottomk_sketch_pairs
        from dblink_spark.sources.dedup_index import (
            load_comps_table, save_comps_table,
        )

        pairs = bottomk_sketch_pairs(
            load(spark, SF_DIR, "documents"), k=8, threshold=0.99
        )
        comps = connected_components(pairs, "doc1", "doc2")
        path = str(tmp_path / "comps")
        save_comps_table(comps, path)
        release_caches(pairs)
        return load_comps_table(spark, path), path

    def _assert_no_rebuild(self, df, comps_path):
        plan = formatted_plan(df)
        scans = scan_infos(plan)
        locs = [s.location for s in scans]
        assert any(comps_path in loc for loc in locs), (
            "plan must read the persisted closure"
        )
        assert all(
            comps_path in loc or "documents" in loc for loc in locs
        ), f"unexpected extra scans (lineage leak?): {locs}"
        # tokenize/shingle stages explode token arrays; the closure loop
        # caches its frontier — neither may appear off a loaded table
        assert "Generate" not in plan, "tokenization re-ran off the closure"
        assert "InMemoryTableScan" not in plan, (
            "closure-round caches present — the closure re-ran"
        )
        a = audit_plan(df)
        assert a.python_ops == 0

    def test_survivors_off_loaded_closure(self, spark, tmp_path):
        comps, path = self._loaded_comps(spark, tmp_path)
        df = q.REGISTRY["dedup_survivors"].fn(spark, SF_DIR, comps=comps)
        self._assert_no_rebuild(df, path)

    def test_bias_audit_off_loaded_closure(self, spark, tmp_path):
        comps, path = self._loaded_comps(spark, tmp_path)
        df = q.REGISTRY["q_docs_dedup_bias_audit"].fn(
            spark, SF_DIR, comps=comps
        )
        self._assert_no_rebuild(df, path)


class TestLadderSpanPlan:
    def test_ladder_spans_plan(self, spark):
        """r14 ladder surgeon: family structural pins — no products, zero
        Python, (doc_id, text)-only scans, cached gram/hit relations —
        plus its own discipline: exactly ONE corpus gram pass at width 5
        (the persisted occ5 feeds rarity, hits, and evidence), tokens
        never crossing an exchange."""
        df = q.REGISTRY["text_strip_ladder_spans"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "InMemoryTableScan" in plan, "gram/hit relations must cache"
        a = audit_plan(df)
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        )
        from dblink_spark.queries import release_caches

        release_caches(df)

    def test_template_spans_plan(self, spark):
        """r15 template surgeon: the same family structural pins as the
        ladder (no products, zero Python, (doc_id, text)-only scans,
        cached gram/hit/island relations — ONE width-5 corpus gram pass
        feeds band, hits, evidence AND the confirmation join), plus the
        tier's own scale discipline: the confirmation join runs on the
        gram key (an equi-join — never a cross product), with fan-out
        bounded at 64 rows/gram by the band filter upstream."""
        df = q.REGISTRY["text_strip_template_spans"].fn(spark, SF_DIR)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "InMemoryTableScan" in plan, "gram/hit/island relations cache"
        a = audit_plan(df)
        assert a.python_ops == 0
        scans = scan_infos(plan)
        assert all(
            set(s.read_columns) <= {"doc_id", "text"} for s in scans
        )
        from dblink_spark.queries import release_caches

        release_caches(df)
