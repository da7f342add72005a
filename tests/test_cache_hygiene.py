"""Caller-owns-cache contract (r5 VERDICT #7): queries that persist an
intermediate attach the handle to their result (`owns_caches`); a
long-lived session materializes, then `release_caches` — after which NO
cached plan may outlive the invocation. Asserted against Spark's
CacheManager directly, so a future persist() added without the contract
fails here."""

from __future__ import annotations

import pytest

from dblink_spark.queries import REGISTRY, release_caches

SF = "/root/testdata/sf0.001"

#: every registered query that persists an intermediate (grep .persist())
_PERSISTING = [
    "dedup_minhash_lsh",
    # r16: persists the window-annotated (doc, group rep/size/next)
    # relation — group-join sides + the per-doc expansion all read it
    "dedup_simhash",
    # r16: dedup_bottomk_jaccard left this list — at its 0.99 operating
    # point the prefix is 1 hash/doc, so the pair build now carries the
    # sketch through the prefix join (verify-in-join) and persists nothing
    # (see bottomk_sketch_pairs; test_bottomk_carry_persists_nothing pins
    # the new shape)
    "pairwise_metrics",
    # persists the quality-filtered corpus metadata (the r16 carry-sketch
    # pair build persists nothing itself), leaving exactly one owned
    # cache on the result
    "pipeline_corpus_prep",
    # persists the exploded gram table (feeds boiler set + totals + hits)
    "text_boilerplate_grams",
    # persists the band-signature table (query + candidate + balance arms)
    "ann_lsh_recall",
    # persists BOTH signature tables (old index + new batch), each feeding
    # its band explode and verify side
    "dedup_incremental_minhash",
    # persists the exploded paragraph relation (keeper agg + probe join)
    "dedup_paragraphs",
    # persists the (doc_id, i, g) gram-occurrence relation (boiler + hits)
    "text_strip_boilerplate",
    # persists the fingerprint table (band sides + verify + output anchor)
    "multimodal_phash_dedup",
    # persists the gram-occurrence relation (firsts agg + hit probe)
    "text_dedup_repeated_ngrams",
    # persists the cell-assignment relation (both pair-join sides + anchor)
    "dedup_semantic",
    # persists the row-local (doc_id, token, tf) relation (df agg + join)
    "text_tfidf_topk",
    # persists the quantized-norm base relation (moments pass + verdict)
    "vector_outlier_filter",
    # persists the gram-occurrence relation (boiler agg + hit probe)
    "text_strip_maximal_spans",
    # same persisted gram skeleton, gap-tolerant run-merge variant
    "text_strip_gapped_spans",
    # persists the 8-cover relation, its exploded positions and the
    # anchor-doc 4-gram table (r15: was missing from this list since r13
    # — the docstring promises EVERY .persist() query is covered)
    "text_strip_confirmed_spans",
    # persists the width-5 gram table + band-hit relation (r15: missing
    # since r14, same omission)
    "text_strip_ladder_spans",
    # persists width-5 grams, band hits AND the island-gram relation
    # (evidence + confirmation both read it)
    "text_strip_template_spans",
    # persists the per-supplier revenue aggregate (max scalar + winner
    # filter both read the cache; lineitem is scanned exactly once)
    "q15_top_supplier",
    # persists the tiny (type, hour) rollup (spine bounds, type list and
    # zero-fill join all derive from it; events scans exactly once)
    "q_events_gap_fill",
    # same shared _dense_hourly rollup cache as q_events_gap_fill
    "q_events_hourly_anomaly",
    # persists the per-doc (doc_id, n_bigrams, ppl_key) relation (the LM
    # pipeline is expensive — histogram and verdict must not replay it)
    "q_docs_ccnet_bucket",
    # persists the distinct (gram, source) relation AND its semi-joined
    # 2..8-source universe (r12 two-pass build: ubiquity count, pair
    # explode and per-source denominators all consume them)
    "q_docs_source_overlap",
    # persists the per-user (last_day, f_key, m_key) relation (reference
    # day + three histograms + scoring all derive from it)
    "q_events_rfm",
    # persists the Δ-sized per-part value aggregate (the scalar-total fold
    # and the fraction filter both read it; lineitem scans exactly once)
    "q11_important_parts",
    # persists the per-doc chunk-fingerprint relation (fp rollup + verdict
    # join both read it; the row-local chunk build runs once)
    "text_cdc_chunks",
]


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


@pytest.mark.parametrize("name", _PERSISTING)
def test_release_caches_empties_cache_manager(name, spark):
    cm = _cache_manager(spark)
    spark.catalog.clearCache()
    assert cm.isEmpty()
    df = REGISTRY[name].fn(spark, SF)
    df.count()
    assert not cm.isEmpty(), f"{name}: expected a persisted intermediate"
    release_caches(df)
    assert cm.isEmpty(), f"{name}: release_caches left cached plans behind"


def test_components_queries_release_internally(spark):
    """dedup_components / dedup_survivors consume their pair cache eagerly
    inside the closure and must release it BEFORE returning."""
    cm = _cache_manager(spark)
    for name in ("dedup_components", "dedup_survivors"):
        spark.catalog.clearCache()
        df = REGISTRY[name].fn(spark, SF)
        assert cm.isEmpty(), f"{name}: cache left behind at build time"
        df.count()
        release_caches(df)  # no-op by contract, but exercised
        assert cm.isEmpty()


def test_non_persisting_queries_are_noop(spark):
    """release_caches must be safe on queries that persist nothing."""
    df = REGISTRY["dedup_exact"].fn(spark, SF)
    df.count()
    release_caches(df)  # must not raise


def test_bottomk_carry_persists_nothing(spark):
    """r16: the high-threshold (carry-sketch) arm of bottomk_sketch_pairs
    must not persist — the sketch rides the prefix join, so there is no
    multi-consumer intermediate left to cache. The wide-prefix arm keeps
    the persisted sketch frame (released internally by its consumers)."""
    cm = _cache_manager(spark)
    spark.catalog.clearCache()
    df = REGISTRY["dedup_bottomk_jaccard"].fn(spark, SF)
    df.count()
    assert cm.isEmpty(), "carry-sketch arm must not persist"
    release_caches(df)  # must be a no-op, not raise


def test_outstanding_registry_detects_derived_frame_leak(spark):
    """The ADVICE-r6 silent no-op: releasing a DERIVED frame frees nothing
    (ownership rides on the object). The session registry must expose the
    leaked cache and release_outstanding must recover it."""
    from dblink_spark.queries import outstanding_caches, release_outstanding

    cm = _cache_manager(spark)
    spark.catalog.clearCache()
    release_outstanding()  # clean slate for the registry too
    df = REGISTRY["dedup_minhash_lsh"].fn(spark, SF)
    derived = df.filter("n_near_dups >= 0")  # drops the ownership attribute
    derived.count()
    release_caches(derived)  # the silent no-op under test
    assert not cm.isEmpty(), "precondition: the cache must still be live"
    leaked = outstanding_caches()
    # r10: the query owns TWO caches (signature table + tagged band
    # relation for the hot-bucket cap) — both must surface as leaked
    assert len(leaked) == 2, "registry must surface the derived-frame leak"
    assert release_outstanding() == 2
    assert cm.isEmpty(), "release_outstanding must actually unpersist"
    assert outstanding_caches() == []


def test_outstanding_registry_empty_after_proper_release(spark):
    from dblink_spark.queries import outstanding_caches, release_outstanding

    spark.catalog.clearCache()
    release_outstanding()
    df = REGISTRY["dedup_minhash_lsh"].fn(spark, SF)
    df.count()
    release_caches(df)
    assert outstanding_caches() == []


def test_materialized_scope_releases_on_exit(spark):
    """The r8 ergonomic wrapper: consuming a persisting query through
    `materialized` leaves no live cache and no outstanding registry entry,
    even when the caller derives new frames inside the block."""
    from dblink_spark.queries import materialized, outstanding_caches, release_outstanding

    cm = _cache_manager(spark)
    spark.catalog.clearCache()
    release_outstanding()
    with materialized(REGISTRY["dedup_minhash_lsh"].fn(spark, SF)) as df:
        # deriving inside the block is fine: release targets the ENTERING
        # frame, whose ownership attribute is intact
        df.filter("n_near_dups >= 0").count()
        assert not cm.isEmpty()
    assert cm.isEmpty(), "materialized must unpersist on exit"
    assert outstanding_caches() == []


def test_materialized_releases_on_error(spark):
    from dblink_spark.queries import materialized, outstanding_caches, release_outstanding

    cm = _cache_manager(spark)
    spark.catalog.clearCache()
    release_outstanding()
    with pytest.raises(RuntimeError, match="boom"):
        with materialized(REGISTRY["dedup_minhash_lsh"].fn(spark, SF)) as df:
            df.count()
            raise RuntimeError("boom")
    assert cm.isEmpty(), "materialized must unpersist even on error"
    assert outstanding_caches() == []
