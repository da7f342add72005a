"""Per-partition memory-ceiling guard (VERDICT r7 task 3).

Each ER partition is materialized whole inside one grouped-Arrow kernel
task (the reference shares the limitation — SURVEY §4: "spill is not
handled"; ref: GibbsUpdates.scala:175-184). Instead of segfaulting /
OOMing at scale, ``assign_partitions`` audits the exact packed-state bytes
per partition up front and raises an actionable error pointing at the fix
(more KD-tree levels)."""

from __future__ import annotations

import pytest

from dblink_spark.er.attributes import (
    Attribute,
    BetaParams,
    ConstantSim,
    LevenshteinSim,
)
from dblink_spark.er.cache import build_records_cache
from dblink_spark.er.datagen import make_rldata
from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
from dblink_spark.er.state import (
    PartitionBudgetError,
    assign_partitions,
    audit_partition_budget,
    init_state,
)


@pytest.fixture(scope="module")
def small_state(spark):
    from pyspark.sql import functions as F

    pdf = make_rldata(
        n_records=120, dup_fraction=0.2, missing_fraction=0.02, seed=19
    )
    if "ent_id" in pdf.columns:
        pdf = pdf.drop(columns=["ent_id"])
    records = spark.createDataFrame(pdf).withColumn("file_id", F.lit("0"))
    attrs = [
        Attribute("by", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bm", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bd", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("fname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
        Attribute("lname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
    ]
    cache = build_records_cache(records, attrs, expected_max_cluster_size=10)
    state = init_state(spark, records, cache, SinglePartition(), 1, seed=41)
    return state, cache


def test_audit_reports_exact_packed_widths(spark, small_state):
    state, cache = small_state
    stats = audit_partition_budget(state.df, cache.num_attributes)
    assert len(stats) == 1  # SinglePartition
    s = stats[0]
    assert s["n_records"] == 120
    # the estimate must cover at least the two record blobs it measures
    # exactly: rec_values (4*R*A) + rec_dist (R*A)
    assert s["packed_bytes"] >= 5 * 120 * cache.num_attributes
    assert s["max_cell_bytes"] >= 4 * 120 * cache.num_attributes


def test_oversized_partition_raises_actionable_error(spark, small_state):
    state, cache = small_state
    pf = KDTreePartitioner(num_levels=1, attribute_ids=[3, 4, 0])
    pf.fit(state.df.filter("NOT is_summary").select("ent_values"))
    with pytest.raises(PartitionBudgetError, match="num_levels"):
        assign_partitions(
            state, pf, pf.num_partitions, partition_budget_bytes=64
        )


def test_within_budget_passes_and_env_override(spark, small_state, monkeypatch):
    state, cache = small_state
    pf = KDTreePartitioner(num_levels=1, attribute_ids=[3, 4, 0])
    pf.fit(state.df.filter("NOT is_summary").select("ent_values"))
    s2 = assign_partitions(state, pf, pf.num_partitions)  # default budget
    assert s2.num_partitions == 2
    # env knob reaches the default path (1 MB >= this tiny state? no — the
    # packed state here is a few KB, so force a sub-KB budget via the env
    # by using the smallest nonzero value and asserting it still audits)
    monkeypatch.setenv("DBLINK_PARTITION_BUDGET_MB", "1")
    stats = audit_partition_budget(s2.df, cache.num_attributes)
    assert stats  # 120 records pack well under 1 MB — passes
    # 0 is the explicit opt-out sentinel (ADVICE r8): soft budget skipped,
    # Arrow hard-ceiling check retained — so even an absurd per-call
    # budget_bytes=0 must NOT raise
    monkeypatch.setenv("DBLINK_PARTITION_BUDGET_MB", "0")
    assert audit_partition_budget(s2.df, cache.num_attributes)
    assert audit_partition_budget(s2.df, cache.num_attributes, budget_bytes=0)
    # ...while a tiny nonzero budget still fails fast with guidance
    with pytest.raises(PartitionBudgetError, match="num_levels"):
        audit_partition_budget(s2.df, cache.num_attributes, budget_bytes=64)


def test_negative_budget_rejected(spark, small_state, monkeypatch):
    """ADVICE r9: a NEGATIVE budget (typo'd env var) must not silently
    disable the soft budget — only the explicit 0 sentinel does."""
    state, cache = small_state
    with pytest.raises(ValueError, match=">= 0"):
        audit_partition_budget(state.df, cache.num_attributes, budget_bytes=-1)
    monkeypatch.setenv("DBLINK_PARTITION_BUDGET_MB", "-2048")
    with pytest.raises(ValueError, match=">= 0"):
        audit_partition_budget(state.df, cache.num_attributes)
