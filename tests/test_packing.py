"""Sequence packing (sharded FFD): budget respected, every chunk packed
exactly once, deterministic across partitionings, and waste bounded."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dblink_spark.operators.packing import pack_sequences
from dblink_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 256


@pytest.fixture(scope="module")
def chunks(spark):
    df = REGISTRY["text_chunk_windows"].fn(spark, SF_DIR).select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("key"), "n_tokens"
    )
    return df.localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def packed(spark, chunks):
    return pack_sequences(
        chunks, "key", "n_tokens", budget=BUDGET, n_shards=8
    ).localCheckpoint(eager=True)


def test_every_chunk_packed_exactly_once(chunks, packed):
    assert packed.count() == chunks.count()
    assert packed.select("chunk_key").distinct().count() == chunks.count()


def test_budget_respected(packed):
    over = (
        packed.groupBy("shard", "bin_idx")
        .agg(F.sum("n_tokens").alias("fill"), F.first("bin_fill").alias("bf"),
             F.count("*").alias("n"))
        .filter((F.col("fill") > BUDGET) & (F.col("n") > 1))
    )
    # only single-chunk bins may exceed the budget (oversized chunk flag)
    assert over.count() == 0


def test_bin_fill_column_is_consistent(packed):
    bad = (
        packed.groupBy("shard", "bin_idx")
        .agg(F.sum("n_tokens").alias("fill"), F.first("bin_fill").alias("bf"))
        .filter(F.col("fill") != F.col("bf"))
    )
    assert bad.count() == 0


def test_deterministic_across_partitionings(spark, chunks, packed):
    again = pack_sequences(
        chunks.repartition(13), "key", "n_tokens", budget=BUDGET, n_shards=8
    )
    a = {tuple(r) for r in packed.collect()}
    b = {tuple(r) for r in again.collect()}
    assert a == b, "packing must not depend on physical partitioning"


def test_waste_is_bounded(packed):
    """FFD waste check: total padding <= 25% of capacity on this corpus
    (loose; catches a degenerate one-chunk-per-bin regression)."""
    bins = packed.groupBy("shard", "bin_idx").agg(
        F.first("bin_fill").alias("fill")
    )
    rows = bins.collect()
    capacity = sum(min(BUDGET, r["fill"]) if r["fill"] > BUDGET else BUDGET for r in rows)
    filled = sum(min(r["fill"], BUDGET) for r in rows)
    assert filled / capacity > 0.75, f"padding waste too high: {filled}/{capacity}"


class TestFFDProperties:
    """Driver-side property tests of the pure FFD core (hypothesis)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=200)
    )
    @settings(max_examples=200, deadline=None)
    def test_first_fit_invariants(self, sizes):
        import numpy as np

        from dblink_spark.operators.packing import ffd_pack

        budget = 100
        toks = np.sort(np.array(sizes, dtype=np.int64))[::-1]
        bin_of, fills = ffd_pack(toks, budget)
        # every item placed exactly once, fills consistent
        assert len(bin_of) == len(toks)
        recomputed = np.zeros(len(fills), dtype=np.int64)
        np.add.at(recomputed, bin_of, toks)
        assert (recomputed == fills).all()
        # budget respected (max item here <= budget, so no oversize bins)
        assert (fills <= budget).all()
        # first-fit invariant: for any bin j>0, its LARGEST item (the first
        # routed there, thanks to descending order) did not fit any earlier
        # bin at the time — and fills only grow, so it does not fit now.
        largest_in = {}
        for i, b in enumerate(bin_of):
            largest_in.setdefault(int(b), int(toks[i]))  # first seen = largest
        for j in range(1, len(fills)):
            assert all(
                fills[i] + largest_in[j] > budget for i in range(j)
            ), "a bin's defining item would fit an earlier bin"

    @given(
        st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=100)
    )
    @settings(max_examples=100, deadline=None)
    def test_oversized_items_get_own_flagged_bin(self, sizes):
        import numpy as np

        from dblink_spark.operators.packing import ffd_pack

        budget = 50  # half the max size -> some items oversized
        toks = np.sort(np.array(sizes, dtype=np.int64))[::-1]
        bin_of, fills = ffd_pack(toks, budget)
        for b, fill in enumerate(fills):
            members = np.flatnonzero(bin_of == b)
            if fill > budget:
                assert len(members) == 1, "oversized bins must be singletons"
