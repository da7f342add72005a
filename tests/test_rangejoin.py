"""Unit tests for the banded range join (bucket-blocked inequality join)."""

from __future__ import annotations

import pytest

from dblink_spark.operators.rangejoin import band_join


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 1000), (3, "u2", 100)],
        "id: long, user: string, t: long",
    )
    right = spark.createDataFrame(
        [(11, "u1", 95), (12, "u1", 160), (13, "u1", 994), (14, "u2", 300), (15, "u3", 100)],
        "id: long, user: string, t: long",
    )
    return left, right


def _pairs(df):
    return {(r["l_id"], r["r_id"]) for r in df.collect()}


class TestBandJoin:
    def test_within_band_only(self, tables):
        left, right = tables
        got = _pairs(band_join(left, right, on="t", by="user", delta=10))
        assert got == {(1, 11), (2, 13)}  # |100-95|<=10, |1000-994|<=10

    def test_band_boundary_inclusive(self, tables):
        left, right = tables
        got = _pairs(band_join(left, right, on="t", by="user", delta=60))
        assert (1, 12) in got  # |100-160| == 60 exactly

    def test_key_blocking(self, tables):
        left, right = tables
        # u2's 100 vs u3's 100 must NOT pair (different key)
        got = _pairs(band_join(left, right, on="t", by="user", delta=1000))
        assert (3, 15) not in got
        assert (3, 14) in got

    def test_cross_bucket_pairs_found(self, spark):
        """A pair straddling a bucket boundary (b vs b+1) must be found —
        the ±1 bucket expansion."""
        left = spark.createDataFrame([(1, "u", 99)], "id: long, user: string, t: long")
        right = spark.createDataFrame([(2, "u", 101)], "id: long, user: string, t: long")
        got = _pairs(band_join(left, right, on="t", by="user", delta=100))
        assert got == {(1, 2)}

    def test_negative_keys_floor_bucketing(self, spark):
        """Bucketing must floor, not truncate toward zero: -5 and 5 are in
        adjacent buckets for delta=10 and must still pair."""
        left = spark.createDataFrame([(1, "u", -5)], "id: long, user: string, t: long")
        right = spark.createDataFrame([(2, "u", 5)], "id: long, user: string, t: long")
        got = _pairs(band_join(left, right, on="t", by="user", delta=10))
        assert got == {(1, 2)}

    def test_bad_delta(self, tables):
        left, right = tables
        with pytest.raises(ValueError):
            band_join(left, right, on="t", by="user", delta=0)

    def test_matches_naive_inequality_join(self, spark):
        """Property check vs the naive formulation on random data."""
        import random

        rnd = random.Random(0)
        lrows = [(i, f"u{rnd.randint(0, 3)}", rnd.randint(0, 500)) for i in range(60)]
        rrows = [(i, f"u{rnd.randint(0, 3)}", rnd.randint(0, 500)) for i in range(60)]
        left = spark.createDataFrame(lrows, "id: long, user: string, t: long")
        right = spark.createDataFrame(rrows, "id: long, user: string, t: long")
        got = _pairs(band_join(left, right, on="t", by="user", delta=37))
        expect = {
            (li, ri)
            for (li, lu, lt) in lrows
            for (ri, ru, rt) in rrows
            if lu == ru and abs(lt - rt) <= 37
        }
        assert got == expect
