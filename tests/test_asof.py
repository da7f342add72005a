"""Unit tests for the as-of join operator (union+window formulation)."""

from __future__ import annotations

import pytest

from dblink_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 205),
            (3, "u1", 300),
            (4, "u2", 50),
            (5, "u3", 999),
        ],
        "event_id: long, user: string, t: long",
    )
    right = spark.createDataFrame(
        [
            ("u1", 100, 10.0),  # equal-timestamp: inclusive match for event 1
            ("u1", 200, 20.0),
            ("u1", 400, 40.0),
            ("u2", 60, 60.0),   # after u2's only left row
        ],
        "user: string, t: long, v: double",
    )
    return left, right


def _rows(df):
    return {r["event_id"]: r for r in df.collect()}


class TestAsofJoin:
    def test_latest_at_or_before(self, tables):
        left, right = tables
        out = _rows(asof_join(left, right, on="t", by="user", value_cols=["v"]))
        assert out[2]["v_asof"] == 20.0 and out[2]["t_asof"] == 200
        assert out[3]["v_asof"] == 20.0  # 400 is in the future

    def test_equal_timestamp_inclusive(self, tables):
        left, right = tables
        out = _rows(asof_join(left, right, on="t", by="user", value_cols=["v"]))
        assert out[1]["v_asof"] == 10.0 and out[1]["t_asof"] == 100

    def test_no_match_yields_null(self, tables):
        left, right = tables
        out = _rows(asof_join(left, right, on="t", by="user", value_cols=["v"]))
        assert out[4]["v_asof"] is None and out[4]["t_asof"] is None  # only future
        assert out[5]["v_asof"] is None  # u3 has no right rows

    def test_all_left_rows_preserved(self, tables):
        left, right = tables
        out = asof_join(left, right, on="t", by="user", value_cols=["v"])
        assert out.count() == left.count()
        assert set(out.columns) == {"event_id", "user", "t", "v_asof", "t_asof"}

    def test_null_payload_does_not_break_atomicity(self, spark):
        """A right row whose payload is NULL must still win as the latest
        match — per-column carry would fall through to an older row."""
        left = spark.createDataFrame([(1, "u", 100)], "event_id: long, user: string, t: long")
        right = spark.createDataFrame(
            [("u", 10, 5.0), ("u", 90, None)], "user: string, t: long, v: double"
        )
        out = _rows(asof_join(left, right, on="t", by="user", value_cols=["v"]))
        assert out[1]["t_asof"] == 90
        assert out[1]["v_asof"] is None

    def test_single_shuffle_plan(self, tables):
        from dblink_spark.plans.audit import audit_plan

        left, right = tables
        a = audit_plan(asof_join(left, right, on="t", by="user", value_cols=["v"]))
        assert a.exchanges == 1, "as-of join must cost exactly one shuffle"
        assert a.python_ops == 0
