"""Bucketed co-located joins: same key + same bucket count => NO Exchange.

The assertion is on the physical plan (the thing that matters at 100 TB),
not just the result: a bucketed fact-fact join must read bucket i of both
sides into one task and merge-join without shuffling either side.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F
import pytest

from dblink_spark.operators.bucketing import read_bucketed, save_bucketed
from dblink_spark.plans.audit import audit_plan

SF_DIR = "/root/testdata/sf0.001"


@contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    users = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    save_bucketed(events, "b_events", str(d / "events"), "user_id", 8)
    save_bucketed(users, "b_users", str(d / "users"), "user_id", 8)
    yield "b_events", "b_users"
    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_users")


class TestBucketedJoin:
    def test_join_is_shuffle_free(self, spark, bucketed_tables):
        t1, t2 = bucketed_tables
        with _no_broadcast(spark):
            j = read_bucketed(spark, t1).join(read_bucketed(spark, t2), "user_id")
            a = audit_plan(j)
            assert a.exchanges == 0, "co-located bucketed join must not shuffle"
            assert a.sortmerge_joins >= 1

    def test_unbucketed_same_join_shuffles(self, spark, bucketed_tables):
        """Control: the same join through plain parquet reads (no catalog
        bucket spec) shuffles both sides — bucket metadata, not file layout,
        is what removes the Exchange."""
        t1, _ = bucketed_tables
        with _no_broadcast(spark):
            events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
                "event_id", "user_id"
            )
            users = events.groupBy("user_id").agg(F.count("*").alias("n"))
            a = audit_plan(events.join(users, "user_id"))
            assert a.exchanges >= 2

    def test_groupby_on_bucket_key_is_shuffle_free(self, spark, bucketed_tables):
        t1, _ = bucketed_tables
        a = audit_plan(
            read_bucketed(spark, t1).groupBy("user_id").agg(F.sum("value"))
        )
        assert a.exchanges == 0, "bucketing satisfies the agg's distribution"

    def test_join_result_matches_unbucketed(self, spark, bucketed_tables):
        t1, t2 = bucketed_tables
        got = (
            read_bucketed(spark, t1)
            .join(read_bucketed(spark, t2), "user_id")
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum("n_events").alias("s"),
            )
            .collect()[0]
        )
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        users = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
        exp = (
            events.join(users, "user_id")
            .groupBy()
            .agg(F.count("*").alias("n"), F.sum("n_events").alias("s"))
            .collect()[0]
        )
        assert (got["n"], got["s"]) == (exp["n"], exp["s"])
