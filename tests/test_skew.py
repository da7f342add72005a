"""Salted two-stage aggregation (operators/skew.py): exactness vs the plain
groupBy on a deliberately skewed frame, and the plan shape that makes it a
skew fix (two aggregation exchanges, partials bounded by keys x salts)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dblink_spark.operators.skew import salted_aggregate


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key owning ~95% of rows — the shape that serializes a plain
    # groupBy reducer
    hot = spark.range(9500).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("cold"), (F.col("id") % 50)).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_matches_plain_groupby_exactly(spark, skewed):
    exprs = {
        "n": ("count", F.lit(1)),
        "total": ("sum", F.col("v").cast("decimal(18,4)")),
        "lo": ("min", F.col("v")),
        "hi": ("max", F.col("v")),
    }
    got = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in salted_aggregate(skewed, ["k"], exprs, n_salts=8).collect()
    }
    expect = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,4)")).alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == expect


def test_two_stage_plan_shape(spark, skewed):
    from dblink_spark.plans.audit import exchange_count, formatted_plan

    df = salted_aggregate(
        skewed, ["k"], {"n": ("count", F.lit(1))}, n_salts=8
    )
    plan = formatted_plan(df)
    # stage 1 shuffles on (k, salt), stage 2 on k — two exchanges by design
    assert exchange_count(plan) == 2, plan


def test_rejects_non_decomposable_op(spark, skewed):
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(skewed, ["k"], {"m": ("median", F.col("v"))})


def test_salt_is_deterministic_per_row(spark, skewed):
    """Retry safety (SPARK-23207 class): the salt must be a pure function of
    row content, not of task/partition placement — a recomputed map task must
    re-derive the SAME salts. Re-evaluating the same rows under a different
    physical partitioning must yield identical stage-1 partials."""
    exprs = {"n": ("count", F.lit(1)), "total": ("sum", F.col("v"))}
    a = salted_aggregate(skewed.repartition(3), ["k"], exprs, n_salts=8)
    b = salted_aggregate(skewed.repartition(11, "v"), ["k"], exprs, n_salts=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and the plan must not carry a nondeterministic id expression
    for df in (a,):
        plan = df._jdf.queryExecution().toString()
        assert "monotonically_increasing_id" not in plan


def test_salt_col_spreads_duplicate_rows(spark):
    """With fully duplicated rows, the content-hash default collapses to one
    salt; a caller-supplied unique-id column restores the spread."""
    dup = spark.range(4000).select(
        F.col("id").alias("rid"), F.lit("hot").alias("k"), F.lit(1.0).alias("v")
    )
    out = salted_aggregate(
        dup, ["k"], {"n": ("count", F.lit(1))}, n_salts=8, salt_col="rid"
    ).collect()
    assert out == [("hot", 4000)] or (out[0]["k"], out[0]["n"]) == ("hot", 4000)


def test_default_salt_tolerates_map_columns(spark):
    """hash() rejects MapType; the default row-content salt basis must skip
    map columns instead of failing at plan time (code-review r5)."""
    from dblink_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [("a", 1, {"x": 1}), ("a", 2, {"y": 2}), ("b", 3, {"z": 3})],
        "k string, v int, m map<string,int>",
    )
    out = salted_aggregate(
        df, ["k"], {"n": ("count", "v"), "s": ("sum", "v")}, n_salts=4
    )
    rows = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    assert rows == {"a": (2, 3), "b": (1, 3)}


def test_default_salt_requires_hashable_column(spark):
    from dblink_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame([({"x": 1},)], "m map<string,int>")
    with pytest.raises(ValueError, match="salt_col"):
        salted_aggregate(df, ["m"], {"n": ("count", "m")})
