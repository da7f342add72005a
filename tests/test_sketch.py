"""Count-min sketch property test: estimates (min over hash rows) must
upper-bound true frequencies — the CMS guarantee — and be tight for heavy
hitters at this fixture scale."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_cms_estimates_upper_bound_truth(spark):
    from dblink_spark.queries.stats import _CMS_P, _CMS_ROWS, _CMS_W, sketch_count_min

    sketch = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in sketch_count_min(spark, SF).collect()
    }
    truth = {
        r["user_id"]: r["cnt"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    overest = 0
    for uid, true_cnt in truth.items():
        est = min(
            sketch.get((i, ((a * (uid % _CMS_P) + b) % _CMS_P) % _CMS_W), 0)
            for i, (a, b) in enumerate(_CMS_ROWS)
        )
        assert est >= true_cnt, (uid, est, true_cnt)
        overest += est - true_cnt
    # with ~hundreds of keys in 4x256 cells, collisions are rare: the mean
    # overestimate stays small relative to total mass
    assert overest / max(sum(truth.values()), 1) < 0.5


def test_cms_hash_safe_for_extreme_ids(spark):
    """Spark and DuckDB must agree on the sketch for ids that would overflow
    int64 under a 2^61-1 modulus (Spark wraps silently, DuckDB raises) and
    for negative ids (sign of %). The pmod-reduce-first formulation keeps
    every intermediate inside int64 and non-negative in both engines."""
    import duckdb

    from dblink_spark.queries.stats import _CMS_P, _CMS_ROWS, _CMS_W

    ids = [2**63 - 1, -(2**63), -1, 0, 9_300_000_000, -9_300_000_000, 42]
    sdf = spark.createDataFrame([(i,) for i in ids], "user_id bigint")
    cells = sdf.select(
        *[
            F.pmod(
                F.pmod(
                    F.lit(a) * F.pmod(F.col("user_id"), F.lit(_CMS_P)) + F.lit(b),
                    F.lit(_CMS_P),
                ),
                F.lit(_CMS_W),
            )
            .cast("int")
            .alias(f"c{i}")
            for i, (a, b) in enumerate(_CMS_ROWS)
        ]
    ).collect()
    con = duckdb.connect()
    for row, uid in zip(cells, ids):
        for i, (a, b) in enumerate(_CMS_ROWS):
            duck = con.execute(
                f"SELECT CAST(((CAST({a} AS BIGINT) * (((CAST({uid} AS BIGINT) % {_CMS_P}) + {_CMS_P}) % {_CMS_P}) + {b}) "
                f"% {_CMS_P}) % {_CMS_W} AS INT)"
            ).fetchone()[0]
            assert row[f"c{i}"] == duck >= 0, (uid, i, row[f"c{i}"], duck)
