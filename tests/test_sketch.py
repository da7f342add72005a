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
            sketch.get((i, ((a * uid + b) % _CMS_P) % _CMS_W), 0)
            for i, (a, b) in enumerate(_CMS_ROWS)
        )
        assert est >= true_cnt, (uid, est, true_cnt)
        overest += est - true_cnt
    # with ~hundreds of keys in 4x256 cells, collisions are rare: the mean
    # overestimate stays small relative to total mass
    assert overest / max(sum(truth.values()), 1) < 0.5
