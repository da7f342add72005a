"""Every registered query with an oracle must match DuckDB exactly at sf0.001.

This is the local twin of the driver's t2 correctness gate (which runs at
sf0.01); see tools/oracle_check.py for the comparison semantics.
"""

from __future__ import annotations

import duckdb
import pytest

from dblink_spark.queries import REGISTRY

from tools.oracle_check import compare

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check, mirrors driver behavior
        return
    odf = duck.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
    assert len(sdf) > 0, f"{name}: empty result proves nothing"
