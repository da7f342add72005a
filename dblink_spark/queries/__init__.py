"""Declared query inventory: name -> (spark callable, duckdb oracle SQL).

Every operator claimed as implemented in SURVEY.md §2 gets an entry here;
``__spark_entry__.py`` re-exports this registry for the driver's
correctness gate (duckdb oracle hash-match at sf0.01).

Exact-match discipline
----------------------
The driver compares row count + schema + an order-insensitive value hash, so
Spark and DuckDB must produce *bit-identical* values:

- Monetary/quantity aggregates go through ``DECIMAL`` so summation is exact
  and associative (float sums depend on accumulation order, which differs
  between engines). Final values are cast back to ``DOUBLE``.
- Averages are computed as ``double(exact_decimal_sum) / count`` — a single
  IEEE division on identical inputs is identical.
- Hash-like values use md5 hex strings (both engines agree), never engine
  hash() builtins.
- Collected sets are sorted arrays.
- Counts are cast to BIGINT in the oracle (DuckDB widens SUM(int) to
  HUGEINT otherwise).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check
    survey_ref: str = ""  # e.g. "SURVEY §2.7 G1"
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, survey_ref: str = "", doc: str = ""
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table (projection/predicates push down)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Importing the modules populates REGISTRY.
from dblink_spark.queries import tpch  # noqa: E402,F401
from dblink_spark.queries import er_analysis  # noqa: E402,F401
from dblink_spark.queries import dedup  # noqa: E402,F401
from dblink_spark.queries import text  # noqa: E402,F401
from dblink_spark.queries import vectors  # noqa: E402,F401
from dblink_spark.queries import stats  # noqa: E402,F401
from dblink_spark.queries import multimodal  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
