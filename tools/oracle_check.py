"""Local twin of the driver's duckdb-oracle correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, schema, and exact values
(order-insensitive). Stricter than the driver's value-hash: floats must match
bit-for-bit, so if this passes, any reasonable hash matches.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

# runnable as `python tools/oracle_check.py` from anywhere: the repo root
# (not tools/) must be importable for dblink_spark
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    s = normalize(sdf)
    o = normalize(odf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c].to_numpy(), o[c].to_numpy()
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                svf = sv.astype("float64")
                ovf = ov.astype("float64")
                eq = (svf == ovf) | (pd.isna(svf) & pd.isna(ovf))
                if not eq.all():
                    bad = int((~eq).sum())
                    maxd = np.nanmax(np.abs(svf - ovf))
                    problems.append(f"col {c}: {bad} mismatches, max abs diff {maxd:.3e}")
            else:
                eq = (sv == ov) | (pd.isna(pd.Series(sv)) & pd.isna(pd.Series(ov))).to_numpy()
                if not eq.all():
                    idx = int(np.argmax(~eq))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} mismatches, first at row {idx}: "
                        f"spark={sv[idx]!r} oracle={ov[idx]!r}"
                    )
    # dtype-level schema check (informational strictness)
    for c in s_cols:
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if sk != ok and {sk, ok} != {"i", "f"}:
            problems.append(f"col {c}: dtype kind spark={sdf[c].dtype} oracle={odf[c].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from dblink_spark.queries import REGISTRY
    from dblink_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            from dblink_spark.queries import materialized

            # materialize-and-release scope: owned caches can't leak in
            # this long-lived session
            with materialized(q.fn(spark, sf_dir)) as df:
                sdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"pass* {name}: rows={len(sdf)} (no oracle, rows-only) [{t_spark:.1f}s]")
            if len(sdf) == 0:
                print(f"WARN  {name}: empty result")
            continue
        t0 = time.time()
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        t_duck = time.time() - t0
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: rows={len(sdf)} [{t_spark:.1f}s/{t_duck:.1f}s]")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"PASS  {name}: rows={len(sdf)} [{t_spark:.1f}s/{t_duck:.1f}s]")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
