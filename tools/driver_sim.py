"""Simulate the driver's verify: vanilla SparkSession, import __spark_entry__,
smoke entry(), then hash-compare queries() vs oracle_sql() at sf0.01.

Unlike the driver's own gate (observed to record only the first 50 entries
in round 4), this runs EVERY registered query and fails loudly if any entry
is missing a result — the repo's defense against silent inventory drift.
Pass ``--json PATH`` to write the per-query results in the driver's
CORRECTNESS format (committed per-round as CORRECTNESS_LOCAL_r{N}.json)."""
import hashlib
import importlib.util
import json
import sys

import duckdb
import pandas as pd
import numpy as np

SF = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# driver-style import by path, NOT from repo cwd
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver_sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke entry()
df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) >= 0

# 2. queries vs oracle
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]")
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    rows = sorted(map(repr, pdf.itertuples(index=False, name=None)))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

qs = mod.queries()
oracles = mod.oracle_sql()
results: dict[str, dict] = {}
fails = 0
from dblink_spark.queries import materialized

for name, fn in qs.items():
    try:
        # materialize-and-release scope: owned caches can't leak in this
        # long-lived session
        with materialized(fn(spark, SF)) as df:
            sdf = df.toPandas()
    except Exception as exc:  # noqa: BLE001 - record, keep going, fail at exit
        fails += 1
        results[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": None,
                         "oracle_rows": None, "err": repr(exc)}
        print(f"ERR {name}: {exc!r}")
        continue
    if name not in oracles:
        results[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": len(sdf),
                         "oracle_rows": None, "err": None}
        print(f"rows-only {name}: {len(sdf)} rows")
        continue
    odf = con.execute(oracles[name]).fetchdf()
    ok_rows = len(sdf) == len(odf)
    ok_schema = sorted(sdf.columns) == sorted(odf.columns)
    ok_hash = value_hash(sdf) == value_hash(odf)
    ok = ok_rows and ok_hash and ok_schema
    results[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                     "hash_match": ok_hash, "spark_rows": len(sdf),
                     "oracle_rows": len(odf), "err": None}
    if not ok:
        fails += 1
    print(f"{'OK ' if ok else 'BAD'} {name}: spark_rows={len(sdf)} oracle_rows={len(odf)} hash_match={ok_hash}")

# 3. inventory completeness: EVERY registered query must have produced a
# result row here — a gate that can silently shrink can silently hide a
# regression (round-4 lesson: 54 registered, 50 in the driver's file).
missing = sorted(set(qs) - set(results))
if missing:
    fails += 1
    print(f"INVENTORY DRIFT: no result for registered queries: {missing}")
if len(qs) > 50:
    beyond = list(qs)[50:]
    print(f"note: {len(qs)} registered > 50 driver-gate cap; beyond-window "
          f"(verified here, likely absent from driver file): {beyond}")

if "--json" in sys.argv:
    if sys.argv.index("--json") + 1 >= len(sys.argv):
        print("--json requires a path argument", file=sys.stderr)
        sys.exit(2)
    out = sys.argv[sys.argv.index("--json") + 1]
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out} ({len(results)} entries)")

print(f"{fails} failures")
sys.exit(1 if fails else 0)
