"""Simulate the driver's verify: vanilla SparkSession, import __spark_entry__,
smoke entry(), then hash-compare queries() vs oracle_sql() at sf0.01."""
import hashlib
import importlib.util
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
fails = 0
for name, fn in qs.items():
    sdf = fn(spark, SF).toPandas()
    if name not in oracles:
        print(f"rows-only {name}: {len(sdf)} rows")
        continue
    odf = con.execute(oracles[name]).fetchdf()
    ok_rows = len(sdf) == len(odf)
    ok_hash = value_hash(sdf) == value_hash(odf)
    status = "OK " if (ok_rows and ok_hash) else "BAD"
    if not (ok_rows and ok_hash):
        fails += 1
    print(f"{status} {name}: spark_rows={len(sdf)} oracle_rows={len(odf)} hash_match={ok_hash}")
print(f"{fails} failures")
sys.exit(1 if fails else 0)
