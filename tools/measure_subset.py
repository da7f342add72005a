"""Targeted best-of-3 timing of named registered queries, bench methodology
(same `_time_query` + canary bracketing as bench.py), for within-session
before/after adjudication during optimization rounds.

Usage: python tools/measure_subset.py q1 q2 ... [--reps N] [--json PATH]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import bench
    from dblink_spark.queries import REGISTRY
    from dblink_spark.session import get_spark

    unknown = [n for n in args.names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"not in REGISTRY: {unknown}")

    spark = get_spark("measure_subset")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"canary_start_sec": bench._canary(spark, warm=True)}
    print(f"# canary start {out['canary_start_sec']:.3f}s", file=sys.stderr)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    timings: dict[str, float] = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"measure: {name}")
        t0 = time.time()
        timings[name], n = bench._time_query(spark, sf_dir, name, reps=args.reps)
        print(
            f"# {name}: best {timings[name]:.3f}s ({n} rows, "
            f"{args.reps} reps, {time.time() - t0:.1f}s total)",
            file=sys.stderr,
        )
        spark.sparkContext.setJobDescription(None)
    out["queries"] = timings
    out["canary_end_sec"] = bench._canary(spark)
    out["sf_dir"] = sf_dir
    print(f"# canary end {out['canary_end_sec']:.3f}s", file=sys.stderr)
    line = json.dumps(out)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
