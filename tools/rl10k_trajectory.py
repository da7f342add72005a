"""Measure the RLdata10000 linkage-quality trajectory over the full chain.

ADVICE r4 (tests/test_rldata10k_parity.py:62): the full-length run lands at
P=0.625/R=0.984 and the precision threshold was relaxed to match — is that
the converged posterior being recall-heavy, or precision genuinely decaying
with chain length (over-merging drift)? The reference implementation is
JVM/Scala+Spark-2.3-era and not runnable in this container, so this tool
answers the question from the chain itself:

  - POINT trajectory: pairwise P/R/F1 of the single-iteration clustering at
    iterations 100, 200, ..., 1000. A stationary point-P after burn-in means
    the posterior itself sits there; a monotone decay means drift.
  - sMPC trajectory: the shared-most-probable-clusters estimate computed
    from samples in (100, k] for k = 200, ..., 1000 — how the *estimator*
    the evaluate step reports moves as more samples accumulate.

Run: python tools/rl10k_trajectory.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REF_CONF = "/root/reference/examples/RLdata10000.conf"
REF_CSV = "/root/reference/examples/RLdata10000.csv"


def main() -> None:
    from dblink_spark.config import load_config
    from dblink_spark.er.chain import (
        most_probable_clusters,
        shared_most_probable_clusters,
    )
    from dblink_spark.er.metrics import evaluate_pairwise
    from dblink_spark.project import Project
    from dblink_spark.session import get_spark
    from dblink_spark.sources.chain import read_linkage_chain

    spark = get_spark("rl10k_trajectory")
    spark.sparkContext.setLogLevel("WARN")

    out_dir = tempfile.mkdtemp(prefix="rl10k_traj_")
    cfg = load_config(REF_CONF)
    d = cfg["dblink"]
    d["data"]["path"] = REF_CSV
    d["outputPath"] = out_dir + "/"
    d["checkpointPath"] = os.path.join(out_dir, "ckpt")
    project = Project.from_config(spark, cfg)
    t0 = time.time()
    res = project.run()
    print(f"# full run: {time.time() - t0:.1f}s, final {res['evaluate']}")

    truth = project.true_clusters().localCheckpoint(eager=True)
    chain = read_linkage_chain(spark, out_dir).localCheckpoint(eager=True)

    traj: dict[str, list] = {"point": [], "smpc": []}
    for k in range(100, 1001, 100):
        snap = chain.filter(F.col("iteration") == k).select(
            F.sort_array("rec_ids").alias("cluster")
        )
        m = evaluate_pairwise(snap, truth)
        traj["point"].append(
            {"iteration": k, "precision": round(m.precision, 4),
             "recall": round(m.recall, 4), "f1": round(m.f1, 4)}
        )
        print(f"# point  it={k:5d}  P={m.precision:.4f} R={m.recall:.4f} "
              f"F1={m.f1:.4f}")
    for k in range(200, 1001, 100):
        prefix = chain.filter(
            (F.col("iteration") > 100) & (F.col("iteration") <= k)
        )
        smpc = shared_most_probable_clusters(most_probable_clusters(prefix))
        m = evaluate_pairwise(smpc, truth)
        traj["smpc"].append(
            {"cutoff": k, "precision": round(m.precision, 4),
             "recall": round(m.recall, 4), "f1": round(m.f1, 4)}
        )
        print(f"# sMPC  (100,{k:5d}]  P={m.precision:.4f} R={m.recall:.4f} "
              f"F1={m.f1:.4f}")

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rl10k_trajectory.json"
    with open(out_path, "w") as f:
        json.dump({"final": res["evaluate"], "trajectory": traj}, f, indent=1)
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
