"""Capture .explain("formatted") for named registered queries into
plans/$CAPTURE_PLANS_ROUND/<query>_<tag>.txt (default r17;
optimization-round evidence artifacts).

Usage: python tools/capture_plans.py <tag> <query> [query ...]
       python tools/capture_plans.py <tag> --top   # the round's touched set

The formatted plan is taken from the UNEXECUTED frame (AdaptiveSparkPlan
initial plan) — deterministic, and the Exchange/join/pushdown shape the
optimization claims are about is all visible there.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP = [
    "dedup_components",
    "dedup_survivors",
    "dedup_neardup_handoff",
    "dedup_bottomk_jaccard",
    "q_docs_dedup_bias_audit",
    "pipeline_corpus_prep",
    "dedup_semantic",
    "ann_ivf_trained",
    "q_docs_source_overlap",
    "dedup_embedding_cosine_scaled",
    "dedup_simhash",
    "text_tfidf_topk",
    "q_docs_ccnet_bucket",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--top"]:
        names = TOP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dblink_spark.queries import REGISTRY, materialized
    from dblink_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("CAPTURE_PLANS_ROUND", "r17")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        with materialized(REGISTRY[name].fn(spark, sf_dir)) as df:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            if os.environ.get("CAPTURE_PLANS_EXECUTE"):
                df.count()
        print(f"wrote {path}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
