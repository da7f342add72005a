"""Scale-shape tests for the dedup family beyond the oracle gates: the
prefix filter must keep a ubiquitous token from turning the bottom-k sketch
join quadratic, without losing any true near-dup pair."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from dblink_spark.queries.dedup import (
    bottomk_prefix,
    bottomk_sketch_pairs,
    bottomk_sketches,
)


def _shared_token() -> str:
    """A token whose md5 ranks high, so it is (deterministically) never a
    doc's KMV minimum in the corpus below — the worst case for the OLD
    full-sketch join (it lands in most docs' bottom-8) and the best
    demonstration that the prefix join ignores it."""
    return max((f"w{i}" for i in range(64)), key=lambda t: hashlib.md5(t.encode()).hexdigest())


def test_bottomk_prefix_bounds_hot_key(spark):
    """300 docs all share one token: the old (h, lang) join had a posting
    list of ~300 on that hash → ~45k candidate rows from one key. The
    prefix join only collides docs on their sketch MINIMUM, which is a
    per-doc unique token here — candidates stay linear, and the two real
    duplicates are still found with jaccard 1.0."""
    shared = _shared_token()
    n = 300
    rows = [
        (f"d{i:04d}", "en", " ".join([f"u{i}_{j}" for j in range(8)] + [shared]))
        for i in range(n)
    ]
    rows.append(("dup_a", "en", "alpha beta gamma delta"))
    rows.append(("dup_b", "en", "delta gamma beta alpha"))
    d = spark.createDataFrame(rows, "doc_id string, lang string, text string")

    docs = bottomk_sketches(d, 8)
    pre = bottomk_prefix(docs, 0.99)
    a, b = pre.alias("a"), pre.alias("b")
    n_cand = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    assert n_cand <= n // 10, f"hot key leaked into candidates: {n_cand}"

    out = bottomk_sketch_pairs(d, 8, 0.99).collect()
    assert {(r.doc1, r.doc2) for r in out} == {("dup_a", "dup_b")}
    assert out[0].sketch_jaccard == 1.0


def test_bottomk_prefix_length_general_threshold(spark):
    """At t=0.5 with k=8 the per-doc prefix is k - ceil(t*k) + 1 = 5 hashes;
    a pair sharing 6 of 8 hashes (jac 6/10 >= 0.5) must survive the prefix
    filter and verify exactly."""
    base = [f"t{j}" for j in range(8)]
    other = base[:6] + ["x1", "x2"]
    d = spark.createDataFrame(
        [("a", "en", " ".join(base)), ("b", "en", " ".join(other))],
        "doc_id string, lang string, text string",
    )
    out = bottomk_sketch_pairs(d, 8, 0.5).collect()
    assert len(out) == 1
    assert abs(out[0].sketch_jaccard - 0.6) < 1e-12
