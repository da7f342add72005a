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


class TestLshBandWidth:
    """`embedding_near_dups` must accept any band spec (the width knob that
    keeps hyperplane banding viable as the corpus grows) and stay SOUND:
    every emitted pair really has cosine >= threshold, at every width."""

    SF = "/root/testdata/sf0.001"

    def _brute_cosines(self, spark):
        import numpy as np

        rows = (
            spark.read.parquet(f"{self.SF}/embeddings.parquet")
            .select("vec_id", "embedding")
            .collect()
        )
        vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
        return vecs

    def test_two_widths_sound_and_equijoin(self, spark):
        import numpy as np

        from dblink_spark.plans.audit import formatted_plan
        from dblink_spark.queries.vectors import (
            bits_for_corpus,
            embedding_near_dups,
            make_lsh_bands,
        )

        e = spark.read.parquet(f"{self.SF}/embeddings.parquet")
        vecs = self._brute_cosines(spark)
        for bits in (4, 6):
            bands = make_lsh_bands(n_bands=3, bits_per_band=bits, dim=64, seed=11)
            assert all(len(b) == bits for b in bands)
            df = embedding_near_dups(e, bands=bands, threshold=0.35)
            plan = formatted_plan(df)
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
            got = df.collect()
            assert got, f"width {bits}: no candidate pairs at all"
            for r in got:
                a, b = vecs[r["v1"]], vecs[r["v2"]]
                true_cos = float(
                    a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
                )
                assert true_cos >= 0.35 - 1e-6, (bits, r, true_cos)

    def test_bits_for_corpus_scales_logarithmically(self):
        from dblink_spark.queries.vectors import bits_for_corpus

        assert bits_for_corpus(1_000, target_bucket=64) == 4
        assert bits_for_corpus(1_000_000, target_bucket=64) == 14
        assert bits_for_corpus(100, target_bucket=64) == 2  # floor
        # doubling the corpus adds one bit: join cost stays ~N * bucket
        assert (
            bits_for_corpus(2_000_000, target_bucket=64)
            == bits_for_corpus(1_000_000, target_bucket=64) + 1
        )
