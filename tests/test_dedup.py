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


class TestHotBucketCap:
    """VERDICT r9 task 1: LSH band joins must survive degenerate corpora.
    A bucket of n identical docs emits C(n,2) candidates uncapped — 5e9
    pairs from one 100k-doc bucket. Above HOT_BUCKET_CAP the bucket emits
    star pairs (rep x member): linear, and the production decision
    (rep_doc / connected components) is preserved because every member of
    an identical-doc clique verifies against the representative."""

    def _identical_corpus(self, spark, n: int, text: str = None, start: int = 0):
        text = text or " ".join(f"tok{j}" for j in range(30))
        return spark.createDataFrame(
            [(start + i, text) for i in range(n)], "doc_id long, text string"
        )

    def test_cap_bounds_identical_doc_clique(self, spark):
        from dblink_spark.queries.dedup import (
            capped_band_candidates,
            capped_bucket_count,
            minhash_bands,
            minhash_signatures,
        )

        n = 3000
        d = self._identical_corpus(spark, n)
        bands = minhash_bands(minhash_signatures(d))
        # all 4 band keys are shared by every doc -> 4 hot buckets
        assert capped_bucket_count(bands, cap=64) == 4
        cand = capped_band_candidates(bands, cap=64)
        rows = cand.collect()
        # star pairs: exactly n-1 candidates (identical across the 4 bands,
        # deduped), every one anchored at the clique's min doc_id — vs
        # C(3000,2) = 4.5M uncapped
        assert len(rows) == n - 1
        assert all(r.doc1 == 0 for r in rows)
        assert {r.doc2 for r in rows} == set(range(1, n))

    def test_cap_preserves_rep_through_verify(self, spark):
        """The star pairs must survive the exact-Jaccard verify (identical
        docs: jaccard 1.0), so each member's rep_doc equals the clique
        minimum — the same decision the uncapped all-pairs path yields."""
        from dblink_spark.queries.dedup import (
            capped_band_candidates,
            minhash_bands,
            minhash_signatures,
        )

        d = self._identical_corpus(spark, 500)
        sigs = minhash_signatures(d)
        cand = capped_band_candidates(minhash_bands(sigs), cap=16)
        s1 = sigs.select(
            F.col("doc_id").alias("doc1"), F.col("toks").alias("t1"), F.col("n_tok").alias("n1")
        )
        s2 = sigs.select(
            F.col("doc_id").alias("doc2"), F.col("toks").alias("t2"), F.col("n_tok").alias("n2")
        )
        ni = F.size(F.array_intersect("t1", "t2"))
        verified = (
            cand.join(s1, "doc1").join(s2, "doc2")
            .filter(ni.cast("double") / (F.col("n1") + F.col("n2") - ni) >= 0.8)
        )
        reps = verified.groupBy("doc2").agg(F.min("doc1").alias("rep"))
        got = {r.doc2: r.rep for r in reps.collect()}
        assert got == {i: 0 for i in range(1, 500)}

    def test_cap_never_fires_on_gate_corpora(self, spark):
        """The default threshold must be invisible on the registered
        fixtures (hash gates are bit-exact only if the cap is a no-op
        there). Measured max occupancy: 245 at sf0.01, 2335 at sf0.1."""
        from dblink_spark.queries.dedup import (
            HOT_BUCKET_CAP,
            capped_bucket_count,
            minhash_bands,
            minhash_signatures,
        )

        for sf in ("sf0.01", "sf0.1"):
            d = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
            bands = minhash_bands(minhash_signatures(d))
            assert capped_bucket_count(bands, HOT_BUCKET_CAP) == 0, sf

    def test_incremental_cap_bounds_old_side_fanout(self, spark):
        """A new doc landing in a hot OLD bucket pairs with the bucket
        representative only — per-new-doc fan-out is bounded by 4*cap, not
        by the old bucket's population."""
        from dblink_spark.queries.dedup import (
            capped_incremental_candidates,
            minhash_bands,
            minhash_signatures,
        )

        old = self._identical_corpus(spark, 2000, start=1000)
        new = self._identical_corpus(spark, 10, start=0)
        bands_old = minhash_bands(minhash_signatures(old))
        bands_new = minhash_bands(minhash_signatures(new))
        cand = capped_incremental_candidates(bands_new, bands_old, cap=64)
        rows = cand.collect()
        # each of the 10 new docs -> exactly ONE candidate (the old rep)
        assert len(rows) == 10
        assert all(r.old_id == 1000 for r in rows)
        assert {r.new_id for r in rows} == set(range(10))


class TestBottomkComponentsContraction:
    """`bottomk_components` (r16) must be VALUE-IDENTICAL to the
    uncontracted composition `connected_components(bottomk_sketch_pairs)`
    — the contraction is a plan-shape optimization, and these corpora are
    built to hit every seam of the equivalence argument: identical-sketch
    groups with and without cross-group links, unpaired singletons,
    subset sketches (same prefix, jac < 1), NULL-lang docs (never
    pairable under SQL null semantics, must not self-group), and
    cross-lang identical text (blocked)."""

    CORPUS = [
        # clique of 3 identical docs (identical sketches)
        ("a1", "en", "alpha beta gamma delta"),
        ("a2", "en", "delta gamma beta alpha"),
        ("a3", "en", "alpha beta beta gamma delta delta"),
        # pair of identical docs, isolated group (no cross links)
        ("b1", "en", "epsilon zeta eta theta"),
        ("b2", "en", "theta eta zeta epsilon"),
        # near-dup ladder (non-identical sketches, linked at low t only)
        ("c1", "en", "t0 t1 t2 t3 t4 t5 t6 t7"),
        ("c2", "en", "t0 t1 t2 t3 t4 t5 x1 x2"),
        ("c3", "en", "t0 t1 t2 t3 x1 x2 x3 x4"),
        # singleton, never pairs
        ("s1", "en", "unique words only here truly"),
        # NULL lang: identical text, must NOT pair or group
        ("n1", None, "omega psi chi phi"),
        ("n2", None, "omega psi chi phi"),
        # same text as the a-clique but different lang: blocked
        ("x1", "fr", "alpha beta gamma delta"),
        ("x2", "fr", "delta gamma beta alpha"),
    ]

    def _both(self, spark, k, t):
        from dblink_spark.operators.components import connected_components
        from dblink_spark.queries import release_caches
        from dblink_spark.queries.dedup import (
            bottomk_components,
            bottomk_sketch_pairs,
        )

        d = spark.createDataFrame(
            self.CORPUS, "doc_id string, lang string, text string"
        )
        pairs = bottomk_sketch_pairs(d, k=k, threshold=t)
        old = {
            (r["node"], r["component"])
            for r in connected_components(pairs, "doc1", "doc2").collect()
        }
        release_caches(pairs)
        new = {
            (r["node"], r["component"])
            for r in bottomk_components(d, k=k, threshold=t).collect()
        }
        return old, new

    def test_exact_dup_point(self, spark):
        old, new = self._both(spark, 8, 0.99)
        assert new == old
        # the a-clique and b-pair survive; NULL-lang twins must be absent
        nodes = {n for n, _ in new}
        assert {"a1", "a2", "a3", "b1", "b2", "x1", "x2"} <= nodes
        assert not nodes & {"n1", "n2", "s1"}

    def test_low_threshold_cross_group_links(self, spark):
        old, new = self._both(spark, 8, 0.4)
        assert new == old
        # the c-ladder links through c2 at this t: one component
        comp = {n: c for n, c in new}
        assert comp["c1"] == comp["c2"] == comp["c3"] == "c1"

    def test_handoff_configuration(self, spark):
        old, new = self._both(spark, 64, 0.3)
        assert new == old


class TestSimhashContraction:
    """`dedup_simhash` (r16) runs its banded join over DISTINCT
    (lang, simhash) groups and expands the per-doc rollup arithmetically;
    it must be value-identical to the doc-level pair formulation. The
    reference here is an INDEPENDENT pure-Python replay of the spec
    (md5 low-32 bit votes, pairwise Hamming <= 1 within lang), so the
    contraction arithmetic — (gsize - 1) + adjacent sizes, rep vs
    second-min partner, singleton groups, NULL-lang exclusion — is
    checked against brute force, not against another Spark plan.

    The corpus is deterministic: single-token docs have fp = md5_low16,
    and ("w4", "w64") differ in exactly one bit (18962 vs 19090), so the
    cross-group Hamming-1 adjacency path is guaranteed to be exercised,
    in both directions, including a singleton group adjacent to a clique.
    """

    def _corpus(self):
        rows = [
            # 3-doc identical-fp clique (same token, one group)
            (1, "en", "w4"),
            (2, "en", "w4"),
            (3, "en", "w4"),
            # hamming-1 neighbors of the clique: a 2-doc group
            (4, "en", "w64"),
            (5, "en", "w64"),
            # same tokens, other lang: blocked from the en groups
            (6, "fr", "w4"),
            (7, "fr", "w64"),
            # NULL lang twins: must never pair or group
            (8, None, "w4"),
            (9, None, "w4"),
            # multi-token docs: identical distinct-token sets -> same fp
            (10, "en", "alpha beta gamma"),
            (11, "en", "gamma beta alpha alpha"),
            # isolated singleton (whatever its fp, reference decides)
            (12, "en", "w212"),
        ]
        return rows

    @staticmethod
    def _fp(text: str) -> int:
        toks = list(dict.fromkeys(text.split(" ")))
        votes = [0] * 16
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for i in range(16):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(16) if votes[i] > 0)

    def _reference(self, rows):
        fps = {d: (lang, self._fp(text)) for d, lang, text in rows}
        out = {}
        for d1, (l1, f1) in fps.items():
            partners = [
                d2
                for d2, (l2, f2) in fps.items()
                if d2 != d1 and l1 is not None and l1 == l2
                and bin(f1 ^ f2).count("1") <= 1
            ]
            if partners:
                out[d1] = (len(partners), min(partners))
        return out

    def test_matches_bruteforce(self, spark):
        from dblink_spark.queries import REGISTRY, release_caches
        import os, tempfile

        rows = self._corpus()
        ref = self._reference(rows)
        # coverage sanity: the corpus really exercises cross-group
        # adjacency (clique <-> pair in en) and in-group partners
        assert ref[1] == (4, 2)   # 2 clique peers + the 2-doc w64 group
        assert ref[4] == (4, 1)   # its group peer + the 3-doc clique
        assert 8 not in ref and 9 not in ref  # NULL lang excluded
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(d, lang, t, None, None) for d, lang, t in rows],
                "doc_id bigint, lang string, text string, "
                "source string, url string",
            ).write.parquet(os.path.join(td, "documents.parquet"))
            df = REGISTRY["dedup_simhash"].fn(spark, td)
            got = {
                r["doc_id"]: (r["n_near_dups"], r["min_partner"])
                for r in df.collect()
            }
            release_caches(df)
        assert got == ref

