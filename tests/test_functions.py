"""Unit tests for the dblink_spark.functions column library, verified
against plain-Python computations."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from dblink_spark.functions import (
    constant_similarity,
    cosine_similarity,
    dot_product,
    l2_norm,
    levenshtein_similarity,
    minhash_signature,
    prefix_fingerprint,
    quantized_dot,
    simhash,
    tokenize,
    word_shingles,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


class TestVector:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        return spark.createDataFrame(
            [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a: array<double>, b: array<double>"
        )

    def test_dot_and_norm(self, vecs):
        r = vecs.select(
            dot_product("a", "b").alias("d"),
            l2_norm("a").alias("na"),
            cosine_similarity("a", "b").alias("c"),
        ).collect()[0]
        assert r["d"] == pytest.approx(32.0)
        assert r["na"] == pytest.approx(math.sqrt(14.0))
        assert r["c"] == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))

    def test_quantized_dot_exact(self, vecs):
        r = vecs.select(quantized_dot("a", "b").alias("q")).collect()[0]
        expect = sum(math.floor(x * y * 1e9) for x, y in [(1, 4), (2, 5), (3, 6)])
        assert r["q"] == expect


class TestSimilarity:
    def test_levenshtein_known_value(self, spark):
        """Reference golden (SimilarityFnTest.scala): sim("AB","BB") == 2.0
        with threshold 5, max 10."""
        df = spark.createDataFrame([("AB", "BB")], "a: string, b: string")
        r = df.select(levenshtein_similarity("a", "b", 5.0, 10.0).alias("s")).collect()[0]
        assert r["s"] == pytest.approx(2.0)

    def test_constant_is_zero(self, spark):
        df = spark.createDataFrame([("x", "y")], "a: string, b: string")
        assert df.select(constant_similarity().alias("s")).collect()[0]["s"] == 0.0


class TestText:
    @pytest.fixture(scope="class")
    def doc(self, spark):
        return spark.createDataFrame(
            [("the quick brown fox jumps",)], "text: string"
        )

    def test_tokenize(self, doc):
        r = doc.select(tokenize("text").alias("t")).collect()[0]
        assert r["t"] == ["the", "quick", "brown", "fox", "jumps"]

    def test_word_shingles(self, doc):
        r = doc.select(word_shingles("text", 3).alias("s")).collect()[0]
        assert r["s"] == ["the quick brown", "quick brown fox", "brown fox jumps"]

    def test_word_shingles_short_doc_empty(self, spark):
        df = spark.createDataFrame([("one two",)], "text: string")
        assert df.select(word_shingles("text", 3).alias("s")).collect()[0]["s"] == []

    def test_minhash_signature_matches_python(self, doc):
        r = doc.select(
            minhash_signature(tokenize("text"), n_hashes=4).alias("sig")
        ).collect()[0]
        toks = ["the", "quick", "brown", "fox", "jumps"]
        expect = [min(_md5(f"{i}{t}") for t in toks) for i in range(4)]
        assert list(r["sig"]) == expect

    def test_simhash_matches_python(self, doc):
        r = doc.select(simhash(tokenize("text"), bits=16).alias("fp")).collect()[0]
        toks = ["the", "quick", "brown", "fox", "jumps"]
        hs = [int(_md5(t)[:8], 16) for t in toks]
        fp = 0
        for i in range(16):
            vote = sum(1 if (h >> i) & 1 else -1 for h in hs)
            if vote > 0:
                fp |= 1 << i
        assert r["fp"] == fp

    def test_prefix_fingerprint(self, doc):
        r = doc.select(prefix_fingerprint("text", 3).alias("fp")).collect()[0]
        assert r["fp"] == _md5("the quick brown")

    def test_all_jvm_side(self, spark, doc):
        """No Python ops in any function's plan — the whole library must
        stay inside codegen."""
        from dblink_spark.plans.audit import audit_plan

        df = doc.select(
            word_shingles("text").alias("sh"),
            minhash_signature(tokenize("text"), 2).alias("mh"),
            simhash(tokenize("text"), 4).alias("sim"),
            prefix_fingerprint("text").alias("fp"),
        )
        assert audit_plan(df).python_ops == 0
