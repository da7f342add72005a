"""Column-function library — the engine's `pyspark.sql.functions`-style
public surface. Everything here returns a Catalyst ``Column`` (JVM-side,
codegen-friendly); nothing is a Python UDF.

Similarity functions mirror the reference's two built-ins
(`SimilarityFn.scala:49-106`) and are re-exported from
:mod:`dblink_spark.er.attributes`, which owns the dual Column/scalar forms.
"""

from dblink_spark.er.attributes import (  # noqa: F401
    ConstantSim,
    LevenshteinSim,
)
from dblink_spark.functions.text import (  # noqa: F401
    minhash_signature,
    prefix_fingerprint,
    simhash,
    tokenize,
    word_shingles,
)
from dblink_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    quantized_dot,
)


def levenshtein_similarity(a, b, threshold: float = 5.0, max_similarity: float = 10.0):
    """Truncated, rescaled normalized-Levenshtein similarity column
    (ref: SimilarityFn.scala:61-106): ``max(0, f·(M·unit − t))`` with
    ``f = M/(M−t)`` and Yujian–Bo unit similarity ``1 − 2d/(|a|+|b|+d)``."""
    return LevenshteinSim(threshold, max_similarity).column(a, b)


def constant_similarity():
    """sim ≡ 0 — the frequency-only distortion model
    (ref: SimilarityFn.scala:49-59)."""
    return ConstantSim().column(None, None)
