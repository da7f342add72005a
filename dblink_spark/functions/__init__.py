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


def eval_once(col):
    """Pushdown barrier for an EXPENSIVE non-negative double Column that a
    downstream ``.filter`` would otherwise duplicate (r16, guide §4.4: the
    optimizer pushes a filter on a computed column below the projection
    and evaluates the expression once in the pushed filter and again in
    the projection — for interpreted higher-order folds like
    `quantized_dot` / `array_intersect` sizes that doubles the dominant
    per-candidate CPU; measured 2.30s → 1.53s on
    dedup_embedding_cosine_scaled's verify stage).

    Mechanism: ``col + 0.0 * rand(7)`` — the added term is EXACTLY +0.0
    for every draw (rand ∈ [0, 1), and 0.0 * x == +0.0 for all finite x),
    and ``x + 0.0 == x`` bit-for-bit for every double except -0.0, so the
    VALUE is untouched for the non-negative columns this is documented
    for (similarities, Jaccards, guarded cosines — all either integer-
    derived or CASE-guarded, never -0.0). The nondeterministic marker is
    what blocks the optimizer from duplicating or reordering past it —
    the same rule as `udf.asNondeterministic` in the guide; task retries
    are safe because the term is value-erased before it can differ.

    Use ONLY on a column that (a) is about to be filtered on, (b) is
    expensive to evaluate, and (c) can never be negative zero."""
    from pyspark.sql import functions as F

    return col + F.lit(0.0) * F.rand(7)
