"""Attribute specifications: similarity functions and distortion priors.

Semantics follow the reference's truncated similarity model
(ref: SimilarityFn.scala:25-106):

- ConstantSim: sim ≡ 0 (frequency-only distortion model).
- LevenshteinSim: normalized Levenshtein unit similarity (Yujian-Bo metric,
  1 - 2d/(len(a)+len(b)+d)), rescaled by
  max(0, transFactor*(maxSimilarity*unit - threshold)) with
  transFactor = maxSimilarity/(maxSimilarity - threshold).

Both a Spark Column form (used to build the domain similarity index as a
Catalyst-planned join, JVM-side levenshtein) and a plain-Python form (used
only in unit tests) are provided.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column


@dataclass(frozen=True)
class BetaParams:
    """Beta distortion prior shape parameters (ref: package.scala:166-170)."""

    alpha: float
    beta: float

    def __post_init__(self):
        if self.alpha <= 0 or self.beta <= 0:
            raise ValueError("Beta shape parameters must be positive")

    @property
    def mean(self) -> float:
        return self.alpha / (self.alpha + self.beta)


class SimilarityFn:
    """Base: a truncated attribute similarity function."""

    is_constant: bool = False
    threshold: float = 0.0
    max_similarity: float = 0.0

    def column(self, a: Column, b: Column) -> Column:
        """Truncated similarity as a Spark Column expression."""
        raise NotImplementedError

    def similarity(self, a: str, b: str) -> float:
        """Plain-Python twin of `column` (tests / tiny domains)."""
        raise NotImplementedError

    def unit_upper_bound_column(self, len_a: Column, len_b: Column) -> Column:
        """Upper bound on unit similarity given only lengths — used to prune
        the domain cross-join before computing the edit distance."""
        raise NotImplementedError


@dataclass(frozen=True)
class ConstantSim(SimilarityFn):
    is_constant: bool = field(default=True, init=False)
    threshold: float = field(default=0.0, init=False)
    max_similarity: float = field(default=0.0, init=False)

    def column(self, a: Column, b: Column) -> Column:
        return F.lit(0.0)

    def similarity(self, a: str, b: str) -> float:
        return 0.0


@dataclass(frozen=True)
class LevenshteinSim(SimilarityFn):
    threshold: float = 7.0
    max_similarity: float = 10.0
    is_constant: bool = field(default=False, init=False)

    def __post_init__(self):
        if self.max_similarity <= 0:
            raise ValueError("max_similarity must be positive")
        if not (0 <= self.threshold < self.max_similarity):
            raise ValueError("threshold must be in [0, max_similarity)")

    @property
    def trans_factor(self) -> float:
        return self.max_similarity / (self.max_similarity - self.threshold)

    def column(self, a: Column, b: Column) -> Column:
        total = F.length(a) + F.length(b)
        d = F.levenshtein(a, b).cast("double")
        unit = F.when(total > 0, 1.0 - 2.0 * d / (total + d)).otherwise(F.lit(1.0))
        trans = self.trans_factor * (self.max_similarity * unit - self.threshold)
        return F.greatest(trans, F.lit(0.0))

    def similarity(self, a: str, b: str) -> float:
        total = len(a) + len(b)
        if total > 0:
            d = float(_levenshtein(a, b))
            unit = 1.0 - 2.0 * d / (total + d)
        else:
            unit = 1.0
        trans = self.trans_factor * (self.max_similarity * unit - self.threshold)
        return trans if trans > 0.0 else 0.0

    def unit_upper_bound_column(self, len_a: Column, len_b: Column) -> Column:
        # d >= |len(a)-len(b)|, and unit similarity is decreasing in d
        gap = F.abs(len_a - len_b).cast("double")
        total = (len_a + len_b).cast("double")
        return F.when(total > 0, 1.0 - 2.0 * gap / (total + gap)).otherwise(F.lit(1.0))


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


SIMILARITY_FNS = {
    "ConstantSimilarityFn": ConstantSim,
    "LevenshteinSimilarityFn": LevenshteinSim,
}


@dataclass(frozen=True)
class Attribute:
    """Matching-attribute spec (ref: package.scala:128-141)."""

    name: str
    sim_fn: SimilarityFn
    distortion_prior: BetaParams
