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

    def prune_key_column(self, value: Column) -> "Column | None":
        """Optional per-value pruning key, precomputed ONCE per side of the
        domain self-join (vs once per pair). None (default) = no key-based
        prune available for this similarity."""
        return None

    def allowed_length_bounds(self, length: Column) -> "tuple[Column, Column] | None":
        """Optional inclusive [lo, hi] partner-length range such that
        sim > 0 implies the partner's length lies inside it. When provided,
        the index build replaces the all-pairs scan with a length-bucketed
        EQUI-join (each value joins only compatible length buckets — the
        scan cost becomes proportional to emitted candidates, not |dom|^2).
        None (default) = no length-based blocking available."""
        return None

    def prune_filter_column(
        self, key_a: Column, key_b: Column, len_a: Column, len_b: Column
    ) -> "Column | None":
        """Keep-filter over a candidate pair given the two pruning keys —
        must be IMPLIED by sim > 0 (a lower-bound prune, never dropping a
        true neighbor). None when `prune_key_column` is None."""
        return None


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

    def prune_key_column(self, value: Column) -> Column:
        """64-bit character-presence bitmask (bit = codepoint mod 64; ASCII
        letters map collision-free). One edit op changes at most 2 presence
        bits (substitution), so ``d >= popcount(maskA XOR maskB) / 2`` —
        a Levenshtein LOWER bound computable per pair with two long ops.
        Hash collisions only CLEAR xor bits, i.e. weaken the bound: the
        prune stays semantics-preserving for any alphabet."""
        one = F.lit(1).cast("long")
        return F.aggregate(
            F.array_distinct(F.split(value, "")),
            F.lit(0).cast("long"),
            # call_function: the SQL shiftleft accepts a COLUMN shift amount
            # (the Python F.shiftleft wrapper pins numBits to an int literal)
            lambda acc, ch: acc.bitwiseOR(
                F.call_function("shiftleft", one, F.pmod(F.ascii(ch), F.lit(64)))
            ),
        )

    def allowed_length_bounds(self, length: Column) -> "tuple[Column, Column]":
        """sim > 0 requires unit > t (t = threshold/max_similarity), and the
        length-gap lower bound on edit distance gives
        ``1 - 2g/(total+g) > t  <=>  t*len_b < len_a < len_b/t`` (derived
        via g = |la-lb|, total = la+lb). The emitted bounds are WIDENED one
        integer on each side — ``lo = max(floor(t*L)-1, 0), hi =
        ceil(L/t)+1`` — because t is a rounded double and the exact
        strict-inequality bounds can exclude a pair whose truncated
        similarity is positive only by float epsilon (e.g. t=0.3, lengths
        10 vs 3: trans ~ 8e-17 > 0 but ceil(3/0.3)-1 = 9 < 10). A
        one-ulp-of-t error moves each boundary by < 1 length unit, so the
        +-1 widening restores 'sim > 0 implies in-bounds' for every
        representable t; the extra candidates just pay one levenshtein.
        Empty strings: total=0 defines unit=1, so L=0 must pair with L=0 —
        covered since lo=0 and hi>=1."""
        t = self.threshold / self.max_similarity
        if t <= 0.0:
            # no truncation -> every length pairs with every other; signal
            # "no blocking available" rather than an unbounded sequence
            return None
        lo = F.when(length == 0, F.lit(0)).otherwise(
            F.greatest(F.floor(length * F.lit(t)) - 1, F.lit(0)).cast("int")
        )
        hi = F.when(length == 0, F.lit(0)).otherwise(
            (F.ceil(length / F.lit(t)) + 1).cast("int")
        )
        return lo, hi

    def prune_filter_column(
        self, key_a: Column, key_b: Column, len_a: Column, len_b: Column
    ) -> Column:
        """Keep iff the BEST-CASE unit similarity given the combined
        Levenshtein lower bound ``d >= max(|len gap|, popcount(xor)/2)``
        still clears the truncation floor. Implied by sim > 0: unit
        similarity is decreasing in d and every true neighbor satisfies
        unit > threshold/max_similarity."""
        pc = F.bit_count(key_a.bitwiseXOR(key_b)).cast("double")
        gap = F.abs(len_a - len_b).cast("double")
        d_lb = F.greatest(gap, F.ceil(pc / 2.0).cast("double"))
        total = (len_a + len_b).cast("double")
        unit_ub = F.when(total > 0, 1.0 - 2.0 * d_lb / (total + d_lb)).otherwise(
            F.lit(1.0)
        )
        # epsilon guard: the final filter keeps sim>0 i.e. ms*u - th > 0,
        # while this prune tests u > th/ms with a ROUNDED quotient — at the
        # knife edge the two can disagree by an ulp, so lower the floor a
        # hair rather than risk pruning a true neighbor
        return unit_ub > F.lit(self.threshold / self.max_similarity - 1e-12)


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
