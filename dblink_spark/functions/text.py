"""Text column functions: tokenization, shingling, sketch signatures.

All pure Catalyst expressions (split / transform / array_min / aggregate /
md5) — hashing is md5-based so results are engine-portable (never the
engine-native ``hash()``), matching the discipline of the oracle-gated
queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def tokenize(text) -> Column:
    """Whitespace tokens, as the fixture queries define them."""
    return F.split(text, " ")


def word_shingles(text, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.
    Empty array when the document has fewer than ``n`` tokens."""
    toks = tokenize(text)
    count = F.size(toks) - (n - 1)
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _seeded_md5(seed: int):
    # NB: captured via factory, not a lambda default — PySpark binds extra
    # lambda params to the element *index* in higher-order functions.
    return lambda t: F.md5(F.concat(F.lit(str(seed)), t))


def minhash_signature(tokens, n_hashes: int = 16) -> Column:
    """MinHash signature over a token-array column: element ``i`` is
    ``min(md5(str(i) || token))`` (lexicographic min over hex strings —
    identical logic to the LSH dedup query's groupBy form, usable without
    a shuffle when the tokens are already collected)."""
    return F.array(
        *[
            F.array_min(F.transform(tokens, _seeded_md5(i)))
            for i in range(n_hashes)
        ]
    )


def _bit_vote(bit: int):
    mask = F.lit(1 << bit)

    def vote(acc, t):
        h = F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
        return acc + F.when((h.bitwiseAND(mask)) != 0, 1).otherwise(-1)

    return vote


def simhash(tokens, bits: int = 16) -> Column:
    """SimHash fingerprint over a token-array column: per-bit ±1 votes from
    each token's md5-derived hash, majority sign packed into a BIGINT."""
    fp = None
    for i in range(bits):
        vote = F.aggregate(tokens, F.lit(0), _bit_vote(i))
        term = F.when(vote > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return fp.cast("bigint")


def prefix_fingerprint(text, k: int = 8) -> Column:
    """md5 fingerprint of the first ``k`` tokens — the cheap
    boilerplate-prefix duplicate detector used by text_fingerprint."""
    return F.md5(F.array_join(F.slice(tokenize(text), 1, k), " "))
