"""Sequence packing: bin chunks into fixed token budgets for training.

After context-window chunking (queries/text.py:text_chunk_windows) a
training pipeline packs variable-length chunks into fixed-size sequences
(e.g. 4096 tokens) to minimize padding waste. Exact global bin packing is
NP-hard and inherently sequential, so at scale the standard design is
sharded first-fit-decreasing: chunks are hash-assigned to shards (pure
function of the chunk key — deterministic under retries/partitioning), and
FFD runs independently inside each shard. FFD guarantees <= 11/9 OPT + 1
bins per shard, and sharding costs at most one partially-filled bin per
shard — negligible when shards hold thousands of chunks.

This is a genuinely non-SQL-expressible operator (the packing decision for
chunk i depends on every earlier decision in its shard), hence an
Arrow-batched ``applyInPandas`` kernel — the sanctioned escape hatch — with
a deterministic spec so results are reproducible anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from dblink_spark.operators.workerboot import make_worker_boot

PACK_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("bin_idx", LongType()),
        StructField("chunk_key", StringType()),
        StructField("n_tokens", LongType()),
        StructField("bin_fill", LongType()),  # total tokens in the bin
    ]
)


def _make_ffd_pack():
    """Factory so ``ffd_pack`` is a CLOSURE, not a plain module attribute:
    cloudpickle serializes closures by VALUE, while module-level functions
    go by reference — and the driver imports ``__spark_entry__`` by file
    path, so executor Python workers cannot ``import dblink_spark`` (same
    pitfall documented at operators/multimodal.py:_fake_decode; caught by
    tools/driver_sim.py when the kernel first referenced a module-level
    helper)."""

    def ffd_pack(toks: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
        """First-fit packing of an (already ordered) token-count sequence.

        Returns ``(bin_of, fills)``: each item's bin index and each bin's
        total fill. Called with tokens sorted descending (the D in FFD);
        pure and driver-testable — tests/test_packing.py property-checks
        the first-fit invariants over random inputs."""
        bin_of = np.empty(len(toks), dtype=np.int64)
        fills: list[int] = []
        for i, t in enumerate(toks):
            placed = False
            for b, fill in enumerate(fills):
                if fill + t <= budget:
                    fills[b] = fill + t
                    bin_of[i] = b
                    placed = True
                    break
            if not placed:
                fills.append(int(t))
                bin_of[i] = len(fills) - 1
        return bin_of, np.array(fills, dtype=np.int64)

    return ffd_pack


ffd_pack = _make_ffd_pack()


def pack_sequences(
    chunks: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Pack rows of ``chunks`` into bins of at most ``budget`` tokens.

    Returns one row per input chunk: its shard, the bin it landed in, and
    the bin's total fill (every row of a bin carries the same ``bin_fill``,
    so padding waste is ``budget - bin_fill`` summed over distinct bins).

    Determinism: shard = pmod(hash of the chunk key string via md5 prefix),
    and within a shard FFD processes chunks sorted by (tokens DESC, key) —
    both pure functions of the data, so the packing is identical across
    partitionings, retries, and cluster sizes. Chunks longer than the
    budget get a bin of their own (flagged by ``bin_fill > budget`` so the
    caller can truncate or split upstream).

    100-TB shape: ONE shuffle (groupBy shard); each kernel holds one
    shard's (key, n_tokens) pairs — metadata, not text — so memory per task
    is ~bytes-per-chunk-key x chunks-per-shard; join the assignment back to
    the chunk text afterwards on ``chunk_key``."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    # md5-prefix shard key: engine-stable, retry-stable (cf. queries/stats.py
    # q_docs_sample_split -- same rationale)
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_shards),
    )
    prepared = chunks.select(
        shard.alias("shard"),
        F.col(key_col).cast("string").alias("chunk_key"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )

    _ffd = ffd_pack  # closure capture -> pickled by value into the kernel

    boot = make_worker_boot()

    def ffd(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        boot()  # operators/workerboot.py
        # NULL key/tokens guard (public operator; r5 ADVICE): a NULL key
        # makes the shard NULL and None entries crash the lexsort with an
        # opaque TypeError; a NULL token count corrupts the FFD order.
        # Checked HERE, in the kernel, so the guard costs zero extra Spark
        # jobs (a driver-side pre-scan would be a full extra pass at scale).
        if key[0] is None or pdf["chunk_key"].isna().any() or pdf["n_tokens"].isna().any():
            raise ValueError(
                "pack_sequences: NULL chunk key or token count — filter or "
                "coalesce upstream (packing has no NULL semantics)"
            )
        sh = int(key[0])
        order = np.lexsort(
            (pdf["chunk_key"].to_numpy(), -pdf["n_tokens"].to_numpy())
        )
        toks = pdf["n_tokens"].to_numpy()[order]
        keys = pdf["chunk_key"].to_numpy()[order]
        bin_of, fills_arr = _ffd(toks, budget)
        return pd.DataFrame(
            {
                "shard": np.full(len(toks), sh, dtype=np.int64),
                "bin_idx": bin_of,
                "chunk_key": keys,
                "n_tokens": toks.astype(np.int64),
                "bin_fill": fills_arr[bin_of],
            }
        )

    return prepared.groupBy("shard").applyInPandas(ffd, PACK_SCHEMA)
