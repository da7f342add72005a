"""Linkage-chain parquet sink/scan with buffered appends.

Sink (ref: util/BufferedRDDWriter.scala:30-74 + Sampler.scala:79,107,118):
samples are buffered and flushed as one parquet append per
``buffer_size`` saved iterations — one Spark write job per flush instead of
one per sample. Files land ordered by iteration, so the parquet footer
min/max stats on ``iteration`` let the scan skip whole files for the
burn-in cutoff filter (ref: Project.scala:111-112) without paying the
small-files/partition-explosion cost of ``partitionBy("iteration")``.

Scan (ref: LinkageChain.scala:35-43): plain parquet read; the cutoff is a
pushed filter (shows under PushedFilters in explain()).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

CHAIN_DIRNAME = "linkage-chain.parquet"


class BufferedChainWriter:
    """Buffer sample DataFrames; union + append every ``buffer_size``.

    Each buffered DataFrame must derive from a materialized
    (localCheckpoint'ed) state so the union re-scans cached partitions
    instead of recomputing the chain.
    """

    def __init__(self, path: str, buffer_size: int = 10, append: bool = False):
        self.path = os.path.join(path, CHAIN_DIRNAME)
        self.buffer_size = max(int(buffer_size), 1)
        self._buffer: list[DataFrame] = []
        self._first_write_mode = "append" if append else "overwrite"
        self._wrote = False

    def append(self, sample: DataFrame) -> None:
        self._buffer.append(sample)
        if len(self._buffer) >= self.buffer_size:
            self.flush()

    def flush(self) -> None:
        if not self._buffer:
            return
        df = self._buffer[0]
        for d in self._buffer[1:]:
            df = df.unionByName(d)
        mode = self._first_write_mode if not self._wrote else "append"
        df.write.mode(mode).parquet(self.path)
        self._wrote = True
        self._buffer.clear()


def read_linkage_chain(
    spark: SparkSession, path: str, cutoff: int | None = None
) -> DataFrame:
    """Scan saved samples; ``cutoff`` filters ``iteration >= cutoff`` and is
    pushed down to the parquet scan (ref: Project.scala:104-116)."""
    p = path if path.endswith(".parquet") else os.path.join(path, CHAIN_DIRNAME)
    df = spark.read.parquet(p)
    if cutoff is not None:
        df = df.filter(F.col("iteration") >= cutoff)
    return df
