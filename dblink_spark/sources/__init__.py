"""Sources & sinks (SURVEY §2.1, S1-S11).

Everything here is plain ``spark.read`` / ``df.write`` so Catalyst owns the
physical plan: CSV scans get column pruning, the linkage-chain parquet scan
gets predicate pushdown on the iteration cutoff, and the state parquet
round-trip is a straight columnar copy.
"""

from dblink_spark.sources.records_csv import (
    read_records_csv,
    read_clusters_csv,
    write_clusters_csv,
)
from dblink_spark.sources.chain import BufferedChainWriter, read_linkage_chain
from dblink_spark.sources.state_io import save_state, load_state
from dblink_spark.sources.files import copy_files

__all__ = [
    "read_records_csv",
    "read_clusters_csv",
    "write_clusters_csv",
    "BufferedChainWriter",
    "read_linkage_chain",
    "save_state",
    "load_state",
    "copy_files",
]
