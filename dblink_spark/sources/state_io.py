"""Chain-state save/resume (ref: State.scala:122-193, S4/S5).

Two artifacts, mirroring the reference's split:

- ``state.parquet`` — the cluster DataFrame (workers' share), a straight
  columnar round-trip (ref: State.scala:144-149/182-185 Parquet save/load).
- ``driver-state.pkl`` — driver scalars: iteration, θ, seeds, summaries,
  the fitted partition function, the records cache, and the driver RNG
  (NumPy ``Generator`` pickles with its exact bit-state), replacing the
  reference's Java ``ObjectOutputStream`` blob (ref: State.scala:122-150).

Resume is bit-exact: kernel seeds derive from ``current_seed`` +
``partition_id`` (data values, not task indexes), and the driver RNG
restores mid-stream, so save→load→sample produces the same chain as an
uninterrupted run (tested in tests/test_sources.py).
"""

from __future__ import annotations

import os
import pickle

from pyspark.sql import SparkSession

from dblink_spark.er.state import State

STATE_DIRNAME = "state.parquet"
DRIVER_BLOB = "driver-state.pkl"

#: On-disk layout version. Bump whenever the parquet state schema changes
#: incompatibly (v2 = packed-binary rec_values/rec_dist; v1 was
#: array<array<T>>, which would otherwise fail deep inside np.frombuffer
#: with an opaque error instead of a clear diagnostic at load time).
STATE_FORMAT_VERSION = 2


def save_state(state: State, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    df = state.df
    if state.num_partitions == 1:
        # One part file so the scan preserves row order exactly: resume
        # bit-exactness needs the reloaded entity-row order to equal the
        # in-memory order (Spark packs multi-file scans by size, not name).
        # Single-partition states are driver-sized by construction, so one
        # file is also the right layout.
        df = df.coalesce(1)
    df.write.mode("overwrite").parquet(os.path.join(path, STATE_DIRNAME))
    blob = {
        "format_version": STATE_FORMAT_VERSION,
        "iteration": state.iteration,
        "theta": state.theta,
        "population_size": state.population_size,
        "summary": state.summary,
        "partition_fn": state.partition_fn,
        "num_partitions": state.num_partitions,
        "start_seed": state.start_seed,
        "current_seed": state.current_seed,
        "cache": state.cache,
        "rng": state.rng,
    }
    with open(os.path.join(path, DRIVER_BLOB), "wb") as f:
        pickle.dump(blob, f)


def load_state(spark: SparkSession, path: str) -> State:
    with open(os.path.join(path, DRIVER_BLOB), "rb") as f:
        blob = pickle.load(f)
    found = blob.get("format_version", 1)
    if found != STATE_FORMAT_VERSION:
        raise ValueError(
            f"incompatible state format at {path!r}: found v{found}, "
            f"this build reads v{STATE_FORMAT_VERSION} (packed-binary record "
            "state). Re-run the chain from records, or convert the checkpoint."
        )
    df = spark.read.parquet(os.path.join(path, STATE_DIRNAME))
    binary_cols = {f.name for f in df.schema.fields if f.dataType.typeName() == "binary"}
    if not {"rec_values", "rec_dist"} <= binary_cols:
        raise ValueError(
            f"incompatible state.parquet at {path!r}: rec_values/rec_dist must "
            "be packed BinaryType (format v2); found an older array layout."
        )
    # Materialize so the first transition starts from a truncated lineage,
    # same as mid-chain states (ref: PeriodicCheckpointer discipline).
    df = df.localCheckpoint(eager=True)
    return State(
        iteration=blob["iteration"],
        _df=df,
        spark=spark,
        theta=blob["theta"],
        population_size=blob["population_size"],
        summary=blob["summary"],
        partition_fn=blob["partition_fn"],
        num_partitions=blob["num_partitions"],
        start_seed=blob["start_seed"],
        current_seed=blob["current_seed"],
        cache=blob["cache"],
        rng=blob["rng"],
    )
