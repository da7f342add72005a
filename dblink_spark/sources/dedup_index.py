"""Persisted dedup-index tables (VERDICT r11 tasks 3 & 5).

The production daily-crawl shape: the corpus's MinHash signature index is
built ONCE, written as a table, and every subsequent batch dedups against
the table scan — never re-tokenizing yesterday's 100 TB. Likewise the
verified near-dup PAIR relation: `dedup_components`, `dedup_survivors`,
and `q_docs_dedup_bias_audit` all consume the same pair spec, and a real
pipeline materializes it once per snapshot instead of recomputing it per
report (the amortization seam — each pair build costs a full
sketch+band+verify sweep).

Same layout discipline as chain-state save/resume
(`sources/state_io.py:37,65` — data as parquet, scalars beside it, a
format-version gate that fails LOUDLY on mismatch): here the sidecar is a
JSON spec describing exactly how the index was built (sketch family,
parameters, tokenizer, threshold, blocking). An index built under any
other spec is NOT comparable — band keys or verify verdicts would
silently disagree — so load validates the expected spec key-by-key and
raises a named error instead of producing wrong dedup verdicts.

Cross-session by construction: everything needed to consume the index is
in the files (parquet schema + JSON spec); a fresh SparkSession reads it
with zero references to the producing session (pinned by
tests/test_sources.py round-trips running the consumer queries off the
loaded tables only).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

INDEX_FORMAT_VERSION = 1
DATA_DIRNAME = "index.parquet"
META_FILE = "index-meta.json"


def minhash_index_spec() -> dict:
    """The spec the current MinHash build writes/expects — derived from
    the live constants so a parameter change here and a stale on-disk
    index can never silently mix."""
    from dblink_spark.queries.dedup import N_BANDS, N_HASHES, ROWS_PER_BAND

    return {
        "kind": "minhash-signatures",
        "num_hashes": N_HASHES,
        "bands": N_BANDS,
        "rows_per_band": ROWS_PER_BAND,
        "tokenizer": "whitespace-distinct",
        "hash": "md5-chunks-mix",
    }


def bottomk_pairs_spec(k: int = 8, threshold: float = 0.99) -> dict:
    """Spec for a persisted verified near-dup pair table (the
    `bottomk_sketch_pairs` output all three closure consumers share)."""
    return {
        "kind": "bottomk-verified-pairs",
        "k": k,
        "threshold": threshold,
        "blocking": "lang",
        "tokenizer": "whitespace-distinct-md5",
    }


def save_index(df: DataFrame, path: str, spec: dict) -> None:
    """Write an index table + its spec sidecar. ``df`` is materialized by
    the parquet write itself — callers should release any owned caches
    AFTER this returns (the save is a terminal consumer)."""
    os.makedirs(path, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(path, DATA_DIRNAME))
    meta = {"format_version": INDEX_FORMAT_VERSION, "spec": spec}
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def load_index(spark: SparkSession, path: str, expect_spec: dict) -> DataFrame:
    """Scan an index table back, validating format version and the FULL
    spec. The returned frame is a plain parquet scan — predicates and
    column pruning push down, and no recompute of the producing pipeline
    can occur by construction (there is no lineage to it)."""
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    found_version = meta.get("format_version")
    if found_version != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"incompatible dedup index at {path!r}: format v{found_version}, "
            f"this build reads v{INDEX_FORMAT_VERSION}"
        )
    found = meta.get("spec", {})
    if found != expect_spec:
        diff = {
            k: (found.get(k), expect_spec.get(k))
            for k in sorted(set(found) | set(expect_spec))
            if found.get(k) != expect_spec.get(k)
        }
        raise ValueError(
            f"dedup index spec mismatch at {path!r} (found vs expected): "
            f"{diff} — an index built under a different sketch spec is "
            "not comparable; rebuild it"
        )
    return spark.read.parquet(os.path.join(path, DATA_DIRNAME))


def save_minhash_index(sigs: DataFrame, path: str) -> None:
    """Persist a `minhash_signatures` table (doc_id, h0..h15, toks,
    n_tok). The token arrays ride along because the exact-Jaccard verify
    step reads them — the index IS the verify side, so a batch dedup
    touches old TEXT never, old signatures once."""
    save_index(sigs, path, minhash_index_spec())


def load_minhash_index(spark: SparkSession, path: str) -> DataFrame:
    return load_index(spark, path, minhash_index_spec())


def save_pair_table(
    pairs: DataFrame, path: str, k: int = 8, threshold: float = 0.99
) -> None:
    """Persist a verified pair relation (doc1, doc2, sketch_jaccard)."""
    save_index(pairs, path, bottomk_pairs_spec(k, threshold))


def load_pair_table(
    spark: SparkSession, path: str, k: int = 8, threshold: float = 0.99
) -> DataFrame:
    return load_index(spark, path, bottomk_pairs_spec(k, threshold))


def comps_table_spec(k: int = 8, threshold: float = 0.99) -> dict:
    """Spec for a persisted CONNECTED-COMPONENTS relation (node,
    component) derived from a pair table under the given sketch spec —
    the second amortization tier (r13): the closure itself is the
    dominant per-consumer cost once pairs are shared (each self-build
    runs O(log n) large-star/small-star rounds), and `dedup_survivors` /
    `q_docs_dedup_bias_audit` both consume exactly this relation. The
    spec embeds the PAIR spec so a comps table can never silently mix
    with pairs built under different sketch parameters."""
    return {
        "kind": "connected-components",
        "closure": "large-star-small-star-min-label",
        "pairs": bottomk_pairs_spec(k, threshold),
    }


def save_comps_table(
    comps: DataFrame, path: str, k: int = 8, threshold: float = 0.99
) -> None:
    """Persist a components relation (node, component)."""
    save_index(
        comps.select("node", "component"), path, comps_table_spec(k, threshold)
    )


def load_comps_table(
    spark: SparkSession, path: str, k: int = 8, threshold: float = 0.99
) -> DataFrame:
    return load_index(spark, path, comps_table_spec(k, threshold))
