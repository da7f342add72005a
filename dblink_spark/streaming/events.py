"""Streaming event analytics: the streaming twins of the batch event queries.

Design for scale:

- Aggregations are **watermarked** so state is bounded: completed windows
  are evicted from the state store and late arrivals for them are dropped.
  Without a watermark a 100 TB stream accumulates state forever. Exact
  late-data semantics differ per operator and are pinned empirically in
  tests/test_streaming_edge.py: the windowed agg drops a late row only if
  its window was already evicted in an earlier batch (a never-seen window
  is accepted and emitted late), while dropDuplicatesWithinWatermark and
  session_window pre-filter rows older than the in-force watermark.
- Session windows use the built-in ``F.session_window`` (JVM-side state
  merge, whole-stage codegen on the agg) rather than a Python stateful op.
- The one custom stateful operator (``user_running_stats``) uses
  ``applyInPandasWithState`` — Arrow-batched per-group state, the PySpark
  analogue of flatMapGroupsWithState — for semantics window functions can't
  express incrementally (cumulative per-key counters emitted per batch).

The events fixture stores TIMESTAMP(NANOS). Pre-4.1 Spark readers only
accept nanos as raw int64 (``spark.sql.legacy.parquet.nanosAsLong``);
4.1+ ignores that conf and reads nanos natively as ``timestamp_ntz``. We
probe the batch reader's inferred schema (a footer-only read) and build the
matching stream schema, converting to integer µs + a proper timestamp
column either way — same dispatch as the batch side
(`dblink_spark.queries.tpch.load_events_us`).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from dblink_spark.operators.workerboot import make_worker_boot


def _events_schema(ts_is_long: bool) -> StructType:
    """Schema of the events fixture: ``ts`` is int64 nanos under the pre-4.1
    ``nanosAsLong`` reader, ``timestamp_ntz`` under the 4.1+ native one."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType() if ts_is_long else TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


#: kept for import compatibility (the nanosAsLong-reader variant)
EVENTS_SCHEMA = _events_schema(ts_is_long=True)


def read_event_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over a directory of events parquet files.

    Emits ``event_id, user_id, event_type, value, ts_us bigint,
    event_time timestamp`` — integer-µs plus a real timestamp column for
    window/watermark operators.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # footer-only probe: which dtype does THIS Spark's reader give nanos?
    probed = dict(spark.read.parquet(events_dir).dtypes)["ts"]
    ts_is_long = probed == "bigint"
    reader = (
        spark.readStream.schema(_events_schema(ts_is_long))
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(events_dir)
    ts_us = (
        F.expr("CAST(ts DIV 1000 AS BIGINT)")
        if ts_is_long
        else F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).cast("bigint")
    )
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ts_us.alias("ts_us"),
        F.timestamp_micros(ts_us).alias("event_time"),
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + value sums per event type.

    Watermarked so the state store evicts completed windows; output in
    append mode emits each window exactly once after the watermark passes.
    """
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization — the streaming twin of the batch
    ``q_events_sessionize`` query (same 30-min inactivity gap).

    ``F.session_window`` keeps per-(user, open-session) state JVM-side and
    merges overlapping windows as events arrive; the watermark closes and
    emits sessions once no more late data can extend them.
    """
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("duration_us"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "duration_us",
        )
    )


_RUNNING_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)
_RUNNING_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_us", LongType()),
    ]
)


def user_running_stats(events: DataFrame) -> DataFrame:
    """Cumulative per-user counters via ``applyInPandasWithState``.

    Emits one row per user per micro-batch with the running event count,
    value sum, and latest-seen µs timestamp — the custom-stateful-operator
    pattern (state is an explicit struct, updated Arrow batch by Arrow
    batch, never rebuilt from history)."""

    boot = make_worker_boot()

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        boot()  # operators/workerboot.py
        (n, total, last_us) = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts_us"].max()))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events_total": [n],
                "total_value": [total],
                "last_ts_us": [last_us],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_OUT,
        stateStructType=_RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_event_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication — the training-data-pipeline primitive for
    at-least-once sources (replayed files, Kafka redeliveries).

    ``dropDuplicatesWithinWatermark`` keeps one row per key while only
    retaining state for the watermark horizon: a duplicate arriving within
    the watermark of its first sighting is dropped, and state for keys
    older than the watermark is evicted — bounded state on an unbounded
    stream, unlike ``dropDuplicates`` whose state grows forever.
    """
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def run_to_memory_sink(
    stream: DataFrame, table_name: str, output_mode: str = "append"
) -> None:
    """Drain a stream into an in-memory table with ``trigger(availableNow)``
    — processes everything currently in the source, then stops. Used by
    tests and local verification; production would writeStream to parquet
    with a checkpoint location."""
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def minhash_key(text_col, n_hashes: int = 8, first_row: int = 0):
    """Per-row MinHash signature key via JVM higher-order functions — NO
    explode/groupBy, so it is legal in any streaming context and costs zero
    shuffles in batch: ONE md5 per distinct token split into four 32-bit
    chunks, each hash row a cheap rotate-xor chunk mix (the r7 derivation
    shared with the batch LSH — `queries.dedup.mh_mix`; the former build
    evaluated ``n_hashes`` md5 digests per token), ``array_min`` per row,
    mins concatenated and md5'd into one 32-char key. Two documents share
    the key iff every one of the ``n_hashes`` min-hashes agrees —
    P(match) = jaccard^n_hashes, a sharp high-similarity detector (the
    single-band limit of the batch LSH in queries/dedup.py).
    ``first_row`` selects a disjoint hash-row range so several BAND keys
    can be built from independent hash families
    (`near_dedup_doc_stream_banded`).

    STATE-COMPATIBILITY (ADVICE r7): the r7 one-md5-per-token rewrite
    CHANGED every signature value. dropDuplicates state in a checkpoint
    written by the pre-r7 build keys on the old signatures and will never
    match new ones — previously-seen near-duplicates would re-emit after
    an in-place upgrade. Restart dedup streams from a FRESH checkpoint
    when crossing that boundary (documented in COVERAGE.md)."""
    from dblink_spark.queries.dedup import mh_family, mh_token_chunks

    chunks = mh_token_chunks(F.array_distinct(F.split(text_col, " ")))
    mins = [
        F.array_min(F.transform(chunks, mh_family(i))).cast("string")
        for i in range(first_row, first_row + n_hashes)
    ]
    return F.md5(F.concat_ws("|", *mins))


def near_dedup_doc_stream(
    docs: DataFrame,
    n_hashes: int = 8,
    watermark: str = "2 hours",
    time_col: str = "event_time",
) -> DataFrame:
    """Streaming near-duplicate suppression for a document stream — the
    stream-side twin of the batch MinHash dedup: keep the first document
    per MinHash-signature bucket within the watermark horizon, drop the
    near-identical rest.

    State is one row per distinct signature inside the watermark window
    (``dropDuplicatesWithinWatermark`` evicts older keys), so an unbounded
    crawl stream runs with bounded state. The signature itself is computed
    row-local with higher-order functions (`minhash_key`) — no stateful
    shuffle beyond the dedup itself.

    Recall knob: one key of ``n_hashes`` min-hashes is the single-band
    limit (catches jaccard ~> 0.92 at n=8 with >50% probability); for
    band-OR semantics use `near_dedup_doc_stream_banded`."""
    return (
        docs.withColumn("near_key", minhash_key(F.col("text"), n_hashes))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["near_key"])
    )


def near_dedup_doc_stream_banded(
    docs: DataFrame,
    n_bands: int = 2,
    rows_per_band: int = 4,
    watermark: str = "2 hours",
    time_col: str = "event_time",
) -> DataFrame:
    """Band-OR streaming near-dedup: a document is suppressed if ANY of its
    ``n_bands`` MinHash band keys (disjoint hash-row families of
    ``rows_per_band`` rows each) was already claimed inside the watermark
    horizon — the streaming twin of the batch LSH banding's OR semantics
    and its recall knob (P(caught) = 1 - (1 - j^r)^b vs the single band's
    j^(r*b)).

    Mechanism: one ``dropDuplicatesWithinWatermark`` PER BAND, chained
    (Spark 4 supports chained stateful operators in append mode). Stage k
    records the band-k key of every row that REACHES it, so suppression is
    relative to stream order exactly like the single-key operator; state is
    one row per distinct band key per band inside the watermark — still
    bounded. The batch twin (pinned stream==batch in
    tests/test_streaming_edge.py) is the same sequence of keep-first-per-key
    filters applied in band order.

    Hot-bucket robustness (VERDICT r9 task 1): this operator needs NO
    occupancy cap, unlike the batch band joins (queries/dedup.py
    capped_band_candidates) — it never forms candidate PAIRS. State is
    keyed on the band key itself, so a degenerate stream of a million
    identical docs costs one state row per band and one lookup per doc:
    occupancy-bounded by construction."""
    # ONE watermark definition feeds every chained stateful op (Spark
    # propagates it; redefining it mid-chain is an analysis error)
    out = docs.withWatermark(time_col, watermark)
    for b in range(n_bands):
        out = out.withColumn(
            f"band_{b}",
            minhash_key(F.col("text"), rows_per_band, first_row=b * rows_per_band),
        ).dropDuplicatesWithinWatermark([f"band_{b}"])
    return out.drop(*[f"band_{b}" for b in range(n_bands)])


def pii_redact_doc_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming PII scrub — the stream-side twin of
    `queries.text.text_pii_redact` (same _PII_PASSES constant, same
    email -> phone -> ipv4 -> longnum order so one piece of PII yields
    exactly one typed mask). Entirely stateless (JVM regexp projections,
    no watermark, no state store), so it composes with ANY streaming
    output mode and drops into a pipeline before the stateful dedup
    stages: scrub, then near-dedup, exactly like the batch corpus-prep
    ordering. Replaces the text column in place and appends the match
    counts."""
    from dblink_spark.queries.text import _PII_PASSES

    scrubbed = F.col(text_col)
    for cnt, pat, mask in _PII_PASSES:
        docs = docs.withColumn(
            cnt, F.regexp_count(scrubbed, F.lit(pat)).cast("int")
        )
        scrubbed = F.regexp_replace(scrubbed, F.lit(pat), F.lit(mask))
    return docs.withColumn(text_col, scrubbed)


def url_dedup_doc_stream(
    docs: DataFrame,
    url_col: str = "url",
    watermark: str = "2 hours",
    time_col: str = "event_time",
) -> DataFrame:
    """Streaming twin of the batch `queries.dedup.dedup_url_canonical`
    pass — the metadata-FIRST dedup a crawl pipeline runs at ingest:
    canonicalize the URL row-locally (the SHARED `canonicalize_url` spec,
    so stream and batch can never disagree on the rules) and keep the
    first crawl per canonical key inside the watermark horizon.

    State is one row per distinct canonical URL within the window
    (``dropDuplicatesWithinWatermark`` evicts older keys) — bounded for
    an unbounded crawl stream, and occupancy-bounded by construction
    like the banded near-dedup (state keyed on the canonical key itself,
    no pair join, so a million re-crawls of one page cost one state row
    and one lookup each). Canonicalization is stateless string work
    inside codegen; the dedup is the only stateful stage, so this drops
    in BEFORE the content passes (cheapest filter first, body text never
    consulted)."""
    from dblink_spark.queries.dedup import canonicalize_url

    return (
        docs.withColumn("canon_url", canonicalize_url(F.col(url_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["canon_url"])
    )


def semantic_decon_stream(
    vectors: DataFrame, evals: list, tau: "float | None" = None
) -> DataFrame:
    """Streaming twin of the batch
    `queries.vectors.vector_semantic_decontaminate` literal arm — the
    eval-suite sweep at INGEST time: every arriving embedding is scored
    against the baked eval-suite literals (the SHARED
    `decon_best_literal` spec, so stream and batch can never disagree on
    a verdict) and only flagged rows pass downstream.

    Entirely STATELESS — the eval suite is a driver-side constant and
    the sweep is one narrow greatest-over-structs expression, no
    watermark, no state store, no shuffle — so it composes with ANY
    output mode and drops in ahead of the stateful dedup stages exactly
    like the PII scrub: the cheapest irreversible filters run first.
    `evals` is the [(eval_id, vector), ...] suite (bounded small by
    definition — the batch query caps it at 512); `tau` defaults to the
    batch `_DECON_TAU`."""
    from dblink_spark.functions.vector import quantized_dot
    from dblink_spark.queries.vectors import _DECON_TAU, decon_best_literal

    if tau is None:
        tau = _DECON_TAU
    scored = vectors.withColumn(
        "sq", quantized_dot(F.col("embedding"), F.col("embedding"))
    ).withColumn("m", decon_best_literal(evals))
    return (
        scored.filter(F.col("m.cos") >= F.lit(tau))
        .withColumn("eval_id", (-F.col("m.neid")).cast("bigint"))
        .withColumn("cosine", F.col("m.cos"))
        .drop("m", "sq")
    )


# --- r12: user-journey transition counting at ingest -----------------------

_TRANS_OUT = StructType(
    [
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n_transitions", LongType()),
    ]
)
_TRANS_STATE = StructType(
    [
        StructField("last_type", StringType()),
        StructField("last_us", LongType()),
        StructField("last_eid", LongType()),
    ]
)


def transition_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``q_events_transition_matrix``'s pair-counting
    core: per-user consecutive (from_type, to_type) transitions counted
    at ingest via ``applyInPandasWithState`` — state is ONE row per user
    (the last seen (type, ts_us, event_id)), so a user's chain continues
    seamlessly across micro-batches and a 100M-event bot costs the same
    three state fields as anyone else. Each micro-batch emits that
    batch's per-user pair increments (append mode); the matrix rollup
    downstream is a stateless groupBy-sum, and row normalization stays a
    batch-side read-time step (a running denominator per from-type would
    be cross-user state — deliberately out of the ingest path).

    Ordering contract (same assumption the batch query's (ts_us,
    event_id) sort makes explicit): WITHIN a micro-batch rows sort by
    (ts_us, event_id) before chaining, and an event older than the
    user's stored last is counted FROM the stored last (its true
    predecessor already emitted) — with in-order arrival per user across
    batches (the parquet-replay and production-log case) the stream's
    pair multiset equals the batch query's exactly, pinned by the
    stream==batch test.

    The stored (last_us, last_eid) make violations of that contract
    OBSERVABLE (ADVICE r12): each micro-batch counts this user's events
    that arrive strictly older than the stored last and, when nonzero,
    emits one diagnostic row ``(NULL, NULL, n_violations)`` alongside
    the pair increments — NULL can never collide with a real event type
    (a transition always has both types), in-order streams emit no such
    row (bit-identical output to the pre-diagnostic contract), and the
    downstream groupBy-sum rollup keeps the diagnostic separate for
    free. The adversarial cross-batch test pins both the diagnostic and
    the documented count-from-stored-last chaining."""

    boot = make_worker_boot()

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        boot()  # operators/workerboot.py
        last_type, last_us, last_eid = (
            state.get if state.exists else (None, -1, -1)
        )
        counts: dict[tuple[str, str], int] = {}
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")
        n_ooo = 0
        if last_type is not None:
            us_v = rows["ts_us"].to_numpy()
            eid_v = rows["event_id"].to_numpy()
            n_ooo = int(
                (
                    (us_v < last_us)
                    | ((us_v == last_us) & (eid_v < last_eid))
                ).sum()
            )
        for etype, us, eid in zip(
            rows["event_type"], rows["ts_us"], rows["event_id"]
        ):
            if last_type is not None:
                pair = (last_type, str(etype))
                counts[pair] = counts.get(pair, 0) + 1
            last_type, last_us, last_eid = str(etype), int(us), int(eid)
        state.update((last_type, last_us, last_eid))
        if counts or n_ooo:
            ks = sorted(counts)
            out = pd.DataFrame(
                {
                    "from_type": [k[0] for k in ks],
                    "to_type": [k[1] for k in ks],
                    "n_transitions": [counts[k] for k in ks],
                }
            )
            if n_ooo:
                out = pd.concat(
                    [
                        out,
                        pd.DataFrame(
                            {
                                "from_type": [None],
                                "to_type": [None],
                                "n_transitions": [n_ooo],
                            }
                        ),
                    ],
                    ignore_index=True,
                )
            yield out

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TRANS_OUT,
        stateStructType=_TRANS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class OutOfOrderReplayError(RuntimeError):
    """A replayed stream violated ``transition_stream``'s per-user
    in-order arrival contract more often than the consumer tolerates.

    Each out-of-order event chains from the STORED last (documented
    count-from-stored-last behavior), so up to ``n_ooo`` of the emitted
    pairs can differ from what the batch query's (ts_us, event_id) sort
    would produce — at n_ooo == 0 the stream==batch equality is exact;
    above it the matrix is an approximation whose error is bounded by
    the fraction. Fixes, in preference order: feed the replay through a
    per-user-ordered source (the parquet-replay and production-log
    case), widen micro-batches so reorderings land in one batch (the
    in-batch sort absorbs them), or raise ``max_ooo_fraction`` to accept
    the documented approximation.

    Threshold scale change (r15 ADVICE): since r15 ``ooo_fraction`` is
    ``n_ooo / (n_ooo + n_pairs)`` — the share of ALL observed
    transitions — where pre-r15 it was ``n_ooo / n_pairs`` (violations
    per real pair, which could exceed 1.0). The new reading is always
    <= the old one for the same replay (n_ooo=1, n_pairs=2 read 0.5 and
    now reads 0.333), so ``max_ooo_fraction`` values tuned against the
    pre-r15 scale silently become MORE permissive: retune them to
    ``old / (1 + old)`` to keep the same admission boundary. The default
    0.0 (any violation fails) is unaffected."""


def audit_stream_ordering(
    pairs: DataFrame, max_ooo_fraction: float = 0.0
) -> dict:
    """Consumer-side gate over ``transition_stream`` output (VERDICT r14
    task 7): totals the (NULL, NULL, n) out-of-order diagnostic rows
    against the real pair count and FAILS LOUDLY with
    :class:`OutOfOrderReplayError` when the violation fraction exceeds
    ``max_ooo_fraction`` (default 0.0 — any violation invalidates the
    exact stream==batch contract). Returns the stats dict
    ``{n_ooo, n_pairs, ooo_fraction}`` when within tolerance, so
    production replays can log the rate even at 0.

    ``ooo_fraction`` is ``n_ooo / (n_ooo + n_pairs)`` — the share of ALL
    observed transitions that arrived out of order, bounded in [0, 1]
    (r14 ADVICE: the earlier violations-per-real-pair ratio exceeded 1.0
    when violations outnumbered real pairs, surprising callers tuning
    ``max_ooo_fraction``). An all-violation replay reads exactly 1.0.

    Run it on the completed sink relation (memory-sink table / files)
    after the stream drains; it is two map-side conditional sums — one
    job, no shuffle beyond the final partial-agg exchange."""
    row = pairs.select(
        F.sum(
            F.when(
                F.col("from_type").isNull() & F.col("to_type").isNull(),
                F.col("n_transitions"),
            ).otherwise(F.lit(0))
        ).alias("n_ooo"),
        F.sum(
            F.when(
                F.col("from_type").isNotNull(), F.col("n_transitions")
            ).otherwise(F.lit(0))
        ).alias("n_pairs"),
    ).collect()[0]
    n_ooo = int(row["n_ooo"] or 0)
    n_pairs = int(row["n_pairs"] or 0)
    total = n_ooo + n_pairs
    frac = (n_ooo / total) if total else 0.0
    stats = {
        "n_ooo": n_ooo,
        "n_pairs": n_pairs,
        "ooo_fraction": round(frac, 6),
    }
    if frac > max_ooo_fraction:
        raise OutOfOrderReplayError(
            f"{n_ooo} out-of-order arrivals out of {total} observed "
            f"transitions "
            f"(fraction {frac:.6f} > tolerated {max_ooo_fraction}); the "
            "stream==batch contract does not hold for this replay — see "
            "OutOfOrderReplayError for the remediation ladder"
        )
    return stats
