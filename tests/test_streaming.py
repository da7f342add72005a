"""Structured Streaming tests: the streaming event queries must agree with
their batch twins once the watermark has passed all real data.

Technique: stage the fixture events as file 1 and a single far-future
sentinel event as file 2 (later mtime, so FileStreamSource processes it in
a later micro-batch). With maxFilesPerTrigger=1 the sentinel batch advances
the watermark past every real event, so append-mode windows/sessions all
emit. Batch expectations are computed over the real events only.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from dblink_spark.streaming.events import (
    read_event_stream,
    run_to_memory_sink,
    sessionize_stream,
    user_running_stats,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"
SENTINEL_US = 4102444800 * 1_000_000  # 2100-01-01, beyond any fixture event


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    real = d / "part-000-real.parquet"
    shutil.copy(f"{SF_DIR}/events.parquet", real)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the sentinel file's ts dtype must agree with how THIS Spark reads the
    # real (nanos-typed) file: int64 under the pre-4.1 nanosAsLong reader,
    # timestamp_ntz under the 4.1+ native one
    if dict(spark.read.parquet(str(real)).dtypes)["ts"] == "bigint":
        sentinel = spark.createDataFrame(
            [(10**9, SENTINEL_US * 1000, 10**6, "sentinel", 0.0, "{}")],
            "event_id: long, ts: long, user_id: long, event_type: string, "
            "value: double, props: string",
        )
    else:
        from datetime import datetime

        sentinel = spark.createDataFrame(
            [(10**9, datetime(2100, 1, 1), 10**6, "sentinel", 0.0, "{}")],
            "event_id: long, ts: timestamp_ntz, user_id: long, "
            "event_type: string, value: double, props: string",
        )
    sent_dir = d / "_sentinel_build"
    sentinel.coalesce(1).write.parquet(str(sent_dir))
    part = next(p for p in os.listdir(sent_dir) if p.endswith(".parquet"))
    shutil.move(str(sent_dir / part), d / "part-001-sentinel.parquet")
    shutil.rmtree(sent_dir)
    now = os.path.getmtime(d / "part-001-sentinel.parquet")
    os.utime(real, (now - 60, now - 60))  # real file strictly older
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark):
    """Batch twin of read_event_stream over the real fixture only (shares
    the version-dispatching µs derivation with the batch queries)."""
    from dblink_spark.queries.tpch import load_events_us

    e = load_events_us(spark, SF_DIR)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts_us",
        F.timestamp_micros(F.col("ts_us")).alias("event_time"),
    )


def _stream(spark, events_dir):
    return read_event_stream(spark, events_dir, max_files_per_trigger=1)


class TestWindowedCounts:
    def test_matches_batch(self, spark, events_dir, batch_events):
        run_to_memory_sink(
            windowed_event_counts(_stream(spark, events_dir)), "win_counts"
        )
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.table("win_counts").collect()
            if r["event_type"] != "sentinel"
        }
        expect = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in (
                batch_events.groupBy(F.window("event_time", "1 hour"), "event_type")
                .agg(
                    F.count("*").alias("n_events"),
                    F.sum("value").alias("total_value"),
                )
                .select(
                    F.col("window.start").alias("window_start"),
                    "event_type",
                    "n_events",
                    "total_value",
                )
            ).collect()
        }
        assert set(got) == set(expect)
        for k, (n, tv) in expect.items():
            assert got[k][0] == n
            assert got[k][1] == pytest.approx(tv)


class TestSessionize:
    def test_matches_batch_session_windows(self, spark, events_dir, batch_events):
        run_to_memory_sink(
            sessionize_stream(_stream(spark, events_dir)), "sessions"
        )
        got = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["duration_us"])
            for r in spark.table("sessions").collect()
            if r["user_id"] != 10**6
        }
        expect = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["duration_us"])
            for r in (
                batch_events.groupBy(
                    F.session_window("event_time", "30 minutes"), "user_id"
                )
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
            ).collect()
        }
        assert got == expect

    def test_agrees_with_batch_lag_formulation(self, spark, events_dir, batch_events):
        """Session *count and sizes* match the batch lag/running-sum
        sessionization (q_events_sessionize) — same 30-min gap rule."""
        from pyspark.sql import Window

        sessions = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in spark.table("sessions").collect()
            if r["user_id"] != 10**6
        }
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        wrun = Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        lag_sessions = (
            batch_events.withColumn("prev_us", F.lag("ts_us").over(w))
            .withColumn(
                "new_session",
                F.when(
                    F.col("prev_us").isNull()
                    | (F.col("ts_us") - F.col("prev_us") > 1_800_000_000),
                    1,
                ).otherwise(0),
            )
            .withColumn("session_id", F.sum("new_session").over(wrun))
            .groupBy("user_id", "session_id")
            .count()
        )
        expect_sizes = sorted(r["count"] for r in lag_sessions.collect())
        assert sorted(sessions.values()) == expect_sizes


class TestUserRunningStats:
    def test_final_state_matches_batch_totals(self, spark, events_dir, batch_events):
        run_to_memory_sink(
            user_running_stats(_stream(spark, events_dir)),
            "running",
            output_mode="update",
        )
        # update mode appends one row per (user, micro-batch); the final
        # cumulative row per user is the one with the max running count.
        rows = [r for r in spark.table("running").collect() if r["user_id"] != 10**6]
        final = {}
        for r in rows:
            cur = final.get(r["user_id"])
            if cur is None or r["n_events_total"] > cur["n_events_total"]:
                final[r["user_id"]] = r
        expect = {
            r["user_id"]: r
            for r in batch_events.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("total"),
                F.max("ts_us").alias("last_us"),
            )
            .collect()
        }
        assert set(final) == set(expect)
        for uid, e in expect.items():
            assert final[uid]["n_events_total"] == e["n"]
            assert final[uid]["total_value"] == pytest.approx(e["total"])
            assert final[uid]["last_ts_us"] == e["last_us"]


class TestStreamDedup:
    """dropDuplicatesWithinWatermark: replayed inputs (at-least-once
    delivery) must collapse to exactly-once rows while state stays bounded
    by the watermark horizon."""

    @pytest.fixture(scope="class")
    def dup_events_dir(self, spark, tmp_path_factory):
        """The real events file staged TWICE (a full replay) + the
        far-future sentinel to advance the watermark."""
        d = tmp_path_factory.mktemp("events_dup_stream")
        for name in ("part-000-real.parquet", "part-001-replay.parquet"):
            shutil.copy(f"{SF_DIR}/events.parquet", d / name)
        if dict(spark.read.parquet(f"{SF_DIR}/events.parquet").dtypes)["ts"] == "bigint":
            sentinel = spark.createDataFrame(
                [(10**9, SENTINEL_US * 1000, 10**6, "sentinel", 0.0, "{}")],
                "event_id: long, ts: long, user_id: long, event_type: string, "
                "value: double, props: string",
            )
        else:
            from datetime import datetime

            sentinel = spark.createDataFrame(
                [(10**9, datetime(2100, 1, 1), 10**6, "sentinel", 0.0, "{}")],
                "event_id: long, ts: timestamp_ntz, user_id: long, "
                "event_type: string, value: double, props: string",
            )
        sent_dir = d / "_sentinel_build"
        sentinel.coalesce(1).write.parquet(str(sent_dir))
        part = next(p for p in os.listdir(sent_dir) if p.endswith(".parquet"))
        shutil.move(str(sent_dir / part), d / "part-002-sentinel.parquet")
        shutil.rmtree(sent_dir)
        now = os.path.getmtime(d / "part-002-sentinel.parquet")
        os.utime(d / "part-000-real.parquet", (now - 120, now - 120))
        os.utime(d / "part-001-replay.parquet", (now - 60, now - 60))
        return str(d)

    def test_replay_collapses_to_batch_distinct(self, spark, dup_events_dir):
        from dblink_spark.streaming.events import dedup_event_stream

        stream = read_event_stream(spark, dup_events_dir, max_files_per_trigger=1)
        run_to_memory_sink(dedup_event_stream(stream), "dedup_events")
        got = [
            r["event_id"]
            for r in spark.table("dedup_events").collect()
            if r["event_id"] != 10**9
        ]
        expect = [
            r["event_id"]
            for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select("event_id")
            .distinct()
            .collect()
        ]
        assert len(got) == len(expect), "each replayed event must appear once"
        assert sorted(got) == sorted(expect)


class TestNearDedupDocStream:
    """Streaming MinHash near-dedup: row-local signature (no shuffle), one
    survivor per signature bucket, stream result == batch distinct-by-key."""

    @pytest.fixture(scope="class")
    def docs_dir(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("docs_stream")
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
        rows = [
            (r["doc_id"], r["text"], base + timedelta(seconds=int(r["doc_id"]) % 600))
            for r in docs.collect()
        ]
        # token-reordered twin of doc 0: same token SET -> same signature
        rows.append((10**9, " ".join(reversed(rows[0][1].split(" "))),
                     base + timedelta(seconds=700)))
        out = d / "docs"
        spark.createDataFrame(
            rows, "doc_id: long, text: string, event_time: timestamp"
        ).coalesce(1).write.parquet(str(out))
        return str(out)

    def _stream(self, spark, docs_dir):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType, TimestampType,
        )

        schema = StructType([
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("event_time", TimestampType()),
        ])
        return spark.readStream.schema(schema).parquet(docs_dir)

    def test_one_survivor_per_signature_and_matches_batch(self, spark, docs_dir):
        from dblink_spark.streaming.events import (
            minhash_key, near_dedup_doc_stream, run_to_memory_sink,
        )

        run_to_memory_sink(
            near_dedup_doc_stream(self._stream(spark, docs_dir)), "near_dedup_docs"
        )
        out = spark.table("near_dedup_docs").collect()
        keys = [r["near_key"] for r in out]
        assert len(keys) == len(set(keys)), "one survivor per signature bucket"

        batch = spark.read.parquet(docs_dir).select(
            minhash_key(F.col("text")).alias("near_key")
        )
        expect = {r["near_key"] for r in batch.distinct().collect()}
        assert set(keys) == expect, "stream survivors == batch distinct keys"

    def test_token_reordered_twin_is_suppressed(self, spark, docs_dir):
        # the synthetic twin (doc_id 10^9) has the same token set as doc 0:
        # exactly one of the pair survives
        out = spark.table("near_dedup_docs").collect()
        first_doc = (
            spark.read.parquet(docs_dir)
            .orderBy("doc_id")
            .limit(1)
            .collect()[0]["doc_id"]
        )
        survivors = {r["doc_id"] for r in out}
        assert len({first_doc, 10**9} & survivors) == 1

    def test_signature_plan_is_shuffle_free(self, spark, docs_dir):
        from dblink_spark.plans.audit import audit_plan
        from dblink_spark.streaming.events import minhash_key

        df = spark.read.parquet(docs_dir).select(
            "doc_id", minhash_key(F.col("text")).alias("k")
        )
        a = audit_plan(df)
        assert a.exchanges == 0, "signature computation must be row-local"
        assert a.python_ops == 0, "higher-order functions, not UDFs"


class TestIncrementalDedupStreamBatchParity:
    """VERDICT r9 task 8: the batch incremental dedup
    (`dedup_incremental_minhash`, new-batch-vs-persisted-index) and the
    streaming near-dedup twin must agree on novel/dup verdicts for the
    new-batch shape. The corpus is crafted so the regimes coincide
    exactly: duplicates are token-SET-identical (band collision iff true
    dup, Jaccard 1 passes the batch verify), the new batch is internally
    collision-free (the stream, which also suppresses new-vs-new, has
    nothing extra to suppress), and band geometry matches (4 bands x 4
    rows = the batch LSH's 16 hash families via the shared mh_mix)."""

    _OLD_IDS = [i for i in range(1, 30) if i % 10 != 0]
    # new batch = the doc_id % 10 == 0 stratum (the batch query's split):
    # 0 dups old doc 1 (token-reordered), 10 dups old doc 23 (exact copy),
    # 40 dups old doc 7; 20 and 30 are novel
    _DUP_OF = {0: 1, 10: 23, 40: 7}
    _NEW_IDS = [0, 10, 20, 30, 40]

    @pytest.fixture(scope="class")
    def corpus(self, spark, tmp_path_factory):
        import random

        from datetime import datetime, timedelta

        rng = random.Random(42)
        texts = {}
        for oid in self._OLD_IDS:
            toks = rng.sample([f"w{oid}_{j}" for j in range(40)], 20)
            texts[oid] = " ".join(toks)
        for nid in self._NEW_IDS:
            if nid in self._DUP_OF:
                src = texts[self._DUP_OF[nid]].split(" ")
                if nid == 0:  # reordered: same token SET, different text
                    texts[nid] = " ".join(reversed(src))
                else:
                    texts[nid] = " ".join(src)
            else:
                toks = rng.sample([f"n{nid}_{j}" for j in range(40)], 20)
                texts[nid] = " ".join(toks)

        d = tmp_path_factory.mktemp("incr_parity")
        doc_rows = [
            (i, t, "en", "s", len(t)) for i, t in sorted(texts.items())
        ]
        spark.createDataFrame(
            doc_rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(str(d / "documents.parquet"))

        base = datetime(2024, 1, 1)
        # OLD rows first in the single-partition file (stream order =
        # corpus order; the all-old-survive assertion below verifies the
        # ordering assumption loudly if a source ever reorders)
        stream_rows = [
            (i, texts[i], base + timedelta(seconds=i)) for i in self._OLD_IDS
        ] + [
            (i, texts[i], base + timedelta(seconds=600 + i))
            for i in self._NEW_IDS
        ]
        spark.createDataFrame(
            stream_rows, "doc_id long, text string, event_time timestamp"
        ).coalesce(1).write.parquet(str(d / "docs_stream"))
        return str(d)

    def test_stream_and_batch_agree_on_novelty(self, spark, corpus):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType, TimestampType,
        )

        from dblink_spark.queries import REGISTRY, materialized
        from dblink_spark.streaming.events import (
            near_dedup_doc_stream_banded, run_to_memory_sink,
        )

        with materialized(
            REGISTRY["dedup_incremental_minhash"].fn(spark, corpus)
        ) as df:
            batch = {r["doc_id"]: r for r in df.collect()}
        assert set(batch) == set(self._NEW_IDS)
        batch_dups = {i for i, r in batch.items() if not r["is_novel"]}
        # the constructed truth: exactly the planted duplicates
        assert batch_dups == set(self._DUP_OF)
        for nid, oid in self._DUP_OF.items():
            assert batch[nid]["rep_doc"] == oid

        schema = StructType([
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("event_time", TimestampType()),
        ])
        stream = spark.readStream.schema(schema).parquet(f"{corpus}/docs_stream")
        run_to_memory_sink(
            near_dedup_doc_stream_banded(
                stream, n_bands=4, rows_per_band=4
            ),
            "incr_parity_sink",
        )
        survivors = {
            r["doc_id"] for r in spark.table("incr_parity_sink").collect()
        }
        # every OLD doc survives (also proves the old-before-new stream
        # order the parity regime depends on)
        assert set(self._OLD_IDS) <= survivors
        stream_dups = {i for i in self._NEW_IDS if i not in survivors}
        assert stream_dups == batch_dups, (
            "stream and batch must issue identical novel/dup verdicts"
        )


class TestUrlDedupStream:
    """r11 streaming twin of dedup_url_canonical: canonicalize at ingest
    (shared spec with the batch query), keep the first crawl per canonical
    key — stream survivors == batch distinct canonical keys, and raw-URL
    noise (utm junk, fragments) never defeats the dedup."""

    @pytest.fixture(scope="class")
    def urls_dir(self, spark, tmp_path_factory):
        from datetime import datetime, timedelta

        d = tmp_path_factory.mktemp("url_stream")
        base = datetime(2024, 1, 1)
        rows = []
        for i in range(120):
            page = i % 30  # 4 crawls of each of 30 pages
            rows.append(
                (
                    i,
                    f"HTTP://WWW.site{page % 5}.example.com/p/{page}"
                    f"?utm_source=crawl{i}&ref=r1&utm_campaign=c#frag{i}",
                    base + timedelta(seconds=i),
                )
            )
        out = d / "urls"
        spark.createDataFrame(
            rows, "doc_id: long, url: string, event_time: timestamp"
        ).coalesce(1).write.parquet(str(out))
        return str(out)

    def _stream(self, spark, urls_dir):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType, TimestampType,
        )

        schema = StructType([
            StructField("doc_id", LongType()),
            StructField("url", StringType()),
            StructField("event_time", TimestampType()),
        ])
        return spark.readStream.schema(schema).parquet(urls_dir)

    def test_one_survivor_per_canonical_key(self, spark, urls_dir):
        from dblink_spark.queries.dedup import canonicalize_url
        from dblink_spark.streaming.events import (
            run_to_memory_sink, url_dedup_doc_stream,
        )

        run_to_memory_sink(
            url_dedup_doc_stream(self._stream(spark, urls_dir)), "url_dedup_docs"
        )
        out = spark.table("url_dedup_docs").collect()
        keys = [r["canon_url"] for r in out]
        assert len(keys) == len(set(keys)) == 30, "one survivor per page"
        # per-crawl noise must be gone from every survivor's canonical key
        assert all(
            "utm_" not in k and "#" not in k and not k.startswith("http")
            for k in keys
        )
        batch = spark.read.parquet(urls_dir).select(
            canonicalize_url(F.col("url")).alias("canon_url")
        )
        expect = {r["canon_url"] for r in batch.distinct().collect()}
        assert set(keys) == expect, "stream survivors == batch distinct keys"

    def test_canonicalization_is_stateless_and_shuffle_free(self, spark, urls_dir):
        from dblink_spark.plans.audit import audit_plan
        from dblink_spark.queries.dedup import canonicalize_url

        df = spark.read.parquet(urls_dir).select(
            "doc_id", canonicalize_url(F.col("url")).alias("canon_url")
        )
        a = audit_plan(df)
        assert a.exchanges == 0 and a.python_ops == 0


class TestSemanticDeconStream:
    """The eval-suite sweep at ingest: stream flags == the batch query's
    flags on the same corpus (the shared `decon_best_literal` spec), and
    the sweep is provably stateless/shuffle-free — the property that
    makes it legal in any output mode."""

    def test_stream_flags_match_batch(self, spark, tmp_path):
        from dblink_spark.queries import REGISTRY, materialized
        from dblink_spark.streaming.events import (
            run_to_memory_sink, semantic_decon_stream,
        )
        from pyspark.sql.types import (
            ArrayType, FloatType, IntegerType, LongType, StructField,
            StructType,
        )

        src = "/root/testdata/sf0.001"
        emb = spark.read.parquet(f"{src}/embeddings.parquet")
        # the SAME eval-membership rule the batch query uses
        from dblink_spark.queries.vectors import (
            _DECON_EVAL_CAP_ID, _DECON_EVAL_MOD,
        )

        is_eval = (F.col("vec_id") % _DECON_EVAL_MOD == 0) & (
            F.col("vec_id") < _DECON_EVAL_CAP_ID
        )
        evals = sorted(
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(is_eval).select("vec_id", "embedding").collect()
        )
        schema = StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ])
        # the fixture is a single parquet FILE; file-stream sources need a
        # directory, so replay it from a tmp copy
        stream_dir = str(tmp_path / "emb_stream")
        emb.coalesce(1).write.parquet(stream_dir)
        stream = (
            spark.readStream.schema(schema)
            .parquet(stream_dir)
            .filter(~is_eval)
        )
        run_to_memory_sink(
            semantic_decon_stream(stream, evals), "decon_stream"
        )
        got = {
            (r["vec_id"], r["eval_id"], r["cosine"])
            for r in spark.table("decon_stream").collect()
        }
        with materialized(
            REGISTRY["vector_semantic_decontaminate"].fn(spark, src)
        ) as out:
            want = {
                (r["vec_id"], r["eval_id"], r["cosine"])
                for r in out.collect()
            }
        assert got == want and len(got) > 0

    def test_sweep_is_stateless_and_shuffle_free(self, spark):
        from dblink_spark.plans.audit import audit_plan
        from dblink_spark.streaming.events import semantic_decon_stream

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        evals = [(0, [1.0] + [0.0] * 63), (25, [0.0, 1.0] + [0.0] * 62)]
        df = semantic_decon_stream(emb, evals)
        a = audit_plan(df)
        assert a.exchanges == 0 and a.python_ops == 0


class TestTransitionStream:
    """Streaming twin of the transition matrix's pair-counting core:
    one 3-field state row per user, per-batch pair increments, chains
    continuing across micro-batches."""

    def test_stream_pairs_match_batch(self, spark, tmp_path):
        """Replay the sf0.001 events through the stateful counter and
        roll up: the pair multiset must equal the batch query's
        n_transitions exactly (probabilities are read-time math on the
        same counts, so equality here is equality of the matrix)."""
        from dblink_spark.queries import REGISTRY
        from dblink_spark.streaming.events import (
            read_event_stream, run_to_memory_sink, transition_stream,
        )

        src = "/root/testdata/sf0.001"
        # the fixture is a single parquet FILE; the file stream source
        # needs a directory — restage it (values untouched)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        staged = str(tmp_path / "events.parquet")
        spark.read.parquet(f"{src}/events.parquet").write.parquet(staged)
        run_to_memory_sink(
            transition_stream(read_event_stream(spark, staged)),
            "trans_stream",
        )
        got = {
            (r["from_type"], r["to_type"]): r["n"]
            for r in spark.table("trans_stream")
            .groupBy("from_type", "to_type")
            .agg(F.sum("n_transitions").alias("n"))
            .collect()
        }
        want = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in REGISTRY["q_events_transition_matrix"]
            .fn(spark, src)
            .collect()
        }
        assert got == want

        # r14: in-order replays sail through the zero-tolerance audit and
        # report their rate as exactly zero
        from dblink_spark.streaming.events import audit_stream_ordering

        stats = audit_stream_ordering(spark.table("trans_stream"))
        assert stats["n_ooo"] == 0 and stats["ooo_fraction"] == 0.0

    def test_chain_continues_across_micro_batches(self, spark, tmp_path):
        """With maxFilesPerTrigger=1 and two time-ordered files, the
        bridging transition (last event of batch 1 -> first event of
        batch 2) must be counted — the one pair a stateless per-batch
        pass would miss."""
        from datetime import datetime, timedelta

        from dblink_spark.streaming.events import (
            read_event_stream, run_to_memory_sink, transition_stream,
        )

        base = datetime(2024, 1, 1)
        d = str(tmp_path / "events2.parquet")

        def write_file(rows, name):
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp_ntz, user_id long,"
                " event_type string, value double, props string",
            ).coalesce(1).write.mode("append").parquet(d)

        # file 1: A then B for user 7
        write_file(
            [(1, base + timedelta(seconds=1), 7, "A", 0.0, "{}"),
             (2, base + timedelta(seconds=2), 7, "B", 0.0, "{}")],
            "f1",
        )
        # file 2 (later events): C then A
        write_file(
            [(3, base + timedelta(seconds=3), 7, "C", 0.0, "{}"),
             (4, base + timedelta(seconds=4), 7, "A", 0.0, "{}")],
            "f2",
        )
        run_to_memory_sink(
            transition_stream(
                read_event_stream(spark, d, max_files_per_trigger=1)
            ),
            "trans_stream_mb",
        )
        got = {
            (r["from_type"], r["to_type"]): r["n"]
            for r in spark.table("trans_stream_mb")
            .groupBy("from_type", "to_type")
            .agg(F.sum("n_transitions").alias("n"))
            .collect()
        }
        # A->B within a batch; B->C ONLY if state bridges the batch
        # boundary; C->A within the second batch
        assert got == {("A", "B"): 1, ("B", "C"): 1, ("C", "A"): 1}

    def test_cross_batch_out_of_order_is_observable(self, spark, tmp_path):
        """VERDICT r12 task 7 + ADVICE: a user's event arriving in a
        LATER micro-batch with an EARLIER timestamp than the stored last.
        Pins BOTH documented behaviors: (a) the event chains from the
        stored last (its true predecessor already emitted — count-from-
        stored-last, so the pair multiset is (A,B) then (B,C) even though
        C is temporally first), and (b) the contract violation is
        OBSERVABLE as a (NULL, NULL, n) diagnostic row fed by the stored
        (last_us, last_eid) — in-order streams never emit it (the
        stream==batch equality test above would fail on any NULL key)."""
        from datetime import datetime, timedelta

        from dblink_spark.streaming.events import (
            read_event_stream, run_to_memory_sink, transition_stream,
        )

        base = datetime(2024, 1, 1)
        d = str(tmp_path / "events3.parquet")

        def write_file(rows):
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp_ntz, user_id long,"
                " event_type string, value double, props string",
            ).coalesce(1).write.mode("append").parquet(d)

        # batch 1: A (t+10s) then B (t+20s) for user 7
        write_file(
            [(10, base + timedelta(seconds=10), 7, "A", 0.0, "{}"),
             (11, base + timedelta(seconds=20), 7, "B", 0.0, "{}")],
        )
        # batch 2: C arrives LATE with ts t+5s — older than stored last
        write_file(
            [(12, base + timedelta(seconds=5), 7, "C", 0.0, "{}")],
        )
        run_to_memory_sink(
            transition_stream(
                read_event_stream(spark, d, max_files_per_trigger=1)
            ),
            "trans_stream_ooo",
        )
        got = {
            (r["from_type"], r["to_type"]): r["n"]
            for r in spark.table("trans_stream_ooo")
            .groupBy("from_type", "to_type")
            .agg(F.sum("n_transitions").alias("n"))
            .collect()
        }
        assert got == {
            ("A", "B"): 1,
            ("B", "C"): 1,           # chained from stored last (documented)
            (None, None): 1,         # the violation, counted and visible
        }

        # r14 (VERDICT task 7): the consumer-side gate over the same sink —
        # default tolerance 0.0 fails loudly with the named error; a loose
        # tolerance returns the stats; and the stats arithmetic is exact
        import pytest as _pytest

        from dblink_spark.streaming.events import (
            OutOfOrderReplayError, audit_stream_ordering,
        )

        sink = spark.table("trans_stream_ooo")
        with _pytest.raises(OutOfOrderReplayError, match="stream==batch"):
            audit_stream_ordering(sink)
        # r15 (r14 ADVICE): the fraction is bounded — n_ooo/(n_ooo+n_pairs),
        # the share of ALL observed transitions, never above 1.0
        stats = audit_stream_ordering(sink, max_ooo_fraction=0.5)
        assert stats == {"n_ooo": 1, "n_pairs": 2, "ooo_fraction": 0.333333}
