"""Adversarial edge-corpus oracle checks: the driver gate runs the fixture
corpus; this module runs the SAME Spark-vs-DuckDB comparison on crafted
documents — empty text, single token, exact window-boundary token counts,
multi-byte unicode, repeated spaces — for the queries whose logic is most
sensitive to tokenization and offsets. A divergence that the benign fixture
can't expose fails here."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from dblink_spark.queries import REGISTRY
from dblink_spark.queries.text import _STOPWORDS
from tools.oracle_check import compare

# 128-token window / 96 stride boundaries, empty-ish strings, unicode,
# consecutive spaces (empty tokens), and a token that begins with digits
# (hash-prefix separator probe).
_PASSING_TEXT = (
    "the quick brown fox jumps over a lazy dog and runs into the forest "
    "while birds sing songs of morning light across quiet fields today"
)
_DOCS = [
    (0, "", "en", "src1"),
    (1, "solo", "en", "src1"),
    (2, " ".join(f"w{i}" for i in range(96)), "en", "src2"),     # = stride
    (3, " ".join(f"w{i}" for i in range(127)), "en", "src2"),    # window-1
    (4, " ".join(f"w{i}" for i in range(128)), "de", "src3"),    # = window
    (5, " ".join(f"w{i}" for i in range(129)), "de", "src3"),    # window+1
    (6, "héllo wörld é́ naïve café", "fr", "src4"),    # multibyte
    (7, "a  b   c", "en", "src4"),                                # empty toks
    (8, "12x 1 2x 12 x", "en", "src5"),                           # digit-lead
    (9, " ".join(f"w{i}" for i in range(224)) + " tail", "en", "src5"),
    (10, "solo", "en", "src0"),   # exact dup of doc 1, inside the benchmark source
    # Gopher-PASSING docs (25 words, mean word len 4.3, 4 stopwords, no '#')
    # for pipeline_corpus_prep: 11 pins the NULL-lang coalesce path; 12/13
    # are an identical pair inside 'en' — nonzero closure, survivor = 12
    # (equal length, smaller doc_id), so 'en' yields n_dupes_dropped >= 1.
    (11, _PASSING_TEXT, None, "src6"),
    (12, _PASSING_TEXT, "en", "src6"),
    (13, _PASSING_TEXT, "en", "src6"),
    # PII true positives for text_pii_redact: emails (incl. digit-bearing
    # local part and subdomain), digit runs at the 8/9 boundary, masks
    # adjacent to punctuation, and an email embedded mid-token.
    (14, "contact bob.smith+spam@mail.example.co and 123456789 now", "en", "src7"),
    (15, "short 12345678 run but a1b2@sub.domain.org stays", "en", "src7"),
    (16, "ids 9876543210123 touch,alice@ex.io,commas and (555)"
         " 4155550123456789 end", "en", "src7"),
    # Phone boundaries (r7): three separator styles match; a 7-digit local
    # and a bare 10-digit run do NOT (the bare run falls through to <NUM>).
    (17, "call 555-123-4567 or (555) 123 4567 or +1 555.123.4567 now",
         "en", "src8"),
    (18, "local 555-1234 seven digits and 4155550123 bare ten", "en", "src8"),
    # IPv4 boundaries (r7): valid quads at range edges and punctuation
    # match; 999.x octets and v-prefixed version strings do not.
    (19, "ping 10.0.0.1, then 255.255.255.255 works but v1.2.3.4 and"
         " 999.1.2.3 stay", "en", "src8"),
    (20, "fax +12 345-678-9012 abroad or 123456789012 raw", "en", "src8"),
    # Within-doc repetition (r10, text_dedup_repeated_ngrams): doc 21
    # repeats a NON-overlapping 8-gram (rep1..rep8 ... rep1..rep8) — the
    # second span excises cleanly; doc 22 is one token repeated 10 times —
    # the SELF-OVERLAPPING edge where excised later spans overlap the kept
    # first span and the doc collapses to a single token. Tokens are
    # corpus-unique so no cross-doc query is perturbed.
    (21, " ".join(f"rep{j}" for j in range(1, 9)) + " fillx1 fillx2 fillx3 fillx4 "
         + " ".join(f"rep{j}" for j in range(1, 9)), "en", "src9"),
    (22, " ".join(["zrpt"] * 10), "en", "src9"),
]

_QUERIES = [
    "text_chunk_windows",
    "q_docs_sample_split",
    # NULL lang -> 'und' stratum; singleton languages kept whole
    "q_docs_lang_rebalance",
    # alpha-resampling on wildly uneven strata: singleton fr/und targets
    # round to 0-or-1 docs, the heavy en stratum is budget-capped, the
    # sqrt-quantized weights exercise tiny-count edges (sqrt(1), sqrt(2))
    "q_docs_alpha_mixture",
    "text_token_count",
    "text_token_count_bpe",  # unicode + digit-lead + empty docs pin the regex
    # empty-token exclusion (doc 7), unicode tokens, und stratum, rank ties
    "text_vocab_topk",
    "dedup_exact",
    # NULL-lang docs route through the 'und' path segment; the exact-dup
    # texts (1/10, 11-13) do NOT collide here — different doc_ids derive
    # different pages, pinning that this pass keys on metadata, not text
    "dedup_url_canonical",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_bottomk_jaccard",
    "dedup_components",
    "dedup_survivors",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_gopher_rules",
    "text_repetition",   # 1-token docs: descending sequence(1,0) ANSI crash, fixed
    "text_decontaminate",
    # bloom membership on the same corpus: the src0 'solo' doc is sub-8
    # tokens (EMPTY benchmark gram set -> all-zero bitset, nothing
    # flagged), pinning the empty-bench edge both engines must agree on
    "text_bloom_decontaminate",
    # sub-8-token docs exercise the n_grams=0 guard; identical docs 11-13
    # drive a 100%-boilerplate fraction
    "text_boilerplate_grams",
    # span surgery: identical docs 11-13 are fully excised on ALL copies,
    # sub-8-token docs pass through untouched, doc 9's shared w0.. prefix
    # is cut mid-document
    "text_strip_boilerplate",
    # within-doc twin: doc 21's non-overlapping repeat, doc 22's
    # self-overlapping run, everything else untouched
    "text_dedup_repeated_ngrams",
    # maximal-span gate: identical 25-token docs 11-13 clear the 16-token
    # floor and excise fully; doc 9's long shared w0.. prefix run-merges
    # into one island; isolated shared 8-grams stay below the floor
    "text_strip_maximal_spans",
    # gap-tolerant twin on the same corpus: the edge docs' covered runs
    # are either contiguous or separated by >7 fresh tokens, so here it
    # must agree with the exact-island surgeon everywhere EXCEPT where a
    # merged span crosses the floor (the dedicated pathology test pins
    # the bridging behavior itself)
    "text_strip_gapped_spans",
    # end-to-end composition: NULL-lang coalesce, mostly-failing quality
    # gate, and a passing identical pair driving a nonzero closure
    "pipeline_corpus_prep",
    "text_pii_redact",   # true positives live ONLY here (fixture is clean)
    # heavy score ties (most edge docs score 0.0/0.2) pin the deterministic
    # tie-break chain (score DESC, n_tokens DESC, doc_id ASC) across engines
    "q_docs_top_quality_per_lang",
    # 0-bigram docs (empty/single-token -> NULL nll), holdout docs with
    # fully-OOV bigrams (exact 20.0-bit backoff), train/holdout split edges
    "text_lm_bigram_nll",
    # new-batch docs 0/10/20 vs the rest as prior index; doc 10 is an exact
    # dup of prior doc 1 -> non-novel with rep_doc 1; 0 and 20 novel
    "dedup_incremental_minhash",
    # identical docs 11-13: every span of 12/13 first occurred in 11 ->
    # clean_text = '' (the all-dup edge); sub-span docs, empty text, and
    # within-doc repeats exercise keep-first-by-(doc_id, para_idx)
    "dedup_paragraphs",
    # per-source rank ties (sources hold 1-4 docs, scores mostly 0.0/0.2)
    # pin the deterministic tie-break; every source is under the k=10 cap
    "q_docs_source_cap",
    # NULL-lang budget stratum, heavy score ties, and the overshoot edge
    # (last pick may cross the budget) — every edge lang fits the budget,
    # so greedy takes all; the sf corpora exercise the exclusion arm
    "q_docs_token_budget_mix",
    # 23-doc id range yields all three delta statuses (2 added, 2 removed,
    # 2 changed — hash membership at the shared 90%/10% spec); the empty
    # doc 0 pins the ''-vs-NULL fingerprint distinction
    "q_docs_snapshot_diff",
    # shard/position determinism on adversarial ids; the NULL-lang and
    # duplicate-text docs prove the order depends on doc_id alone
    "q_docs_training_order",
    # tiny uneven strata: singleton fr/und rows, strata that vanish from
    # one snapshot entirely (full-outer edge), zero-guard shares
    "q_docs_snapshot_drift",
    # tiny-corpus budget ((3*n) div 10 docs), heavy rank_key ties from the
    # identical triplet, and sub-10-token docs in the 0-point stratum
    "q_docs_quality_quantile_gate",
    # every edge source holds 1-4 docs, all under the min-docs evidence
    # floor — the whole corpus must drop on provenance alone
    "q_docs_domain_filter",
    # strata of wildly different sizes (en heavy, NULL->'und' tiny): the
    # und stratum binds the budget and its epochs_milli must hit the cap
    "q_docs_mixture_recipe",
    # single-token docs, exact-dup texts (identical tf vectors must get
    # identical keyword sets), unicode tokens, corpus-wide tokens at
    # idf16=0
    "text_tfidf_topk",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus") / "dir"
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in _DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _QUERIES)
def test_edge_corpus_matches_oracle(name, spark, edge_dir, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, edge_dir).toPandas()
    odf = duck.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name} on edge corpus: {problems}"
    assert len(sdf) > 0


def test_pii_redact_typed_counts(spark, edge_dir):
    """Engine agreement alone could bless a wrong pattern on both sides —
    pin the EXPECTED per-doc typed-mask counts for every PII boundary doc:
    three phone separator styles match, 7-digit locals and bare 10-digit
    runs don't (the bare run is a <NUM>), valid dotted quads at the octet
    range edges match while version strings and 999.x quads don't."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_pii_redact"].fn(spark, edge_dir).collect()
    }

    def counts(i):
        r = rows[i]
        return (r["n_emails"], r["n_phones"], r["n_ipv4"], r["n_longnums"])

    assert counts(14) == (1, 0, 0, 1)   # email + 9-digit run
    assert counts(15) == (1, 0, 0, 0)   # 8 digits is below the <NUM> floor
    assert counts(16) == (1, 0, 0, 2)   # (555) + 16-digit run is NOT a phone
    assert counts(17) == (0, 3, 0, 0)   # 555-123-4567 / (555) 123 4567 / +1 555.123.4567
    assert counts(18) == (0, 0, 0, 1)   # 7-digit local unmasked; bare 10 digits -> <NUM>
    assert counts(19) == (0, 0, 2, 0)   # 10.0.0.1 + 255.255.255.255; v1.2.3.4, 999.1.2.3 stay
    assert counts(20) == (0, 1, 0, 1)   # +12 345-678-9012; 12-digit run -> <NUM>
    # clean docs are byte-identical after the scrub (no false positives)
    assert rows[12]["chars_delta"] == 0
    scrubbed19 = rows[19]
    assert scrubbed19["redacted_fp"] != rows[12]["redacted_fp"]


def test_bloom_supersets_exact_decontamination(spark):
    """The Bloom law that makes it safe for decontamination: NO false
    negatives — every doc the exact join flags, the bitset flags too
    (false positives are allowed and expected at ~fill^4). Checked at
    both gate SFs where src0 carries real benchmark grams."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = {
            r["doc_id"]
            for r in REGISTRY["text_decontaminate"].fn(spark, sf).collect()
            if r["contaminated"]
        }
        bloom = {
            r["doc_id"]: r["flagged"]
            for r in REGISTRY["text_bloom_decontaminate"].fn(spark, sf).collect()
        }
        assert exact, sf  # fixture plants real contamination
        missed = [d for d in exact if not bloom.get(d)]
        assert not missed, (sf, missed)


def test_snapshot_drift_laws(spark, edge_dir):
    """Integer-law pins beyond engine agreement: shares are exact floor
    milli units summing to <= 1000 per side, drift_milli == |delta|,
    drifted == (drift > 20), and tv_milli is half the L1 distance —
    identical on every row."""
    rows = REGISTRY["q_docs_snapshot_drift"].fn(spark, edge_dir).collect()
    assert rows
    t_old = sum(r["n_old"] for r in rows)
    t_new = sum(r["n_new"] for r in rows)
    assert sum(r["share_old_milli"] for r in rows) <= 1000
    assert sum(r["share_new_milli"] for r in rows) <= 1000
    l1 = 0
    for r in rows:
        assert r["share_old_milli"] == (1000 * r["n_old"]) // t_old
        assert r["share_new_milli"] == (1000 * r["n_new"]) // t_new
        d = abs(r["share_new_milli"] - r["share_old_milli"])
        assert r["drift_milli"] == d
        assert r["drifted"] == (d > 20)
        l1 += d
    assert len({r["tv_milli"] for r in rows}) == 1
    assert rows[0]["tv_milli"] == l1 // 2


def test_alpha_mixture_flattens_distribution(spark, edge_dir):
    """The temperature-sampling law beyond engine agreement: realized
    stratum shares must be FLATTER than the raw distribution — every
    stratum's kept/target rate is non-increasing in stratum size (smaller
    strata keep a larger fraction), targets respect the half-corpus
    budget, and membership is downward-deterministic (kept docs are
    exactly those under the stratum threshold)."""
    rows = REGISTRY["q_docs_alpha_mixture"].fn(spark, edge_dir).collect()
    assert rows
    strata = {}
    for r in rows:
        strata.setdefault(r["lang"], r)
    kept_counts = {}
    for r in rows:
        kept_counts[r["lang"]] = kept_counts.get(r["lang"], 0) + 1
    total_docs = sum({r["lang"]: r["n_docs"] for r in rows}.values())
    total_target = sum({r["lang"]: r["target_docs"] for r in rows}.values())
    assert total_target <= total_docs // 2 + len(strata), "budget respected"
    # monotone flattening: target rate never increases with stratum size
    info = sorted(
        {(r["n_docs"], r["target_docs"]) for r in rows}
    )
    for (n1, t1), (n2, t2) in zip(info, info[1:]):
        assert t1 / n1 >= t2 / n2 - 1e-12, (info,)
    # whole-stratum keeps: target == n -> every doc of the stratum present
    for r in rows:
        if r["target_docs"] == r["n_docs"]:
            assert kept_counts[r["lang"]] == r["n_docs"]


def test_lang_rebalance_semantics(spark, edge_dir):
    """Pin the mixing semantics beyond engine agreement: the smallest
    strata (singleton 'fr' and NULL->'und') are kept whole, no stratum is
    amplified, and membership is decided by the salted doc key alone."""
    rows = REGISTRY["q_docs_lang_rebalance"].fn(spark, edge_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert by_lang.get("fr") == {6}, "singleton stratum must be kept whole"
    assert by_lang.get("und") == {11}, "NULL lang must form the und stratum"
    from collections import Counter

    totals = Counter(
        (lang if lang is not None else "und")
        for _, _, lang, _ in [(d[0], d[1], d[2], d[3]) for d in _DOCS]
    )
    for lang, kept in by_lang.items():
        assert len(kept) <= totals[lang], "rebalance must never amplify"


def test_boilerplate_grams_semantics(spark, edge_dir):
    """Engine agreement can't bless wrong thresholds — pin the semantics:
    identical docs 11/12/13 are 100% boilerplate against each other,
    sub-8-token docs take the zero-gram guard, and a doc with no
    cross-document 8-gram (doc 17) scores 0.0."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_boilerplate_grams"].fn(spark, edge_dir).collect()
    }
    for i in (11, 12, 13):  # identical triplet: every gram shared
        assert rows[i]["n_grams"] > 0
        assert rows[i]["n_boiler"] == rows[i]["n_grams"]
        assert rows[i]["boiler_frac"] == 1.0
    for i in (0, 1, 7):  # empty / 1-token / 3-token: no 8-grams at all
        assert rows[i]["n_grams"] == 0 and rows[i]["boiler_frac"] == 0.0
    # doc 9 shares its w0..wN prefix grams with docs 2-5 by construction —
    # a true positive, not a control; doc 17's sentence is corpus-unique
    assert rows[9]["n_boiler"] > 0
    assert rows[17]["n_grams"] > 0 and rows[17]["n_boiler"] == 0


def test_strip_boilerplate_semantics(spark, edge_dir):
    """Span-surgery pins beyond engine agreement: conservation
    (n_kept + n_removed == n_tokens on EVERY row), full excision of the
    identical triplet on all copies (strip-all, unlike dedup_paragraphs'
    keep-first), pass-through of sub-8-token docs, and byte-identical
    clean_text for untouched docs."""
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["text_strip_boilerplate"].fn(spark, edge_dir)
    ) as df:
        rows = {r["doc_id"]: r for r in df.collect()}
    originals = {i: t for i, t, _, _ in _DOCS}
    for i, r in rows.items():
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"], i
    # identical triplet: every 8-gram is cross-document -> ALL copies
    # stripped empty (including the first — strip-all semantics)
    for i in (11, 12, 13):
        assert rows[i]["n_removed"] == rows[i]["n_tokens"] > 0
        assert rows[i]["clean_text"] == ""
    # sub-8-token docs cannot carry an 8-gram: untouched, byte-identical
    for i in (0, 1, 6, 7, 8):
        assert rows[i]["n_removed"] == 0
        assert rows[i]["clean_text"] == originals[i]
    # doc 9 shares its w0.. prefix grams with docs 2-5 but its ' tail'
    # suffix is unique: partial excision, strictly between 0 and all
    assert 0 < rows[9]["n_removed"] < rows[9]["n_tokens"]
    assert rows[9]["clean_text"].endswith("tail")


def test_repeated_ngram_surgery_semantics(spark, edge_dir):
    """Within-doc surgery pins: doc 21's SECOND rep1..rep8 span is excised
    exactly (8 tokens gone, the filler and first span survive in order);
    doc 22's self-overlapping run collapses to one token (removal wins on
    shared positions — the documented conservative bias); docs without
    internal repeats pass through byte-identical; conservation holds on
    every row."""
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["text_dedup_repeated_ngrams"].fn(spark, edge_dir)
    ) as df:
        rows = {r["doc_id"]: r for r in df.collect()}
    originals = {i: t for i, t, _, _ in _DOCS}
    for i, r in rows.items():
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"], i
    # doc 21: 8 + 4 + 8 = 20 tokens; the second rep-span (positions
    # 13..20) is the only non-first gram occurrence
    assert rows[21]["n_tokens"] == 20 and rows[21]["n_removed"] == 8
    assert rows[21]["clean_text"] == (
        " ".join(f"rep{j}" for j in range(1, 9)) + " fillx1 fillx2 fillx3 fillx4"
    )
    # doc 22: grams start at 1..3, first kept, spans 2..9 and 3..10
    # excised -> only position 1 survives
    assert rows[22]["n_tokens"] == 10 and rows[22]["clean_text"] == "zrpt"
    assert rows[22]["n_removed"] == 9
    # cross-doc duplicates (11/12/13) have no WITHIN-doc repeats: untouched
    for i in (9, 11, 12, 13):
        assert rows[i]["n_removed"] == 0
        assert rows[i]["clean_text"] == originals[i]


def test_paragraph_dedup_semantics(spark, edge_dir):
    """Engine agreement can't bless wrong span surgery — pin the C4
    semantics: the identical triplet 11/12/13 keeps only doc 11's spans
    (12/13 reconstruct to the EMPTY string); a corpus-unique doc survives
    byte-identical; counts conserve (n_kept <= n_paras, and the kept spans
    rebuild exactly the prefix-ordered surviving text)."""
    from dblink_spark.queries import materialized

    with materialized(REGISTRY["dedup_paragraphs"].fn(spark, edge_dir)) as df:
        rows = {r["doc_id"]: r for r in df.collect()}
    originals = {i: t for i, t, _, _ in _DOCS}
    # all-dup docs: every span of 12/13 first occurred in 11
    assert rows[11]["n_kept"] == rows[11]["n_paras"] > 0
    assert rows[11]["clean_text"] == originals[11]
    for i in (12, 13):
        assert rows[i]["n_paras"] > 0 and rows[i]["n_kept"] == 0
        assert rows[i]["clean_text"] == ""
    # doc 10 duplicates doc 1's single span ('solo') -> dropped empty
    assert rows[1]["clean_text"] == "solo"
    assert rows[10]["n_kept"] == 0 and rows[10]["clean_text"] == ""
    # corpus-unique spans survive byte-identical; conservation everywhere
    assert rows[6]["clean_text"] == originals[6]
    for i, r in rows.items():
        assert 0 <= r["n_kept"] <= r["n_paras"], i
    # empty text: one empty-string span, corpus-first occurrence wins once
    assert rows[0]["n_paras"] == 1


def test_chunking_window_boundaries(spark, edge_dir):
    """Exact-boundary docs chunk as the spec says: <=128 tokens -> one
    chunk; 129 tokens -> two (second = the 33-token overlap tail)."""
    out = REGISTRY["text_chunk_windows"].fn(spark, edge_dir)
    per_doc = {
        r["doc_id"]: r["cnt"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_doc[0] == 1  # empty text -> one empty chunk
    # docs that FIT one window -> exactly one chunk (incl. the 127/128
    # boundary cases that previously emitted a fully-overlapped tail)
    assert per_doc[2] == 1 and per_doc[3] == 1 and per_doc[4] == 1
    assert per_doc[5] == 2  # 129 tokens: [1..128] + 33-token tail [97..129]
    assert per_doc[9] == 3  # 225 tokens: starts 1, 97, 193
    tail = (
        out.filter((F.col("doc_id") == 5) & (F.col("chunk_idx") == 1))
        .collect()[0]
    )
    assert tail["n_tokens"] == 129 - 96


# dirty-JSON payloads + extreme ids: the json query must agree with the
# oracle on EVERY PERMISSIVE-parse case (malformed, empty, NULL, string
# numbers, floats, arrays, missing field, int64 extremes), and the HLL /
# count-min queries on extreme ids.
_EVENTS = [
    (1, 7, "click", 1.0, '{"k": 7}'),
    (2, -(2**63), "click", 2.0, '{"k": "7"}'),       # string number -> null
    (3, 2**63 - 1, "click", 3.0, '{"k": 7.9}'),      # float -> null
    (4, 0, "view", 4.0, '{"k": null}'),
    (5, -1, "view", 5.0, "{bad"),                    # malformed -> null
    (6, 7, "view", 6.0, ""),                         # empty -> null
    (7, 8, "view", 7.0, None),                       # NULL props
    (8, 9, "buy", 8.0, '{"x": 1}'),                  # missing field
    (9, 10, "buy", 9.0, '{"k": [1]}'),               # wrong type
    (10, 11, "buy", 10.0, '{"k": 9223372036854775807}'),
    (11, 12, "buy", 11.0, '{"k": -5}'),
    # 2^63: JSON integer that does NOT fit int64 — Spark LongType parse
    # nulls it; the oracle must map it to NULL too (json_type 'UBIGINT'
    # excluded), not raise a cast-out-of-range (r5 ADVICE)
    (12, 13, "buy", 12.0, '{"k": 9223372036854775808}'),
]

_EVENT_QUERIES = [
    "q_events_json_props",
    "q_events_user_distinct_approx",
    "sketch_count_min",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events") / "dir"
    spark.createDataFrame(
        [(i, None, u, t, v, p) for i, u, t, v, p in _EVENTS],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_events(edge_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_edge_events_match_oracle(name, spark, edge_events_dir, duck_events):
    q = REGISTRY[name]
    sdf = q.fn(spark, edge_events_dir).toPandas()
    odf = duck_events.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name} on edge events: {problems}"
    assert len(sdf) > 0


def test_json_props_permissive_counts(spark, edge_events_dir):
    """Spot-check the PERMISSIVE accounting: of the 'view' rows only the
    null/malformed/empty/NULL-props quartet exists -> all missing."""
    out = {
        r["event_type"]: r
        for r in REGISTRY["q_events_json_props"].fn(spark, edge_events_dir).collect()
    }
    assert out["view"]["n"] == 4 and out["view"]["n_missing"] == 4
    assert out["click"]["n_missing"] == 2  # string + float k
    assert out["click"]["sum_k"] == 7
    assert out["buy"]["sum_k"] == 2**63 - 1 - 5
    assert out["buy"]["n_missing"] == 3  # missing field + array + 2^63 overflow


# zero-norm / duplicate / antipodal vectors: a single zero embedding (a
# failed encoder output) used to crash every cosine query with ANSI
# DIVIDE_BY_ZERO; guarded cosine defines it as 0.0 in BOTH engines.
_VECTOR_QUERIES = [
    "vector_norms_by_label",
    "ann_topk_cosine",
    "dedup_embedding_cosine_scaled",
    "ann_lsh_bucketed",
    "ann_ivf_untrained_baseline",
    # zero vector projects to all-zero coords; antipodal pair to negated
    # coords (floor asymmetry handled identically on both engines)
    "vector_random_projection",
    # corpus smaller than K -> every vector is its own centroid; the
    # zero vector's all-zero cosines tie across all 13 cells (cid-asc
    # break); the exact-dup pair must land in one cell and drop the later
    "dedup_semantic",
    # zero vector ties at conf 0.0 across all centroids (label-asc break);
    # the antipode classifies away from its source's label centroid
    "vector_centroid_classifier",
    # the zero vector's sq=0 sits far below its label's mean; the exact
    # duplicate pair must receive identical verdicts within their labels
    "vector_outlier_filter",
    # 13-vector corpus: tiny strata (some labels may miss train or valid
    # rows entirely -> NULL accuracies), the zero vector scored at conf 0,
    # huge binomial band from the tiny n_valid
    "vector_classifier_holdout",
]


@pytest.fixture(scope="module")
def edge_vectors_dir(spark, tmp_path_factory):
    import numpy as np

    d = tmp_path_factory.mktemp("edge_vectors") / "dir"
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=64).astype("float32")], i % 3)
        for i in range(10)
    ]
    rows.append((10, [0.0] * 64, 0))                      # zero vector
    rows.append((11, rows[0][1], 1))                      # exact duplicate
    rows.append((12, [float(-x) for x in rows[0][1]], 2))  # antipode
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_vectors(edge_vectors_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_vectors_dir}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _VECTOR_QUERIES)
def test_edge_vectors_match_oracle(name, spark, edge_vectors_dir, duck_vectors):
    q = REGISTRY[name]
    sdf = q.fn(spark, edge_vectors_dir).toPandas()
    odf = duck_vectors.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name} on edge vectors: {problems}"
    assert len(sdf) > 0


def test_zero_vector_never_ranks(spark, edge_vectors_dir):
    """The zero vector's guarded cosine is 0.0 everywhere, so it can only
    appear as a trailing zero-score neighbor, never as a near-dup pair."""
    out = REGISTRY["ann_topk_cosine"].fn(spark, edge_vectors_dir).toPandas()
    z = out[out["neighbor_id"] == 10]
    assert (z["cosine"] == 0.0).all()


# JOINT documents+embeddings corpus for the one multi-table query
# (hybrid_search): quality-boundary docs, a passing doc with a ZERO-NORM
# embedding, a passing doc with NO embedding row, an embedding with no doc,
# and a doc that is itself a query. r5 VERDICT gap #2.
def _tok_text(n):
    return " ".join(f"t{i}" for i in range(n))


_JOINT_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, _tok_text(20), "en", "s1", 150),     # passes; embedding ~ query 0
    (1, _tok_text(30), "en", "s1", 200),     # passes; ZERO-NORM embedding
    (2, _tok_text(25), "de", "s2", 300),     # passes; NO embedding row
    (3, _tok_text(40), "de", "s2", 50),      # fails n_chars >= 100
    (4, _tok_text(10), "fr", "s3", 100),     # both boundaries: 10 toks, 100 chars
    (5, _tok_text(9), "fr", "s3", 500),      # fails tokens >= 10
    (6, _tok_text(15), "en", "s4", 20000),   # n_chars upper boundary, passes
    (7, _tok_text(15), "en", "s4", 20001),   # fails n_chars <= 20000
]


@pytest.fixture(scope="module")
def edge_joint_dir(spark, tmp_path_factory):
    import numpy as np

    d = tmp_path_factory.mktemp("edge_joint") / "dir"
    spark.createDataFrame(
        _JOINT_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    rng = np.random.default_rng(13)

    def vec():
        return [float(x) for x in rng.normal(size=64).astype("float32")]

    rows = [(i, vec(), i % 3) for i in (0, 2, 3)]  # queries 0, 2, 3
    # vec 1 is the ZERO vector — and vec_id < 4 makes it BOTH query 1 (a
    # zero-norm query: guarded cosine 0 against everything, ranking falls
    # back to doc_id ties) AND passing doc 1's embedding
    rows.append((1, [0.0] * 64, 1))
    rows.append((4, vec(), 1))                     # boundary doc 4
    base0 = rows[0][1]
    rows.append((6, [v + 0.01 for v in base0], 0))  # doc 6 ~ near query 0
    rows.append((9, vec(), 2))                     # embedding with NO doc
    # NOTE: doc 8 has no embedding at all is implicit (no vec row); docs
    # 3/5/7 fail the quality filter; queries share the embeddings table,
    # so corpus docs 0..2 double as query vectors
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_joint(edge_joint_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_joint_dir}/{t}.parquet/*.parquet')"
        )
    return con


def test_hybrid_search_joint_edge_corpus(spark, edge_joint_dir, duck_joint):
    q = REGISTRY["hybrid_search"]
    sdf = q.fn(spark, edge_joint_dir).toPandas()
    odf = duck_joint.execute(q.oracle).fetchdf()
    problems = compare("hybrid_search", sdf, odf)
    assert not problems, f"hybrid_search on joint edge corpus: {problems}"
    assert len(sdf) > 0


def test_hybrid_search_joint_semantics(spark, edge_joint_dir):
    """Spot-check the join/filter semantics the hash can't explain:
    filter-failing and embedding-less docs never appear; the zero-norm doc
    scores exactly 0; the zero-norm QUERY ranks purely by doc_id ties; the
    near-duplicate of query 0 ranks first."""
    out = REGISTRY["hybrid_search"].fn(spark, edge_joint_dir).toPandas()
    # keep = filter-passing docs with embeddings: {0,1,2,4,6}
    assert set(out["doc_id"]) <= {0, 1, 2, 4, 6}
    z = out[out["doc_id"] == 1]
    assert (z["cosine"] == 0.0).all()
    q1 = out[out["query_id"] == 1].sort_values("rank")
    assert (q1["cosine"] == 0.0).all()  # zero-norm query: guarded everywhere
    # pure doc_id tiebreak; doc 1 absent (self: doc_id == query_id)
    assert list(q1["doc_id"]) == [0, 2, 4]
    top_q0 = out[(out["query_id"] == 0) & (out["rank"] == 1)]
    assert list(top_q0["doc_id"]) == [6]


def test_lm_bigram_nll_semantics(spark, edge_dir):
    """Engine agreement can't bless a wrong formula on both sides — pin the
    absolute semantics: (a) 0-bigram docs (empty / single-token) emit NULL
    nll_bits; (b) a holdout doc whose bigrams are ALL unseen scores exactly
    the 20.0-bit backoff (sum = -320*n -> nll = 20.0 identically); (c) the
    identical triplet 11/12/13 (11 and 13 in the train split) makes the
    holdout member 12 fully in-vocabulary and far more likely than backoff."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_lm_bigram_nll"].fn(spark, edge_dir).collect()
    }
    assert rows[0]["n_bigrams"] == 0 and rows[0]["nll_bits"] is None
    assert rows[1]["n_bigrams"] == 0 and rows[1]["nll_bits"] is None
    # doc 16 (holdout, unique PII-ish tokens): every bigram OOV
    assert rows[16]["n_oov"] == rows[16]["n_bigrams"] > 0
    assert rows[16]["nll_bits"] == pytest.approx(20.0)
    # doc 12 (holdout copy of train docs 11/13): fully in-vocab, likely
    assert rows[12]["n_oov"] == 0
    assert rows[12]["nll_bits"] < 10.0


def test_lm_qlp_matches_true_log2_on_grid():
    """The integer-shift quantization must equal floor(16*log2(c/t)) on a
    dense rational grid INCLUDING exact powers of two and near-boundary
    ratios — pure DuckDB + math, no Spark (the Spark expression tree is the
    same formula term-for-term; cross-engine equality is the parametrized
    edge test above plus the driver gate)."""
    import math

    from dblink_spark.queries.text import _LM_THRESHOLDS

    j_sql = " + ".join(
        f"(CASE WHEN r >= {th!r} THEN 1 ELSE 0 END)" for th in _LM_THRESHOLDS
    )
    pairs = [(c, t) for t in range(1, 80) for c in range(1, t + 1)]
    pairs += [(1, 2**40), (3, 2**40 + 1), (2**31 - 1, 2**31), (511, 512)]
    con = duckdb.connect()
    con.execute("CREATE TABLE g(c BIGINT, t BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?)", pairs)
    got = con.execute(
        f"""
        WITH a AS (SELECT c, t, length(bin(t)) - length(bin(c)) AS s0 FROM g),
        b AS (SELECT *, CASE WHEN (c << s0) >= t THEN s0 ELSE s0 + 1 END AS s FROM a),
        d AS (SELECT *, CAST((c << s) AS DOUBLE) / CAST(t AS DOUBLE) AS r FROM b)
        SELECT c, t, -16 * s + ({j_sql}) FROM d
        """
    ).fetchall()
    for c, t, qlp in got:
        assert qlp == math.floor(16 * math.log2(c / t)), (c, t, qlp)


def test_snapshot_diff_semantics(spark, tmp_path):
    """Value-level pins the parity gate can't isolate: a NULL-text doc
    present in BOTH snapshots is never 'changed' (null-safe fingerprint),
    an empty-text doc differs from a NULL-text doc (''-vs-sentinel), and
    every emitted status agrees with a direct membership/revision replay
    of the shared hash spec."""
    import hashlib

    d = str(tmp_path / "snap")
    spark.createDataFrame(
        [(i, None if i % 7 == 3 else f"body {i}") for i in range(40)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: r.asDict()
        for r in REGISTRY["q_docs_snapshot_diff"].fn(spark, d).collect()
    }

    def key(salt, i):
        return hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8]

    for i in range(40):
        in_old = key("snapold", i) < "e6666666"
        in_new = key("snapnew", i) < "e6666666"
        revised = key("snaprev", i) < "1999999a"
        text = None if i % 7 == 3 else f"body {i}"
        if not in_old and not in_new:
            assert i not in out
        elif in_old and not in_new:
            assert out[i]["status"] == "removed"
        elif in_new and not in_old:
            assert out[i]["status"] == "added"
        else:
            # both sides: changed IFF the revision marker fired on a
            # non-NULL text; NULL text revises to NULL (concat null-out)
            # so NULL-in-both is NEVER emitted
            if text is not None and revised:
                assert out[i]["status"] == "changed"
                assert out[i]["old_fp"] != out[i]["new_fp"]
            else:
                assert i not in out, f"unchanged doc {i} leaked into the Δ"


def test_training_order_partition_invariance(spark, tmp_path):
    """The 'global shuffle' contract: the (shard_id, pos) assignment is a
    pure function of doc_id — identical under any input partitioning or
    row order — and within each shard pos is exactly 1..n."""
    d = str(tmp_path / "ord")
    spark.range(0, 300).selectExpr(
        "id AS doc_id", "'t' AS text"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    fn = REGISTRY["q_docs_training_order"].fn
    base = sorted(map(tuple, fn(spark, d).collect()))

    # same corpus, adversarial partitioning: 13 hash partitions on a
    # content column — the result must be bit-identical
    d2 = str(tmp_path / "ord2")
    spark.read.parquet(d + "/documents.parquet").repartition(
        13, "text"
    ).write.parquet(d2 + "/documents.parquet")
    assert sorted(map(tuple, fn(spark, d2).collect())) == base

    by_shard = {}
    for shard, pos, doc, _ in base:
        by_shard.setdefault(shard, []).append(pos)
    assert sum(len(v) for v in by_shard.values()) == 300
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_semantic_dedup_edge_verdicts(spark, edge_vectors_dir):
    """Sharp value pins on the edge vectors: the exact duplicate (12=11's
    source pair 0/11) must drop with its source as representative at
    cosine ~1; the zero vector scores 0 against everything so it always
    survives; survivors plus drops partition the corpus."""
    out = (
        REGISTRY["dedup_semantic"]
        .fn(spark, edge_vectors_dir)
        .toPandas()
        .set_index("vec_id")
    )
    assert len(out) == 13
    assert not out.loc[11, "keep"] and out.loc[11, "rep_id"] == 0
    assert out.loc[11, "rep_cos"] > 0.999
    assert out.loc[10, "keep"] and out.loc[0, "keep"]
    assert (out["keep"] == out["rep_id"].isna()).all()


def test_classifier_holdout_contract(spark, edge_vectors_dir):
    """Contract semantics beyond engine agreement. On the SF fixtures the
    labels are independent of the embeddings, so the honest expectation is
    memorization-without-transfer: fit_ok AND leak_ok must BOTH hold
    (measured: train ~0.45 vs chance 0.1; valid ~0.04-0.08, inside the
    band). Structural pins everywhere: counts partition each label, the
    accuracy columns replay the count ratios, contract booleans are
    corpus-constant."""
    import math

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = (
            REGISTRY["vector_classifier_holdout"].fn(spark, sf).collect()
        )
        assert rows
        assert all(r["fit_ok"] for r in rows), sf
        assert all(r["leak_ok"] for r in rows), sf
        t_c = sum(r["n_correct_train"] for r in rows)
        t_n = sum(r["n_train"] for r in rows)
        v_c = sum(r["n_correct_valid"] for r in rows)
        v_n = sum(r["n_valid"] for r in rows)
        p = rows[0]["chance_acc"]
        assert t_c / t_n >= 2 * p, "memorization must clear 2x chance"
        assert v_c / v_n <= p + 5 * math.sqrt(p * (1 - p) / v_n)

    rows = (
        REGISTRY["vector_classifier_holdout"]
        .fn(spark, edge_vectors_dir)
        .collect()
    )
    for r in rows:
        if r["n_train"] == 0:
            assert r["train_acc"] is None
        else:
            assert r["train_acc"] == r["n_correct_train"] / r["n_train"]
        if r["n_valid"] == 0:
            assert r["valid_acc"] is None
    assert len({(r["fit_ok"], r["leak_ok"]) for r in rows}) == 1


def test_centroid_classifier_edge_verdicts(spark, edge_vectors_dir):
    """The zero vector's guarded cosine is 0.0 to every centroid, so the
    label-asc tie-break must predict label 0 at conf exactly 0.0; the
    exact-duplicate pair (0, 11) must receive identical predictions."""
    out = (
        REGISTRY["vector_centroid_classifier"]
        .fn(spark, edge_vectors_dir)
        .toPandas()
        .set_index("vec_id")
    )
    assert len(out) == 13
    assert out.loc[10, "pred_label"] == 0 and out.loc[10, "conf"] == 0.0
    assert out.loc[0, "pred_label"] == out.loc[11, "pred_label"]
    assert out.loc[0, "conf"] == out.loc[11, "conf"]


def test_quantile_gate_budget_and_maximality(spark, edge_dir):
    """The kept set must fit the (3*n) div 10 budget, be downward-closed
    in rank_key (everything at-or-above the threshold survives), and be
    MAXIMAL: admitting the next-best excluded bucket would bust the
    budget — the bucket-granular quantile contract."""
    docs = spark.read.parquet(f"{edge_dir}/documents.parquet")
    n = docs.count()
    budget = (3 * n) // 10
    kept = (
        REGISTRY["q_docs_quality_quantile_gate"].fn(spark, edge_dir).toPandas()
    )
    assert 0 < len(kept) <= budget
    thr = kept["threshold_key"].iloc[0]
    assert (kept["rank_key"] >= thr).all()
    # recompute every doc's rank_key independently (the same three
    # heuristics in pandas) to find the next-best excluded bucket
    rows = docs.select("doc_id", "text").toPandas()
    stop = set(_STOPWORDS)

    def rank_key(text):
        toks = text.split(" ")
        nt, nc = len(toks), len(text)
        ns = sum(1 for t in toks if t in stop)
        pts = (
            (5 if nt >= 10 else 0)
            + (3 if ns / nt >= 0.05 else 0)
            + (2 if 3.0 <= nc / nt <= 12.0 else 0)
        )
        return pts * 1000 + min(nt, 999)

    keys = sorted(rank_key(t) for t in rows["text"])
    excluded = [k for k in keys if k < thr]
    if excluded:
        next_bucket = max(excluded)
        overflow = len(kept) + sum(1 for k in keys if k == next_bucket)
        assert overflow > budget, "gate left budget on the table"


def test_domain_filter_verdict_consistency(spark, edge_dir):
    """Every edge source holds fewer than the min-docs evidence floor, so
    provenance alone must drop every doc; and all docs of one source must
    share one verdict and one scorecard (the verdict is a function of the
    source, never the doc)."""
    out = (
        REGISTRY["q_docs_domain_filter"].fn(spark, edge_dir).toPandas()
    )
    assert (~out["src_kept"]).all()
    per_src = out.groupby("source")[["src_n_docs", "src_mean_pts", "src_kept"]]
    assert (per_src.nunique() == 1).all().all()
    # scorecard counts reconcile with the corpus
    assert (
        out.groupby("source")["doc_id"].count()
        == out.groupby("source")["src_n_docs"].first()
    ).all()


def test_mixture_recipe_laws(spark, edge_dir):
    """The recipe's defining laws, recomputed from the emitted inventory:
    budget_total = min(avail * E * L); target = budget div L; the binding
    stratum's epochs_milli hits the 4-epoch cap exactly and nobody
    exceeds it; every column is reproducible integer arithmetic."""
    out = REGISTRY["q_docs_mixture_recipe"].fn(spark, edge_dir).toPandas()
    L = len(out)
    assert (out["n_strata"] == L).all()
    budget = int((out["avail_tokens"] * 4 * L).min())
    assert (out["budget_total"] == budget).all()
    assert (out["target_tokens"] == budget // L).all()
    expect_epochs = (budget // L) * 1000 // out["avail_tokens"]
    assert (out["epochs_milli"] == expect_epochs).all()
    assert out["epochs_milli"].max() == 4000
    assert (out["epochs_milli"] <= 4000).all()
    assert "und" in set(out["stratum"])


def test_tfidf_quantization_is_exact_ceil_log2(spark, edge_dir):
    """idf16 must equal ceil(16*log2(N/df)) EXACTLY — verified with
    arbitrary-precision integers (N^16 <= df^16 * 2^idf16 < 2 * N^16),
    not float log2; plus rank-shape invariants (rn dense from 1, <= k,
    deterministic (score desc, token asc) order) and the exact-duplicate
    docs carrying identical keyword sets."""
    docs = spark.read.parquet(f"{edge_dir}/documents.parquet")
    n_docs = docs.count()
    out = REGISTRY["text_tfidf_topk"].fn(spark, edge_dir).toPandas()
    for df_val, idf16 in (
        out[["df", "idf16"]].drop_duplicates().itertuples(index=False)
    ):
        df_i, k = int(df_val), int(idf16)
        if df_i == n_docs:
            assert k == 0
            continue
        lhs = df_i**16 * 2**k
        assert n_docs**16 <= lhs < 2 * n_docs**16, (df_i, k)
    for _, g in out.groupby("doc_id"):
        g = g.sort_values("rn")
        assert list(g["rn"]) == list(range(1, len(g) + 1))
        assert len(g) <= 5
        key = list(zip(-g["score"], g["token"]))
        assert key == sorted(key)
    # exact-duplicate texts -> identical (token, tf, score, rn) sets
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
        if r["text"] is not None
    }
    by_text = {}
    for did, t in texts.items():
        by_text.setdefault(t, []).append(did)
    dup_groups = [v for v in by_text.values() if len(v) > 1]
    assert dup_groups, "edge corpus must contain duplicate texts"
    for grp in dup_groups:
        sets = {
            frozenset(
                zip(g["token"], g["tf"], g["score"], g["rn"])
            )
            for _, g in out[out["doc_id"].isin(grp)].groupby("doc_id")
        }
        assert len(sets) == 1, grp


def test_outlier_filter_edge_verdicts(spark, edge_vectors_dir):
    """Small-n MASKING, pinned exactly: with only n=5 members per label,
    no point can strictly exceed 2 population standard deviations —
    Samuelson's inequality caps z^2 at n-1 = 4 exactly — so even the
    zero vector (sq=0, the label's extreme deviation) must NOT be
    flagged; its z^2 must still sit near that algebraic maximum. The
    exact-duplicate pair shares sq, and each label's carried moments are
    internally consistent (n_label matches the actual member count)."""
    out = (
        REGISTRY["vector_outlier_filter"]
        .fn(spark, edge_vectors_dir)
        .toPandas()
        .set_index("vec_id")
    )
    assert len(out) == 13
    assert out.loc[10, "sq"] == 0
    assert not out["is_outlier"].any(), "n<=5 labels: masking forbids flags"
    z2 = (out.loc[10, "sq"] - out.loc[10, "label_mean"]) ** 2 / out.loc[
        10, "label_var"
    ]
    n = out.loc[10, "n_label"]
    assert z2 <= (n - 1) + 1e-9, "Samuelson bound"
    assert z2 > 0.8 * (n - 1), "zero vector must be near the extreme"
    assert out.loc[0, "sq"] == out.loc[11, "sq"]
    counts = out.groupby("label")["n_label"].first()
    actual = out.groupby("label").size()
    assert (counts == actual).all()


def test_url_canonical_rules(spark, edge_dir):
    """Pin the canonicalization semantics beyond engine agreement: scheme
    case / www / utm params / fragments / trailing slash are all removed,
    surviving params are sorted, and two doc_ids agreeing on
    (source, lang, doc_id mod 50, ref mod 4) — the canonical content —
    dedup regardless of their raw-URL noise."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_url_canonical"].fn(spark, edge_dir).collect()
    }
    for r in rows.values():
        c = r["canon_url"]
        assert not c.startswith(("http", "HTTP", "www."))
        assert "utm_" not in c and "#" not in c and "WWW" not in c
        assert not c.split("?")[0].endswith("/")
        assert r["rep_doc"] <= r["doc_id"]
        assert r["keep"] == (r["doc_id"] == r["rep_doc"])
    # docs 12 and 16: both en, doc_id%50 differs -> no collision; construct
    # the one collision pair present in the edge ids: none share
    # (source, lang, id%50, id%4), so every doc is its own canonical rep
    groups: dict = {}
    for r in rows.values():
        groups.setdefault(r["canon_url"], []).append(r["doc_id"])
    for ids in groups.values():
        for i in ids:
            assert rows[i]["rep_doc"] == min(ids)
            assert rows[i]["n_crawls"] == len(ids)


def test_url_canonical_collides_across_noise(spark, tmp_path):
    """Two crawls of the same page must dedup even when their raw URLs
    disagree on the noise axes the canonicalizer removes: docs 700 and 800
    share the canonical content (source, lang, id%50=0, ref=id%4=0) but
    differ in per-crawl utm_source AND fragment presence (700%7==0 carries
    '#sec-700', 800 carries none). Note the derivation makes scheme-case/
    www/trailing-slash agree within any collision group (id%2 and id%5
    can't differ when id%100 agrees) — those axes are pinned by the
    no-noise-survives assertions in test_url_canonical_rules."""
    rows = [(700, "a", "en", "sx"), (800, "b", "en", "sx"),
            (101, "c", "en", "sx")]
    d = str(tmp_path / "urls")
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_url_canonical"].fn(spark, d).collect()
    }
    assert out[700]["url"] != out[800]["url"]
    assert "#sec-700" in out[700]["url"] and "#" not in out[800]["url"]
    assert out[700]["canon_url"] == out[800]["canon_url"]
    assert out[800]["rep_doc"] == 700 and not out[800]["keep"]
    assert out[700]["keep"] and out[700]["n_crawls"] == 2
    # different page (id%50=1) never collides despite same source/lang
    assert out[101]["n_crawls"] == 1 and out[101]["keep"]


def test_url_canonical_double_question_mark(spark):
    """ADVICE r11: RFC 3986 allows literal '?' INSIDE the query string.
    The query must be everything after the FIRST '?' (the oracle's
    strpos/substr semantics) — the old substring_index(url, '?', -1)
    took the LAST '?' and silently mis-keyed such URLs. Pin Spark ==
    DuckDB-oracle-expression on an adversarial corpus that the fixture
    derivation can never emit (it only ever builds one '?')."""
    import duckdb

    urls = [
        # second '?' inside the query: 'b=2?c=3' is ONE param value
        "https://ex.com/p?a=1&b=2?c=3",
        # '?' in query AND a fragment carrying its own '?'
        "HTTP://WWW.Ex.com/p/?z=9?y=8&utm_source=x#frag?notquery",
        # '?' only inside the fragment: query is empty
        "https://ex.com/p#frag?x=1",
        "https://ex.com/p??",  # empty-ish params, double '?' immediately
        "https://ex.com/plain",
    ]
    from dblink_spark.queries.dedup import canonicalize_url

    got = [
        r["c"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    expect = [
        r[0]
        for r in con.execute("""
            WITH parts AS (
              SELECT url, regexp_replace(url, '[?#].*$', '') AS base,
                CASE WHEN strpos(url, '?') > 0
                  THEN regexp_replace(substr(url, strpos(url, '?') + 1),
                                      '#.*$', '')
                  ELSE '' END AS query
              FROM u
            )
            SELECT rtrim(regexp_replace(regexp_replace(lower(base),
                     '^https?://', ''), '^www\\.', ''), '/')
              || CASE WHEN kept <> '' THEN '?' || kept ELSE '' END
            FROM (
              SELECT url, base,
                array_to_string(list_sort(list_filter(
                  string_split(query, '&'),
                  x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&')
                AS kept
              FROM parts)
            ORDER BY url
        """).fetchall()
    ]
    assert sorted(got) == sorted(expect)
    # and the first-'?' semantics explicitly: the whole tail is the query
    by_url = dict(zip(urls, got))
    assert by_url["https://ex.com/p?a=1&b=2?c=3"] == "ex.com/p?a=1&b=2?c=3"
    # known shared quirk, pinned so it can't drift one-sided: a '?' that
    # first appears INSIDE the fragment still starts the query span in
    # BOTH engines (strpos/first-match doesn't know about '#'); the
    # fragment marker itself is stripped afterwards on both sides
    assert by_url["https://ex.com/p#frag?x=1"] == "ex.com/p?x=1"


def test_maximal_span_length_gate(spark, tmp_path):
    """The Lee-et-al distinction the fixed-granularity surgeons can't
    make (VERDICT r10 'What's missing' #3): a 40-token block shared by
    two docs is excised IN FULL (one merged island >= the 16-token
    floor), while an 8-token shared idiom survives — on the SAME corpus
    where text_strip_boilerplate removes both."""
    block = " ".join(f"blk{j}" for j in range(40))
    idiom = " ".join(f"idm{j}" for j in range(8))

    def doc(pre, mid, n=20):
        return " ".join(f"{pre}{j}" for j in range(n)) + " " + mid + " " + \
            " ".join(f"{pre}t{j}" for j in range(n))

    rows = [
        (0, doc("aa", block), "en", "s1"),
        (1, doc("bb", block), "en", "s1"),
        (2, doc("cc", idiom), "en", "s2"),
        (3, doc("dd", idiom), "en", "s2"),
    ]
    d = str(tmp_path / "span_corpus")
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")

    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["text_strip_maximal_spans"].fn(spark, d)
    ) as df:
        maximal = {r["doc_id"]: r for r in df.collect()}
    with materialized(
        REGISTRY["text_strip_boilerplate"].fn(spark, d)
    ) as df:
        fixed = {r["doc_id"]: r for r in df.collect()}

    for i in (0, 1):  # 40-token block: both surgeons excise exactly it
        assert maximal[i]["n_removed"] == 40, maximal[i]
        assert fixed[i]["n_removed"] == 40
        assert "blk0" not in maximal[i]["clean_text"]
        assert maximal[i]["n_kept"] + maximal[i]["n_removed"] == maximal[i]["n_tokens"]
    for i in (2, 3):  # 8-token idiom: below the floor -> maximal keeps it
        assert maximal[i]["n_removed"] == 0, maximal[i]
        assert "idm0" in maximal[i]["clean_text"]
        assert fixed[i]["n_removed"] == 8, "fixed surgeon strips the idiom"
        assert maximal[i]["n_kept"] + maximal[i]["n_removed"] == maximal[i]["n_tokens"]


def test_funnel_requires_sequential_order(spark, tmp_path):
    """The property that makes it a funnel and not four existence checks:
    user 1 does signup->view->click->purchase in order (converts fully);
    user 2 has all four types but the purchase PRECEDES the click (stops
    at click); user 3 views before signing up (stops at signup); user 4
    re-views after a later signup (second view counts — chained minima,
    not first-occurrence); same-timestamp stages count (>= semantics)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)

    def ev(eid, uid, sec, etype):
        return (eid, base + timedelta(seconds=sec), uid, etype, 0.0, "{}")

    rows = [
        ev(1, 1, 10, "signup"), ev(2, 1, 20, "view"),
        ev(3, 1, 20, "click"),          # same-ts as view: >= counts
        ev(4, 1, 40, "purchase"),
        ev(5, 2, 10, "signup"), ev(6, 2, 20, "view"),
        ev(7, 2, 25, "purchase"),       # BEFORE the click -> no conversion
        ev(8, 2, 30, "click"),
        ev(9, 3, 20, "view"), ev(10, 3, 30, "signup"),  # view too early
        ev(11, 4, 5, "view"), ev(12, 4, 10, "signup"),
        ev(13, 4, 15, "view"),          # the re-view after signup counts
    ]
    d = str(tmp_path / "funnel_events")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    out = {
        r["stage"]: r
        for r in REGISTRY["q_events_funnel"].fn(spark, d).collect()
    }
    assert out["signup"]["n_users"] == 4
    assert out["view"]["n_users"] == 3       # users 1, 2, 4
    assert out["click"]["n_users"] == 2      # users 1, 2
    assert out["purchase"]["n_users"] == 1   # user 1 only
    assert out["view"]["conv_milli"] == (1000 * 3) // 4
    assert out["purchase"]["conv_milli"] == 500
    assert out["signup"]["conv_milli"] == 1000


def test_funnel_bot_user_bounded_state(spark, tmp_path):
    """VERDICT r11 task 4: one bot user with 10⁵ events must flow through
    the funnel with BOUNDED memory. The r12 window formulation buffers
    each user's rows in a spillable array — forced onto the
    UnsafeExternalSorter path here by dropping
    `spark.sql.windowExec.buffer.in.memory.threshold` to 1024 rows
    (every row past 1024 goes through the disk-backed sorter; the
    spill.threshold itself stays at its 4096 default — grinding it to
    ~64 makes thousands of spill FILES per window, which is its own
    pathology) — where the old collect_list built one 10⁵-struct
    in-memory aggregation buffer with no spill path at all. Results must
    be exact either way: the bot converts (its events interleave all
    four stages in order), the one human converts, and the plan stays
    window-based (no collect_list) with one corpus-sized exchange."""
    from datetime import datetime, timedelta

    from dblink_spark.plans.audit import audit_plan, formatted_plan

    base = datetime(2024, 1, 1)
    stages = ["signup", "view", "click", "purchase"]
    rows = []
    # bot user 7: 100k events cycling the four types in funnel order
    for i in range(100_000):
        rows.append(
            (i, base + timedelta(seconds=i), 7, stages[i % 4], 0.0, "{}")
        )
    # one human control
    for j, st in enumerate(stages):
        rows.append(
            (200_000 + j, base + timedelta(seconds=j), 8, st, 0.0, "{}")
        )
    d = str(tmp_path / "bot_events")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(d + "/events.parquet")
    key = "spark.sql.windowExec.buffer.in.memory.threshold"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "1024")
    try:
        df = REGISTRY["q_events_funnel"].fn(spark, d)
        plan = formatted_plan(df)
        assert "collect_list" not in plan, "funnel must not buffer structs"
        assert plan.count("Window") >= 1
        # exactly two exchanges: the ONE corpus-sized user_id hash (all
        # four windows AND the per-user first() agg reuse it) plus the
        # SinglePartition fold that moves 4 counters per partition
        assert audit_plan(df).exchanges == 2
        out = {r["stage"]: r["n_users"] for r in df.collect()}
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert out == {"signup": 2, "view": 2, "click": 2, "purchase": 2}


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        f"{d}/{name.split('_')[-1]}.parquet"
    )
    return d


def test_q17_integer_threshold_boundary(spark, tmp_path):
    """The Q17 correlated-average boundary in exact integers: a line whose
    quantity is STRICTLY below 20% of its part's average counts; a line
    landing exactly ON the boundary (5*qty*cnt == sum_qty) does not; other
    brands never enter. Part A: quantities [1,10,10,19] (sum 40, cnt 4) —
    only qty=1 qualifies (20 < 40). Part B: [2,18] (sum 20, cnt 2) —
    qty=2 gives 5*2*2 == 20, excluded by the strict inequality."""
    d = str(tmp_path / "q17")
    spark.createDataFrame(
        [(1, "Brand#23"), (2, "Brand#23"), (3, "Brand#9")],
        "p_partkey long, p_brand string",
    ).write.parquet(d + "/part.parquet")
    lines = [
        (1, 1.0, 700.0), (1, 10.0, 1.0), (1, 10.0, 1.0), (1, 19.0, 1.0),
        (2, 2.0, 999.0), (2, 18.0, 1.0),
        (3, 1.0, 123456.0),  # wrong brand: its tiny quantity must not leak
        (3, 99.0, 1.0),
    ]
    spark.createDataFrame(
        lines, "l_partkey long, l_quantity double, l_extendedprice double"
    ).write.parquet(d + "/lineitem.parquet")
    [row] = REGISTRY["q17_small_quantity_revenue"].fn(spark, d).collect()
    assert row["n_lines"] == 1
    assert row["avg_yearly"] == 700.0 / 7.0


def test_q15_exact_tie_emits_all_winners(spark, tmp_path):
    """Q15's max filter compares DECIMAL-exact revenues, so two suppliers
    with identical quarterly revenue BOTH win (a double round-trip that
    split the tie would emit one row and flip the gate hash); revenue
    outside the date window never counts."""
    from dblink_spark.queries import materialized

    d = str(tmp_path / "q15")
    spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    ).write.parquet(d + "/supplier.parquet")
    import datetime

    inw = datetime.datetime(1996, 2, 1)
    outw = datetime.datetime(1997, 2, 1)
    lines = [
        (1, 100.0, 0.10, inw),
        (2, 90.0, 0.0, inw),    # 90.00 == 100*(1-0.10): exact tie
        (3, 89.99, 0.0, inw),   # just below
        (3, 5000.0, 0.0, outw),  # outside the quarter: ignored
    ]
    spark.createDataFrame(
        lines,
        "l_suppkey long, l_extendedprice double, l_discount double,"
        " l_shipdate timestamp",
    ).write.parquet(d + "/lineitem.parquet")
    with materialized(REGISTRY["q15_top_supplier"].fn(spark, d)) as out:
        rows = sorted((r["name"], r["total_revenue"]) for r in out.collect())
    assert rows == [("S1", 90.0), ("S2", 90.0)]


def test_q21_sole_blame_semantics(spark, tmp_path):
    """The Q21 EXISTS/NOT-EXISTS conjunction, pinned case by case: sole
    flagged supplier on a multi-supplier finished order counts; an order
    where TWO suppliers are flagged counts for neither (NOT EXISTS); a
    single-supplier order counts for nobody (EXISTS); an open order never
    counts (status filter)."""
    d = str(tmp_path / "q21")
    spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    ).write.parquet(d + "/supplier.parquet")
    spark.createDataFrame(
        [(10, "F"), (20, "F"), (30, "F"), (40, "O"), (50, "F")],
        "o_orderkey long, o_orderstatus string",
    ).write.parquet(d + "/orders.parquet")
    lines = [
        (10, 1, "R"), (10, 2, "N"),              # S1 solely blamed
        (20, 1, "R"), (20, 2, "R"),              # both flagged -> neither
        (30, 1, "R"),                            # single-supplier -> nobody
        (40, 1, "R"), (40, 2, "N"),              # open order -> nobody
        (50, 2, "R"), (50, 1, "N"), (50, 3, "N"),  # S2 solely blamed
    ]
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long, l_returnflag string"
    ).write.parquet(d + "/lineitem.parquet")
    out = {
        r["name"]: r["numwait"]
        for r in REGISTRY["q21_blamed_supplier"].fn(spark, d).collect()
    }
    assert out == {"S1": 1, "S2": 1}


def test_q22_dormancy_and_threshold(spark, tmp_path):
    """Q22 semantics: only nation-subset customers enter; the average is
    over POSITIVE balances only; a dormant above-average customer counts,
    a below-average dormant one does not, an above-average customer with
    a recent order does not, and a customer with NO orders at all is
    dormant (the anti join's vacuous case)."""
    import datetime

    d = str(tmp_path / "q22")
    custs = [
        (1, 0, 100.0),    # below avg
        (2, 0, 900.0),    # above avg, dormant (old order only)
        (3, 0, 1000.0),   # above avg, RECENT order -> excluded
        (4, 0, -50.0),    # negative: excluded from the average
        (5, 1, 99999.0),  # nation 1: outside the subset entirely
        (6, 0, 800.0),    # above avg, NO orders at all -> dormant
    ]
    spark.createDataFrame(
        custs, "c_custkey long, c_nationkey int, c_acctbal double"
    ).write.parquet(d + "/customer.parquet")
    old = datetime.datetime(1999, 1, 1)
    recent = datetime.datetime(2001, 1, 1)
    spark.createDataFrame(
        [(2, old), (3, recent), (1, old)],
        "o_custkey long, o_orderdate timestamp",
    ).write.parquet(d + "/orders.parquet")
    # avg over positive nation-0 balances: (100+900+1000+800)/4 = 700
    [row] = REGISTRY["q22_dormant_accounts"].fn(spark, d).collect()
    assert row["nationkey"] == 0
    assert row["numcust"] == 2          # customers 2 and 6
    assert row["totacctbal"] == 1700.0


def test_q7_direction_and_year_boundaries(spark, tmp_path):
    """Q7 semantics: a NATION_3 supplier shipping to a NATION_7 customer
    lands in the (3,7) row and never the (7,3) row; a same-nation pair
    contributes nothing; Dec-31 vs Jan-1 shipments split across year
    rows."""
    import datetime

    d = str(tmp_path / "q7")
    spark.createDataFrame(
        [(3, "NATION_3"), (7, "NATION_7"), (9, "NATION_9")],
        "n_nationkey int, n_name string",
    ).write.parquet(d + "/nation.parquet")
    spark.createDataFrame(
        [(1, 3), (2, 7), (3, 9)], "s_suppkey long, s_nationkey int"
    ).write.parquet(d + "/supplier.parquet")
    spark.createDataFrame(
        [(10, 7), (20, 3), (30, 3)], "c_custkey long, c_nationkey int"
    ).write.parquet(d + "/customer.parquet")
    spark.createDataFrame(
        [(100, 10), (200, 20), (300, 30)], "o_orderkey long, o_custkey long"
    ).write.parquet(d + "/orders.parquet")
    dec31 = datetime.datetime(1996, 12, 31)
    jan1 = datetime.datetime(1997, 1, 1)
    lines = [
        (100, 1, 100.0, 0.0, dec31),  # s@3 -> c@7, 1996
        (100, 1, 200.0, 0.0, jan1),   # s@3 -> c@7, 1997 (year split)
        (200, 2, 400.0, 0.0, dec31),  # s@7 -> c@3, 1996 (reverse direction)
        (300, 1, 999.0, 0.0, dec31),  # s@3 -> c@3: same nation, dropped
        (100, 3, 999.0, 0.0, dec31),  # s@9 -> c@7: outside pair, dropped
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_suppkey long, l_extendedprice double,"
        " l_discount double, l_shipdate timestamp",
    ).write.parquet(d + "/lineitem.parquet")
    rows = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in REGISTRY["q7_nation_volume"].fn(spark, d).collect()
    }
    assert rows == {
        ("NATION_3", "NATION_7", 1996): 100.0,
        ("NATION_3", "NATION_7", 1997): 200.0,
        ("NATION_7", "NATION_3", 1996): 400.0,
    }


def test_moving_revenue_range_frame_semantics(spark, tmp_path):
    """The properties that make it a RANGE frame: a value exactly 30 days
    old falls OUT (frame is day-29..day), a 29-day-old one stays in,
    same-day peer orders count in each other's frames (a ROWS frame would
    order them arbitrarily), and customers never see each other."""
    import datetime

    d = str(tmp_path / "qmov")
    base = datetime.datetime(2000, 1, 1)

    def day(k):
        return base + datetime.timedelta(days=k)

    rows = [
        (1, 101, 10.0, day(0)),
        (2, 101, 20.0, day(29)),   # frame [0,29]: includes day 0
        (3, 101, 40.0, day(30)),   # frame [1,30]: day 0 drops out
        (4, 101, 80.0, day(30)),   # same-day peer: both rows sum both
        (5, 202, 7.0, day(29)),    # other customer: isolated
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).write.parquet(d + "/orders.parquet")
    out = {
        r["orderkey"]: r["trailing_30d"]
        for r in REGISTRY["q_orders_moving_revenue"].fn(spark, d).collect()
    }
    assert out == {1: 10.0, 2: 30.0, 3: 140.0, 4: 140.0, 5: 7.0}


def test_retention_cohort_semantics(spark, tmp_path):
    """Retention pins: the cohort is the FIRST active day (user B's later
    events join their own cohort, not a fresh one), a same-day repeat
    event does not double-count the user, a single-event user exists only
    at offset 0, and milli rates divide by the cohort's own day-0 size."""
    import datetime

    base = datetime.datetime(2024, 3, 1)

    def ev(eid, uid, day_off, sec=0):
        return (
            eid, base + datetime.timedelta(days=day_off, seconds=sec),
            uid, "view", 0.0, "{}",
        )

    rows = [
        # cohort day 0: users 1, 2, 3
        ev(1, 1, 0), ev(2, 2, 0), ev(3, 3, 0),
        ev(4, 1, 0, sec=60),   # same-day repeat: no double count
        ev(5, 1, 2), ev(6, 2, 2),  # two of three return on day 2
        ev(7, 1, 5),               # one returns on day 5
        # cohort day 1: user 4 only, never returns
        ev(8, 4, 1),
    ]
    d = str(tmp_path / "qret")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    res = REGISTRY["q_events_retention"].fn(spark, d).collect()
    cohorts = {}
    for r in res:
        cohorts[(r["cohort_day"] - min(x["cohort_day"] for x in res),
                 r["offset_day"])] = (r["n_users"], r["retention_milli"])
    assert cohorts == {
        (0, 0): (3, 1000),
        (0, 2): (2, 666),
        (0, 5): (1, 333),
        (1, 0): (1, 1000),
    }


_PTS0 = "xx yy"  # 2 tokens, no stopwords, mean len 2.5 -> 0 points
_PTS10 = (
    "the quick brown fox jumps over the lazy dog and then runs home"
)  # 13 tokens, stopword-rich, mean len in [3,12] -> 10 points


def test_neyman_allocation_laws(spark, tmp_path):
    """The allocation laws, recomputed independently in exact integers:
    a zero-variance stratum earns nothing; weights are
    floor(sqrt(n*S2 - S1^2)) of exact integer moments; the budget splits
    by largest remainder with the leftover going to the highest
    remainder; with no cap binding the allocations sum to exactly 1000."""
    import math

    rows, did = [], 0

    def add(lang, text, k):
        nonlocal did
        for _ in range(k):
            rows.append((did, text, lang, "s", len(text)))
            did += 1

    add("aa", _PTS0, 5)                       # zero variance -> w = 0
    add("bb", _PTS0, 300); add("bb", _PTS10, 300)
    add("cc", _PTS0, 100); add("cc", _PTS10, 500)
    d = str(tmp_path / "neyman")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(d + "/documents.parquet")
    out = {
        r["stratum"]: (r["n_docs"], r["sigma_w"], r["alloc"])
        for r in REGISTRY["q_docs_neyman_allocation"].fn(spark, d).collect()
    }
    # independent recomputation (isqrt == floor(ieee sqrt) at these
    # magnitudes: the doubles are exact)
    w_bb = math.isqrt(600 * 300 * 100 - 3000**2)
    w_cc = math.isqrt(600 * 500 * 100 - 5000**2)
    tw = w_bb + w_cc
    a_bb, r_bb = divmod(1000 * w_bb, tw)
    a_cc, r_cc = divmod(1000 * w_cc, tw)
    leftover = 1000 - a_bb - a_cc
    assert leftover in (0, 1)
    if leftover:  # highest remainder (tie impossible here) takes it
        if r_bb > r_cc:
            a_bb += 1
        else:
            a_cc += 1
    assert out == {
        "aa": (5, 0, 0),
        "bb": (600, w_bb, a_bb),
        "cc": (600, w_cc, a_cc),
    }
    assert out["bb"][2] + out["cc"][2] == 1000


def test_neyman_cap_binds_without_reallocation(spark, tmp_path):
    """A stratum never receives more samples than it has docs: one
    2-doc high-variance stratum against a zero-variance one gets capped
    at 2 (not its uncapped 1000), and the lost budget is NOT
    redistributed (documented config smell)."""
    rows = [
        (0, _PTS0, "aa", "s", 5), (1, _PTS0, "aa", "s", 5),
        (2, _PTS0, "aa", "s", 5),
        (3, _PTS0, "bb", "s", 5), (4, _PTS10, "bb", "s", 60),
    ]
    d = str(tmp_path / "neyman_cap")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(d + "/documents.parquet")
    out = {
        r["stratum"]: (r["n_docs"], r["sigma_w"], r["alloc"])
        for r in REGISTRY["q_docs_neyman_allocation"].fn(spark, d).collect()
    }
    # bb: n=2, S1=10, S2=100 -> w = isqrt(200-100) = 10; sole weight
    assert out == {"aa": (3, 0, 0), "bb": (2, 10, 2)}


def test_cube_disambiguates_null_lang_from_subtotal(spark, tmp_path):
    """A document whose lang is NULL in the DATA lands in the 'und'
    stratum with gid=0; CUBE's own subtotal rows carry gid>0 — the two
    can never collide. Marginals and the grand total reconcile."""
    rows = [
        (0, "a b c", "en", "s1", 5),
        (1, "d e", "en", "s2", 3),
        (2, "f g h i", None, "s1", 7),
    ]
    d = str(tmp_path / "cube")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(d + "/documents.parquet")
    res = REGISTRY["q_docs_inventory_cube"].fn(spark, d).collect()
    cells = {(r["gid"], r["stratum"], r["src"]): (r["n_docs"], r["total_tokens"]) for r in res}
    assert cells[(0, "und", "s1")] == (1, 4)
    assert cells[(0, "en", "s1")] == (1, 3)
    assert cells[(0, "en", "s2")] == (1, 2)
    assert cells[(1, "en", None)] == (2, 5)      # lang marginal
    assert cells[(1, "und", None)] == (1, 4)
    assert cells[(2, None, "s1")] == (2, 7)      # source marginal
    assert cells[(3, None, None)] == (3, 9)      # grand total
    assert len(res) == 8


def _decon_corpus(spark, tmp_path, name, eval_vecs, corpus_rows):
    """eval_vecs: list of 64-dim lists placed at eval slots 0,25,50,...;
    corpus_rows: list of (vec_id, label, vec) at NON-eval ids."""
    rows = [
        (25 * i, [float(x) for x in v], 0) for i, v in enumerate(eval_vecs)
    ] + [(vid, [float(x) for x in v], lab) for vid, lab, v in corpus_rows]
    d = str(tmp_path / name)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(d + "/embeddings.parquet")
    return d


def _basis(i, scale=1.0):
    v = [0.0] * 64
    v[i] = scale
    return v


def test_semantic_decon_literal_arm_semantics(spark, tmp_path):
    """Literal-arm pins: an exact duplicate of an eval vector flags at
    cosine ~1 against THAT eval id; a scaled copy (same direction) flags
    identically (cosine is scale-free); an orthogonal vector never flags;
    the all-zero vector (failed encoder) never flags (guarded cosine 0);
    an exact tie between two eval vectors resolves to the LOWER eval id."""
    evals = [_basis(0), _basis(1)]  # eval ids 0 and 25
    sq2 = 1.0 / (2.0 ** 0.5)
    corpus = [
        (1, 7, _basis(0)),            # exact dup of eval 0
        (2, 7, _basis(0, scale=3.0)),  # same direction, scaled
        (3, 7, _basis(2)),            # orthogonal to both evals
        (4, 7, [0.0] * 64),           # zero vector
        # equal 45-degree angle to BOTH evals: cos = 1/sqrt(2) to each,
        # tie -> eval 0 (lower id) must win
        (6, 7, [sq2, sq2] + [0.0] * 62),
    ]
    d = _decon_corpus(spark, tmp_path, "decon_small", evals, corpus)
    out = {
        r["vec_id"]: (r["eval_id"], r["cosine"])
        for r in REGISTRY["vector_semantic_decontaminate"].fn(spark, d).collect()
    }
    assert set(out) == {1, 2, 6}
    assert out[1][0] == 0 and out[1][1] > 0.999
    assert out[2][0] == 0 and out[2][1] > 0.999
    assert out[6][0] == 0 and abs(out[6][1] - sq2) < 1e-6


def test_semantic_decon_one_vector_suite_and_empty_suite(spark, tmp_path):
    """ADVICE r11: F.greatest needs >= 2 args, so a 1-vector eval suite
    (a real shape — a single held-out benchmark) must dispatch through
    the single-struct branch, and an EMPTY suite must raise a named
    ValueError instead of a py4j arity blowup. Same guard discipline as
    vector_centroid_classifier."""
    import pytest as _pytest

    from dblink_spark.queries.vectors import decon_best_literal

    with _pytest.raises(ValueError, match="empty eval suite"):
        decon_best_literal([])
    evals = [_basis(0)]  # ONE eval vector, id 0
    corpus = [
        (1, 7, _basis(0)),   # dup of the only eval -> flagged
        (3, 7, _basis(2)),   # orthogonal -> unflagged
    ]
    d = _decon_corpus(spark, tmp_path, "decon_one", evals, corpus)
    out = {
        r["vec_id"]: (r["eval_id"], r["cosine"])
        for r in REGISTRY["vector_semantic_decontaminate"].fn(spark, d).collect()
    }
    assert set(out) == {1}
    assert out[1][0] == 0 and out[1][1] > 0.999


def test_semantic_decon_join_arm_matches_literal_semantics(spark, tmp_path):
    """Above 64 eval vectors the broadcast-join arm dispatches; it must
    reproduce the literal arm's verdicts exactly — pinned by planting the
    same dup/orthogonal/tie probes among 70 eval slots and checking the
    flagged set, best ids, and the join-arm plan (one vec_id exchange,
    a broadcast join, no product)."""
    from dblink_spark.plans.audit import audit_plan, formatted_plan

    evals = [_basis(i % 60) for i in range(70)]  # ids 0,25,...,1725
    sq2 = 1.0 / (2.0 ** 0.5)
    corpus = [
        (1, 7, _basis(0)),    # dup of eval 0 AND eval 60 (same direction):
                              # tie -> eval id 0 wins
        (3, 7, _basis(63)),   # no eval vector points at axis 63 -> unflagged
        (4, 7, [0.0] * 64),   # zero vector
        (6, 7, [sq2] + [0.0] * 62 + [0.0]),  # dup of eval 0 direction again
    ]
    d = _decon_corpus(spark, tmp_path, "decon_big", evals, corpus)
    df = REGISTRY["vector_semantic_decontaminate"].fn(spark, d)
    a = audit_plan(df)
    assert a.broadcast_joins >= 1, "join arm must dispatch above 64 evals"
    assert "CartesianProduct" not in formatted_plan(df)
    out = {
        r["vec_id"]: (r["eval_id"], r["cosine"]) for r in df.collect()
    }
    assert set(out) == {1, 6}
    assert out[1][0] == 0 and out[1][1] > 0.999
    assert out[6][0] == 0 and out[6][1] > 0.999


def test_gap_fill_zero_rows_are_emitted(spark, tmp_path):
    """The gap-filling contract: every (observed type, spine hour) cell
    exists — a missing hour becomes an explicit (0, 0.0) row, value sums
    stay exact, and the spine spans min..max hour inclusive. Type A is
    active at hours 0 and 2 (gap at 1); type B only at hour 1 (zeros at
    0 and 2)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, sec, etype, val):
        return (eid, base + datetime.timedelta(seconds=sec), 1, etype, val, "{}")

    rows = [
        ev(1, 0, "A", 1.5), ev(2, 60, "A", 2.5),        # hour 0: n=2, 4.0
        ev(3, 2 * 3600, "A", 7.0),                      # hour 2
        ev(4, 3600 + 10, "B", 3.25),                    # hour 1 only
    ]
    d = str(tmp_path / "gapfill")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    from dblink_spark.queries import materialized

    with materialized(REGISTRY["q_events_gap_fill"].fn(spark, d)) as out:
        cells = {
            (r["event_type"], r["hr"] - 473352): (r["n_events"], r["total_value"])
            for r in out.collect()
        }
    # 2024-01-01T00 is hour 473352 since the epoch (pinned via the offset)
    assert cells == {
        ("A", 0): (2, 4.0), ("A", 1): (0, 0.0), ("A", 2): (1, 7.0),
        ("B", 0): (0, 0.0), ("B", 1): (1, 3.25), ("B", 2): (0, 0.0),
    }


def test_hourly_anomaly_z2_semantics(spark, tmp_path):
    """The monitor's defining cases on a crafted 26-hour series: a 4x
    spike flags against a flat window; the NEXT hour's die-off to zero
    does NOT flag for that type (the spike just inflated the window's
    variance — exactly what sigma-based monitors do); the same die-off
    DOES flag for a type whose window stayed flat — and that hour exists
    ONLY because the series is gap-filled; no half-window hour
    (win_n < 24) ever flags."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    counts = {"A": {h: 10 for h in range(26)}, "B": {h: 10 for h in range(26)}}
    counts["A"][24] = 40   # spike
    counts["A"][25] = 10
    counts["B"][25] = 0    # silent hour -> only a zero-filled cell
    for etype, per in counts.items():
        for h, k in per.items():
            for j in range(k):
                eid += 1
                rows.append(
                    (eid, base + datetime.timedelta(hours=h, seconds=j),
                     1, etype, 1.0, "{}")
                )
    d = str(tmp_path / "anomaly")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["q_events_hourly_anomaly"].fn(spark, d)
    ) as out:
        res = out.collect()
    h0 = min(r["hr"] for r in res)
    cells = {(r["event_type"], r["hr"] - h0): r for r in res}
    assert len(res) == 52  # 2 types x 26 dense hours
    flags = {k for k, r in cells.items() if r["is_anomaly"]}
    assert flags == {("A", 24), ("B", 25)}
    # B's flagged hour is a ZERO-FILLED cell (0 events) — the gap-fill
    # composition is what makes the die-off visible at all
    assert cells[("B", 25)]["n_events"] == 0
    # the spike's aftermath: A's die-off... stays 10, and hour 25's
    # window (containing the 40-spike) has inflated variance -> no flag
    assert not cells[("A", 25)]["is_anomaly"]
    # no half-window flags, and win_n ramps 1..24
    assert all(not r["is_anomaly"] for k, r in cells.items() if r["win_n"] < 24)
    assert cells[("A", 0)]["win_n"] == 1 and cells[("A", 23)]["win_n"] == 24


def test_ccnet_bucket_laws(spark):
    """The tercile laws, recomputed independently from the query's OWN
    (doc, key) output on the fixture corpus: buckets are monotone in the
    key (every head key <= every middle key <= every tail key), the cuts
    are exactly the histogram-CDF rule (t1 = min key with 3*cum >= N,
    t2 = min key with 3*cum >= 2N), a tie key never splits across
    buckets, and unscorable docs land in the tail with a NULL key."""
    from collections import Counter

    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["q_docs_ccnet_bucket"].fn(spark, "/root/testdata/sf0.001")
    ) as out:
        rows = out.collect()
    scored = [(r["ppl_key"], r["bucket"]) for r in rows if r["ppl_key"] is not None]
    assert all(r["bucket"] == "tail" for r in rows if r["ppl_key"] is None)
    # independent recomputation of the thresholds
    hist = Counter(k for k, _ in scored)
    keys = sorted(hist)
    n = len(scored)
    cum = 0
    t1 = t2 = None
    for k in keys:
        cum += hist[k]
        if t1 is None and 3 * cum >= n:
            t1 = k
        if t2 is None and 3 * cum >= 2 * n:
            t2 = k
    expect = {
        k: ("head" if k <= t1 else "middle" if k <= t2 else "tail")
        for k in keys
    }
    # every doc matches the recomputed rule -> tie keys cannot split
    assert all(b == expect[k] for k, b in scored)
    # all three buckets are populated on the fixture corpus
    assert {b for _, b in scored} == {"head", "middle", "tail"}


def test_source_overlap_cap_and_containment(spark, tmp_path):
    """Overlap semantics on a crafted corpus: a gram shared by MORE than
    `_OVERLAP_MAX_SRC` sources leaves the universe entirely (the
    boilerplate/blowup cap — it must neither pair sources nor count in
    denominators); singleton grams carry nothing; a source fully
    contained in another scores exactly 1000; the pair is emitted once
    in (lower, higher) order."""
    from dblink_spark.queries.text import _OVERLAP_MAX_SRC

    g = lambda tag: " ".join(f"{tag}{i}" for i in range(8))  # one 8-gram
    rows = []
    did = 0

    def add(src, text):
        nonlocal did
        rows.append((did, text, "en", src, len(text)))
        did += 1

    # boilerplate gram in MAX_SRC+2 sources: must vanish from the universe
    for k in range(_OVERLAP_MAX_SRC + 2):
        add(f"s{k:02d}", g("boiler"))
    # sa: grams A, B; sb: grams A, B, C(shared with sc) -> sa subset of sb
    add("sa", g("aaa")); add("sa", g("bbb"))
    add("sb", g("aaa")); add("sb", g("bbb")); add("sb", g("ccc"))
    add("sc", g("ccc")); add("sc", g("unique"))  # 'unique' is a singleton
    d = str(tmp_path / "overlap")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(d + "/documents.parquet")
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["q_docs_source_overlap"].fn(spark, d)
    ) as out:
        res = {
            (r["src1"], r["src2"]): (
                r["shared_grams"], r["n_grams_1"], r["n_grams_2"],
                r["overlap_milli"],
            )
            for r in out.collect()
        }
    # the boiler sources share ONLY the capped gram -> no pair rows at all;
    # sa⊂sb scores 1000; sb-sc share one gram; singleton never counts
    assert res == {
        ("sa", "sb"): (2, 2, 3, 1000),
        ("sb", "sc"): (1, 3, 1, 1000),
    }


def test_source_overlap_hot_gram_bounded_state(spark, tmp_path):
    """VERDICT r11 task 1 pathology: ONE template gram present in 500
    distinct sources. Under the r11 single-pass build this put a
    500-element source set into one aggregation buffer before the
    ubiquity filter discarded it; the r12 two-pass build pre-counts with
    a plain count(*) (constant state per gram), semi-joins, and only
    then collects — so collect_set never sees the hot gram at all. The
    pin: the hot gram contributes NO pairs and NO denominators (the two
    planted mirror sources still score exactly), and the plan carries
    the LeftSemi count-filter-join (structural bound, test_plan_audit
    pins the same on the real corpus)."""
    g = lambda tag: " ".join(f"{tag}{i}" for i in range(8))
    rows = []
    for k in range(500):  # the hot gram: one gram, 500 sources
        rows.append((k, g("boiler"), "en", f"hot{k:03d}", 10))
    # two mirrors sharing one discriminative gram each way
    rows.append((9001, g("mir") + " " + g("boiler"), "en", "ma", 10))
    rows.append((9002, g("mir"), "en", "mb", 10))
    d = str(tmp_path / "hotgram")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(d + "/documents.parquet")
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["q_docs_source_overlap"].fn(spark, d)
    ) as out:
        from dblink_spark.plans.audit import formatted_plan

        plan = formatted_plan(out)
        rows_out = {
            (r["src1"], r["src2"]): (
                r["shared_grams"], r["n_grams_1"], r["n_grams_2"],
                r["overlap_milli"],
            )
            for r in out.collect()
        }
    assert "LeftSemi" in plan
    # ma's universe is ONLY the mir gram (boiler gram in 502 sources is
    # way past the cap): a single (1,1,1,1000) mirror pair, nothing else
    assert rows_out == {("ma", "mb"): (1, 1, 1, 1000)}


def test_quality_weighted_sample_thresholds(spark, tmp_path):
    """The probability law, pinned deterministically: pts=0 docs can
    NEVER enter (p=0) whatever their key; pts=10 docs ALWAYS enter
    (p=1, the explicit branch); for pts=5 (p=0.25) membership follows
    the exact hex threshold — verified by hand-picking doc_ids whose
    md5 keys land on either side of it."""
    import hashlib

    from dblink_spark.queries.pipeline import _QWS_SALT, _QWS_THRESHOLDS

    thr5 = _QWS_THRESHOLDS[5]

    def key(doc_id):
        return hashlib.md5(f"{_QWS_SALT}{doc_id}".encode()).hexdigest()[:8]

    kept_id = next(i for i in range(1000, 5000) if key(i) < thr5)
    drop_id = next(i for i in range(1000, 5000) if key(i) >= thr5)
    # pts=10 text (>=10 tokens, stopwords, mean len in range); pts=5 text
    # (>=10 tokens, no stopwords, mean len out of range); pts=0 (short)
    t10 = "the quick brown fox jumps over the lazy dog and then runs home"
    t5 = " ".join("zz" for _ in range(12))  # 12 tokens, mean len 2 -> 5 pts
    t0 = "xx yy"
    rows = [
        (1, t0, "en", "s", 5),          # pts=0: never kept
        (2, t10, "en", "s", 60),        # pts=10: always kept
        (kept_id, t5, "en", "s", 30),   # pts=5, key below threshold
        (drop_id, t5, "en", "s", 30),   # pts=5, key above threshold
    ]
    d = str(tmp_path / "qws")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: r["pts"]
        for r in REGISTRY["q_docs_quality_weighted_sample"].fn(spark, d).collect()
    }
    assert set(out) == {2, kept_id}
    assert out[2] == 10 and out[kept_id] == 5


def test_dedup_bias_audit_exposes_length_bias(spark, tmp_path):
    """The pathology the audit exists to expose: a near-duplicate pair
    where the LONGER copy is the LOWER-quality one (padding with repeated
    non-stop tokens keeps the token SET identical — sketch jaccard 1.0 —
    while crushing the stopword ratio below the 3-point rule). The
    length-based survivor rule keeps the bad copy, and the report shows
    kept-mean < dropped-mean; an untouched doc lands in 'unique'."""
    good = (
        "the quick brown fox jumps over the lazy dog and then runs home"
    )  # 13 tokens, stopword-rich -> 10 pts
    pad = " ".join(["quick", "brown", "fox", "jumps"] * 20)
    longer_worse = good + " " + pad  # same token SET; stop ratio < 0.05
    rows = [
        (1, good, "en", "s", len(good)),
        (2, longer_worse, "en", "s", len(longer_worse)),
        (3, "totally unrelated words entirely " + " ".join(
            f"u{i}" for i in range(20)), "en", "s", 200),
    ]
    d = str(tmp_path / "bias")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(d + "/documents.parquet")
    out = {
        (r["stratum"], r["verdict"]): (r["n_docs"], r["mean_pts_milli"])
        for r in REGISTRY["q_docs_dedup_bias_audit"].fn(spark, d).collect()
    }
    assert out[("en", "kept")] == (1, 7000)      # the long, bad copy
    assert out[("en", "dropped")] == (1, 10000)  # the short, good copy
    assert out[("en", "unique")][0] == 1
    assert out[("en", "kept")][1] < out[("en", "dropped")][1]


def test_rfm_quintile_semantics(spark, tmp_path):
    """RFM pins on a 5-user crafted corpus where each dimension has 5
    distinct values: the best-recency user scores r=5 (inversion), the
    highest spender m=5, the most frequent f=5; identical keys share a
    score (bucket-granular ties); every score recomputes from the pure
    integer rule."""
    import datetime

    base = datetime.datetime(2024, 6, 1)
    rows, eid = [], 0

    def ev(uid, day, val):
        nonlocal eid
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(days=day), uid, "view", val, "{}")
        )

    # user k (1..5): k events, all on day k, 10.0 each — so last day,
    # frequency and spend all increase with k
    for k in range(1, 6):
        for _ in range(k):
            ev(k, k, 10.0)
    d = str(tmp_path / "rfm")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    from dblink_spark.queries import materialized

    with materialized(REGISTRY["q_events_rfm"].fn(spark, d)) as out:
        res = {r["user_id"]: r for r in out.collect()}
    # user 5: most recent (r_key 0 -> r=5), most frequent (f=5), top spend
    assert (res[5]["r_score"], res[5]["f_score"], res[5]["m_score"]) == (5, 5, 5)
    # user 1: stalest, least frequent, least spend -> all 1
    assert (res[1]["r_score"], res[1]["f_score"], res[1]["m_score"]) == (1, 1, 1)
    # keys: r_key = 5 - k; f_key = k; m_key = floor(10k)
    for k in range(1, 6):
        assert res[k]["r_key"] == 5 - k
        assert res[k]["f_key"] == k
        assert res[k]["m_key"] == 10 * k
    # monotone: higher k -> scores never decrease in f/m, never in r
    for k in range(1, 5):
        assert res[k + 1]["f_score"] >= res[k]["f_score"]
        assert res[k + 1]["m_score"] >= res[k]["m_score"]
        assert res[k + 1]["r_score"] >= res[k]["r_score"]


# --- r12: boundary pins for the TPC-H-completing family --------------------


def _pq(spark, d, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        f"{d}/{table}.parquet"
    )


def test_q2_min_offer_ties_and_region_pruning(spark, tmp_path):
    """Q2 boundaries: two EUROPE suppliers tied on the exact integer
    minimum unit price are BOTH emitted (the pre-LIMIT published
    semantics); a cheaper offer from a non-EUROPE supplier never enters
    the correlation; non-STANDARD parts are excluded; the unit price is
    exact milli (1000*cents DIV qty — 10.00/2 and 5.00/1 both collapse
    to 500000)."""
    d = str(tmp_path / "q2")
    _pq(spark, d, "region", [(3, "EUROPE"), (1, "AMERICA")],
        "r_regionkey long, r_name string")
    _pq(spark, d, "nation",
        [(3, "NATION_3", 3), (1, "NATION_1", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
    _pq(spark, d, "supplier",
        [(1, "s_eu_a", 10.0, 3), (2, "s_eu_b", 20.0, 3),
         (3, "s_am", 99.0, 1)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long")
    _pq(spark, d, "part", [(1, "STANDARD"), (2, "PROMO")],
        "p_partkey long, p_type string")
    _pq(spark, d, "lineitem",
        [(1, 1, 10.0, 2.0), (1, 1, 30.0, 3.0),  # s1 best: 500000
         (1, 2, 5.0, 1.0),                       # s2: exact tie 500000
         (1, 3, 0.01, 100.0),                    # cheapest, wrong region
         (2, 1, 0.01, 100.0)],                   # cheapest, wrong type
        "l_partkey long, l_suppkey long, l_extendedprice double,"
        " l_quantity double")
    rows = {
        (r["partkey"], r["supplier"]): r
        for r in REGISTRY["q2_min_cost_supplier"].fn(spark, d).collect()
    }
    assert set(rows) == {(1, "s_eu_a"), (1, "s_eu_b")}
    for r in rows.values():
        assert r["unit_milli"] == 500000
        assert r["nation"] == "NATION_3"


def test_q8_share_zero_year_and_market_scoping(spark, tmp_path):
    """Q8 boundaries: a year where the share nation shipped nothing
    yields exactly 0 milli (never NULL, never a missing row); volume
    from non-ASIA customers or non-ECONOMY parts never enters either
    sum; the share is integer-exact (100/400 -> 250)."""
    from datetime import datetime

    d = str(tmp_path / "q8")
    _pq(spark, d, "region", [(2, "ASIA"), (1, "AMERICA")],
        "r_regionkey long, r_name string")
    _pq(spark, d, "nation",
        [(2, "NATION_2", 2), (7, "NATION_7", 2), (1, "NATION_1", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
    _pq(spark, d, "supplier", [(1, 2), (2, 7)],
        "s_suppkey long, s_nationkey long")
    _pq(spark, d, "customer", [(1, 2), (2, 1)],
        "c_custkey long, c_nationkey long")
    _pq(spark, d, "part", [(1, "ECONOMY"), (2, "PROMO")],
        "p_partkey long, p_type string")
    _pq(spark, d, "orders",
        [(10, 1, datetime(1996, 5, 1)), (11, 1, datetime(1997, 5, 1)),
         (12, 2, datetime(1996, 6, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp")
    _pq(spark, d, "lineitem",
        [(10, 1, 1, 100.0, 0.0),   # 1996, NATION_2
         (10, 1, 2, 300.0, 0.0),   # 1996, NATION_7
         (11, 1, 2, 50.0, 0.0),    # 1997, only NATION_7 -> share 0
         (12, 1, 1, 9999.0, 0.0),  # AMERICA customer: out of market
         (10, 2, 1, 9999.0, 0.0)], # non-ECONOMY part: out of market
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_extendedprice double, l_discount double")
    out = {
        r["o_year"]: r
        for r in REGISTRY["q8_market_share"].fn(spark, d).collect()
    }
    assert set(out) == {1996, 1997}
    assert out[1996]["mkt_share_milli"] == 250  # 1000*100 // 400
    assert out[1996]["total_volume"] == 400.0
    assert out[1997]["mkt_share_milli"] == 0
    assert out[1997]["nation_volume"] == 0.0


def test_q9_negative_profit_kept_exact(spark, tmp_path):
    """Q9 boundaries: a line whose retail-cost exceeds its discounted
    revenue contributes NEGATIVE exact ten-thousandths (100.00 at 10%
    off vs 200.00 cost -> -110.0000); the %gear% LIKE excludes other
    parts entirely; rollup is per (supplier nation, order year)."""
    from datetime import datetime

    d = str(tmp_path / "q9")
    _pq(spark, d, "nation", [(0, "NATION_0", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    _pq(spark, d, "supplier", [(1, 0)], "s_suppkey long, s_nationkey long")
    _pq(spark, d, "part",
        [(1, "red gear", 20.0), (2, "red gear", 200.0),
         (3, "red widget", 0.01)],
        "p_partkey long, p_name string, p_retailprice double")
    _pq(spark, d, "orders", [(10, datetime(1999, 1, 1))],
        "o_orderkey long, o_orderdate timestamp")
    _pq(spark, d, "lineitem",
        [(10, 1, 1, 2.0, 100.0, 0.10),   # 90 - 40 = +50.0000
         (10, 2, 1, 1.0, 100.0, 0.10),   # 90 - 200 = -110.0000
         (10, 3, 1, 1.0, 1000.0, 0.0)],  # widget: excluded by LIKE
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double")
    [row] = REGISTRY["q9_product_profit"].fn(spark, d).collect()
    assert (row["nation"], row["o_year"]) == ("NATION_0", 1999)
    assert row["profit_e4"] == (500000 - 1100000)


def test_q11_fraction_boundary_is_strict(spark, tmp_path):
    """Q11 boundary: 1500*value == total lands exactly ON the threshold
    and is excluded (strict >) — pinned with cent values chosen so the
    cross-multiplied integers are exact: A=1499.00, B=1.00, total
    150000 cents; 1500*100 == 150000 exactly."""
    d = str(tmp_path / "q11")
    _pq(spark, d, "region", [(1, "AMERICA")], "r_regionkey long, r_name string")
    _pq(spark, d, "nation", [(1, "NATION_1", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
    _pq(spark, d, "supplier", [(1, 1)], "s_suppkey long, s_nationkey long")
    _pq(spark, d, "lineitem",
        [(1, 1, 1499.0), (2, 1, 1.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double")
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["q11_important_parts"].fn(spark, d)
    ) as df:
        rows = {r["partkey"]: r["value_cents"] for r in df.collect()}
    assert rows == {1: 149900}  # B sits exactly on the line -> out


def test_q12_sixty_day_lateness_boundary(spark, tmp_path):
    """Q12 boundary: shipped exactly +60 days is NOT late (strict >);
    +61 days is; priority banding splits 1-URGENT/2-HIGH from the rest
    within each linestatus."""
    from datetime import datetime

    d = str(tmp_path / "q12")
    _pq(spark, d, "orders",
        [(1, datetime(2024, 1, 1), "1-URGENT"),
         (2, datetime(2024, 1, 1), "5-LOW"),
         (3, datetime(2024, 1, 1), "2-HIGH")],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string")
    _pq(spark, d, "lineitem",
        [(1, "O", datetime(2024, 3, 1)),   # +60 exactly: on time
         (1, "O", datetime(2024, 3, 2)),   # +61: late, high
         (2, "O", datetime(2024, 6, 1)),   # late, low
         (3, "F", datetime(2024, 3, 2))],  # late, high, other status
        "l_orderkey long, l_linestatus string, l_shipdate timestamp")
    out = {
        r["linestatus"]: (r["high_line_count"], r["low_line_count"])
        for r in REGISTRY["q12_priority_shipping"].fn(spark, d).collect()
    }
    assert out == {"O": (1, 1), "F": (1, 0)}


def test_q20_exact_half_excluded_and_window_scoping(spark, tmp_path):
    """Q20 boundaries: a supplier at EXACTLY half a part's volume
    (2*qty == total) does not dominate; quantity shipped outside the
    1996 window never counts; the name match is a PREFIX ('small%'),
    not a substring."""
    from datetime import datetime

    in_win = datetime(1996, 6, 1)
    out_win = datetime(1995, 6, 1)
    d = str(tmp_path / "q20")
    _pq(spark, d, "nation", [(0, "NATION_0", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    _pq(spark, d, "supplier", [(1, "s1", 0), (2, "s2", 0)],
        "s_suppkey long, s_name string, s_nationkey long")
    _pq(spark, d, "part",
        [(1, "small bolt"), (2, "small gear"), (3, "big small")],
        "p_partkey long, p_name string")
    _pq(spark, d, "lineitem",
        [(1, 1, 6.0, in_win), (1, 2, 4.0, in_win),    # s1: 12>10 dominates
         (2, 1, 4.0, in_win), (2, 2, 4.0, in_win),    # exact half: neither
         (2, 1, 50.0, out_win),                        # outside the window
         (3, 1, 99.0, in_win)],                        # 'big small': prefix miss
        "l_partkey long, l_suppkey long, l_quantity double,"
        " l_shipdate timestamp")
    rows = {
        r["supplier"]: r["n_dominated"]
        for r in REGISTRY["q20_dominant_suppliers"].fn(spark, d).collect()
    }
    assert rows == {"s1": 1}


def test_gapped_spans_bridge_the_edited_block(spark, tmp_path):
    """The exact pathology text_strip_maximal_spans documents as its
    limit: a 41-token near-duplicate block with ONE edited token in the
    middle. The edit splits the cover into two ~20-token islands — each
    passes the 16 floor for the EXACT surgeon, but the point here is the
    bridge: the gapped surgeon excises the edited token TOO (one merged
    span), while the exact surgeon leaves the edit behind. A second doc
    pair with a 9-token gap (> tolerance 7) must NOT bridge, and two
    sub-floor islands that only clear the floor WHEN merged pin that the
    gate runs after the merge."""
    from dblink_spark.queries.text import (
        _SPAN_GAP_TOLERANCE, _SPAN_MIN_TOKENS,
    )

    assert _SPAN_GAP_TOLERANCE == 7 and _SPAN_MIN_TOKENS == 16

    block = [f"lic{j}" for j in range(41)]
    edited = list(block)
    edited[20] = "EDITED"  # one-token edit mid-block
    # islands: positions 1..20 and 22..41 covered; gap = 1 <= 7 -> bridge
    #
    # second pair: two 16-token shared runs separated by 9 fresh tokens
    # in doc 3 (gap 9 > 7 -> no bridge; each island >= 16 -> excised
    # separately, the 9 fresh tokens survive)
    run_a = [f"ra{j}" for j in range(16)]
    run_b = [f"rb{j}" for j in range(16)]
    fresh = [f"fr{j}" for j in range(9)]
    # third pair: two 10-token shared runs, 3-token gap in doc 5 — each
    # island is sub-floor (10 < 16) but the merged span is 23 >= 16:
    # ONLY the gapped surgeon removes anything
    run_c = [f"rc{j}" for j in range(10)]
    run_d = [f"rd{j}" for j in range(10)]
    mid = ["m1", "m2", "m3"]
    rows = [
        (1, " ".join(block), "en", "s1"),
        (2, " ".join(edited), "en", "s2"),
        (3, " ".join(run_a + fresh + run_b), "en", "s3"),
        (4, " ".join(run_a + ["zz1", "zz2"] + run_b), "en", "s4"),
        (5, " ".join(run_c + mid + run_d), "en", "s5"),
        (6, " ".join(run_c + ["qq1", "qq2", "qq3", "qq4"] + run_d), "en", "s6"),
    ]
    d = str(tmp_path / "gapped")
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(d + "/documents.parquet")
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["text_strip_maximal_spans"].fn(spark, d)
    ) as mdf:
        exact = {r["doc_id"]: r for r in mdf.collect()}
    with materialized(
        REGISTRY["text_strip_gapped_spans"].fn(spark, d)
    ) as gdf:
        gapped = {r["doc_id"]: r for r in gdf.collect()}
    # doc 2: the exact surgeon keeps the edit (two islands around it);
    # the gapped surgeon bridges it — the WHOLE 41 tokens go
    assert "EDITED" in exact[2]["clean_text"]
    assert exact[2]["n_removed"] == 40
    assert gapped[2]["n_removed"] == 41 and gapped[2]["clean_text"] == ""
    # doc 3: 9-token gap never bridges — fresh tokens survive BOTH
    assert gapped[3]["n_removed"] == 32
    assert gapped[3]["clean_text"] == " ".join(fresh)
    assert exact[3]["n_removed"] == 32
    # doc 5: sub-floor islands — exact removes NOTHING, gapped merges
    # 10+3+10 = 23 >= 16 and removes the whole span including the gap
    assert exact[5]["n_removed"] == 0
    assert gapped[5]["n_removed"] == 23 and gapped[5]["clean_text"] == ""
    # conservation holds everywhere
    for out in (exact, gapped):
        for r in out.values():
            assert r["n_kept"] + r["n_removed"] == r["n_tokens"]


def test_confirmed_spans_catch_edit_dense_block(spark, tmp_path):
    """VERDICT r12 task 6 — THE miss class the gapped surgeon documents:
    a block edited every <= 7 tokens carries no intact 8-gram in the
    edited region, so 8-gram detection (exact AND gapped) sees only the
    intact prefix and leaves the rest. The 4-gram confirmation pass must
    (a) extend the prefix anchor through the edit-dense region and excise
    the WHOLE block, (b) never create a span from weak evidence alone (an
    anchor-free edit-dense copy stays untouched), and (c) not over-extend
    past boilerplate into genuinely fresh text."""
    from dblink_spark.queries.text import _SPAN_GAP_TOLERANCE, _SPAN_MIN_TOKENS

    assert _SPAN_GAP_TOLERANCE == 7 and _SPAN_MIN_TOKENS == 16

    block = [f"lic{j}" for j in range(60)]
    # doc 3: intact 24-token prefix, then an edit every 6th token —
    # max clean run after the prefix is 5 tokens (< 8: invisible to the
    # 8-gram detector, >= 4: visible to the confirmation probe)
    dense = list(block)
    for pos1 in (25, 31, 37, 43, 49, 55):  # 1-based edit positions
        dense[pos1 - 1] = f"ED{pos1}"
    # doc 4: the SAME edit cadence from the start — no 8-gram anywhere,
    # so no anchor; weak 4-gram matches alone must excise NOTHING
    noanchor = list(block)
    for pos1 in (1, 7, 13, 19, 25, 31, 37, 43, 49, 55):
        noanchor[pos1 - 1] = f"NA{pos1}"
    # doc 5: a 16-token boilerplate prefix then fresh text — the island
    # must stop at the prefix (no weak chain into fresh tokens)
    fresh_tail = [f"fresh{j}" for j in range(20)]
    rows = [
        (1, " ".join(block), "en", "s1"),
        (2, " ".join(block), "en", "s2"),
        (3, " ".join(dense), "en", "s3"),
        (4, " ".join(noanchor), "en", "s4"),
        (5, " ".join(block[:16] + fresh_tail), "en", "s5"),
    ]
    d = str(tmp_path / "confirmed")
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(d + "/documents.parquet")
    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["text_strip_gapped_spans"].fn(spark, d)
    ) as gdf:
        gapped = {r["doc_id"]: r for r in gdf.collect()}
    with materialized(
        REGISTRY["text_strip_confirmed_spans"].fn(spark, d)
    ) as cdf:
        conf = {r["doc_id"]: r for r in cdf.collect()}
    # the documented miss: gapped removes only the intact 24-token prefix
    # of doc 3 and leaves the 36 edit-dense boilerplate tokens behind
    assert gapped[3]["n_removed"] == 24
    # confirmation extends the anchor through every <=1-token hole chain:
    # the WHOLE 60-token block goes, bridged edits included
    assert conf[3]["n_removed"] == 60 and conf[3]["clean_text"] == ""
    # weak evidence never creates a span: the anchor-free copy is intact
    assert gapped[4]["n_removed"] == 0
    assert conf[4]["n_removed"] == 0
    assert conf[4]["clean_text"] == " ".join(noanchor)
    # no over-extension into fresh text: exactly the 16-token prefix
    assert conf[5]["n_removed"] == 16
    assert conf[5]["clean_text"] == " ".join(fresh_tail)
    # the fully-shared copies excise completely under both surgeons
    for doc in (1, 2):
        assert gapped[doc]["n_removed"] == 60
        assert conf[doc]["n_removed"] == 60
    for out in (gapped, conf):
        for r in out.values():
            assert r["n_kept"] + r["n_removed"] == r["n_tokens"]


def test_transition_matrix_order_ties_and_truncation(spark, tmp_path):
    """Transition-matrix semantics pinned by hand: consecutiveness is per
    user ordered by (ts_us, event_id) — a same-microsecond pair resolves
    by event id, so the B-then-A tie is deterministic; a single-event
    user contributes nothing; self-transitions count; row normalization
    is integer-truncating (three equal 1/3 outcomes give 333+333+333,
    NOT a rounded 334 anywhere)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)

    def ev(eid, uid, us, etype):
        return (eid, base + timedelta(microseconds=us), uid, etype, 0.0, "{}")

    rows = [
        # user 1: A(10), then the same-us tie at 20 -> B(e2) before A(e3)
        ev(1, 1, 10, "A"), ev(2, 1, 20, "B"), ev(3, 1, 20, "A"),
        ev(4, 1, 30, "C"),
        ev(5, 2, 10, "A"),                      # single event: no pairs
        ev(6, 3, 5, "B"), ev(7, 3, 6, "B"),     # self-transition
        # user 4: from-C fan-out of three equal outcomes -> 333 each
        ev(8, 4, 1, "C"), ev(9, 4, 2, "A"), ev(10, 4, 3, "C"),
        ev(11, 4, 4, "B"), ev(12, 4, 5, "C"), ev(13, 4, 6, "C"),
    ]
    d = str(tmp_path / "trans_events")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(d + "/events.parquet")
    out = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob_milli"])
        for r in REGISTRY["q_events_transition_matrix"].fn(spark, d).collect()
    }
    # user1: A->B, B->A, A->C; user3: B->B; user4: C->A, A->C, C->B,
    # B->C, C->C
    assert out[("A", "B")] == (1, 333)   # from-A total 3 (A->B + 2x A->C)
    assert out[("A", "C")] == (2, 666)
    assert out[("B", "A")] == (1, 333)   # from-B total 3
    assert out[("B", "B")] == (1, 333)
    assert out[("B", "C")] == (1, 333)
    assert out[("C", "A")] == (1, 333)   # from-C total 3, truncated thirds
    assert out[("C", "B")] == (1, 333)
    assert out[("C", "C")] == (1, 333)
    assert len(out) == 8


def test_engagement_gini_hand_computed(spark, tmp_path):
    """Gini semantics pinned by hand on two crafted populations: perfect
    equality gives exactly 0 (and an empty top decile when N < 10 users
    would make k=0 — share 0, not NULL); an extreme 91-vs-nine-1s
    population gives Gini 810 and top-decile share 910, both recomputed
    in the comment arithmetic: ascending ranks 1..9 hold x=1, rank 10
    holds 91 -> sum(i*x) = 45 + 910 = 955; 1000*(2*955 - 11*100) DIV
    (10*100) = 810; k = 10 DIV 10 = 1 -> s_top = 91 -> 910."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)

    def events_for(counts, d):
        rows, eid = [], 0
        for uid, n in counts.items():
            for j in range(n):
                rows.append(
                    (eid, base + timedelta(seconds=eid), uid, "view",
                     0.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.parquet(d + "/events.parquet")

    d1 = str(tmp_path / "equal")
    events_for({u: 5 for u in range(4)}, d1)
    [r] = REGISTRY["q_events_engagement_gini"].fn(spark, d1).collect()
    assert (r["n_users"], r["total_events"]) == (4, 20)
    assert r["gini_milli"] == 0
    assert r["top_decile_share_milli"] == 0  # k = 4 DIV 10 = 0 users

    d2 = str(tmp_path / "skewed")
    counts = {u: 1 for u in range(9)}
    counts[99] = 91
    events_for(counts, d2)
    [r] = REGISTRY["q_events_engagement_gini"].fn(spark, d2).collect()
    assert (r["n_users"], r["total_events"]) == (10, 100)
    assert r["gini_milli"] == 810
    assert r["top_decile_share_milli"] == 910


def test_engagement_gini_rank_sum_exact_past_bigint(spark):
    """ADVICE r12: the per-bucket rank-sum x·cnt·(2R+cnt+1)/2 wraps
    BIGINT (~9.2e18) around 10^9 users near the 99999 count cap. Pin the
    PRODUCTION expression (imported, not copied) against Python bignum
    arithmetic in exactly that regime — both parities of cnt, plus the
    downstream milli-Gini DIV on the decimal aggregate."""
    from dblink_spark.queries.tpch import _GINI_CAP, _GINI_RANK_SUM_EXPR

    cases = [  # (x, cnt, r_before) — all products far past BIGINT
        (_GINI_CAP, 10**9, 10**9),          # even cnt
        (_GINI_CAP, 10**9 + 1, 10**9 - 1),  # odd cnt
        (_GINI_CAP - 2, 3, 2 * 10**18),     # huge r_before, odd cnt
        (1, 1, 0),                          # degenerate small bucket
    ]
    df = spark.createDataFrame(
        cases, "x bigint, cnt bigint, r_before bigint"
    ).selectExpr(f"{_GINI_RANK_SUM_EXPR} AS rank_sum")
    got = [int(r["rank_sum"]) for r in df.collect()]
    want = [x * (cnt * (2 * r + cnt + 1)) // 2 for x, cnt, r in cases]
    assert got == want
    assert max(want) > 2**63  # the regime genuinely exceeds BIGINT

    # the final milli ratio: quotient fits BIGINT even though both
    # operands are ~10^23-digit decimals
    n_users, total = 10**9, 10**9 * _GINI_CAP
    s = sum(want)
    [row] = spark.createDataFrame(
        [(str(s), n_users, str(total))], "s string, n bigint, t string"
    ).selectExpr(
        "CAST((1000 * (2 * CAST(s AS DECIMAL(38,0))"
        " - (CAST(n AS DECIMAL(38,0)) + 1) * CAST(t AS DECIMAL(38,0))))"
        " DIV (CAST(n AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)))"
        " AS BIGINT) AS g"
    ).collect()
    # DIV truncates toward zero; mirror that exactly in bignum space
    num = 1000 * (2 * s - (n_users + 1) * total)
    den = n_users * total
    want_g = -((-num) // den) if num < 0 else num // den
    assert int(row["g"]) == want_g


def test_cdc_chunks_shift_resistance(spark, tmp_path):
    """THE content-defined-chunking property: doc B is doc A with one
    token PREPENDED. Fixed-grid chunking shares nothing (every window
    shifts by one), but CDC boundaries are functions of the local 4-token
    window, so after the first cut the two docs produce IDENTICAL chunks
    — the report must show both docs sharing most of their chunks. A
    third, unrelated doc shares none; sub-4-token docs form exactly one
    chunk; conservation n_dup_chunks <= n_chunks holds."""
    import random

    rng = random.Random(42)
    base_tokens = [f"t{rng.randrange(10**6)}" for _ in range(600)]
    a = " ".join(base_tokens)
    b = "PREPENDED " + a
    other = " ".join(f"z{j}" for j in range(50))
    tiny = "x1 x2 x3"
    rows = [(1, a, "en", "s1"), (2, b, "en", "s2"),
            (3, other, "en", "s3"), (4, tiny, "en", "s4")]
    d = str(tmp_path / "cdc")
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(d + "/documents.parquet")
    from dblink_spark.queries import materialized

    with materialized(REGISTRY["text_cdc_chunks"].fn(spark, d)) as df:
        out = {r["doc_id"]: r for r in df.collect()}
    # the 600-token doc should cut into several ~64-token chunks
    assert out[1]["n_chunks"] >= 4
    # shift resistance: all but the first chunk of each doc re-align ->
    # both docs share the overwhelming majority of their chunks
    for i in (1, 2):
        assert out[i]["n_dup_chunks"] >= out[i]["n_chunks"] - 2, out[i]
        assert out[i]["dup_milli"] >= 500
    # and the CONTRAST: the fixed 128/96 grid on the same pair shares 0
    # windows (every boundary shifted by the prepend)
    grid = REGISTRY["text_chunk_windows"].fn(spark, d)
    fps = (
        grid.groupBy("chunk_text")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .count()
    )
    assert fps == 0, "fixed grid must NOT re-align (that's the point)"
    assert out[3]["n_dup_chunks"] == 0
    assert out[4]["n_chunks"] == 1 and out[4]["n_tokens"] == 3
    for r in out.values():
        assert r["n_dup_chunks"] <= r["n_chunks"]


def test_ladder_spans_close_the_no_anchor_class(spark, tmp_path):
    """r14 (VERDICT r13 task 4): the miss class every 8-gram-anchored
    surgeon shares — a duplicated block edited at least once per 8
    tokens in EVERY copy, so no intact cross-doc 8-gram exists anywhere
    and text_strip_confirmed_spans never anchors. The crafted corpus
    pins all four gates at once:

    - docs 0/1: a 63-token block, both copies edited at positions
      0,7,...,56 with per-doc replacement tokens — intact shared runs
      are 6 tokens (no shared 8-gram; 18 shared 5-grams). The ladder
      excises the merged island (62 tokens, edit positions gap-merged);
      the confirmed surgeon misses it entirely (the documented class).
    - docs 2/3: one shared 5-token idiom — rarity passes, density (1 of
      6 required) and length fail: kept. Chance phrase overlap can
      never create a span.
    - docs 4/5: a 15-token VERBATIM shared block — 11 evidence starts
      pass density, but 15 < the 16-token floor: kept by ladder AND by
      confirmed (its island is also sub-floor). The length gate is the
      same family-wide boundary.
    """
    edits = set(range(0, 63, 7))

    def copy(tag):
        return " ".join(
            f"x{tag}{j}" if j in edits else f"blk{j}" for j in range(63)
        )

    idiom = " ".join(f"idm{j}" for j in range(5))
    med = " ".join(f"med{j}" for j in range(15))

    def doc(pre, mid, n=20):
        return " ".join(f"{pre}{j}" for j in range(n)) + " " + mid + " " + \
            " ".join(f"{pre}t{j}" for j in range(n))

    rows = [
        (0, doc("aa", copy("a"))), (1, doc("bb", copy("b"))),
        (2, doc("cc", idiom)), (3, doc("dd", idiom)),
        (4, doc("ee", med)), (5, doc("ff", med)),
    ]
    d = str(tmp_path / "ladder_corpus")
    spark.createDataFrame(
        [(i, t, "en", "s1", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")

    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["text_strip_ladder_spans"].fn(spark, d)
    ) as df:
        ladder = {r["doc_id"]: r for r in df.collect()}
    with materialized(
        REGISTRY["text_strip_confirmed_spans"].fn(spark, d)
    ) as df:
        confirmed = {r["doc_id"]: r for r in df.collect()}

    for i in (0, 1):
        # confirmed: no 8-gram anchor anywhere -> the documented miss
        assert confirmed[i]["n_removed"] == 0, confirmed[i]
        # ladder: island spans block positions 1..62 (edits gap-merged)
        assert ladder[i]["n_removed"] == 62, ladder[i]
        assert "blk1" not in ladder[i]["clean_text"]
        tag = "a" if i == 0 else "b"
        assert f"x{tag}0" in ladder[i]["clean_text"], (
            "position 0 sits outside the island and must survive"
        )
    for i in (2, 3, 4, 5):  # density gate (2/3) and length gate (4/5)
        assert ladder[i]["n_removed"] == 0, ladder[i]
        assert confirmed[i]["n_removed"] == 0
    for i in range(6):
        assert (
            ladder[i]["n_kept"] + ladder[i]["n_removed"]
            == ladder[i]["n_tokens"]
        )


def test_template_spans_close_the_past_cap_class(spark, tmp_path):
    """r15 (VERDICT r14 task 5): the ubiquity-cap miss class the ladder
    documents and LADDER_RESIDUAL_r15.json measures at miss=1.00 — a
    slot-edited template duplicated in MORE than 8 docs puts every
    width-5 gram's ubiquity past the rarity cap, so tier 4 discards the
    evidence. The crafted corpus pins the template tier's three gates
    and the tier-band adjacency:

    - docs 0..11: a 63-token block in TWELVE copies, every copy edited
      at positions 0,7,...,56 with per-doc tokens (the no-anchor
      template construction) — shared 5-grams live in exactly 12 docs:
      past the ladder cap (8), inside the template band (9..64). The
      ladder must MISS all twelve (the measured class); the template
      tier must excise the 62-token island in each.
    - doc 20 + satellites: a PHRASE CHAIN — six disjoint 5-token
      phrases planted contiguously in ONE host doc (30-token island, 6
      evidence starts: density and length PASS) but each phrase's other
      carriers are 9 DISTINCT satellite docs, so no single other doc
      shares more than 1 of the island's grams: confirmation (>= 6 from
      one doc) fails for the host, and each satellite's lone phrase is
      sub-floor. Kept everywhere — a chain of unrelated mid-frequency
      idioms is not a template. (Two hosts would make the whole chain
      genuinely duplicated content, and confirmation would correctly
      fire.)
    - docs 40/41: the ladder's own class (63-token block, 2 copies,
      edited every 7) — nd=2 is BELOW the template band, so the
      template tier removes nothing there (adjacent, disjoint bands;
      the ladder still catches it).
    """
    edits = set(range(0, 63, 7))

    def blk(tag):
        return " ".join(
            f"x{tag}{j}" if j in edits else f"tpl{j}" for j in range(63)
        )

    def ladder_blk(tag):
        return " ".join(
            f"y{tag}{j}" if j in edits else f"lad{j}" for j in range(63)
        )

    def doc(pre, mid, n=20):
        return " ".join(f"{pre}{j}" for j in range(n)) + " " + mid + " " + \
            " ".join(f"{pre}t{j}" for j in range(n))

    phrases = [
        " ".join(f"ph{k}_{j}" for j in range(5)) for k in range(6)
    ]
    chain = " ".join(phrases)
    rows = [(i, doc(f"c{i}_", blk(f"c{i}"))) for i in range(12)]
    rows += [(20, doc("ha_", chain))]
    sat = 100
    for k, ph in enumerate(phrases):
        for m in range(9):
            rows.append((sat, doc(f"s{sat}_", ph, n=8)))
            sat += 1
    rows += [(40, doc("la_", ladder_blk("a"))), (41, doc("lb_", ladder_blk("b")))]
    d = str(tmp_path / "template_corpus")
    spark.createDataFrame(
        [(i, t, "en", "s1", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")

    from dblink_spark.queries import materialized

    with materialized(
        REGISTRY["text_strip_template_spans"].fn(spark, d)
    ) as df:
        tpl = {r["doc_id"]: r for r in df.collect()}
    with materialized(
        REGISTRY["text_strip_ladder_spans"].fn(spark, d)
    ) as df:
        ladder = {r["doc_id"]: r for r in df.collect()}

    for i in range(12):
        # the measured miss class: ladder blind past its cap...
        assert ladder[i]["n_removed"] == 0, ladder[i]
        # ...and the template tier excises the island (positions 1..62,
        # the same geometry the ladder pins inside its own band)
        assert tpl[i]["n_removed"] == 62, tpl[i]
        assert "tpl1" not in tpl[i]["clean_text"]
        assert f"xc{i}0" in tpl[i]["clean_text"], (
            "position 0 sits outside the island and must survive"
        )
    # phrase chain: density+length pass, confirmation fails -> kept
    assert tpl[20]["n_removed"] == 0, tpl[20]
    assert all(
        tpl[r]["n_removed"] == 0 for r in tpl if 100 <= r < 100 + 54
    ), "sub-floor satellite phrases must survive"
    # band adjacency: nd=2 belongs to the ladder, not the template tier
    for i in (40, 41):
        assert tpl[i]["n_removed"] == 0, tpl[i]
        assert ladder[i]["n_removed"] == 62, ladder[i]
    for r in tpl.values():
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"]


def test_tfidf_sorted_run_tf_matches_counter(spark):
    """The r16 tf build counts token occurrences as RUNS of the sorted
    token array (one sort + one linear pass, replacing the per-distinct-
    token `size(filter(...))` rescan). The exploded (doc_id, token, tf)
    relation must equal a Python Counter over exactly the same split —
    including single-token docs, all-identical docs, empty-string tokens
    from leading/trailing/double spaces, and a doc that is one long run."""
    from collections import Counter

    import os, tempfile

    from dblink_spark.queries import REGISTRY, release_caches

    texts = [
        (1, "a b a c a b"),
        (2, "solo"),
        (3, "x x x x x x"),
        (4, " lead and  double  space "),
        (5, "z y x w v u t s r q p"),
        (6, "m m m n"),
    ]
    expected = {
        (d, tok, c)
        for d, t in texts
        for tok, c in Counter(t.split(" ")).items()
    }
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, "en", t, None, None) for d, t in texts],
            "doc_id bigint, lang string, text string, source string, url string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        df = REGISTRY["text_tfidf_topk"].fn(spark, td)
        # reach the persisted tf relation through the registered query's
        # own output: every (doc, token) appears in the top-5 here because
        # no doc has more than 5 DISTINCT tokens with nonzero idf... the
        # 11-distinct doc 5 does, so check it via its own rows only.
        got = {
            (r["doc_id"], r["token"], r["tf"]) for r in df.collect()
        }
        release_caches(df)
    # rows the query emits must all carry the Counter tf; and for docs
    # with <= 5 distinct tokens the emission must be complete
    assert got <= expected
    small = {d for d, t in texts if len(set(t.split(" "))) <= 5}
    assert {e for e in expected if e[0] in small} <= got
