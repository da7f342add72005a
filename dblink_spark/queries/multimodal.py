"""Multimodal pipeline queries over the ``documents`` fixture.

These exercise the real ``mapInPandas`` kernels in
:mod:`dblink_spark.operators.multimodal` end-to-end: the oracle recomputes
the same deterministic byte math in SQL, so a hash match proves the binary
plumbing (encode → Arrow batch → numpy kernel → Arrow → aggregate) is
byte-exact — not just row-counted.

The oracles are byte-based regardless of encoding: DuckDB ``strlen`` is
already a byte count, and byte *values* are recovered from
``hex(encode(text))`` nibbles (``_HEX_BYTE_SQL``), so non-ASCII documents
hash-match too — the oracle sees the same UTF-8 bytes as the Spark kernel.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dblink_spark.operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    frame_sample,
    resize_image,
)
from dblink_spark.queries import load, register

_MEDIA_TYPE_SQL = "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]"

# UTF-8 byte value at 0-based byte offset i, via the hex dump of the encoded
# payload: each byte is two hex chars; strpos over '123456789ABCDEF' maps a
# nibble char to its value (and conveniently returns 0 for '0'). This keeps
# the oracle byte-exact for non-ASCII text, where DuckDB's char-oriented
# ord(substr(...)) would return codepoints instead of bytes.
_NIBBLE = "strpos('123456789ABCDEF', substr(hx, CAST(2*{i}+{off} AS INT), 1))"
_HEX_BYTE_SQL = f"(16 * {_NIBBLE.format(i='i', off=1)} + {_NIBBLE.format(i='i', off=2)})"


@register(
    "multimodal_bytes_stats",
    oracle=f"""
SELECT {_MEDIA_TYPE_SQL} AS media_type,
  COUNT(*) AS n_items,
  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
  CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
FROM documents
GROUP BY media_type
""",
    survey_ref="beyond-reference: multimodal binary columns + typed metadata",
)
def multimodal_bytes_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata rollup per media type — exercises attach_media's binary +
    struct metadata derivation (pure Catalyst, no Python)."""
    m = attach_media(load(spark, sf_dir, "documents"))
    return m.groupBy(F.col("media_meta.media_type").alias("media_type")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("media")).cast("bigint").alias("total_bytes"),
        F.max(F.length("media")).cast("bigint").alias("max_bytes"),
    )


@register(
    "multimodal_decode_stats",
    oracle=f"""
WITH h AS (
  SELECT {_MEDIA_TYPE_SQL} AS media_type,
    strlen(text) AS n_samples,
    hex(encode(text)) AS hx
  FROM documents
),
decoded AS (
  SELECT media_type, n_samples,
    list_sum(list_transform(range(0, n_samples),
                            i -> {_HEX_BYTE_SQL})) AS byte_sum
  FROM h
)
SELECT media_type,
  COUNT(*) AS n_items,
  CAST(SUM(n_samples) AS BIGINT) AS total_samples,
  CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum
FROM decoded GROUP BY media_type
""",
    survey_ref="beyond-reference: multimodal decode kernel (mapInPandas)",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates the Arrow-batched decode kernel's per-item signal stats;
    a hash match proves the kernel saw the exact payload bytes."""
    decoded = decode_media(attach_media(load(spark, sf_dir, "documents")))
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_samples").cast("bigint").alias("total_samples"),
        F.sum("byte_sum").cast("bigint").alias("total_byte_sum"),
    )


_FRAME, _STRIDE = 256, 192


@register(
    "multimodal_frame_index",
    oracle=f"""
WITH f AS (
  SELECT doc_id, strlen(text) AS nb,
    CAST((strlen(text) - 1) // {_STRIDE} + 1 AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, n_frames,
  CAST(list_sum(list_transform(range(0, n_frames),
    k -> LEAST({_FRAME}, nb - k * {_STRIDE}))) AS BIGINT) AS total_frame_bytes
FROM f
ORDER BY doc_id
""",
    survey_ref="beyond-reference: frame sampling (video keyframe / audio window)",
)
def multimodal_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping frame extraction (256-byte frames, stride 192) with the
    frames kept nested; verifies offsets and tail-frame truncation."""
    framed = frame_sample(
        attach_media(load(spark, sf_dir, "documents")),
        frame_size=_FRAME,
        stride=_STRIDE,
    )
    return framed.select(
        "doc_id",
        "n_frames",
        F.aggregate(
            F.transform("frames", lambda fr: F.length(fr).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_frame_bytes"),
    ).orderBy("doc_id")


# 2^45: any float32 in (2^-22, 1] times 2^45 is an exact integer (24-bit
# mantissa), so summing the SCALED values as BIGINT is exact + associative
# in both engines — this is how the float32 kernel output gets a bit-exact
# SQL oracle despite "never hash float sums".
_FEAT_SCALE = 2**45


@register(
    "multimodal_feature_extract",
    oracle=f"""
WITH h AS (
  SELECT doc_id, strlen(text) AS total, hex(encode(text)) AS hx
  FROM documents
),
chars AS (
  SELECT doc_id, total,
         unnest(list_transform(range(0, total),
                i -> {_HEX_BYTE_SQL} % 8)) AS pos
  FROM h
),
hist AS (
  SELECT doc_id, total, pos, COUNT(*) AS c
  FROM chars GROUP BY doc_id, total, pos
),
scaled AS (
  -- replicate the kernel bit-for-bit: double division, round to float32,
  -- widen back to double, scale by 2^45 (exact integer)
  SELECT doc_id, pos,
    CAST(CAST(CAST(CAST(c AS DOUBLE) / total AS REAL) AS DOUBLE)
         * {_FEAT_SCALE} AS BIGINT) AS sv
  FROM hist
),
docmt AS (
  SELECT doc_id, {_MEDIA_TYPE_SQL} AS media_type FROM documents
),
docs_per AS (
  SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_items
  FROM docmt GROUP BY media_type
),
agg AS (
  SELECT dm.media_type, s.pos, SUM(s.sv) AS sum_scaled
  FROM scaled s JOIN docmt dm USING (doc_id)
  GROUP BY dm.media_type, s.pos
)
SELECT dp.media_type, CAST(g.pos AS INT) AS pos, dp.n_items,
  CAST(COALESCE(a.sum_scaled, 0) AS BIGINT) AS sum_scaled,
  CAST(COALESCE(a.sum_scaled, 0) AS DOUBLE)
    / (dp.n_items * {_FEAT_SCALE}) AS mean_weight
FROM docs_per dp
CROSS JOIN range(0, 8) g(pos)
LEFT JOIN agg a ON a.media_type = dp.media_type AND a.pos = g.pos
ORDER BY dp.media_type, pos
""",
    survey_ref="beyond-reference: multimodal feature extraction (embedding-kernel shape)",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type mean of the 8-dim byte-histogram features — the shape
    a model-inference kernel would have.

    The per-doc feature is float32; float sums aren't associative, so the
    aggregate goes through an exact dyadic scaling: each float32 value
    times 2^45 is an exact integer (summed as BIGINT), and the mean is one
    deterministic IEEE division at the end. This upgrades the driver check
    from rows-only to a full value-hash gate."""
    feats = extract_features(attach_media(load(spark, sf_dir, "documents")), dim=8)
    # Exactness guard: a nonzero float32 share below 2^-22 (possible only for
    # payloads over ~4 MiB) has ulp < 2^-45, so `val * 2^45` is no longer an
    # exact integer and Spark's truncating cast vs DuckDB's rounding cast
    # could disagree. Fail loudly instead of hashing a silently-lossy sum.
    guarded_val = F.when(
        (F.col("val") > 0) & (F.col("val") < F.lit(2.0**-22)),
        F.raise_error(
            "feature weight below 2^-22: dyadic 2^45 scaling is not exact "
            "(payload over ~4 MiB?) — multimodal_feature_extract oracle "
            "precondition violated"
        ).cast("double"),
    ).otherwise(F.col("val").cast("double"))
    per = (
        feats.select("media_type", F.posexplode("features").alias("pos", "val"))
        .groupBy("media_type", "pos")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                (guarded_val * F.lit(float(_FEAT_SCALE))).cast("bigint")
            ).alias("sum_scaled"),
        )
    )
    return per.select(
        "media_type",
        "pos",
        "n_items",
        "sum_scaled",
        (
            F.col("sum_scaled").cast("double")
            / (F.col("n_items").cast("double") * F.lit(float(_FEAT_SCALE)))
        ).alias("mean_weight"),
    ).orderBy("media_type", "pos")


# --- perceptual-hash image dedup (VERDICT r9 task 5) -----------------------
# aHash over the 8x8 stub-resized grid: bit_k = (pixel_k > mean). The mean
# compare is done as the EXACT integer inequality pixel*64 > total (no
# division), and the 64-bit fingerprint is carried as two 32-bit halves
# (lo = bits 0..31, hi = bits 32..63) so neither engine ever shifts into a
# BIGINT sign bit. Hamming distance <= _PHASH_MAX_HAMMING over 4 disjoint
# 16-bit bands is pigeonhole-COMPLETE (3 flipped bits touch at most 3
# bands, so one band is always intact): the band equi-join is purely an
# optimization and the oracle's all-pairs formulation yields the identical
# pair set — engine-exact by construction (integers end to end).
_PHASH_PX = 64  # 8x8 grid
_PHASH_MAX_HAMMING = 3


def phash_capped_pairs(fp: DataFrame, cap: int | None = None) -> DataFrame:
    """Near-dup pairs ``(doc1 < doc2)`` within Hamming distance
    ``_PHASH_MAX_HAMMING``, candidates via the 4x16-bit band equi-join,
    with HOT band buckets occupancy-capped (VERDICT r10 "What's wrong"
    #2): identical thumbnails/logos are *the* degenerate input for
    perceptual hashing — one bucket of 1M identical fingerprints is
    5x10^11 all-pairs candidates. Buckets above ``cap`` emit star pairs
    against the bucket representative (min doc_id) instead — the same
    rule as `capped_band_candidates`, with the rep's FINGERPRINT carried
    through the min(struct) so the Hamming verify needs no join-back.
    Star pairing preserves rep_doc/connected components on the degenerate
    cliques that create hot buckets (members are within 3 bits of the
    rep, transitively of each other); what it trades is the exact per-doc
    partner count inside pathological cliques, only above the threshold.
    The default cap is `HOT_BUCKET_CAP` — sized to never fire on the
    registered fixtures (max phash band occupancy: 3 at sf0.01, 38 at
    sf0.1), so every hash gate stays bit-exact (pinned in
    tests/test_multimodal.py)."""
    from pyspark.sql import Window

    from dblink_spark.queries.dedup import HOT_BUCKET_CAP

    if cap is None:
        cap = HOT_BUCKET_CAP
    bands = phash_bands(fp)
    # ONE exchange on band_key; the cold self-join then reuses its hash
    # partitioning (the _tagged_bands trick, fingerprints riding along)
    w = Window.partitionBy("band_key")
    tagged = bands.select(
        "doc_id",
        "phash_lo",
        "phash_hi",
        "band_key",
        F.count("*").over(w).alias("occ"),
        F.min(F.struct("doc_id", "phash_lo", "phash_hi")).over(w).alias("rep"),
    )
    cold = tagged.filter(F.col("occ") <= cap)
    a, b = cold.alias("a"), cold.alias("b")
    ham = F.bit_count(
        F.col("a.phash_lo").bitwiseXOR(F.col("b.phash_lo"))
    ) + F.bit_count(F.col("a.phash_hi").bitwiseXOR(F.col("b.phash_hi")))
    pairs_cold = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= _PHASH_MAX_HAMMING)
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
    )
    # rep = min(struct) => rep.doc_id < member doc_id, so the doc1 < doc2
    # invariant holds by construction; the verify still runs (star pairs
    # beyond Hamming 3 are dropped, same contract as the cold arm)
    hot = tagged.filter(
        (F.col("occ") > cap) & (F.col("doc_id") != F.col("rep.doc_id"))
    )
    ham_hot = F.bit_count(
        F.col("rep.phash_lo").bitwiseXOR(F.col("phash_lo"))
    ) + F.bit_count(F.col("rep.phash_hi").bitwiseXOR(F.col("phash_hi")))
    pairs_hot = hot.filter(ham_hot <= _PHASH_MAX_HAMMING).select(
        F.col("rep.doc_id").alias("doc1"), F.col("doc_id").alias("doc2")
    )
    # a pair agreeing on multiple bands is emitted once per band
    return pairs_cold.unionAll(pairs_hot).distinct()


def phash_bands(fp: DataFrame) -> DataFrame:
    """Exploded ``(doc_id, phash_lo, phash_hi, band_key)`` relation: the 4
    disjoint 16-bit quarters of the fingerprint, band index folded into
    the key (``band_idx << 16 | band_bits``) so all bands share ONE join
    column — the `minhash_bands` shape, fingerprints carried for the
    join-free Hamming verify."""
    mask = F.lit(0xFFFF)
    quarters = [
        F.col("phash_lo").bitwiseAND(mask),
        F.shiftright("phash_lo", 16),
        F.col("phash_hi").bitwiseAND(mask),
        F.shiftright("phash_hi", 16),
    ]
    return fp.select(
        "doc_id",
        "phash_lo",
        "phash_hi",
        F.explode(
            F.array(
                *[
                    (F.lit(idx << 16) + q).cast("long")
                    for idx, q in enumerate(quarters)
                ]
            )
        ).alias("band_key"),
    )


@register(
    "multimodal_phash_dedup",
    oracle=f"""
WITH m AS (
  SELECT doc_id, strlen(text) AS L, hex(encode(text)) AS hx FROM documents
  WHERE doc_id % 3 = 0
),
px AS (
  SELECT doc_id, L, hx, k, (k * L) // {_PHASH_PX} AS i
  FROM m, UNNEST(range(0, {_PHASH_PX})) AS u(k)
),
vals AS (
  SELECT doc_id, k,
    CASE WHEN L = 0 THEN 0 ELSE {_HEX_BYTE_SQL} END AS b
  FROM px
),
tot AS (SELECT doc_id, SUM(b) AS total FROM vals GROUP BY doc_id),
bits AS (
  SELECT v.doc_id, v.k,
    CASE WHEN v.b * {_PHASH_PX} > t.total THEN 1 ELSE 0 END AS bit
  FROM vals v JOIN tot t USING (doc_id)
),
fp AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN k < 32
         THEN bit * (1::BIGINT << CAST(k AS INT)) ELSE 0 END) AS BIGINT)
      AS phash_lo,
    CAST(SUM(CASE WHEN k >= 32
         THEN bit * (1::BIGINT << CAST(k - 32 AS INT)) ELSE 0 END) AS BIGINT)
      AS phash_hi
  FROM bits GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.phash_lo, b.phash_lo))
      + bit_count(xor(a.phash_hi, b.phash_hi)) <= {_PHASH_MAX_HAMMING}
),
adj AS (
  SELECT doc1 AS doc_id, doc2 AS partner FROM pairs
  UNION ALL SELECT doc2, doc1 FROM pairs
),
grouped AS (
  SELECT doc_id, COUNT(*) AS n_near_dups, MIN(partner) AS min_partner
  FROM adj GROUP BY doc_id
)
SELECT f.doc_id, f.phash_lo, f.phash_hi,
  CAST(COALESCE(g.n_near_dups, 0) AS BIGINT) AS n_near_dups,
  LEAST(f.doc_id, COALESCE(g.min_partner, f.doc_id)) AS rep_doc
FROM fp f LEFT JOIN grouped g ON g.doc_id = f.doc_id
""",
    survey_ref=(
        "beyond-reference: perceptual-hash (aHash) image dedup — "
        "Hamming-banded candidate join over mapInPandas-decoded pixels"
    ),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup detection for the IMAGE slice: every image
    payload is resized to an 8x8 grid by the Arrow-batched resize kernel
    (stub codec — on a PIL-equipped cluster the real grayscale resample
    slots in with the identical contract), aHash'd (bit = pixel above the
    image mean, exact integer compare), and near-dups are pairs within
    Hamming distance {h} of the 64-bit fingerprint. Emits one row per
    image ``(doc_id, phash_lo, phash_hi, n_near_dups, rep_doc)`` — the
    fingerprints themselves are gated, so the kernel's byte math is
    hash-verified, not just the pair decisions.

    100-TB shape:
    - the media-type filter prunes BEFORE the Python kernel (only the
      image slice is ever decoded — metadata predicates are plain struct
      filters Catalyst evaluates JVM-side);
    - candidates form ONLY via the band_key equi-join over 4 disjoint
      16-bit bands — pigeonhole-complete for Hamming <= {h}, so banding
      changes nothing semantically while bounding the join to docs
      sharing a quarter-fingerprint (the all-pairs-within-type join
      would be N² at corpus scale);
    - DEGENERATE buckets (identical thumbnails/logos — the common phash
      pathology) are occupancy-capped: above HOT_BUCKET_CAP a bucket
      emits star pairs against its representative (`phash_capped_pairs`),
      so a 1M-identical-image clique costs O(n) candidates, not O(n²);
      the cap never fires on the gate corpora (pinned);
    - the fingerprint table is persisted: it feeds both band sides, the
      Hamming verify (carried columns, no re-decode), and the output
      anchor;
    - output is linear in the image count (left join from fp)."""
    d = load(spark, sf_dir, "documents")
    media = attach_media(d).filter(
        F.col("media_meta.media_type") == "image"
    )
    # pin the stub codec like multimodal_resize_stats: the GATE must not
    # change results when PIL happens to be installed
    from dblink_spark.operators.multimodal import _fake_resize_codec

    resized = resize_image(media, 8, 8, codec=_fake_resize_codec())
    # unpack the 64 pixel bytes JVM-side (hex/conv over binary substrings —
    # same trick as multimodal_resize_stats; no second Python stage).
    # r16 (guide §1.2, the ANN change-6 lesson): the 64 bit-vote terms are
    # assembled as SQL strings handed to two ``F.expr`` calls — the Column-
    # algebra form (64 when/multiply chains + per-element lambdas) made the
    # frame BUILD this query's single largest cost (~7k py4j round trips,
    # measured via cProfile over send_command). Identical expression tree:
    # same element_at/CASE/multiply shapes, same left-assoc integer sums.
    sig = resized.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, {_PHASH_PX}), "
            "i -> CAST(CONV(HEX(SUBSTRING(pixels, i, 1)), 16, 10) AS BIGINT))"
        ).alias("px"),
    ).withColumn(
        "total", F.expr("aggregate(px, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    )
    def _bit_sql(k: int) -> str:
        return (
            f"(CASE WHEN (element_at(px, {k + 1}) * {_PHASH_PX}) > total "
            f"THEN 1 ELSE 0 END)"
        )

    lo_sql = " + ".join(f"{_bit_sql(k)} * {1 << k}" for k in range(32))
    hi_sql = " + ".join(
        f"{_bit_sql(k)} * {1 << (k - 32)}" for k in range(32, _PHASH_PX)
    )
    fp = sig.select(
        "doc_id",
        F.expr(f"CAST({lo_sql} AS BIGINT)").alias("phash_lo"),
        F.expr(f"CAST({hi_sql} AS BIGINT)").alias("phash_hi"),
    ).persist()
    pairs = phash_capped_pairs(fp)
    adj = pairs.select(
        F.col("doc1").alias("doc_id"), F.col("doc2").alias("partner")
    ).unionAll(
        pairs.select(F.col("doc2").alias("doc_id"), F.col("doc1").alias("partner"))
    )
    grouped = adj.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_near_dups"),
        F.min("partner").alias("min_partner"),
    )
    out = fp.join(grouped, "doc_id", "left").select(
        "doc_id",
        "phash_lo",
        "phash_hi",
        F.coalesce("n_near_dups", F.lit(0)).cast("long").alias("n_near_dups"),
        F.least(
            F.col("doc_id"), F.coalesce("min_partner", F.col("doc_id"))
        ).alias("rep_doc"),
    )
    from dblink_spark.queries import owns_caches

    return owns_caches(out, fp)


multimodal_phash_dedup.__doc__ = multimodal_phash_dedup.__doc__.format(
    h=_PHASH_MAX_HAMMING
)


_RS_W, _RS_H = 4, 4  # 16 output pixels per item


@register(
    "multimodal_resize_stats",
    oracle=f"""
WITH m AS (
  SELECT doc_id, strlen(text) AS L, hex(encode(text)) AS hx FROM documents
),
px AS (
  SELECT doc_id, L, hx, (k * L) // {_RS_W * _RS_H} AS i
  FROM m, UNNEST(range(0, {_RS_W * _RS_H})) AS u(k)
),
vals AS (
  SELECT doc_id, CASE WHEN L = 0 THEN 0 ELSE {_HEX_BYTE_SQL} END AS b FROM px
),
agg AS (SELECT doc_id, SUM(b) AS psum FROM vals GROUP BY doc_id)
SELECT {_MEDIA_TYPE_SQL} AS media_type,
  COUNT(*) AS n_items,
  CAST(SUM(psum) AS BIGINT) AS total_pixel_sum
FROM agg JOIN documents USING (doc_id)
GROUP BY media_type
""",
    survey_ref="beyond-reference: media resize kernel (fixed-size output per item) — gated via the deterministic stub codec",
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every media payload to a fixed 4x4 grid through the
    Arrow-batched ``resize_image`` kernel and aggregate the pixel sums per
    media type. The gate pins the DETERMINISTIC stub codec
    (nearest-neighbor index resample — the container ships no media libs,
    per the multimodal stub policy), so a hash match proves the resize
    plumbing end-to-end: encode -> Arrow batch -> numpy index resample ->
    fixed-size binary -> JVM byte unpack -> aggregate. The byte unpack on
    the Spark side is hex/conv over binary substrings — JVM-side, no UDF.
    On a cluster with PIL installed, `resize_image(codec=None)` swaps in
    the real decoder with the identical contract."""
    from dblink_spark.operators.multimodal import _fake_resize_codec

    d = load(spark, sf_dir, "documents")
    resized = resize_image(
        attach_media(d), _RS_W, _RS_H, codec=_fake_resize_codec()
    )
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    n_px = _RS_W * _RS_H
    px_sum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_px)),
            lambda i: F.conv(F.hex(F.substring(F.col("pixels"), i, 1)), 16, 10)
            .cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        resized.select(mt.alias("media_type"), px_sum.alias("psum"))
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("psum").cast("long").alias("total_pixel_sum"),
        )
    )
