"""ANN quality: the IVF scale path must retrieve most of the brute-force
truth. Measured at calibration: mean recall@5 = 0.95 (sf0.001) and 0.925
(sf0.01) with nprobe=2 of 8 cells; thresholds carry slack for fixture
evolution. A scale path that silently lost recall would still pass its
hash gate (the oracle implements the SAME approximation), so this test
compares against the exact brute-force baseline instead."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_brute_force(spark):
    from dblink_spark.queries.vectors import ann_ivf_untrained_baseline, ann_topk_cosine

    brute: dict[int, set] = {}
    for r in ann_topk_cosine(spark, SF).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf: dict[int, set] = {}
    for r in ann_ivf_untrained_baseline(spark, SF).collect():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(ivf) == set(brute), "every query must produce IVF results"
    recalls = [
        len(brute[q] & ivf[q]) / len(brute[q]) for q in brute
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.7, (mean_recall, recalls)
    assert min(recalls) >= 0.4, recalls


def test_scaled_band_spec_prefix_stable():
    """The static oracle gates MAX_BITS pre-generated hyperplanes on
    k < bits; the Spark side slices the first `bits`. Both agree only if
    narrower specs are exact prefixes of wider ones."""
    from dblink_spark.queries.vectors import make_lsh_bands_prefix

    wide = make_lsh_bands_prefix(3, 17)
    for w in (2, 5, 9, 17):
        narrow = make_lsh_bands_prefix(3, w)
        assert narrow == [band[:w] for band in wide]


def test_bits_for_corpus_matches_duckdb_formula():
    """Python bits_for_corpus and the oracle's SQL formula must agree for
    any corpus size — a one-bit disagreement silently changes every band
    key. Sweep sizes including exact powers of two (the ceil(log2) edge)."""
    import duckdb

    from dblink_spark.queries.vectors import bits_for_corpus

    con = duckdb.connect()
    sizes = [1, 63, 64, 255, 256, 257, 500, 2000, 4096, 10**6, 2**26, 6 * 10**10]
    for n in sizes:
        sql_bits = con.execute(
            f"SELECT GREATEST(2, CAST(CEIL(LOG2(GREATEST(CAST({n} AS BIGINT) / 64.0, 4.0))) AS INT))"
        ).fetchone()[0]
        assert bits_for_corpus(n, 64) == sql_bits, (n, bits_for_corpus(n, 64), sql_bits)


def test_scaled_dedup_pairs_superset_recall(spark):
    """Width-scaling trades candidates for speed but must still catch the
    obvious near-dups: every pair the scaled query emits has cosine >= the
    threshold, and emitted pairs are a subset of the demo-width pairs when
    the scaled width is <= the demo width (coarser buckets see more)."""
    from dblink_spark.queries.vectors import dedup_embedding_cosine_scaled

    rows = dedup_embedding_cosine_scaled(spark, SF).collect()
    assert rows, "fixture contains planted near-duplicates"
    assert all(r["cosine"] >= 0.35 for r in rows)
    assert all(r["v1"] < r["v2"] for r in rows)


def test_trained_quantizer_beats_seed_on_neutral_queries(spark):
    """The registered `ann_ivf_untrained_baseline` keeps first-K seed centroids so its DuckDB
    oracle stays expressible — but the queries there (vec_id < 8) ARE the
    seed centroids, which inflates recall (each query's own cell holds its
    halo). On NEUTRAL queries the trained spherical-k-means quantizer must
    strictly beat the first-K quantizer at equal nprobe — the property that
    makes training worth shipping at scale."""
    import pyspark.sql.functions as F

    from dblink_spark.queries import load
    from dblink_spark.queries.vectors import (
        _IVF_K,
        ivf_search,
        train_ivf_centroids,
    )
    from dblink_spark.functions.vector import quantized_dot

    sf = "/root/testdata/sf0.01"
    e = load(spark, sf, "embeddings")
    neutral = list(range(100, 140))

    # brute-force truth for the neutral query set
    q = e.filter(F.col("vec_id").isin(neutral)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        quantized_dot(F.col("embedding"), F.col("embedding")).cast("double").alias("qq"),
    )
    base = e.select(
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        quantized_dot(F.col("embedding"), F.col("embedding")).cast("double").alias("bb"),
    )
    from pyspark.sql import Window

    cosine = quantized_dot(F.col("qe"), F.col("embedding")).cast("double") / (
        F.sqrt("qq") * F.sqrt("bb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(cosine), F.asc("neighbor_id"))
    brute_df = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 5")
    )
    brute: dict[int, set] = {}
    for r in brute_df.collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    seed_cents = sorted(
        (r["vec_id"], [float(v) for v in r["embedding"]])
        for r in e.filter(F.col("vec_id") < _IVF_K).collect()
    )
    trained = train_ivf_centroids(e, k=_IVF_K)

    def mean_recall(cents):
        got: dict[int, set] = {}
        for r in ivf_search(e, cents, query_ids=neutral).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(brute[qid] & got.get(qid, set())) / len(brute[qid]) for qid in brute
        ) / len(brute)

    r_seed, r_trained = mean_recall(seed_cents), mean_recall(trained)
    # measured at calibration: seed 0.42, trained 0.575 (sf0.01, nprobe=2)
    assert r_trained > r_seed, (r_trained, r_seed)
    assert r_trained >= 0.5, r_trained


def test_semdedup_k_matches_duckdb_formula():
    """Python `semdedup_k` and the oracle's scalar-subquery formula must
    agree at every corpus size — a one-cell disagreement changes every
    centroid and every verdict. The gate corpora (500 vectors) sit at the
    16-cell floor; sf0.1 (2000) departs it."""
    import duckdb

    from dblink_spark.queries.vectors import semdedup_k

    con = duckdb.connect()
    sizes = [0, 1, 500, 1023, 1024, 1025, 2000, 2048, 10**6, 6 * 10**10]
    for n in sizes:
        sql_k = con.execute(
            f"SELECT GREATEST(16, CAST({n} AS BIGINT) // 64)"
        ).fetchone()[0]
        assert semdedup_k(n) == sql_k, (n, semdedup_k(n), sql_k)
    assert semdedup_k(500) == 16           # gate corpora: floor (hashes stable)
    assert semdedup_k(2000) == 31          # sf0.1: corpus-derived
    assert semdedup_k(64 * 10**9) == 10**9  # 100-TB-ish: cells keep pace


def test_semdedup_cells_scale_with_corpus(spark, tmp_path):
    """The r10 fixed-K retirement made real (VERDICT r10 #1): on a corpus
    ABOVE the floor the derived K must exceed 16, the Spark result must
    still hash-match the DuckDB oracle (the scalar subquery derives the
    SAME K), and the in-cell candidate volume must stay ~N * target_cell —
    the linear bound that makes the blocker survive a 100x corpus."""
    import duckdb
    import numpy as np

    from dblink_spark.queries import REGISTRY
    from dblink_spark.queries.vectors import (
        _SEMDEDUP_TARGET_CELL,
        semdedup_k,
    )
    from tools.oracle_check import compare

    n = 2048  # -> K = 32, double the floor
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=64).astype("float32")], i % 3)
        for i in range(n)
    ]
    d = str(tmp_path / "scaled_vectors")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(d + "/embeddings.parquet")

    q = REGISTRY["dedup_semantic"]
    sdf = q.fn(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    odf = con.execute(q.oracle).fetchdf()
    problems = compare("dedup_semantic", sdf, odf)
    assert not problems, problems

    k = semdedup_k(n)
    assert k == 32
    occ = sdf.groupby("cid").size()
    assert occ.index.nunique() > 16, "derived K must depart the floor"
    # in-cell candidate volume: sum C(occ, 2) ~ N/2 * target_cell for a
    # balanced quantizer; 4x slack absorbs Voronoi skew of the first-K
    # seed centroids (measured 1.00x at this seed, max cell 85). The
    # retired fixed-K=16 formulation sits at 2.0x of THIS bound already
    # at n=2048 and grows linearly with N — the bound is the scale pin.
    vol = int((occ * (occ - 1) // 2).sum())
    assert vol <= 4 * (n // 2) * _SEMDEDUP_TARGET_CELL, (vol, occ.describe())


def test_semdedup_hot_cell_cap_bounds_identical_clique(spark):
    """A clique of identical embeddings lands in ONE cell regardless of K
    (the phash/MinHash degenerate input, on the semantic blocker): above
    the cap the pair relation must be the n-1 star pairs at cosine 1, and
    the downstream keep-earliest verdicts must match what the uncapped
    join would produce (every member drops against the clique minimum)."""
    import pyspark.sql.functions as F

    from dblink_spark.functions.vector import quantized_dot
    from dblink_spark.queries.vectors import (
        _semdedup_pairs,
        _semdedup_tagged_cells,
    )

    n = 1000
    vec = [float((i * 7 % 13) - 6) / 13.0 for i in range(64)]
    cells = spark.createDataFrame(
        [(i, vec, 3) for i in range(n)],
        "vec_id long, embedding array<float>, cid int",
    ).withColumn(
        "sq", quantized_dot(F.col("embedding"), F.col("embedding"))
    ).select("vec_id", "embedding", "sq", "cid")
    pairs = _semdedup_pairs(_semdedup_tagged_cells(cells), cap=64)
    rows = pairs.collect()
    # star: n-1 pairs anchored at the clique min, vs C(1000,2) = 499 500
    assert len(rows) == n - 1
    assert all(r["earlier"] == 0 for r in rows)
    assert {r["vec_id"] for r in rows} == set(range(1, n))
    assert all(r["cos"] > 0.999 for r in rows)


def test_semdedup_cap_never_fires_on_gate_corpora(spark):
    """Hash gates stay bit-exact only if the default cap is a no-op on
    the registered fixtures: max cell occupancy must sit far below
    HOT_BUCKET_CAP at every gate SF (the semdedup_k sizing keeps the
    EXPECTED cell ~64; measured max: 85 on the 2048-vector scale test)."""
    import pyspark.sql.functions as F

    from dblink_spark.queries import load
    from dblink_spark.queries.dedup import HOT_BUCKET_CAP
    from dblink_spark.queries.vectors import (
        ivf_assign_cells,
        semdedup_k,
    )

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        e = load(spark, sf, "embeddings")
        k = semdedup_k(e.count())
        cents = sorted(
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in e.filter(F.col("vec_id") < k)
            .select("vec_id", "embedding")
            .collect()
        )
        occ = (
            ivf_assign_cells(e, cents)
            .groupBy("cid")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert occ <= HOT_BUCKET_CAP // 4, (sf, occ)


def test_ivf_join_arm_matches_literal_arm(spark):
    """The broadcast-join assignment arm (large-K path: corpus-derived K
    would blow the literal expression tree past ~64 centroids) must be a
    VALUE-EXACT twin of the literal arm — same quantized cosine, same
    (cos DESC, cid ASC) tie-break — including on a zero vector (cosine
    ties across every centroid -> cid-asc break) and an exact-duplicate
    pair (identical assignments)."""
    import numpy as np
    import pyspark.sql.functions as F

    from dblink_spark.queries.vectors import ivf_assign_cells

    rng = np.random.default_rng(17)
    rows = [
        (i, [float(x) for x in rng.normal(size=64).astype("float32")], 0)
        for i in range(400)
    ]
    rows.append((400, [0.0] * 64, 0))          # zero vector: all-tie
    rows.append((401, rows[5][1], 0))          # exact duplicate of 5
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") < 100).collect()
    )  # K=100 > _IVF_LITERAL_MAX_K: the default dispatch picks the join arm
    lit = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign_cells(e, cents, max_literal_k=10**9).collect()
    }
    join = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign_cells(e, cents, max_literal_k=0).collect()
    }
    assert lit == join
    default = {
        r["vec_id"]: r["cid"] for r in ivf_assign_cells(e, cents).collect()
    }
    assert default == lit, "default dispatch at K=100 must use a twin arm"
    assert join[401] == join[5], "exact duplicates co-assign"
