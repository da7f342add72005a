"""Sources/sinks: CSV scan semantics, clusters CSV round-trip, buffered
chain writes, and bit-exact state save/resume (SURVEY §2.1 S1-S11)."""

from __future__ import annotations

import os

import pyarrow as pa

import pyspark.sql.functions as F
import pytest

from dblink_spark.er.attributes import Attribute, BetaParams, ConstantSim, LevenshteinSim
from dblink_spark.er.cache import build_records_cache
from dblink_spark.er.datagen import make_rldata
from dblink_spark.er.partition import SinglePartition
from dblink_spark.er.sampler import SamplerOptions, sample
from dblink_spark.er.state import init_state
from dblink_spark.sources import (
    BufferedChainWriter,
    copy_files,
    load_state,
    read_clusters_csv,
    read_linkage_chain,
    read_records_csv,
    save_state,
    write_clusters_csv,
)


def test_read_records_csv_semantics(spark, tmp_path):
    """Header + all-strings + nullValue + DROPMALFORMED (ref: Project.scala:173-180)."""
    p = tmp_path / "in.csv"
    p.write_text(
        "id,src,name,year\n"
        "r1,A,alice,1990\n"
        "r2,A,NA,1991\n"          # NA -> null via nullValue
        "r3,B,carol,1992,EXTRA\n"  # malformed: extra column -> dropped
        "r4,B,dave,NA\n"
    )
    df = read_records_csv(
        spark, str(p), record_id_col="id", matching_cols=["name", "year"],
        file_id_col="src", null_value="NA",
    )
    assert df.columns == ["rec_id", "file_id", "name", "year"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 4
    rows = {r["rec_id"]: r for r in df.collect()}
    assert set(rows) == {"r1", "r2", "r4"}, "malformed row must be dropped"
    assert rows["r2"]["name"] is None
    assert rows["r4"]["year"] is None

    # no file column -> constant "0" file id (single-file dedup mode)
    df2 = read_records_csv(spark, str(p), record_id_col="id", matching_cols=["name"])
    assert df2.select("file_id").distinct().collect()[0][0] == "0"


def test_clusters_csv_roundtrip(spark, tmp_path):
    clusters = spark.createDataFrame(
        [(["r1", "r2"],), (["r3"],), (["r4", "r5", "r6"],)], "cluster array<string>"
    )
    out = str(tmp_path / "clusters")
    write_clusters_csv(clusters, out)
    back = read_clusters_csv(spark, out)
    got = sorted(tuple(r["cluster"]) for r in back.collect())
    assert got == [("r1", "r2"), ("r3",), ("r4", "r5", "r6")]


def test_buffered_chain_writer(spark, tmp_path):
    w = BufferedChainWriter(str(tmp_path), buffer_size=3)
    mk = lambda it: spark.createDataFrame(  # noqa: E731
        [(it, 0, ["a", "b"])], "iteration long, partition_id int, rec_ids array<string>"
    )
    for it in range(5):
        w.append(mk(it))
    w.flush()
    chain = read_linkage_chain(spark, str(tmp_path))
    assert chain.count() == 5
    # cutoff filter pushes to the scan
    assert read_linkage_chain(spark, str(tmp_path), cutoff=3).count() == 2
    plan = read_linkage_chain(spark, str(tmp_path), cutoff=3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(iteration), GreaterThanOrEqual(iteration,3)" in plan


def test_copy_files(spark, tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("hello")
    d = tmp_path / "dest"
    (out,) = copy_files(spark, [str(src)], str(d))
    assert open(out).read() == "hello"


@pytest.fixture(scope="module")
def small_er(spark):
    pdf = make_rldata(n_records=60, dup_fraction=0.2, missing_fraction=0.02, seed=3)
    records = spark.createDataFrame(pdf).withColumn("file_id", F.lit("0"))
    attrs = [
        Attribute("by", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bm", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("bd", ConstantSim(), BetaParams(0.5, 50.0)),
        Attribute("fname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
        Attribute("lname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
    ]
    cache = build_records_cache(records, attrs, expected_max_cluster_size=10)
    return records, cache


def _linkage_set(state):
    rows = state.df.filter("NOT is_summary AND size(rec_ids) > 0").collect()
    return sorted(tuple(sorted(r["rec_ids"])) for r in rows)


def test_state_save_resume_bit_exact(spark, small_er, tmp_path):
    """save -> load -> k more iterations == k+j uninterrupted iterations.

    Driver RNG, kernel seeds, and θ all restore exactly (S4/S5 contract:
    ref State.scala:122-193 round-trips the same driver scalars)."""
    records, cache = small_er

    # uninterrupted: 6 iterations
    s_ref = init_state(spark, records, cache, SinglePartition(), 1, seed=99)
    s_ref = sample(s_ref, sample_size=6, options=SamplerOptions(sampler="PCG-I"))

    # interrupted: 3 iterations, save, load, 3 more
    s_a = init_state(spark, records, cache, SinglePartition(), 1, seed=99)
    s_a = sample(s_a, sample_size=3, options=SamplerOptions(sampler="PCG-I"))
    save_state(s_a, str(tmp_path / "ckpt"))
    s_b = load_state(spark, str(tmp_path / "ckpt"))
    assert s_b.iteration == 3
    assert (s_b.theta == s_a.theta).all()
    s_b = sample(s_b, sample_size=3, options=SamplerOptions(sampler="PCG-I"))

    assert s_b.iteration == s_ref.iteration == 6
    assert _linkage_set(s_b) == _linkage_set(s_ref)
    assert s_b.summary.log_likelihood == pytest.approx(
        s_ref.summary.log_likelihood, rel=0, abs=0
    ), "resume must be bit-exact"
    assert (s_b.summary.agg_distortions == s_ref.summary.agg_distortions).all()


def test_state_format_version_fails_fast(spark, small_er, tmp_path):
    """A checkpoint from an incompatible build must fail at load with an
    explicit format error, not deep inside np.frombuffer (ADVICE r4: the
    v1 array<array<T>> layout 'loads' then dies opaquely on reshape)."""
    import pickle

    import pytest as _pytest

    from dblink_spark.sources.state_io import DRIVER_BLOB

    records, cache = small_er
    s = init_state(spark, records, cache, SinglePartition(), 1, seed=7)
    save_state(s, str(tmp_path / "ckpt"))
    blob_path = str(tmp_path / "ckpt" / DRIVER_BLOB)
    with open(blob_path, "rb") as f:
        blob = pickle.load(f)
    assert blob["format_version"] >= 2
    blob["format_version"] = 1
    with open(blob_path, "wb") as f:
        pickle.dump(blob, f)
    with _pytest.raises(ValueError, match="incompatible state format"):
        load_state(spark, str(tmp_path / "ckpt"))
    # a pre-versioning blob (no marker at all) reads as v1 -> same diagnostic
    del blob["format_version"]
    with open(blob_path, "wb") as f:
        pickle.dump(blob, f)
    with _pytest.raises(ValueError, match="incompatible state format"):
        load_state(spark, str(tmp_path / "ckpt"))


def test_resume_appends_chain(spark, small_er, tmp_path):
    records, cache = small_er
    out = str(tmp_path / "run")
    s = init_state(spark, records, cache, SinglePartition(), 1, seed=5)
    s = sample(s, sample_size=4, options=SamplerOptions(sampler="PCG-I"), output_path=out)
    save_state(s, os.path.join(out, "ckpt"))
    s2 = load_state(spark, os.path.join(out, "ckpt"))
    s2 = sample(s2, sample_size=4, options=SamplerOptions(sampler="PCG-I"), output_path=out)
    chain = read_linkage_chain(spark, out)
    assert chain.select("iteration").distinct().count() == 8


def test_local_linkage_sample_matches_dataframe_path(spark, small_er, tmp_path):
    """The Arrow-native sample builder (driver-local chains) must produce the
    same rows as the DataFrame path, and the pyarrow-flushed files must be
    readable through the same scan with the cutoff filter still pushed."""
    from dblink_spark.er.sampler import linkage_sample, linkage_sample_local

    records, cache = small_er
    s = init_state(spark, records, cache, SinglePartition(), 1, seed=11)
    s = sample(s, sample_size=3, options=SamplerOptions(sampler="PCG-I"))
    assert s.local_parts is not None, "fused path should leave local state"

    tbl = linkage_sample_local(s)
    got = sorted(
        (r["iteration"], r["partition_id"], tuple(sorted(r["rec_ids"])))
        for r in tbl.to_pylist()
    )
    want = sorted(
        (r["iteration"], r["partition_id"], tuple(sorted(r["rec_ids"])))
        for r in linkage_sample(s).collect()
    )
    assert got == want

    # arrow tables through the writer -> same scan semantics as Spark files
    w = BufferedChainWriter(str(tmp_path), buffer_size=2)
    for it in (3, 4, 5):
        t = tbl.set_column(0, "iteration", pa.array([it] * len(tbl), pa.int64()))
        w.append(t)
    w.flush()
    chain = read_linkage_chain(spark, str(tmp_path))
    assert chain.select("iteration").distinct().count() == 3
    assert chain.schema["rec_ids"].dataType.simpleString() == "array<string>"
    assert read_linkage_chain(spark, str(tmp_path), cutoff=5).count() == len(tbl)


def test_distributed_state_save_resume_bit_exact(spark, small_er, tmp_path):
    """Multi-partition resume through the DISTRIBUTED (block-format) path:
    3 Spark transitions + save + load + 3 more == 6 uninterrupted.

    This is the path a 100-TB chain takes: the saved state round-trips
    through the cluster-row interchange format from a block_df, parquet is
    written multi-file, and correctness relies on data-keyed RNG +
    canonicalized kernel order (NOT file ordering, unlike the p=1
    single-file fast path). Bit-exact loglik equality proves the whole
    save/load/transition stack is order-independent."""
    from dblink_spark.er.partition import KDTreePartitioner
    from dblink_spark.er.state import assign_partitions, transition

    records, cache = small_er

    def fresh(seed=99):
        s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=seed)
        pf = KDTreePartitioner(num_levels=1, attribute_ids=[3])
        pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
        return assign_partitions(s0, pf, pf.num_partitions)

    s_ref = fresh()
    assert s_ref.num_partitions == 2
    for _ in range(6):
        s_ref = transition(s_ref, "PCG-I")

    s_a = fresh()
    for _ in range(3):
        s_a = transition(s_a, "PCG-I")
    save_state(s_a, str(tmp_path / "dckpt"))
    s_b = load_state(spark, str(tmp_path / "dckpt"))
    assert s_b.iteration == 3 and s_b.num_partitions == 2
    for _ in range(3):
        s_b = transition(s_b, "PCG-I")

    assert s_b.iteration == s_ref.iteration == 6
    assert _linkage_set(s_b) == _linkage_set(s_ref)
    assert s_b.summary.log_likelihood == pytest.approx(
        s_ref.summary.log_likelihood, rel=0, abs=0
    ), "distributed resume must be bit-exact"
    assert (s_b.summary.agg_distortions == s_ref.summary.agg_distortions).all()
