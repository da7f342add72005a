"""Watch chain mixing on synthetic RLdata: recall/precision/F1 vs truth."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import functions as F

from dblink_spark.er.attributes import Attribute, BetaParams, ConstantSim, LevenshteinSim
from dblink_spark.er.cache import build_records_cache
from dblink_spark.er.datagen import make_rldata
from dblink_spark.er.partition import SinglePartition
from dblink_spark.er.state import init_state, transition
from dblink_spark.session import get_spark

mode = sys.argv[1] if len(sys.argv) > 1 else "PCG-I"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100

spark = get_spark("er_debug", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

pdf = make_rldata(n_records=150, dup_fraction=0.2, missing_fraction=0.02, seed=7)
records = spark.createDataFrame(pdf).withColumn("file_id", F.lit("0"))
attrs = [
    Attribute("by", ConstantSim(), BetaParams(0.5, 50.0)),
    Attribute("bm", ConstantSim(), BetaParams(0.5, 50.0)),
    Attribute("bd", ConstantSim(), BetaParams(0.5, 50.0)),
    Attribute("fname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
    Attribute("lname", LevenshteinSim(7.0, 10.0), BetaParams(0.5, 50.0)),
]
cache = build_records_cache(records, attrs, expected_max_cluster_size=10)

true_pairs = set()
for _, grp in pdf.groupby("ent_id"):
    ids = sorted(grp["rec_id"])
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            true_pairs.add((ids[i], ids[j]))
print(f"{len(true_pairs)} true pairs; mode={mode}")

state = init_state(spark, records, cache, SinglePartition(), 1, seed=11)


def eval_state(state):
    final = state.df.filter("NOT is_summary AND size(rec_ids) >= 2").collect()
    pred = set()
    for row in final:
        ids = sorted(row["rec_ids"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pred.add((ids[i], ids[j]))
    tp = len(pred & true_pairs)
    rec = tp / len(true_pairs)
    prec = tp / max(len(pred), 1)
    return len(pred), rec, prec


for it in range(1, iters + 1):
    state = transition(state, mode)
    if it % 10 == 0 or it <= 3:
        npred, rec, prec = eval_state(state)
        s = state.summary
        print(
            f"it={it:4d} loglik={s.log_likelihood:12.1f} iso={s.num_isolates:4d} "
            f"dist={s.agg_distortions.sum():5d} pred={npred:4d} R={rec:.2f} P={prec:.2f} "
            f"theta={np.round(state.theta.ravel(), 4).tolist()}"
        )
