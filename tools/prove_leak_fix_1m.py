"""Production-length proof for the r13 checkpoint-leak fix (VERDICT r14
task 1).

The r13 fix (`er/state.py:_release_state_df`) is regression-tested at
small scale, but the committed 6-iteration 1M p=8 window still trended
monotonically upward (8.37 -> 37.39 s/iter) — the exact signature the
leak had — and the +7% canary drift could not explain 4.5x. This script
runs a 30-50-iteration window at 1M records / p=8 recording, PER
ITERATION:

- transition wall time;
- an interleaved constant-work canary (host-load bracket: if iteration
  times co-move with the canary, it's load, not accumulation);
- cached-RDD count and total storage bytes (``getRDDStorageInfo`` — the
  leak's direct signature was +1 cached RDD / +~60 MB per iteration);
- shuffle/disk bytes under the block manager's local dirs (candidate:
  shuffle-file growth in spark.local.dir);
- the py4j binding-pool size (candidate: driver py4j object churn);
- JVM heap in use after a System.gc() hint (candidate: ContextCleaner
  backlog pinning old broadcast/RDD metadata).

Verdict logic (printed + saved): the leak fix is CONFIRMED end-to-end if
storage stays flat (cached RDDs bounded, storage bytes bounded) AND
iteration times show no monotone trend beyond the canary envelope;
otherwise the per-iteration diagnostics point at the residual
accumulator.

Usage:  python tools/prove_leak_fix_1m.py [n_iters] [n_records] [p]
Writes: BENCH_LEAKPROOF_r14.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path, onerror=lambda e: None):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_records = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    p = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # r15: k > 1 proves the MULTISWEEP hot path instead — each "iteration"
    # below becomes one transition_multisweep(k) job (k sweeps fused);
    # the storage/heap/py4j probes and verdict logic are identical, and
    # the artifact lands in BENCH_LEAKPROOF_MS_r15.json
    ms_k = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    import bench
    from dblink_spark.er.partition import KDTreePartitioner, SinglePartition
    from dblink_spark.er.state import (
        assign_partitions,
        init_state,
        transition,
        transition_multisweep,
    )
    from dblink_spark.session import get_spark

    spark = get_spark("dblink_leakproof")
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    try:
        local_dirs = [
            str(d)
            for d in sc._jvm.org.apache.spark.SparkEnv.get()
            .blockManager()
            .diskBlockManager()
            .localDirsString()
        ]
    except Exception:  # noqa: BLE001 - API drift; disk metric degrades
        local_dirs = []

    def storage() -> tuple[int, int]:
        infos = jsc.getRDDStorageInfo()
        return len(infos), sum(i.memSize() for i in infos)

    def jvm_heap() -> int:
        rt = sc._jvm.java.lang.Runtime.getRuntime()
        rt.gc()
        return int(rt.totalMemory() - rt.freeMemory())

    def py4j_pool() -> int:
        try:
            return len(sc._gateway.gateway_property.pool)
        except Exception:  # noqa: BLE001
            return -1

    t0 = time.time()
    records, attrs, cache = bench._make_er_problem(spark, n_records, seed=17)
    s0 = init_state(spark, records, cache, SinglePartition(), 1, seed=31)
    pf = KDTreePartitioner(num_levels=p.bit_length() - 1, attribute_ids=[3, 4, 0])
    pf.fit(s0.df.filter("NOT is_summary").select("ent_values"))
    s = assign_partitions(s0, pf, pf.num_partitions)
    build_s = round(time.time() - t0, 1)
    print(f"# build {build_s}s; warming 1 iteration", file=sys.stderr)
    s = transition(s, "PCG-I")  # warm (codegen, broadcast, worker boot)

    def step(st):
        return (
            transition_multisweep(st, "PCG-I", ms_k) if ms_k > 1
            else transition(st, "PCG-I")
        )

    rows = []
    bench._canary(spark, warm=True)
    for i in range(n_iters):
        can = bench._canary(spark)
        t0 = time.time()
        s = step(s)
        wall = round(time.time() - t0, 2)
        n_rdd, mem = storage()
        row = {
            "iter": i,
            "wall_sec": wall,
            "canary_sec": can,
            "n_cached_rdds": n_rdd,
            "storage_mem_mb": round(mem / 1e6, 1),
            "localdir_mb": round(sum(_du(d) for d in local_dirs) / 1e6, 1),
            "py4j_pool": py4j_pool(),
            "jvm_heap_mb": round(jvm_heap() / 1e6, 1),
        }
        rows.append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr, flush=True)

    import statistics as st

    walls = [r["wall_sec"] for r in rows]
    cans = [r["canary_sec"] for r in rows]
    k = max(3, n_iters // 5)
    head_w, tail_w = st.median(walls[:k]), st.median(walls[-k:])
    head_c, tail_c = st.median(cans[:k]), st.median(cans[-k:])
    wall_ratio = tail_w / head_w if head_w else float("inf")
    canary_ratio = tail_c / head_c if head_c else float("inf")
    storage_flat = (
        rows[-1]["n_cached_rdds"] - rows[0]["n_cached_rdds"] <= 2
        and rows[-1]["storage_mem_mb"] <= rows[0]["storage_mem_mb"] * 1.5 + 200
    )
    # time drift beyond 1.4x after dividing out canary co-movement is a
    # real accumulation signal; inside it is host weather
    residual = wall_ratio / max(canary_ratio, 1e-9)
    flat_time = residual < 1.4
    out = {
        "n_records": n_records,
        "num_partitions": p,
        "n_iters": n_iters,
        "multisweep_k": ms_k,
        "cache_build_sec": build_s,
        "wall_head_median": head_w,
        "wall_tail_median": tail_w,
        "wall_tail_over_head": round(wall_ratio, 2),
        "canary_tail_over_head": round(canary_ratio, 2),
        "residual_drift": round(residual, 2),
        "storage_flat": storage_flat,
        "time_flat_vs_canary": flat_time,
        # r15 ADVICE: on fused windows (ms_k>1) the time-flat criterion
        # does not apply (the short window traverses the equilibrium
        # transient by construction), so the headline verdict is storage
        # alone there — otherwise the artifact would stamp
        # leak_fix_confirmed:false next to ms_leak_verdict_storage_flat:true
        # and a consumer keying on the headline would misread the fused
        # path as leaking.
        "leak_fix_confirmed": bool(
            storage_flat if ms_k > 1 else (storage_flat and flat_time)
        ),
        "iterations": rows,
    }
    if ms_k > 1:
        # A fused run advances ms_k sweeps per measured job, so a short
        # window traverses the chain's whole fresh->equilibrium transient
        # (mixed chains sweep 30-50%+ slower — adjudicated r14,
        # tools/confirm_fused_decay.py); wall growth with a FLAT canary
        # and FLAT storage is that transient, not accumulation. The leak
        # signature is storage (the r13 leak was +1 cached RDD / +60 MB
        # per iteration) — flat storage+heap+py4j over ms_k*n_iters
        # sweeps is the fused-path leak verdict.
        out["ms_leak_verdict_storage_flat"] = storage_flat
        out["ms_wall_note"] = (
            f"wall head->tail x{round(wall_ratio, 2)} at canary "
            f"x{round(canary_ratio, 2)} over {ms_k * n_iters} sweeps from "
            "fresh = the equilibrium transient, expected for fused "
            "windows; time_flat_vs_canary applies to equilibrated "
            "single-sweep runs (the r14 artifact), not this path"
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LEAKPROOF_MS_r15.json" if ms_k > 1 else "BENCH_LEAKPROOF_r14.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "iterations"}))


if __name__ == "__main__":
    main()
