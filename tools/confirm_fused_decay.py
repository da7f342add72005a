"""Isolated confirmation probe for the fused-window decay (VERDICT r14
task 2).

The r13 artifact's ``er_mcmc_window_rates`` decayed monotonically
([156.6, 128.3, 98.7] it/s) inside one artifact — as did the 1M probe —
and the fused path is pure driver-side numpy, where nothing should
accumulate. This runs MORE windows (default 8) in an otherwise-idle
process with a constant-work canary interleaved before each, so decay
separates into:

- load: canary co-moves with the window rate (ratio stable);
- real accumulation: rates fall while canaries stay flat.

Also records driver-process RSS around every window — if a numpy-side
leak were real it would show here.

Usage:  python tools/confirm_fused_decay.py [n_windows] [n_records]
Prints one JSON line; exits 1 only when BOTH accumulation signals fire:
rate falls beyond the canary envelope (residual < 0.85) AND driver RSS
grows (> 50 MB) — in a pure driver-side numpy loop, genuine accumulation
must hold memory. A residual fall with flat RSS is reported in the JSON
(read it!) but exits 0: measured r14, that signature is the chain's
fresh->equilibrium transient (mixed chains do more work per sweep — see
bench.mcmc_iters_per_sec), a workload property, not a leak.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main() -> None:
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_records = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    import bench
    from dblink_spark.er.partition import SinglePartition
    from dblink_spark.er.state import init_state, transition, transition_fused
    from dblink_spark.session import get_spark

    spark = get_spark("dblink_fused_decay")
    spark.sparkContext.setLogLevel("WARN")

    records, attrs, cache = bench._make_er_problem(spark, n_records, seed=7)
    state = init_state(spark, records, cache, SinglePartition(), 1, seed=123)
    state = transition(state, "PCG-I")  # warm
    box = [state]

    def window() -> float:
        t0 = time.time()
        for _ in range(20):
            box[0] = transition_fused(box[0], "PCG-I", 10)
        return 200 / (time.time() - t0)

    window()  # discard: first fused sweep pays Arrow/codegen setup
    bench._canary(spark, warm=True)
    rows = []
    for i in range(n_windows):
        can = bench._canary(spark)
        r0 = _rss_mb()
        rate = window()
        rows.append(
            {
                "window": i,
                "rate_it_per_sec": round(rate, 1),
                "canary_sec": can,
                "rss_mb": r0,
            }
        )
        print(f"# {json.dumps(rows[-1])}", file=sys.stderr, flush=True)

    rates = [r["rate_it_per_sec"] for r in rows]
    cans = [r["canary_sec"] for r in rows]
    half = n_windows // 2
    import statistics as st

    rate_ratio = st.median(rates[half:]) / st.median(rates[:half])
    canary_ratio = st.median(cans[:half]) / st.median(cans[half:])  # inverse
    # normalize: if the canary slowed down as much as the rate fell, the
    # decay is load; residual < ~0.85 with flat canary is real decay
    residual = rate_ratio / min(canary_ratio, 1.0) if canary_ratio else 1.0
    monotone = all(rates[i] >= rates[i + 1] for i in range(len(rates) - 1))
    rss_growth_mb = rows[-1]["rss_mb"] - rows[0]["rss_mb"]
    verdict = {
        "n_windows": n_windows,
        "rates": rates,
        "canaries": cans,
        "rate_tail_over_head": round(rate_ratio, 3),
        "canary_head_over_tail": round(canary_ratio, 3),
        "residual_ratio": round(residual, 3),
        "monotone_decay": monotone,
        "rss_growth_mb": round(rss_growth_mb, 1),
        "decay_is_real": bool(residual < 0.85 and rss_growth_mb > 50),
        "note": (
            "residual_ratio ~1 => decay tracks host load; "
            "decay_is_real requires BOTH residual fall and RSS growth"
        ),
    }
    print(json.dumps(verdict))
    sys.exit(1 if verdict["decay_is_real"] else 0)


if __name__ == "__main__":
    main()
