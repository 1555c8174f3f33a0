"""Benchmark harness (driver contract: print ONE JSON line).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Per BASELINE.md method: each query runs
cold once, then N warm reps; reported seconds are the MEDIAN warm rep
(best-of-2 proved load-sensitive: r3's committed number regressed 8%
purely from box load — VERDICT r3 #1/#2). The JSON carries the noise
guards alongside the timings: 1/5/15-min load averages sampled before
and after, warm rep count, and per-query warm spread (max/min ratio)
so a loaded-box artifact is self-identifying.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from eventstreams_spark import registry
    from eventstreams_spark.session import get_spark

    load_before = os.getloadavg()
    spark = get_spark("eventstreams-bench")
    registry._ensure_loaded()

    # BASELINE.md name -> registry name (aliases where the baseline
    # table used a different label).
    headline = {
        "agg_pricing_summary": "agg_pricing_summary",
        "topk_orders_by_revenue": "topk_orders_by_revenue",
        "join_multiway_tpch_q5": "join_multiway_tpch_q5",
        "window_top3_per_user": "window_top3_per_user",
        "sessionize_gap30m_batch": "sessionize_gap30m_batch",
        "tumbling_1h_agg": "tumbling_1h_agg",
        "json_extract_props": "json_extract_props",
        "knn_cosine_top5": "knn_cosine_topk",
        "dedup_docs_exact": "dedup_exact_distinct",
    }

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for bench_name, reg_name in headline.items():
        spec = registry.REGISTRY.get(reg_name)
        if spec is None:
            continue
        warm: list[float] = []
        for run in range(1 + warm_reps):  # 1 cold + N warm
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            if run > 0:
                warm.append(dt)
        warm.sort()
        timings[bench_name] = round(warm[len(warm) // 2], 4)  # median
        spreads[bench_name] = round(warm[-1] / warm[0], 2)

    load_after = os.getloadavg()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_warm_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "noise_guard": {
            "warm_reps": warm_reps,
            "stat": "median",
            "loadavg_before": [round(v, 2) for v in load_before],
            "loadavg_after": [round(v, 2) for v in load_after],
            "warm_spread_maxmin": spreads,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
