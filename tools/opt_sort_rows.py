"""Extend the r10 sort audit with RESULT ROW COUNTS: for every query
whose executed plan ends in a FINAL global Sort (rangepartitioning
whose only consumer is the driver's order-insensitive hash), run the
query once at the given SF and report len(collect()).

The row count at sf0.01 is the proxy for whether the final sort is
real data movement at scale (results that scale with the data) or an
O(1) fixed-cardinality ordering (25 nations, 20 buckets) whose
removal is churn.

Run: python tools/opt_sort_rows.py [sf_dir]  (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from eventstreams_spark import registry
    from eventstreams_spark.session import get_spark

    registry._ensure_loaded()
    spark = get_spark("opt-sort-rows")
    out = []
    for name, spec in sorted(registry.REGISTRY.items()):
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            continue
        if "rangepartitioning" not in plan:
            spark.catalog.clearCache()
            continue
        import re

        lines = [
            ln for ln in plan.splitlines()
            if ln.strip() and "AdaptiveSparkPlan" not in ln
            and "ResultQueryStage" not in ln
        ]
        # strip tree-drawing ("+- ", ": ") and codegen ("*(n) ")
        # prefixes before testing the root operator (AQE wraps the
        # plan, so the true root prints with a "+- " prefix)
        top = re.sub(r"^[\s+\-:]*(\*\(\d+\)\s*)?", "", lines[0]) if lines else ""
        final = top.startswith("Sort ") or top.startswith("Sort[")
        if not final:
            spark.catalog.clearCache()
            continue
        t0 = time.time()
        try:
            n = len(df.collect())
        except Exception as exc:
            n = -1
            print(f"ERR {name}: {str(exc).splitlines()[0][:80]}", flush=True)
        dt = time.time() - t0
        out.append((n, name, dt))
        print(f"{n:8d} {dt:6.2f}s {name}", flush=True)
        spark.catalog.clearCache()
    print("-- sorted by rows --")
    for n, name, dt in sorted(out, reverse=True):
        print(f"{n:8d} {name}")


if __name__ == "__main__":
    main()
