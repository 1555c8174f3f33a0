"""Per-query optimization profiler (guide §1).

For each named registry query: N timed reps of the collect() path the
bench/driver uses, plus one noop-sink rep (guide §1.4 — isolates the
computation from result transfer), plus the formatted physical plan
written to plans/r10/<name>_<tag>.txt, plus job-level counts from the
status tracker (jobs and stages the query scheduled — the fixed
per-job latency floor is ~0.1-0.3 s locally, so a query that runs 30
tiny jobs is paying ~5-10 s of pure scheduling).

Run: python tools/opt_profile.py [--sf SF_DIR] [--reps N] [--tag before] name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None, help="write <plandir>/<name>_<tag>.txt")
    ap.add_argument("--plandir", default="plans/r10")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink rep")
    args = ap.parse_args()

    from eventstreams_spark import registry
    from eventstreams_spark.session import get_spark

    registry._ensure_loaded()
    spark = get_spark("opt-profile")
    sc = spark.sparkContext
    out = {}
    for name in args.names:
        spec = registry.REGISTRY.get(name)
        if spec is None:
            print(f"?? unknown query {name}")
            continue
        sc.setJobDescription(f"opt-profile: {name}")
        jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = spec.builder(spark, args.sf)
        rows = df.collect()
        cold = time.perf_counter() - t0
        jobs_cold = len(sc.statusTracker().getJobIdsForGroup(None) or []) - jobs_before
        warm = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            spec.builder(spark, args.sf).collect()
            warm.append(time.perf_counter() - t0)
        noop_t = None
        if args.noop:
            t0 = time.perf_counter()
            spec.builder(spark, args.sf).write.format("noop").mode("overwrite").save()
            noop_t = round(time.perf_counter() - t0, 3)
        if args.tag:
            os.makedirs(args.plandir, exist_ok=True)
            plan = spec.builder(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"{args.plandir}/{name}_{args.tag}.txt", "w") as f:
                f.write(plan)
        warm.sort()
        out[name] = {
            "rows": len(rows),
            "cold_s": round(cold, 3),
            "warm_median_s": round(warm[len(warm) // 2], 3),
            "warm_all": [round(w, 3) for w in warm],
            "noop_s": noop_t,
            "jobs_cold_rep": jobs_cold,
        }
        print(f"{name}: {json.dumps(out[name])}", flush=True)
        spark.catalog.clearCache()
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
