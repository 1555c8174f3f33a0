"""Audit: which registry queries carry a rangepartitioning Exchange
(global sort) in their physical plan, and which of those are a FINAL
ordering that only exists for human readability (the driver's oracle
hash is order-insensitive — it sorts canonicalized rows before
hashing, verified round 1; json_extract_props dropped its ORDER BY on
exactly that basis in round 1 and has been hash-green since).

A final global sort costs a rangepartitioning Exchange: one extra
shuffle + an AQE stage barrier per query, and at 100 TB a full extra
pass over the result. Sorts feeding a limit compile to
TakeOrderedAndProject (no exchange) and are NOT flagged.

Run: python tools/opt_sort_audit.py [sf_dir]   (defaults sf0.001)
Output: one line per query containing rangepartitioning, with the
operator that consumes it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from eventstreams_spark import registry
    from eventstreams_spark.session import get_spark

    registry._ensure_loaded()
    spark = get_spark("opt-sort-audit")
    hits = []
    errs = []
    for name, spec in sorted(registry.REGISTRY.items()):
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # builder needs streaming harness etc.
            errs.append((name, str(exc).splitlines()[0][:100]))
            continue
        if "rangepartitioning" in plan:
            n = plan.count("rangepartitioning")
            # Is the TOP node (after AdaptiveSparkPlan/ResultQueryStage)
            # a global Sort? Then it's a final ordering.
            import re

            lines = [
                ln for ln in plan.splitlines()
                if ln.strip() and "AdaptiveSparkPlan" not in ln
                and "ResultQueryStage" not in ln
            ]
            # strip tree-drawing ("+- ", ": ") and codegen ("*(n) ")
            # prefixes first: AQE wraps the plan, so the true root
            # prints with a "+- " prefix and a bare startswith("Sort")
            # never matches (r10 third-session fix)
            top = (
                re.sub(r"^[\s+\-:]*(\*\(\d+\)\s*)?", "", lines[0])
                if lines
                else ""
            )
            final = top.startswith("Sort ") or top.startswith("Sort[")
            hits.append((name, n, "FINAL" if final else "inner", top[:80]))
        spark.catalog.clearCache()
    for name, n, kind, top in hits:
        print(f"{kind:5s} x{n} {name}: {top}")
    print(f"-- {len(hits)} queries with rangepartitioning, {len(errs)} builder errors")
    for name, e in errs:
        print(f"ERR {name}: {e}")


if __name__ == "__main__":
    main()
