#!/usr/bin/env python3
"""Generate tests/scan_budgets.json — the per-query parquet-scan
budget that turns the round-4 lineage-fan-out lesson (SCALE.md §12:
every extra consumer of a derived frame silently re-derives it back
to the scan; KM risk sets went 4 scans → 1, matrix profile 4 → 1)
into a regression gate over the WHOLE registry instead of only the
queries with hand-written plan tests.

For every registry query the tool builds the DataFrame at sf0.001,
renders the physical plan, and records how many parquet file scans it
contains (InMemoryTableScan over a persisted frame counts as what it
is — one materialization — which is exactly why persist() is the fix
the budget rewards). tests/test_scan_budgets.py then fails any query
whose plan grows MORE scans than recorded here, and any query missing
from the file (so adding a query forces recording its budget).

Usage: python tools/gen_scan_budgets.py [query ...]
(no args = full registry; with args, updates only those entries)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SCAN_BUDGET_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "scan_budgets.json",
)


def count_parquet_scans(df) -> int:
    """Number of parquet file-scan leaves in the physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # "Scan parquet " is a substring of "FileScan parquet " — count
    # the FileScan form only (the one executedPlan().toString() emits)
    return plan.count("FileScan parquet")


def main() -> None:
    from pyspark.sql import SparkSession

    from eventstreams_spark.session import get_spark
    import __spark_entry__ as e

    only = set(sys.argv[1:])
    spark = get_spark("scan-budgets")
    qs = e.queries()
    budgets: dict[str, int] = {}
    if only and os.path.exists(OUT):
        with open(OUT) as f:
            budgets = json.load(f)
    for name in sorted(qs):
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        try:
            df = qs[name](spark, SF_DIR)
            budgets[name] = count_parquet_scans(df)
            print(f"  {name}: {budgets[name]} scans", flush=True)
        except Exception as ex:  # record loudly, don't write a budget
            print(f"  {name}: ERROR {ex}", flush=True)
    with open(OUT, "w") as f:
        json.dump(budgets, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(budgets)} budgets to {OUT}")


if __name__ == "__main__":
    main()
