"""Registry-wide lineage-fan-out tripwire (SCALE.md §12, VERDICT r4
#7): every registry query's physical plan must not contain MORE
parquet scans than the budget recorded in scan_budgets.json.

The round-4 lesson this generalizes: every extra consumer of a
derived frame re-derives it back to the scan unless the frame is
persisted — Kaplan-Meier risk sets cost 4 fact scans until the
suffix-sum rewrite (→1), the matrix profile 4 until windows carried
their values as arrays (→1). The hand-written plan tests catch this
for ~200 queries; this gate covers ALL of them: an edit that adds a
consumer without persisting (or un-persists a shared frame) grows
the scan count and fails here, at plan-build time, before any bench
regression.

A query missing from the budget file fails too — adding a query
requires recording its budget (`python tools/gen_scan_budgets.py
<name>`), which is the moment to LOOK at the count and ask whether
it should be 1.
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entry


def count_parquet_scans(df) -> int:
    """Parquet file-scan leaves in the physical plan (same counter
    as tools/gen_scan_budgets.py — keep the two in sync)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # "Scan parquet " is a substring of "FileScan parquet " — count
    # the FileScan form only (the one executedPlan().toString() emits)
    return plan.count("FileScan parquet")


BUDGETS_PATH = os.path.join(os.path.dirname(__file__), "scan_budgets.json")

if os.path.exists(BUDGETS_PATH):
    with open(BUDGETS_PATH) as _f:
        BUDGETS = json.load(_f)
else:  # missing file = every query unbudgeted; the gate below fails
    BUDGETS = {}

QUERIES = entry.queries()


def test_every_query_has_a_budget():
    missing = sorted(set(QUERIES) - set(BUDGETS))
    assert not missing, (
        f"queries without a scan budget (run tools/gen_scan_budgets.py "
        f"{' '.join(missing)}): {missing}"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_scan_count_within_budget(spark, sf_dir, name):
    if name not in BUDGETS:
        pytest.skip("no budget recorded (test_every_query_has_a_budget fails)")
    spark.catalog.clearCache()
    df = QUERIES[name](spark, sf_dir)
    got = count_parquet_scans(df)
    assert got <= BUDGETS[name], (
        f"{name}: {got} parquet scans, budget {BUDGETS[name]} — a new "
        f"consumer re-derives shared lineage back to the scan; persist "
        f"the shared frame or restructure (SCALE.md §12)"
    )
