"""Plan inspection & assertion helpers (SURVEY §4, SCALE.md).

The scale contract of every operator is a *plan shape* — broadcast vs
shuffle join, pushed filters, pruned read schema, TakeOrderedAndProject
instead of a global sort. These helpers read the formatted physical
plan so tests can lock those shapes in: a regression that turns a
broadcast chain into a sort-merge cascade fails CI long before anyone
runs it at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text, returned instead of printed."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def operator_counts(df: DataFrame) -> dict[str, int]:
    """Physical operator name → occurrence count (tree section only)."""
    tree = formatted_plan(df).split("\n\n")[0]
    counts: dict[str, int] = {}
    # "* " is the whole-stage-codegen marker: plans without an AQE
    # wrapper (no exchange anywhere) print it in the tree section,
    # e.g. "+- * Scan ExistingRDD (1)" — count those too
    for m in re.finditer(r"[+:]- (?:\* )?(\w[\w ]*?) [(\[]", tree + "\n"):
        name = m.group(1).strip()
        counts[name] = counts.get(name, 0) + 1
    # root operator (no +- prefix)
    first = re.search(r"^(?:\* )?(\w[\w]*)", tree.splitlines()[1] if len(tree.splitlines()) > 1 else "")
    if first:
        counts[first.group(1)] = counts.get(first.group(1), 0) + 1
    return counts


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """Every scan's ReadSchema struct string (column-pruning evidence)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def assert_no_operator(df: DataFrame, *names: str) -> None:
    plan = formatted_plan(df)
    for name in names:
        assert name not in plan, f"forbidden operator {name!r} in plan:\n{plan[:2000]}"


def assert_has_operator(df: DataFrame, *names: str) -> None:
    plan = formatted_plan(df)
    for name in names:
        assert name in plan, f"expected operator {name!r} missing from plan:\n{plan[:2000]}"


def assert_all_joins_broadcast(df: DataFrame) -> None:
    """Every join in the plan is a broadcast hash join (dim-enrichment
    contract: the fact side is never shuffled)."""
    assert_no_operator(df, "SortMergeJoin", "ShuffledHashJoin", "CartesianProduct")


def assert_read_schema_at_most(df: DataFrame, table_marker: str, allowed: set[str]) -> None:
    """The scan whose ReadSchema mentions ``table_marker`` reads no
    column outside ``allowed`` (column pruning reached the scan)."""
    for schema in read_schemas(df):
        cols = {c.split(":")[0] for c in schema.split(",") if c}
        if table_marker in cols:
            extra = cols - allowed
            assert not extra, f"scan reads unpruned columns: {sorted(extra)}"
            return
    raise AssertionError(f"no scan with column {table_marker!r} found")
