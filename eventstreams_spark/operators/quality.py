"""Data-quality expectations (dbt-test / Deequ-style) in one pass.

A quality gate over a 100 TB table must not cost one scan per rule.
Row-local rules (not-null, range, regex, set membership) compile to
`sum(when(violation, 1))` columns inside a SINGLE aggregate — one scan
for any number of rules. Key uniqueness folds into the same aggregate
as `count(*) - count_distinct(key)`. Referential integrity is the only
rule needing a second input: a broadcast/shuffle left-anti count.

Output contract: one row per rule → (rule, n_violations, n_rows),
ready to gate a pipeline (fail if any n_violations > 0) or to land in
a quality-history table per batch/partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation(name: str, cond: Column) -> tuple[str, Column]:
    """A named row-level violation condition (True = row violates)."""
    return (name, F.sum(F.when(cond, 1).otherwise(0)).alias(name))


def not_null(col: str) -> tuple[str, Column]:
    return violation(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = F.col(col)
    return violation(
        f"in_range:{col}", c.isNull() | (c < F.lit(lo)) | (c >= F.lit(hi))
    )


def matches(col: str, regex: str) -> tuple[str, Column]:
    c = F.col(col)
    return violation(f"matches:{col}", c.isNull() | ~c.rlike(regex))


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    c = F.col(col)
    return violation(f"accepted_values:{col}", c.isNull() | ~c.isin(values))


def quality_report(
    df: DataFrame,
    row_rules: list[tuple[str, Column]] = (),
    unique_key: str | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """(rule, n_violations, n_rows) — row rules + uniqueness share ONE
    aggregate over ONE scan; each foreign key adds one anti-join agg."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [agg for _, agg in row_rules]
    names = [name for name, _ in row_rules]
    if unique_key is not None:
        aggs.append(
            (F.count(F.col(unique_key)) - F.count_distinct(F.col(unique_key))).alias(
                f"unique:{unique_key}"
            )
        )
        names.append(f"unique:{unique_key}")
    base = df.agg(*aggs)
    report = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("rule"),
                        F.col(n).cast("long").alias("n_violations"),
                        F.col("_n").alias("n_rows"),
                    )
                    for n in names
                ]
            )
        ).alias("r")
    ).select("r.*")
    for col, dim, dim_col in foreign_keys:
        orphans = (
            df.select(F.col(col)).filter(F.col(col).isNotNull())
            .join(dim.select(F.col(dim_col).alias(col)), col, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(
                F.lit(f"foreign_key:{col}->{dim_col}").alias("rule"),
                F.col("n_violations").cast("long"),
                "n_rows",
            )
        )
        report = report.unionByName(orphans)
    return report
