"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over eventstreams_spark: the registry in
``eventstreams_spark.registry`` holds one named query per implemented
operator from SURVEY.md §2, each paired with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eventstreams_spark import registry
from eventstreams_spark.queries.core import agg_pricing_summary

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return agg_pricing_summary(spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return registry.all_oracles()
