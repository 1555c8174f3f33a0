"""Partitioned parquet landing (SURVEY §4.1 partition pruning,
SCALE.md §1 at-rest layout).

At 100 TB the scan you *don't* do is the fastest: data lands
date-partitioned (`.../event_date=2024-01-03/part-*.parquet`) so a
time-bounded query reads only matching directories — static pruning
for literal predicates, dynamic (DPP) for dim-join-derived ones. The
plan test asserts the pruning actually happens (PartitionFilters on
the scan), because a mis-typed partition column silently degrades to
a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Land a frame as directory-partitioned parquet.

    ``dynamic=True`` sets dynamic partition-overwrite for this write:
    re-landing one day replaces only that day's directory — the
    idempotent-backfill pattern (a replayed ingest batch overwrites
    its own partitions and nothing else).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def land_events_by_date(
    spark: SparkSession, sf_dir: str, out_path: str
) -> DataFrame:
    """Example landing job: events partitioned by event_date."""
    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(ev, out_path, ["event_date"])
    return spark.read.parquet(out_path)
