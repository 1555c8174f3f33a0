"""Bucketed-table materialization (SCALE.md §2 — shuffle-free joins).

At 100 TB the orders⋈lineitem class of fact-to-fact joins dominates
shuffle volume. The storage-side fix is hash **bucketing**: both
tables pre-partitioned into the same number of buckets on the join
key. Spark's sort-merge join then reads bucket i of each side in the
same task — *no Exchange at query time, ever again* — amortizing one
write-time shuffle across every future join on that key.

``materialize_bucketed`` is the write path (saveAsTable — bucket
metadata lives in the session/metastore catalog); ``bucketed_join``
documents the read path. The plan test in tests/test_bucketing.py
asserts the Exchange really disappears — that assertion IS the
feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | list[str],
    num_buckets: int,
    *,
    sort_within: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets sort-merge join skip its sort step
    too: scan → zip buckets → merge. At 100 TB pick ``num_buckets`` so
    one bucket of the *larger* table is ~0.5–1 GB (e.g. 4096 buckets
    for a 4 TB post-prune fact table).
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort_within:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — planner elides both Exchanges
    when bucket specs match (verified by plan test)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
