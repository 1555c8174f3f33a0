"""MERGE-style keyed upsert onto partitioned parquet (no table format).

Without Delta/Iceberg, parquet has no row-level MERGE INTO — but the
lakehouse upsert contract (new rows inserted, existing keys replaced,
untouched data left byte-identical) is still reachable with two
primitives this repo already has: keep-latest-per-key compaction
(cf. queries/timeseries.py cdc_latest_by_key) and dynamic partition
overwrite (operators/partitioned.py).

Shape, and why it scales:
1. The updates frame is tiny relative to the table. Collect its
   DISTINCT partition values (a handful of scalars, not rows).
2. Read ONLY those partitions of the target (static pruning on the
   partition column — the 100 TB table contributes just the touched
   directories).
3. Union target-slice + updates, keep the winning row per key
   (updates outrank target; within updates, latest timestamp wins).
4. Dynamic-overwrite write: only the touched partition directories
   are replaced; every other file on disk is untouched (asserted
   byte-for-byte in tests via mtime+size).

Equivalent of: MERGE INTO t USING u ON t.key = u.key
WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
) -> list:
    """Upsert ``updates`` into the partitioned parquet table at
    ``target_path``; returns the touched partition values.

    A key's row moves partition only if the update carries a new
    partition value — both its old and new partitions are rewritten
    (old row dropped there, new row landed here), which is why the
    touched set includes partitions holding CURRENT rows of updated
    keys, not just the updates' own values.
    """
    target = spark.read.parquet(target_path)
    # align update columns to the target schema (partition directories
    # read back with inferred types, e.g. '2024-01-01' -> DATE)
    updates = updates.select(
        *[F.col(f.name).cast(f.dataType) for f in target.schema.fields]
    )
    part_vals = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    # partitions holding current versions of the updated keys (so a
    # partition-moving update deletes its old row, not duplicates it)
    old_parts = [
        r[0]
        for r in target.join(
            F.broadcast(updates.select(*key_cols).distinct()), key_cols, "left_semi"
        )
        .select(partition_col)
        .distinct()
        .collect()
    ]
    touched = sorted(set(part_vals) | set(old_parts))
    slice_ = target.filter(F.col(partition_col).isin(touched)).withColumn(
        "_src", F.lit(0)
    )
    up = updates.select(*target.columns).withColumn("_src", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_src").desc(), F.col(order_col).desc()
    )
    # Materialize before writing: the write overwrites directories the
    # plan reads from (self-referential MERGE). localCheckpoint cuts
    # the lineage at the cost of caching only the touched slice.
    merged = (
        slice_.unionByName(up)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    ).localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only replaces partitions PRESENT in the output;
    # a partition emptied by a partition-moving update must be cleared
    # explicitly or its stale rows survive.
    written = {r[0] for r in merged.select(partition_col).distinct().collect()}
    emptied = [p for p in touched if p not in written]
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for p in emptied:
            hp = jvm.org.apache.hadoop.fs.Path(
                f"{target_path}/{partition_col}={p}"
            )
            fs = hp.getFileSystem(conf)
            fs.delete(hp, True)
    return touched
