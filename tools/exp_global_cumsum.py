"""Measure: single-partition running total vs exact_global_cumsum.

``sum(v) OVER (ORDER BY k)`` with no PARTITION BY collapses N rows
into ONE sort task — the scale-killer the round-8 Window.orderBy
audit removed from abc_xyz/kruskal/woe/gap-islands. This experiment
times the global-window form against
operators/ranking.exact_global_cumsum (range buckets + per-bucket sum
offsets + bucket-partitioned cumulative window) on a synthetic
N-row frame, and verifies the two outputs are IDENTICAL (the
construction is exact for any boundary choice).

Run: python tools/exp_global_cumsum.py [N]   (~2 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from eventstreams_spark.operators.ranking import exact_global_cumsum

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("exp-global-cumsum")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.range(N)
        .select(
            (F.hash(F.col("id").cast("string")).cast("long")).alias("k"),
            (F.col("id") % 1000 + 1).cast("long").alias("v"),
        )
        .localCheckpoint()
    )

    t0 = time.time()
    w = Window.orderBy("k", "v").rowsBetween(Window.unboundedPreceding, 0)
    single = base.withColumn("cum", F.sum("v").over(w).cast("long"))
    single_sum = single.agg(
        F.sum(F.col("cum") * (F.col("k") % 7)).alias("probe")
    ).collect()[0][0]
    t_single = time.time() - t0

    t0 = time.time()
    bucketed = exact_global_cumsum(base, ["k", "v"], "v", cum_col="cum")
    bucket_sum = bucketed.agg(
        F.sum(F.col("cum") * (F.col("k") % 7)).alias("probe")
    ).collect()[0][0]
    t_bucket = time.time() - t0

    assert single_sum == bucket_sum, (single_sum, bucket_sum)
    diff = (
        single.select("k", "v", "cum")
        .exceptAll(bucketed.select("k", "v", "cum"))
        .count()
    )
    assert diff == 0, f"{diff} rows differ"

    print(f"N = {N:,}")
    print(f"single-partition window : {t_single:7.2f}s")
    print(f"exact_global_cumsum     : {t_bucket:7.2f}s")
    print(f"speedup                 : {t_single / t_bucket:6.2f}x  (identical output verified)")
    spark.stop()


if __name__ == "__main__":
    main()
