"""Measure: does AQE skew-join mitigation survive bucketed layouts?

The open question from the round-2 perf backlog: bucketing elides the
join-side Exchanges (measured 3.6x in SCALE.md §2), but AQE's
skewed-partition splitting operates on SHUFFLE blocks — with no
exchange there is nothing to re-split, so a hot key burns one task.
This experiment quantifies the trade on a controlled skewed join.

Setup: left fact 2M rows, 50% on one hot key, rest uniform over 100k
keys; right 100k keys x 10 rows (fan-out 10). Variants:
  A. shuffle SMJ, AQE skew-join ON   (the mitigated baseline)
  B. both sides bucketed(16), AQE ON (shuffle-free, but unsplittable)
  C. bucketed(16) + AQE skew OFF     (isolates AQE's contribution)
  D. salted join (32 salts), no bucketing (the known-hot-key fix)

Run: python tools/exp_skew_bucketing.py   (~2 min, local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WAREHOUSE = "/tmp/exp_skew_bucketing_wh"
N_LEFT = 4_000_000
N_KEYS = 100_000
FANOUT = 25
SALTS = 32


def build(spark: SparkSession):
    left = spark.range(N_LEFT).select(
        F.when(F.col("id") % 4 != 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % N_KEYS)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    right = spark.range(N_KEYS * FANOUT).select(
        (F.col("id") % N_KEYS).alias("k"),
        (F.col("id") % 97).cast("double").alias("w"),
    )
    return left, right


def agg_join(left, right):
    return (
        left.join(right, "k")
        .groupBy(F.col("k") % 1000)
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    )


def timed(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def sweep_thresholds():
    """AQE skew-threshold sweep: how sensitive is the mitigated join
    to skewedPartitionThresholdInBytes? (default 256 MB never fires
    at local scale — the knob must be sized to ~median partition
    bytes × skewedPartitionFactor or the hot key silently serializes)
    """
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    left, right = build(spark)
    left.persist().count()
    right.persist().count()
    for thr in ["256m", "64m", "16m", "4m"]:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            {"256m": "64m", "64m": "16m", "16m": "4m", "4m": "1m"}[thr],
        )
        timed(agg_join(left, right))  # warm / replan
        t = min(timed(agg_join(left, right)) for _ in range(3))
        print(f"skew threshold {thr:>5}: {t:6.2f} s")
    spark.stop()


def main():
    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.warehouse.dir", WAREHOUSE)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    left, right = build(spark)
    left.persist().count()
    right.persist().count()

    results = {}

    # A: shuffle SMJ with AQE skew mitigation
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # force splits at our scale: default 256MB threshold never fires here
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    timed(agg_join(left, right))  # warm
    results["A_shuffle_smj_aqe_skew"] = min(timed(agg_join(left, right)) for _ in range(3))

    # write bucketed tables
    t0 = time.monotonic()
    left.write.bucketBy(16, "k").sortBy("k").mode("overwrite").saveAsTable("lb")
    right.write.bucketBy(16, "k").sortBy("k").mode("overwrite").saveAsTable("rb")
    results["bucket_write"] = time.monotonic() - t0
    lb, rb = spark.table("lb"), spark.table("rb")

    # B: bucketed, AQE skew ON (can it help? no exchange to split)
    results["B_bucketed_aqe_skew_on"] = min(timed(agg_join(lb, rb)) for _ in range(3))

    # C: bucketed, AQE skew OFF
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["C_bucketed_aqe_skew_off"] = min(timed(agg_join(lb, rb)) for _ in range(3))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    # D: salted join, no bucketing (known-hot-key fix)
    lsalt = left.withColumn("salt", (F.rand(seed=7) * SALTS).cast("int"))
    rsalt = right.join(
        spark.range(SALTS).select(F.col("id").cast("int").alias("salt")), how="cross"
    )
    salted = (
        lsalt.join(rsalt, ["k", "salt"])
        .groupBy(F.col("k") % 1000)
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    )
    results["D_salted_smj"] = min(timed(salted) for _ in range(3))

    # sanity: all variants agree
    a = agg_join(left, right).agg(F.sum("s")).collect()[0][0]
    b = agg_join(lb, rb).agg(F.sum("s")).collect()[0][0]
    d = salted.agg(F.sum("s")).collect()[0][0]
    assert abs(a - b) < 1e-6 * abs(a) and abs(a - d) < 1e-6 * abs(a), (a, b, d)

    for k, v in results.items():
        print(f"{k}: {v:.2f} s")
    spark.stop()
    shutil.rmtree(WAREHOUSE, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep_thresholds()
    else:
        main()
