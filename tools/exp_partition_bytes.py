"""Measure: spark.sql.files.maxPartitionBytes vs scan parallelism.

The knob decides how many input splits a parquet scan produces:
too big → fewer tasks than cores (idle threads); too small → task-
scheduling overhead dominates. This quantifies the curve for a
scan+agg (TPC-H Q1 shape) and a scan+window (sessionize) at sf0.1,
where file sizes are MBs — i.e. the overhead-dominated regime local
benchmarking lives in. At 100 TB the same curve applies per-executor:
target (total input / maxPartitionBytes) ≈ 2-4× total cores.

Run: python tools/exp_partition_bytes.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SETTINGS = ["4m", "16m", "64m", "128m", "512m"]


def main() -> None:
    from pyspark.sql import SparkSession

    from eventstreams_spark import registry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry._ensure_loaded()
    q1 = registry.REGISTRY["agg_pricing_summary"].builder
    sess = registry.REGISTRY["sessionize_gap30m_batch"].builder

    for setting in SETTINGS:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.files.maxPartitionBytes", setting)
            .config("spark.sql.adaptive.enabled", "true")
            .appName(f"exp-mpb-{setting}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        n_parts = q1(spark, sf_dir).rdd.getNumPartitions()
        q1(spark, sf_dir).collect()  # warm
        t1 = min(
            _timed(lambda: q1(spark, sf_dir).collect()) for _ in range(3)
        )
        sess(spark, sf_dir).collect()
        t2 = min(
            _timed(lambda: sess(spark, sf_dir).collect()) for _ in range(3)
        )
        print(f"maxPartitionBytes={setting:>5}  q1 {t1:6.3f}s  "
              f"sessionize {t2:6.3f}s  (result partitions {n_parts})")
        spark.stop()


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


if __name__ == "__main__":
    main()
