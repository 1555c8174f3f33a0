"""Measure: lcp_interval_tree_nodes witness-expansion scaling.

The query's scale claim: the per-depth expansion is bounded by
repeated-content volume x depth spectrum (SUM over eligible entries
of (lcp - 11)), not by corpus size. This experiment measures, at
sf0.001 and sf0.01: eligible entries, expansion rows, and end-to-end
wall (which includes the shared rank-only SA build — the dominant
term, itself measured in SCALE.md §19).

Run: python tools/exp_lcp_tree_scaling.py   (~2 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("exp-lcp-tree")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from eventstreams_spark import registry
    # measure the CONSTRUCTION, not the materialization cache
    from eventstreams_spark.queries.llm import (
        _build_suffix_array_lcp as _suffix_array_lcp_frame,
    )

    registry._ensure_loaded()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        spark.catalog.clearCache()
        t0 = time.time()
        el = _suffix_array_lcp_frame(spark, sf).filter(
            F.col("lcp_next") >= 12
        )
        stats = el.agg(
            F.count(F.lit(1)).alias("eligible"),
            F.sum(F.col("lcp_next") - 11).alias("expansion"),
        ).collect()[0]
        t_sa = time.time() - t0
        t0 = time.time()
        n = registry.REGISTRY["lcp_interval_tree_nodes"].builder(
            spark, sf
        ).count()
        t_all = time.time() - t0
        print(
            f"{sf}: eligible={stats['eligible']:,} "
            f"expansion={stats['expansion']:,} sa_build={t_sa:.1f}s "
            f"tree_query={t_all:.1f}s rows={n}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
