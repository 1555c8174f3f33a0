"""Measure: connected components — min-label propagation vs
large/small-star on a deep graph.

Propagation needs rounds = diameter; the star variant (SoCC'14)
contracts neighborhoods and converges in O(log n) rounds. On a long
chain (the worst case for propagation, and the shape of reply threads
/ session chains / page-walk graphs), the round counts diverge
dramatically — this experiment counts rounds and wall time for both
on an N-node chain plus attached stars (so the graph has both deep
and wide structure).

Run: python tools/exp_cc_star.py   (~2 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CHAIN = 512          # chain length — diameter driver
STAR_FAN = 64        # width attached to every 16th chain node


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("exp_cc_star")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    chain = spark.range(1, CHAIN).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    hubs = (
        spark.range(1, CHAIN, 16)
        .select(F.col("id").alias("src"))
        .crossJoin(spark.range(STAR_FAN).select(F.col("id").alias("f")))
        .select("src", (F.col("src") * 1000 + F.col("f") + CHAIN * 10).alias("dst"))
    )
    edges = chain.unionAll(hubs).persist()
    n_edges = edges.count()

    from eventstreams_spark.operators import graph as G

    # instrument round counts by patching max_iter upward and timing
    for name, fn, iters in (
        ("propagation", G.connected_components, CHAIN + 8),
        ("large/small-star", G.connected_components_star, 64),
    ):
        t0 = time.time()
        labels = fn(edges, max_iter=iters)
        n_comp = labels.select("component").distinct().count()
        dt = time.time() - t0
        print(f"{name:18s}  components={n_comp}  wall={dt:6.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
