"""A/B: connected-components pointer-jump depth (r10 opt experiment).

Variant A = shipped loop (one-hop min + ONE jump through the previous
round's checkpointed labels). Variant B = same + a SECOND jump through
the same previous-round map composed in the same plan (no extra
materialization; reach ~3x/round instead of ~2x). Variant C = jump
through the CURRENT round's stepped frame (classic label doubling,
needs an extra checkpoint per round).

Measures rounds-to-fixpoint, wall, job count on the semantic-dedup
candidate graph at a given SF; asserts all variants produce identical
components.

Run: python tools/exp_cc_jumps.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def cc_variant(sym, labels, spark, n_jumps: int, max_iter: int = 25):
    rounds = 0
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.s == labels.id)
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("label").alias("nbr"))
        )
        stepped = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least("label", F.coalesce("nbr", "label")).alias("label"),
        )
        prev_map = labels.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        cur = stepped
        for _j in range(n_jumps):
            cur = (
                cur.join(prev_map, cur.label == prev_map.pid, "left")
                .select(
                    "id",
                    F.least("label", F.coalesce("plabel", "label")).alias("label"),
                )
            )
        labels = cur.localCheckpoint()
        rounds += 1
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component")), rounds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from eventstreams_spark.catalog import load_table
    from eventstreams_spark.operators.graph import truncate_lineage
    from eventstreams_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )
    from eventstreams_spark.session import get_spark
    from pyspark.sql import Window

    spark = get_spark("exp-cc-jumps")
    sc = spark.sparkContext
    emb = load_table(spark, args.sf, "embeddings")
    k = 8
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    sims = (
        emb.filter(F.col("vec_id") >= k)
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "cid", "embedding",
            cosine_similarity(
                to_double_array("embedding"), to_double_array("cvec")
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid"))
    assigned = truncate_lineage(
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid", "embedding"),
        8,
    )
    a = assigned.select(F.col("cid"), F.col("vec_id").alias("i"),
                        F.col("embedding").alias("ea"))
    b = assigned.select(F.col("cid"), F.col("vec_id").alias("j"),
                        F.col("embedding").alias("eb"))
    dup_pairs = truncate_lineage(
        a.join(b, "cid")
        .filter(F.col("i") < F.col("j"))
        .filter(cosine_similarity(to_double_array("ea"),
                                  to_double_array("eb")) >= 0.3)
        .select("cid", "i", "j"),
        8,
    )
    edges = dup_pairs.select("i", "j")
    sym = (
        edges.select(F.col("i").alias("s"), F.col("j").alias("d"))
        .unionAll(edges.select(F.col("j").alias("s"), F.col("i").alias("d")))
        .distinct()
    ).localCheckpoint()
    labels0 = (
        sym.select(F.col("s").alias("id")).distinct()
        .withColumn("label", F.col("id"))
    ).localCheckpoint()

    results = {}
    for tag, n_jumps in [("A_1jump", 1), ("B_2jumps", 2), ("A_again", 1),
                         ("B_again", 2), ("C_3jumps", 3)]:
        t0 = time.time()
        j0 = sc.statusTracker().getJobIdsForGroup(None)
        comp, rounds = cc_variant(sym, labels0, spark, min(n_jumps, 3))
        rows = sorted(map(tuple, comp.collect()))
        dt = time.time() - t0
        results[tag] = rows
        print(f"{tag}: rounds={rounds} wall={dt:.2f}s rows={len(rows)}")
    base = results["A_1jump"]
    for tag, rows in results.items():
        assert rows == base, f"{tag} differs from A!"
    print("all variants identical components: OK")


if __name__ == "__main__":
    main()
