"""Bucketed-table join elision regression test (SCALE.md §2).

Pins the storage-side contract the fact-to-fact strategy depends on:
two tables bucketed+sorted on the join key must sort-merge join with
ZERO join-side Exchanges. If a Spark upgrade or a conf regression
silently re-shuffles bucketed joins, the 3.6× measured win (and the
bucketing advice throughout SCALE.md) evaporates — this test is the
tripwire.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark):
    # warehouse.dir is a STATIC conf — use the session's default
    # warehouse; DROP TABLE below removes the managed files
    left = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    right = spark.range(2_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") % 13).cast("double").alias("w")
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
        "tb_left_bucketed"
    )
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
        "tb_right_bucketed"
    )
    yield spark.table("tb_left_bucketed"), spark.table("tb_right_bucketed")
    spark.sql("DROP TABLE IF EXISTS tb_left_bucketed")
    spark.sql("DROP TABLE IF EXISTS tb_right_bucketed")


def test_bucketed_join_elides_exchanges(spark, bucketed_pair):
    lb, rb = bucketed_pair
    # force the join-strategy decision away from broadcast so the
    # bucket layout (not size) decides the plan; restore whatever the
    # session had, not a hardcoded default (ADVICE r2)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(rb, "k").groupBy("k").agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        before_agg = plan.split("HashAggregate")[-1]
        # the join subtree (below the aggregates) must contain no Exchange
        assert "Exchange" not in before_agg, before_agg
        assert "SortMergeJoin" in plan, plan
        # and it must still be correct
        expected = (
            lb.join(rb.hint("shuffle_hash"), "k")
            .groupBy("k")
            .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        )
        got = {r.k: r.s for r in joined.collect()}
        want = {r.k: r.s for r in expected.collect()}
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
