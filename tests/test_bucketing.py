"""Bucketed-join plan test (SCALE.md §2): the Exchange disappears.

This is the storage-side co-location strategy for 100 TB fact-to-fact
joins; the assertion that no shuffle remains in the join plan is the
entire point of the feature.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstreams_spark.catalog import load_table
from eventstreams_spark.operators.bucketing import bucketed_join, materialize_bucketed
from eventstreams_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    materialize_bucketed(orders, "orders_b", "o_orderkey", 8)
    materialize_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # at test scale Spark would auto-broadcast; disable so the plan
    # shows the co-located sort-merge path a 100 TB fact join takes
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the point: both sides read pre-bucketed — no shuffle before the join
    assert "Exchange hashpartitioning" not in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_orderkey")
    got = joined.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("q"),
    ).collect()[0]

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("q"),
        )
        .collect()[0]
    )
    assert tuple(got) == tuple(want)
