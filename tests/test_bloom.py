"""Runtime bloom-filter join pruning (SCALE.md): with a selective dim
filter and a shuffle join, Spark injects might_contain(bloom) on the
fact side so most fact rows die before the exchange.

At 100 TB this is the difference between shuffling the full fact table
and shuffling ~the matching fraction; local thresholds are lowered to
exercise the rule on test-sized data (the 10 MB/10 GB defaults are
sized for real clusters and would suppress it here).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_spark(spark):
    old = {k: spark.conf.get(k, None) for k in CONFS}
    for k, v in CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_on_fact_side(bloom_spark, sf_dir):
    li = bloom_spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = bloom_spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, "bloom filter was not injected"
    # and the result is still correct vs the unfiltered plan
    expect = (
        bloom_spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            bloom_spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    got = sum(r["count"] for r in j.collect())
    assert got == expect
