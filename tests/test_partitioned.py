"""Partitioned landing + pruning plan tests (SCALE.md §1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from eventstreams_spark.operators.partitioned import (
    land_events_by_date,
    write_partitioned,
)
from eventstreams_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def landed(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("landed") / "events_by_date")
    return land_events_by_date(spark, sf_dir, out), out


def test_partition_layout_on_disk(landed):
    df, out = landed
    dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(dirs) >= 25  # ~30 days of events


def test_static_partition_pruning_in_plan(spark, landed):
    df, out = landed
    q = df.filter(F.col("event_date") == "2024-01-03").groupBy("event_type").count()
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan
    # the date predicate must land in PartitionFilters, not a row Filter
    seg = plan[plan.index("PartitionFilters"):]
    assert "event_date" in seg[:300]


def test_pruned_read_matches_unpartitioned(spark, sf_dir, landed):
    from eventstreams_spark.catalog import load_table

    df, out = landed
    got = (
        df.filter(F.col("event_date") == "2024-01-03")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]
        .n
    )
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.to_date("ts") == "2024-01-03")
        .count()
    )
    assert got == want and got > 0


def test_dynamic_partition_overwrite_replaces_only_target_day(spark, landed):
    df, out = landed
    before_days = {
        r.event_date for r in df.select("event_date").distinct().collect()
    }
    one_day = df.filter(F.col("event_date") == "2024-01-05").withColumn(
        "value", F.lit(0.0)
    )
    write_partitioned(one_day, out, ["event_date"], dynamic=True)
    after = spark.read.parquet(out)
    after_days = {r.event_date for r in after.select("event_date").distinct().collect()}
    assert after_days == before_days  # other days untouched
    assert (
        after.filter(F.col("event_date") == "2024-01-05")
        .agg(F.max("value"))
        .collect()[0][0]
        == 0.0
    )

def test_dynamic_partition_pruning_from_dim_join(spark, landed, tmp_path):
    """§4.1 DPP: joining the partitioned fact against a *filtered*
    parquet dim injects a runtime partition filter
    (dynamicpruningexpression) into the fact scan — the 100 TB shape
    where the date list comes from data, not a literal."""
    df, out = landed
    spark.createDataFrame(
        [("2024-01-%02d" % d, 1 if d in (3, 4) else 0) for d in range(1, 31)],
        "d string, pick int",
    ).select(F.col("d").cast("date").alias("event_date"), "pick").write.parquet(
        str(tmp_path / "dim")
    )
    dim = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("pick") == 1)
    q = df.join(dim.select("event_date"), "event_date").groupBy("event_type").count()
    plan = formatted_plan(q)
    assert "dynamicpruningexpression" in plan.lower(), plan[:1500]
