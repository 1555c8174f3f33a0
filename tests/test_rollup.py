"""Cascading continuous aggregates (streaming/rollup.py): tier-1 from
raw replayed events, tier-2 re-aggregated from tier-1's parquet, both
checked against batch builders on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventstreams_spark.catalog import load_table
from eventstreams_spark.streaming.replay import replay_table
from eventstreams_spark.streaming.rollup import (
    materialize_tier,
    open_tier_stream,
    rollup_coarsen,
    rollup_partials,
    with_derived_stats,
)


@pytest.fixture()
def events_3d(spark, sf_dir):
    return load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cascade_1h_to_1d_matches_batch(spark, events_3d, tmp_path):
    keys = ["event_type"]
    key_types = [("event_type", T.StringType())]
    t1_path, t2_path = str(tmp_path / "t1"), str(tmp_path / "t2")

    # tier 1: replayed raw stream -> 1h partials parquet
    stream = replay_table(spark, events_3d, str(tmp_path), chunks=3, order_col="ts")
    t1 = rollup_partials(stream, "ts", "1 hour", keys, watermark="10 minutes")
    q1 = materialize_tier(t1, t1_path, str(tmp_path / "ck1"))
    q1.awaitTermination(120)

    # tier-1 golden: batch 1h partials over windows closed by the final
    # watermark (append-mode emission rule)
    wm = events_3d.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("wm")
    ).collect()[0].wm
    want_t1 = (
        rollup_partials(events_3d, "ts", "1 hour", keys)
        .filter(F.col("window_end") <= F.lit(wm))
    )
    got_t1 = spark.read.parquet(t1_path).drop("rollup_date")
    cols = ["window_start", "event_type", "n_events", "min_value", "max_value"]
    assert _rows(got_t1.select(cols)) == _rows(want_t1.select(cols))

    # tier 2: tier-1 parquet opened AS A STREAM -> 1d partials
    t2 = rollup_coarsen(
        open_tier_stream(spark, t1_path, key_types), "1 day", keys, watermark="0 seconds"
    )
    q2 = materialize_tier(t2, t2_path, str(tmp_path / "ck2"))
    q2.awaitTermination(120)

    # tier-2 golden: batch-coarsen the materialized tier 1; compare
    # closed 1d windows (same emission rule against tier-1 max time)
    wm2 = got_t1.agg(F.max("window_start").alias("m")).collect()[0].m
    want_t2 = (
        rollup_coarsen(got_t1, "1 day", keys)
        .filter(F.col("window_end") <= F.lit(wm2))
    )
    got_t2 = spark.read.parquet(t2_path).drop("rollup_date")
    cols2 = ["window_start", "event_type", "n_events", "min_value", "max_value"]
    assert _rows(got_t2.select(cols2)) == _rows(want_t2.select(cols2))

    # derived stats: avg == sum/count and 1d sums reconcile with raw rows
    raw_day = (
        events_3d.filter(F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
        .filter(F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
    )
    t2_day = (
        with_derived_stats(got_t2)
        .filter(F.col("window_start") == F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .select(
            "event_type",
            F.col("n_events").alias("n"),
            F.round("sum_value", 6).alias("s"),
        )
    )
    assert _rows(raw_day) == _rows(t2_day)
