"""RocksDB state store runs the stateful streaming ops (SCALE.md §6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from eventstreams_spark.catalog import load_table
from eventstreams_spark.streaming import tumbling_agg
from eventstreams_spark.streaming.replay import replay_table, run_to_memory
from eventstreams_spark.streaming.state import (
    disable_rocksdb_state,
    enable_rocksdb_state,
)


def test_tumbling_agg_on_rocksdb_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    enable_rocksdb_state(spark)
    try:
        stream = replay_table(spark, ev, str(tmp_path), chunks=3, order_col="ts")
        out = tumbling_agg(
            stream, "ts", "1 hour", ["event_type"], aggs, watermark="10 minutes"
        )
        run_to_memory(out, "t_rocks", output_mode="append")
    finally:
        disable_rocksdb_state(spark)

    got = spark.sql("SELECT window_start, event_type, n FROM t_rocks")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("wm")
    ).collect()[0].wm
    want = (
        tumbling_agg(ev, "ts", "1 hour", ["event_type"], aggs)
        .filter(F.col("window_end") <= F.lit(wm))
        .select("window_start", "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
