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


def test_session_path_stream_on_rocksdb_matches_batch(spark, sf_dir, tmp_path):
    """The round-3 session-path GroupState fold must survive the
    RocksDB state-store provider identically to the HDFS-backed
    default — same closed sessions, same paths."""
    from pyspark.sql import Window

    from eventstreams_spark.streaming.stateful import session_path_stream

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type")
    )
    enable_rocksdb_state(spark)
    try:
        stream = replay_table(spark, ev, str(tmp_path), chunks=3, order_col="ts")
        out = session_path_stream(
            stream, "user_id", "ts", "event_type", gap_seconds=1800, max_steps=5
        )
        run_to_memory(out, "t_spath_rocks", output_mode="append")
    finally:
        disable_rocksdb_state(spark)
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, session_start, session_end, n_events, path"
            " FROM t_spath_rocks"
        ).collect()
    )
    assert len(got) > 0

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev_ts").isNull()
                | (F.col("ts").cast("double") - F.col("prev_ts").cast("double") > 1800)
            ).cast("long"),
        )
        .withColumn("sid", F.sum("new_s").over(w))
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x.event_type,
                ),
                1,
                5,
            ),
        ).alias("path"),
    )
    last = per.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    want = sorted(
        tuple(r)
        for r in per.join(last, "user_id")
        .filter(F.col("sid") < F.col("max_sid"))
        .select("user_id", "session_start", "session_end", "n_events", "path")
        .collect()
    )
    assert got == want


def test_pair_rules_stream_on_rocksdb_matches_hdfs(spark, sf_dir, tmp_path):
    """The round-8 association monitor on the RocksDB provider must
    emit the identical (basket, kind, a, b) multiset as the default
    HDFS-backed store — GroupState item sets round-trip through
    RocksDB unchanged, emit-once included."""
    from eventstreams_spark.streaming.replay import replay_table, run_to_memory
    from eventstreams_spark.streaming.stateful import pair_rules_stream

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lines = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == part["p_partkey"],
    ).select(
        F.col("l_orderkey").alias("basket"),
        F.col("p_brand").alias("item"),
        F.col("l_shipdate").alias("ts"),
    )

    def run(provider_rocks: bool, name: str, stage: str):
        if provider_rocks:
            enable_rocksdb_state(spark)
        try:
            stream = replay_table(
                spark, lines, stage, chunks=3, order_col="ts"
            ).drop("ts")
            run_to_memory(pair_rules_stream(stream, "basket", "item"), name)
        finally:
            if provider_rocks:
                disable_rocksdb_state(spark)
        return sorted(
            map(tuple, spark.table(name).select("basket", "kind", "a", "b").collect())
        )

    hdfs = run(False, "t_pr_hdfs", str(tmp_path / "h"))
    rocks = run(True, "t_pr_rocks", str(tmp_path / "r"))
    assert hdfs == rocks
    assert len(hdfs) > 0


def test_schema_drift_stream_on_rocksdb_matches_hdfs(spark, sf_dir, tmp_path):
    """The schema-drift monitor's cumulative per-shape counts and the
    emit-once is_new alert must be provider-independent."""
    from eventstreams_spark.streaming.replay import replay_table, run_to_memory
    from eventstreams_spark.streaming.stateful import (
        schema_drift_snapshot,
        schema_drift_stream,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "props")

    def run(provider_rocks: bool, name: str, stage: str):
        if provider_rocks:
            enable_rocksdb_state(spark)
        try:
            stream = replay_table(
                spark, ev, stage, chunks=3, order_col="ts"
            ).drop("ts")
            run_to_memory(schema_drift_stream(stream, "props"), name)
        finally:
            if provider_rocks:
                disable_rocksdb_state(spark)
        emitted = spark.table(name)
        snap = sorted(map(tuple, schema_drift_snapshot(emitted).collect()))
        news = sorted(
            map(
                tuple,
                emitted.filter("is_new").select("key_set").collect(),
            )
        )
        return snap, news

    hdfs = run(False, "t_sd_hdfs", str(tmp_path / "h"))
    rocks = run(True, "t_sd_rocks", str(tmp_path / "r"))
    assert hdfs == rocks
    assert len(hdfs[0]) > 0
