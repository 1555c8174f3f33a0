"""Statsd/graphite line-protocol parsing + flush aggregation (S6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreams_spark.sources.statsd import (
    parse_graphite,
    parse_statsd,
    statsd_flush,
)


def _lines(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_parse_statsd_forms(spark):
    df = parse_statsd(
        _lines(
            spark,
            [
                "page.views:1|c",
                "fuel.level:0.5|g",
                "req.latency:320|ms|@0.1",
                "users.uniques:1234|s",
                "api.hits:2|c|@0.5|#env:prod,region:us",
                "not a metric line",
            ],
        )
    )
    rows = {r.line_raw: r for r in df.collect()}
    c = rows["page.views:1|c"]
    assert (c.metric, c.value, c.metric_type, c.sample_rate) == ("page.views", 1.0, "c", 1.0)
    g = rows["fuel.level:0.5|g"]
    assert g.metric_type == "g" and g.scaled_value == 0.5
    t = rows["req.latency:320|ms|@0.1"]
    assert t.metric_type == "ms" and t.sample_rate == 0.1 and t.scaled_value == 320.0
    tagged = rows["api.hits:2|c|@0.5|#env:prod,region:us"]
    assert tagged.scaled_value == 4.0  # counter scaled by 1/rate
    assert tagged.tags == {"env": "prod", "region": "us"}
    bad = rows["not a metric line"]
    assert bad.metric is None and bad.value is None and bad.tags is None


def test_parse_graphite(spark):
    df = parse_graphite(
        _lines(
            spark,
            ["carbon.agents.host1.cpu 0.42 1700000000", "garbage"],
        )
    )
    rows = {r.line_raw: r for r in df.collect()}
    ok = rows["carbon.agents.host1.cpu 0.42 1700000000"]
    assert ok.metric == "carbon.agents.host1.cpu"
    assert ok.value == 0.42
    assert ok.ts.year == 2023
    assert ok.path == ["carbon", "agents", "host1", "cpu"]
    assert rows["garbage"].metric is None


def test_statsd_flush_semantics(spark):
    lines = [
        # two counters in one 10s bucket, one sampled at 0.5
        ("a.count:1|c", "2024-01-01 00:00:01"),
        ("a.count:1|c|@0.5", "2024-01-01 00:00:05"),
        # gauge: last-by-time wins
        ("a.gauge:10|g", "2024-01-01 00:00:02"),
        ("a.gauge:20|g", "2024-01-01 00:00:07"),
        # timers
        ("a.timer:100|ms", "2024-01-01 00:00:03"),
        ("a.timer:300|ms", "2024-01-01 00:00:04"),
    ]
    df = parse_statsd(
        spark.createDataFrame(lines, "value string, ts_s string").withColumn(
            "ts", F.to_timestamp("ts_s")
        )
    )
    out = {(r.metric, r.metric_type): r for r in statsd_flush(df, "10 seconds").collect()}
    assert out[("a.count", "c")].count_sum == 3.0  # 1 + 1/0.5
    assert out[("a.gauge", "g")].gauge_last == 20.0
    t = out[("a.timer", "ms")]
    assert (t.timer_n, t.timer_avg, t.timer_min, t.timer_max) == (2, 200.0, 100.0, 300.0)
    assert all(r.flush_start.second == 0 for r in out.values())


def test_statsd_pipeline_step(spark):
    from eventstreams_spark.pipeline import Pipeline, step_types

    assert "statsd" in step_types() and "graphite" in step_types()
    p = Pipeline.from_config([{"type": "statsd"}])
    out = p.apply(_lines(spark, ["x.y:5|g"])).collect()
    assert out[0].metric == "x.y" and out[0].value == 5.0


def test_graphite_stream_rollup_equals_batch(spark, tmp_path):
    """End-to-end metrics ingest: graphite plaintext lines replayed as
    a 2-micro-batch stream -> parse -> 1-min tumbling agg, compared to
    the identical batch pipeline (S6 parse + T1 builders shared)."""
    from eventstreams_spark.sources.statsd import parse_graphite
    from eventstreams_spark.streaming import tumbling_agg
    from eventstreams_spark.streaming.replay import replay_table, run_to_memory

    base = 1704067200  # 2024-01-01 00:00:00 UTC
    lines = [
        (f"web.req.count {10 + i % 7} {base + i * 13}",)
        for i in range(200)
    ] + [
        (f"db.lat.p50 {3.5 + (i % 5) / 10} {base + i * 17}",)
        for i in range(150)
    ]
    df = spark.createDataFrame(lines, "value string")
    parsed_batch = parse_graphite(df, "value").filter(F.col("metric").isNotNull())

    aggs = [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sv")]
    stream = replay_table(
        spark, df.withColumn("rnd", F.monotonically_increasing_id()),
        str(tmp_path), chunks=2, order_col="rnd",
    )
    parsed_stream = parse_graphite(stream.drop("rnd"), "value").filter(
        F.col("metric").isNotNull()
    )
    out = tumbling_agg(parsed_stream, "ts", "1 minute", ["metric"], aggs,
                       watermark="10 minutes")
    run_to_memory(out, "t_graphite", output_mode="append")
    got = sorted(
        tuple(r) for r in
        spark.sql("SELECT window_start, metric, n, sv FROM t_graphite").collect()
    )
    wm = parsed_batch.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("wm")
    ).collect()[0].wm
    want = sorted(
        tuple(r) for r in
        tumbling_agg(parsed_batch, "ts", "1 minute", ["metric"], aggs)
        .filter(F.col("window_end") <= F.lit(wm))
        .select("window_start", "metric", "n", "sv")
        .collect()
    )
    assert got == want and len(want) > 10
