"""Tests for observe-metrics (A13) and CIDR functions (§2.8 net)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from eventstreams_spark.catalog import load_table
from eventstreams_spark.operators.metrics import (
    MetricsListener,
    observe,
    standard_metrics,
)
from eventstreams_spark.functions.net import cidr_contains, cidr_match, ip_aton


# -------------------------------------------------------------- metrics

def test_observe_batch_inline_metrics(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    observed, obs = observe(ev, "ingest", *standard_metrics("value"))
    n = observed.count()  # the action that also evaluates the metrics
    got = obs.get
    assert got["events"] == n
    assert got["min_value"] <= got["max_value"]


def test_observe_streaming_progress(spark, tmp_path):
    from eventstreams_spark.sources import register_generator

    register_generator(spark)
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.format("event_generator")
            .option("rowsPerBatch", 30)
            .option("maxRows", 60)
            .load()
        )
        observed, name = observe(stream, "gen_metrics", *standard_metrics())
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; give the bus a moment
        deadline = time.time() + 20
        while time.time() < deadline and not listener.by_name.get("gen_metrics"):
            time.sleep(0.25)
        totals = listener.totals("gen_metrics")
        assert totals.get("events") == 60
    finally:
        spark.streams.removeListener(listener)


# ------------------------------------------------------------------ net

def _vals(spark, col):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.63.255.255",), ("10.64.0.0",), ("192.168.1.5",),
         ("not-an-ip",), ("1.2.3",), ("300.1.2.3",)],
        "ip string",
    )
    return [r.v for r in df.select(col.alias("v")).collect()]


def test_ip_aton_values(spark):
    got = _vals(spark, ip_aton("ip"))
    assert got[0] == 10 * 16777216 + 1 * 65536 + 2 * 256 + 3
    assert got[3] == 192 * 16777216 + 168 * 65536 + 256 + 5
    assert got[4] is None and got[5] is None and got[6] is None


def test_cidr_contains_boundaries(spark):
    got = _vals(spark, cidr_contains("10.0.0.0/10", "ip"))
    # /10 covers 10.0.0.0 – 10.63.255.255
    assert got[:4] == [True, True, False, False]
    assert got[4] is None  # malformed ip → NULL, not False


def test_cidr_match_first_wins(spark):
    got = _vals(spark, cidr_match("ip", ["10.0.0.0/10", "10.0.0.0/8", "0.0.0.0/0"]))
    assert got[0] == "10.0.0.0/10"   # matches both; first wins
    assert got[2] == "10.0.0.0/8"    # 10.64.x only matches /8
    assert got[3] == "0.0.0.0/0"
    assert got[4] is None
