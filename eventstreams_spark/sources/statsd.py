"""Statsd / graphite line-protocol parsing (SURVEY §2.1 S6 — the
Logstash ``statsd``/``udp``/``graphite`` input family).

Wire formats handled, both as pure Column expressions (JVM-side,
codegen; NULL fields + intact raw line on parse failure — the
``_grokparsefailure`` convention used across this repo):

- statsd (+ DogStatsD tags): ``name:value|type[|@rate][|#k:v,k2:v2]``
  where type ∈ {c, g, ms, s, h, d}.
- graphite plaintext: ``dotted.metric.path value unix_ts``.

Transport note: Spark has no built-in UDP source; production ingest
lands datagram payloads in a spool dir / Kafka (see ``spool.py``) and
applies these parsers — the transform is source-agnostic, which is the
whole point of keeping parse separate from transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# name:value|type, optional |@rate, optional |#tags  (DogStatsD superset)
_STATSD_RX = r"^([^:|#]+):(-?[0-9.]+)\|(c|g|ms|s|h|d)(?:\|@([0-9.]+))?(?:\|#(.+))?$"

STATSD_FIELDS = "metric value metric_type sample_rate tags".split()


def parse_statsd(df: DataFrame, source: str = "value") -> DataFrame:
    """Statsd datagram line → typed columns.

    ``sample_rate`` defaults to 1.0 (the protocol's implied rate);
    counters should be scaled by 1/sample_rate at aggregation time —
    ``scaled_value`` carries that for type ``c``. ``tags`` parses the
    DogStatsD ``#k:v,...`` suffix into a map (Logstash ``kv`` analog).
    """
    df = df.withColumnRenamed(source, "line_raw")  # parsed `value` would
    # otherwise clobber a source column of the same name
    c = F.col("line_raw")
    metric = F.nullif(F.regexp_extract(c, _STATSD_RX, 1), F.lit(""))
    value = F.nullif(F.regexp_extract(c, _STATSD_RX, 2), F.lit("")).cast("double")
    mtype = F.nullif(F.regexp_extract(c, _STATSD_RX, 3), F.lit(""))
    rate = F.coalesce(
        F.nullif(F.regexp_extract(c, _STATSD_RX, 4), F.lit("")).cast("double"),
        F.lit(1.0),
    )
    tags_raw = F.nullif(F.regexp_extract(c, _STATSD_RX, 5), F.lit(""))
    return (
        df.withColumn("metric", metric)
        .withColumn("value", value)
        .withColumn("metric_type", mtype)
        .withColumn("sample_rate", F.when(metric.isNotNull(), rate))
        .withColumn(
            "scaled_value",
            F.when(F.col("metric_type") == "c", F.col("value") / F.col("sample_rate"))
            .otherwise(F.col("value")),
        )
        .withColumn(
            "tags",
            F.when(tags_raw.isNotNull(), F.str_to_map(tags_raw, F.lit(","), F.lit(":"))),
        )
    )


_GRAPHITE_RX = r"^(\S+)\s+(-?[0-9.eE+]+)\s+(\d+)$"


def parse_graphite(df: DataFrame, source: str = "value") -> DataFrame:
    """Graphite plaintext line → (metric, value, ts) with the dotted
    path also split into a ``path`` array for hierarchy rollups."""
    df = df.withColumnRenamed(source, "line_raw")
    c = F.col("line_raw")
    metric = F.nullif(F.regexp_extract(c, _GRAPHITE_RX, 1), F.lit(""))
    return (
        df.withColumn("metric", metric)
        .withColumn(
            "value",
            F.nullif(F.regexp_extract(c, _GRAPHITE_RX, 2), F.lit("")).cast("double"),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.nullif(F.regexp_extract(c, _GRAPHITE_RX, 3), F.lit("")).cast("long")
            ),
        )
        .withColumn("path", F.when(metric.isNotNull(), F.split(metric, r"\.")))
    )


def statsd_flush(df: DataFrame, every: str = "10 seconds", ts_col: str = "ts") -> DataFrame:
    """The statsd-server flush aggregation as one windowed groupBy:
    counters sum (rate-scaled), gauges take last-by-time, timers get
    count/avg/min/max/p95 — works identically on a batch frame or a
    watermarked stream (same plan builder, SURVEY §3.3).
    """
    w = F.window(ts_col, every)
    by_type = df.groupBy(w.alias("w"), "metric", "metric_type").agg(
        F.sum(F.when(F.col("metric_type") == "c", F.col("scaled_value"))).alias("count_sum"),
        F.max_by("value", F.col(ts_col)).alias("gauge_last"),
        F.count(F.when(F.col("metric_type") == "ms", 1)).alias("timer_n"),
        F.avg(F.when(F.col("metric_type") == "ms", F.col("value"))).alias("timer_avg"),
        F.min(F.when(F.col("metric_type") == "ms", F.col("value"))).alias("timer_min"),
        F.max(F.when(F.col("metric_type") == "ms", F.col("value"))).alias("timer_max"),
        F.percentile_approx(
            F.when(F.col("metric_type") == "ms", F.col("value")), 0.95
        ).alias("timer_p95"),
    )
    return by_type.select(
        F.col("w.start").alias("flush_start"),
        "metric",
        "metric_type",
        "count_sum",
        "gauge_last",
        "timer_n",
        "timer_avg",
        "timer_min",
        "timer_max",
        "timer_p95",
    )
