"""Cascading continuous aggregates — hypertable-style rollup tiers
(SURVEY §2.9/T1 extended; the Timescale/Influx "continuous aggregate"
capability an event-analytics engine owes its users).

Tier 0 is the raw event stream; tier N is a parquet table of
fixed-width window partials maintained incrementally by a streaming
query; tier N+1 is built FROM tier N's parquet dir opened as a file
stream — so each coarser width re-aggregates partials, never raw rows.

Everything is carried in **re-aggregatable partial form** (count, sum,
min, max; avg is derived at read time as sum/count) — the same
map-side-combine discipline Spark's own two-phase HashAggregate uses,
lifted to the storage layer. At 100 TB/day this is the difference
between a dashboard query scanning raw events (TBs) and scanning 1-day
partials (MBs); the append-mode parquet sink gives exactly-once tiers
via the checkpoint commit log (SURVEY §3.3), and each tier is
partitioned by date so readers prune to the queried range.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .windows import tumbling_agg


def rollup_partials(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: Sequence[str],
    value_col: str = "value",
    watermark: str | None = None,
    exact_decimals: int | None = None,
) -> DataFrame:
    """Tier-1 rollup: raw rows → per-(window, keys) partial aggregates.

    Works identically on batch and streaming frames (same builder both
    ways — the golden-test contract of streaming/windows.py).

    ``exact_decimals``: carry the sum as a fixed-point BIGINT
    (``sum_scaled``, value·10^d rounded) instead of a double
    ``sum_value``. Integer partials re-aggregate associatively with NO
    float drift — through any number of cascade tiers and across
    engines — which is what a multi-tier rollup at 100 TB needs
    (double sums drift in the last ULPs per re-aggregation).
    """
    if exact_decimals is None:
        sum_col = F.sum(value_col).alias("sum_value")
    else:
        scale = 10**exact_decimals
        sum_col = F.sum(
            F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
        ).alias("sum_scaled")
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        sum_col,
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    ]
    return tumbling_agg(df, ts_col, width, keys, aggs, watermark)


def rollup_coarsen(
    df: DataFrame,
    width: str,
    keys: Sequence[str],
    watermark: str | None = None,
) -> DataFrame:
    """Tier N → tier N+1: re-aggregate partials into coarser windows.

    ``width`` must be a multiple of the finer tier's width so windows
    nest exactly (1h → 1d); the finer ``window_start`` is the event
    time of the partial row. count/sum/min/max all re-aggregate
    losslessly — this is why tiers store partials, not averages.
    Handles both the double (``sum_value``) and fixed-point
    (``sum_scaled``) partial forms.
    """
    sum_name = "sum_scaled" if "sum_scaled" in df.columns else "sum_value"
    aggs = [
        F.sum("n_events").alias("n_events"),
        F.sum(sum_name).alias(sum_name),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]
    return tumbling_agg(df, "window_start", width, keys, aggs, watermark)


def with_derived_stats(df: DataFrame, exact_decimals: int | None = None) -> DataFrame:
    """Read-side derivations over partials: materialize ``sum_value``
    from the fixed-point form when present, and ``avg_value``."""
    if exact_decimals is not None and "sum_scaled" in df.columns:
        df = df.withColumn(
            "sum_value", F.col("sum_scaled") / F.lit(float(10**exact_decimals))
        )
    return df.withColumn("avg_value", F.col("sum_value") / F.col("n_events"))


def rollup_schema(keys: Sequence[tuple[str, T.DataType]]) -> T.StructType:
    """Schema of a materialized tier (needed to re-open it as a file
    stream — file sources require an explicit schema)."""
    fields = [T.StructField(n, t) for n, t in keys]
    return T.StructType(
        fields
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("min_value", T.DoubleType()),
            T.StructField("max_value", T.DoubleType()),
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("rollup_date", T.DateType()),
        ]
    )


def materialize_tier(
    df: DataFrame, path: str, checkpoint: str, available_now: bool = True
):
    """Land a (streaming) rollup tier as date-partitioned parquet,
    exactly-once via the file-sink commit log. Returns the started
    StreamingQuery; callers own awaitTermination/stop."""
    out = df.withColumn("rollup_date", F.to_date("window_start"))
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("rollup_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def open_tier_stream(
    spark: SparkSession, path: str, keys: Sequence[tuple[str, T.DataType]]
) -> DataFrame:
    """Re-open a materialized tier as the next tier's source stream."""
    return spark.readStream.schema(rollup_schema(keys)).parquet(path)
