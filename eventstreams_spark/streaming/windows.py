"""Event-time window aggregations (T1-T4).

Each builder works on BOTH batch and streaming DataFrames — F.window /
F.session_window are plain Catalyst expressions; only the watermark is
streaming-specific (it is a no-op on batch frames, so golden tests can
run the identical builder both ways and diff results).

Scale notes: streaming state for these lives in the state store keyed
by (window, group key); watermarks bound state size — without one,
windowed state grows forever (T4). At 100 TB/day ingest the state
store provider should be RocksDB with changelog checkpointing
(session.py exposes the conf).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows (T1): one state row per
    (window, keys); append-mode emission when the watermark passes
    window end."""
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (T2): each event updates width/slide windows
    — state and output scale by that factor; prefer the largest slide
    the product tolerates."""
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str | Column,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows (T3): sessions merge as events arrive,
    so state per key is the set of open sessions; the watermark closes
    (and emits) sessions whose end + gap < watermark. Same semantics as
    the batch `sessionize_gap30m_batch` query (W8).

    ``gap`` may be a Column (CalendarIntervalType, e.g. built with
    make_interval) for PER-EVENT dynamic gaps — batch parity for that
    variant is pinned by the session_window_dynamic_gap oracle."""
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def topk_per_window_at_read(
    sink_df: DataFrame,
    k: int,
    order_col: str = "n",
    window_col: str = "window_start",
) -> DataFrame:
    """Streaming top-k per window, the RANK-AT-READ pattern: the
    stream itself only maintains per-(window, key) counts (cheap,
    mergeable, append-mode state) and the ranking runs as a batch
    window over the SINK — ranking inside the stream would need
    all-keys-per-window state and re-emission on every change, which
    no output mode expresses cleanly. This is the standard
    lambda-free decomposition (heavy mergeable state in-stream,
    order-dependent finishing at read).

    Scale: the read-side window partitions by window_start — bounded
    partitions (keys-per-window), never a global sort.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(window_col).orderBy(
        F.col(order_col).desc(), *[c for c in sink_df.columns if c not in (order_col, window_col)]
    )
    return (
        sink_df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
