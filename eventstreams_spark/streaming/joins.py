"""Stream–stream joins (SURVEY §2.4 J11, §2.9 T10).

Two unbounded sides can only join if Spark can bound the state each
side must retain: both sides carry a watermark and the join condition
includes an event-time range tying right-side time to left-side time.
State for rows older than (watermark − bound) is evicted every
micro-batch — at 100 TB/day this eviction is what keeps the RocksDB
state finite, so the time bound is mandatory here, not optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with the right event occurring in
    ``[left_ts, left_ts + within]``; both sides watermarked.

    Output columns: keys, then left columns prefixed ``l_`` and right
    columns prefixed ``r_`` (minus the join keys). Outer variants emit
    unmatched rows only once the watermark closes their window —
    same availableNow-drain caveats as windowed aggregation.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = (
        cond
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    joined = lw.join(rw, cond, how)
    # outer variants: the key must survive whichever side is null-padded
    out_cols = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys
    ]
    for c in left.columns:
        if c not in keys:
            out_cols.append(F.col(f"l.{c}").alias(f"l_{c}"))
    for c in right.columns:
        if c not in keys:
            out_cols.append(F.col(f"r.{c}").alias(f"r_{c}"))
    return joined.select(*out_cols)
