"""Streaming deduplication (T5).

Two regimes with very different state costs:
- ``dropDuplicates(keys)``: exact, but state grows with distinct keys
  forever — only safe for bounded key domains.
- ``dropDuplicatesWithinWatermark(keys)``: state is evicted once the
  watermark passes an entry — the 100 TB choice when duplicates arrive
  close together (retries, at-least-once sources).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """First event per key wins; duplicates within the watermark horizon
    are dropped. Without a watermark, falls back to unbounded-state
    exact dedup (documents the tradeoff above)."""
    if watermark:
        if not ts_col:
            raise ValueError("watermark dedup needs ts_col")
        if df.isStreaming:
            return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
        return df.dropDuplicates(list(keys))
    return df.dropDuplicates(list(keys))
