"""Approximate heavy hitters (frequent items) via distributed
Misra-Gries summaries (SURVEY §2 A-series extension; Misra & Gries
1982, merge rule from Agarwal et al., "Mergeable Summaries", PODS'12).

Why not exact groupBy-count? Exact frequency of EVERY item shuffles
one record per distinct item — fine for enum-ish columns, ruinous for
open domains (URLs, user ids, tokens at 100 TB). Misra-Gries keeps at
most ``k`` counters per partition (executor memory O(k), zero
shuffle until the summaries merge) and guarantees for every item:

    true_count - N/k  <=  estimate  <=  true_count

so any item with true frequency > N/k is guaranteed present in the
merged summary (no false negatives above the threshold). The driver
sees k rows per partition, nothing more.

Plan shape: mapInPandas (Arrow-batched, vectorized value_counts — no
per-row Python) -> groupBy(item).sum() over <= k * n_partitions
summary rows -> top-k. The only shuffle carries summaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_update(counters: dict, batch_counts: pd.Series, k: int) -> None:
    """Fold a batch's exact counts into an MG summary of <= k counters.

    Adding exact sub-counts then removing mass below the (k+1)-th
    largest keeps the MG invariant: every retained count is an
    underestimate by at most the total mass subtracted, which the
    classic analysis bounds by N_partition / k.
    """
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        # subtract the (k+1)-th largest value from everything; drop <= 0
        cut = sorted(counters.values(), reverse=True)[k]
        for item in list(counters):
            nc = counters[item] - cut
            if nc > 0:
                counters[item] = nc
            else:
                del counters[item]


def heavy_hitters(df: DataFrame, col: str, k: int = 64, top: int | None = None) -> DataFrame:
    """Approximate top items of ``df[col]`` with bounded memory.

    Returns (item, est_count) where est_count is the merged MG
    estimate (underestimate; exact when each partition holds fewer
    than ``k`` distinct items). ``top`` limits the output with a
    deterministic (est desc, item asc) order.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            _mg_update(counters, pdf[col].dropna().value_counts(), k)
        yield pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, "item string, est long"
    )
    merged = summaries.groupBy("item").agg(F.sum("est").alias("est_count"))
    if top is not None:
        merged = merged.orderBy(F.col("est_count").desc(), F.col("item")).limit(top)
    return merged
