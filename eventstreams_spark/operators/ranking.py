"""Exact global ranking / equi-depth binning without a global sort.

``ntile(k) OVER (ORDER BY ...)`` and ``row_number() OVER (ORDER BY ...)``
with no PARTITION BY collapse the whole dataset into ONE sort partition —
the classic scale-killer. The distributed-exact alternative (the same
construction every MPP engine uses for global rank / percentile cuts):

1. pick ~``n_buckets`` boundary values with ``percentile_approx``
   (bounded sketch, one combinable aggregate job);
2. assign each row a range-bucket by counting boundaries strictly below
   its key (ties share a bucket, so ordering stays exact);
3. count rows per bucket (tiny aggregate, <= n_buckets rows collected —
   bounded metadata, not data) and prefix-sum into per-bucket offsets;
4. ``row_number()`` partitioned BY BUCKET over the sort key, plus the
   bucket's offset = the row's exact global rank.

The result is identical to the single-partition form for ANY boundary
choice — boundaries only balance work, they never affect correctness —
so an approximate sketch yields an exact rank. Cost: 2 small metadata
jobs + ONE shuffle of the data (by bucket), each sort bounded at
~N/n_buckets rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    rank_col: str = "global_rank",
    n_buckets: int = 32,
    accuracy: int = 10_000,
    with_total: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Add ``rank_col`` = exact 1-based global rank by ``order_cols``.

    ``order_cols[0]`` must be numeric (it feeds the percentile sketch);
    remaining columns are tie-breakers. ``n_buckets`` bounds per-bucket
    sort size — size it ~ shuffle parallelism at scale.

    ``with_total=True`` additionally returns the exact row count (free:
    it is the sum of the per-bucket counts this construction already
    collects), saving callers a separate full scan.

    The input is persisted for the duration: the construction reads it
    three times (percentile sketch, bucket counts, final plan) and the
    cache turns those into one scan + two cache reads.
    """
    lead = order_cols[0]
    df = df.persist()
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # bounded metadata collect: n_buckets-1 floats (like IVF centroids)
    row = df.agg(F.percentile_approx(lead, qs, accuracy).alias("b")).head()
    bounds = sorted(set(row["b"] or []))

    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: F.col(lead) > b))
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("__bucket", bucket)

    # tiny aggregate: per-bucket counts -> prefix-sum offsets (<= n_buckets rows)
    counts = {
        r["__bucket"]: r["n"]
        for r in bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    off_expr: Column = F.lit(0)
    if offsets:
        pairs: list[Column] = []
        for b, off in offsets.items():
            pairs.extend([F.lit(b), F.lit(off)])
        off_expr = F.element_at(F.create_map(*pairs), F.col("__bucket"))

    w = Window.partitionBy("__bucket").orderBy(*order_cols)
    ranked = (
        bucketed.withColumn(rank_col, (off_expr + F.row_number().over(w)).cast("long"))
        .drop("__bucket")
    )
    if with_total:
        return ranked, acc
    return ranked


def ntile_from_rank(rank: Column, total: int, k: int) -> Column:
    """The exact ``ntile(k)`` bucket for a 1-based global ``rank`` over
    ``total`` rows: the first ``total % k`` tiles hold ``total//k + 1``
    rows, the rest ``total//k`` (SQL-standard ntile fill)."""
    q, r = divmod(total, k)
    big = r * (q + 1)  # rows covered by the larger leading tiles
    return (
        F.when(rank <= F.lit(big), F.ceil(rank / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.ceil((rank - F.lit(big)) / F.lit(q)))
        .cast("int")
    )


def exact_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    *,
    cum_col: str = "cum",
    n_buckets: int = 32,
    accuracy: int = 10_000,
    with_total: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Add ``cum_col`` = exact inclusive prefix sum of ``value_col``
    by ``order_cols`` — the cumulative-share / running-total twin of
    :func:`exact_global_rank`, with the same construction: range
    buckets from a percentile sketch, per-bucket SUM offsets
    (bounded metadata collect), then a cumulative window partitioned
    BY BUCKET. Identical to ``sum(v) OVER (ORDER BY ...)`` for any
    boundary choice, with every sort capped at ~N/n_buckets rows.

    ``order_cols[0]`` must be numeric (descending orders ride a
    negated lead column, the fagin/exact_global_rank convention);
    ``value_col`` must be integral or exact-cents to keep the prefix
    sums associativity-safe. ``with_total=True`` also returns the
    exact grand total (free: the sum of the per-bucket offsets'
    final accumulator), saving callers the single-partition
    unbounded-frame window usually used for the denominator.
    """
    lead = order_cols[0]
    df = df.persist()
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(F.percentile_approx(lead, qs, accuracy).alias("b")).head()
    bounds = sorted(set(row["b"] or []))

    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: F.col(lead) > b))
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("__bucket", bucket)

    # bounded metadata: per-bucket value sums -> prefix-sum offsets
    sums = {
        r["__bucket"]: r["s"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]

    off_expr: Column = F.lit(0)
    if offsets:
        pairs: list[Column] = []
        for b, off in offsets.items():
            pairs.extend([F.lit(b), F.lit(off)])
        off_expr = F.element_at(F.create_map(*pairs), F.col("__bucket"))

    w = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        bucketed.withColumn(
            cum_col, (off_expr + F.sum(value_col).over(w)).cast("long")
        )
        .drop("__bucket")
    )
    if with_total:
        return out, acc
    return out
