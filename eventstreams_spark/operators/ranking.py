"""Exact global ranking / equi-depth binning without a global sort.

``ntile(k) OVER (ORDER BY ...)`` and ``row_number() OVER (ORDER BY ...)``
with no PARTITION BY collapse the whole dataset into ONE sort partition —
the classic scale-killer. The distributed-exact alternative (the same
construction every MPP engine uses for global rank / percentile cuts):

1. pick ~``n_buckets`` boundary values with ``percentile_approx``
   (bounded sketch, one combinable aggregate job);
2. assign each row a range-bucket by counting boundaries strictly below
   its key (ties share a bucket, so ordering stays exact);
3. aggregate per bucket (tiny aggregate, <= n_buckets rows collected —
   bounded metadata, not data) and prefix-sum into per-bucket offsets;
4. a window partitioned BY BUCKET over the sort key, plus the bucket's
   offset = the row's exact global value.

The result is identical to the single-partition form for ANY boundary
choice — boundaries only balance work, they never affect correctness —
so an approximate sketch yields an exact rank. Cost: 2 small metadata
jobs + ONE shuffle of the data (by bucket), each sort bounded at
~N/n_buckets rows.

Both public helpers (:func:`exact_global_rank` for row_number,
:func:`exact_global_cumsum` for running sums) share the scaffolding via
:func:`_bucketed_offsets`, parameterized only by the per-bucket
aggregate; a bucketing fix (null-lead handling, float casts) lands once
for both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucketed_offsets(
    df: DataFrame,
    order_cols: list[str],
    per_bucket_agg: Column,
    *,
    n_buckets: int,
    accuracy: int,
) -> tuple[DataFrame, Column, int]:
    """Shared range-bucket scaffolding: sketch ``n_buckets - 1``
    boundaries on ``order_cols[0]`` (must be numeric), tag each row
    with its ``__bucket``, aggregate ``per_bucket_agg`` per bucket
    (bounded metadata collect, <= n_buckets rows), and prefix-sum the
    per-bucket aggregates into exclusive offsets.

    Returns ``(bucketed_frame, offset_expr, grand_total)`` where
    ``bucketed_frame`` carries the extra ``__bucket`` column (callers
    drop it after windowing) and ``offset_expr`` maps ``__bucket`` to
    its exclusive prefix aggregate.

    The input is materialized with an eager ``localCheckpoint`` — the
    construction reads it three times (percentile sketch, bucket
    aggregates, the caller's final plan), and unlike ``persist()``
    (which pins a CacheManager entry until an explicit unpersist that
    no caller can safely time, since the final plan is lazy) the
    checkpoint blocks are released by Spark's ContextCleaner as soon
    as the frame is unreferenced — no per-invocation cache leak over
    a long simulator run (ADVICE r8).
    """
    lead = order_cols[0]
    df = df.localCheckpoint(eager=True)
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

    # tiny aggregate: per-bucket values -> prefix-sum offsets
    per_bucket = {
        r["__bucket"]: r["v"]
        for r in bucketed.groupBy("__bucket")
        .agg(per_bucket_agg.alias("v"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]

    off_expr: Column = F.lit(0)
    if offsets:
        pairs: list[Column] = []
        for b, off in offsets.items():
            pairs.extend([F.lit(b), F.lit(off)])
        off_expr = F.element_at(F.create_map(*pairs), F.col("__bucket"))
    return bucketed, off_expr, acc


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
    """
    bucketed, off_expr, total = _bucketed_offsets(
        df, order_cols, F.count(F.lit(1)),
        n_buckets=n_buckets, accuracy=accuracy,
    )
    w = Window.partitionBy("__bucket").orderBy(*order_cols)
    ranked = (
        bucketed.withColumn(rank_col, (off_expr + F.row_number().over(w)).cast("long"))
        .drop("__bucket")
    )
    if with_total:
        return ranked, total
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
    exact grand total (free: the final prefix-sum accumulator),
    saving callers the single-partition unbounded-frame window
    usually used for the denominator.
    """
    bucketed, off_expr, total = _bucketed_offsets(
        df, order_cols, F.sum(value_col),
        n_buckets=n_buckets, accuracy=accuracy,
    )
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
        return out, total
    return out
