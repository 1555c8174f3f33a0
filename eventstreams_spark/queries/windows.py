"""W-series: window functions (SURVEY §2.6) and O-series set ops (§2.7).

Determinism: every ORDER BY inside a window spec carries a unique-key
tiebreaker (event_id / custkey) unless tie-compatible functions
(rank/dense_rank) are being exercised on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "window_rank_dense",
    category="W1",
    oracle="""
        SELECT p_partkey, p_brand, p_size,
               rank()         OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
               dense_rank()   OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk,
               row_number()   OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS rn,
               ntile(4)       OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS quartile,
               round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_size), 9) AS pct_rank,
               round(cume_dist()    OVER (PARTITION BY p_brand ORDER BY p_size), 9) AS cdist
        FROM part
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family. rank/dense_rank/percent_rank/cume_dist use the
    tie-bearing key (real ties exercised); row_number/ntile get a
    total order — they are position-dependent and nondeterministic
    under ties."""
    p = load_table(spark, sf_dir, "part")
    w_ties = Window.partitionBy("p_brand").orderBy("p_size")
    w_total = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.row_number().over(w_total).alias("rn"),
        F.ntile(4).over(w_total).alias("quartile"),
        F.round(F.percent_rank().over(w_ties), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w_ties), 9).alias("cdist"),
    )


@query(
    "window_lag_lead_gap",
    category="W3",
    oracle="""
        SELECT event_id, user_id, event_type,
               epoch_us(ts) - lag(epoch_us(ts))  OVER w AS gap_us,
               lag(event_type)  OVER w AS prev_type,
               lead(event_type) OVER w AS next_type,
               lag(event_type, 2, 'none') OVER w AS prev2_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offsets and defaults; inter-event gap in µs
    (Logstash `elapsed` analog, W7 folded in)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    )


@query(
    "window_running_sum",
    category="W4",
    oracle="""
        SELECT event_id, user_id,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w / 100.0
                   AS running_value,
               count(*)    OVER w AS running_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals over cents-quantized values: window sums are NOT
    sequential in every engine (DuckDB uses segment trees), so double
    accumulation drifts — integer window sums are order-free exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(cents).over(w) / 100.0).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "window_moving_avg_rows",
    category="W5",
    oracle="""
        SELECT event_id, user_id,
               round(avg(value) OVER w, 6) AS moving_avg_4,
               min(value) OVER w AS moving_min_4,
               max(value) OVER w AS moving_max_4
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 4-row frame (moving average). 6dp rounding: engines
    maintain sliding frames with different add/retract arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("moving_avg_4"),
        F.min("value").over(w).alias("moving_min_4"),
        F.max("value").over(w).alias("moving_max_4"),
    )


@query(
    "window_range_1h_trailing",
    category="W6",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER w, 6) AS trailing_1h_value,
               count(*) OVER w AS trailing_1h_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_1h_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time: trailing 1-hour per-user totals —
    value-based frame bounds, not row counts."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    )


@query(
    "setop_union_all",
    category="O4",
    oracle="""
        SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, user_id, value FROM events WHERE value > 400
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL multiset semantics (overlapping rows duplicated)."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "value"]
    return (
        ev.filter(F.col("event_type") == "click")
        .select(*cols)
        .unionAll(ev.filter(F.col("value") > 400).select(*cols))
    )


@query(
    "setop_intersect_except",
    category="O5",
    oracle="""
        SELECT 'both' AS tag, n FROM (
            SELECT c_nationkey AS n FROM customer
            INTERSECT
            SELECT s_nationkey AS n FROM supplier
        )
        UNION ALL
        SELECT 'cust_only' AS tag, n FROM (
            SELECT c_nationkey AS n FROM customer
            EXCEPT
            SELECT s_nationkey AS n FROM supplier
        )
    """,
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct semantics) tagged and re-unioned."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    both = c.intersect(s).select(F.lit("both").alias("tag"), "n")
    cust_only = c.subtract(s).select(F.lit("cust_only").alias("tag"), "n")
    return both.unionAll(cust_only)


@query(
    "window_first_last_nth",
    category="A8",
    oracle="""
        SELECT event_id, user_id,
               first_value(value)  OVER wf AS first_val,
               last_value(value)   OVER wf AS last_val,
               nth_value(value, 2) OVER wf AS second_val
        FROM events
        WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-partition
    frame (A8 — order-dependent "firsts" are only deterministic with an
    explicit window ordering + unique-key tiebreak, never via groupBy
    first()).

    The UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING frame is load-bearing:
    with the default frame (..CURRENT ROW) last_value degenerates to the
    current row's value in both engines. Scale: one hash-partition
    shuffle on user_id; the full-frame functions are computed in a single
    pass over each sorted partition (no per-row rescans).
    """
    ev = load_table(spark, sf_dir, "events")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(wf).alias("first_val"),
        F.last("value").over(wf).alias("last_val"),
        F.nth_value("value", 2).over(wf).alias("second_val"),
    )


@query(
    "setop_intersect_except_all",
    category="O5",
    oracle="""
        SELECT 'both_all' AS tag, n FROM (
            SELECT c_nationkey AS n FROM customer
            INTERSECT ALL
            SELECT s_nationkey AS n FROM supplier
        )
        UNION ALL
        SELECT 'cust_only_all' AS tag, n FROM (
            SELECT c_nationkey AS n FROM customer
            EXCEPT ALL
            SELECT s_nationkey AS n FROM supplier
        )
    """,
)
def setop_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL multiset semantics (O5 ALL variants):
    each nationkey survives min(cust_count, supp_count) times in the
    intersection and cust_count - supp_count times in the difference.

    Spark plans both as an aggregate producing per-row multiplicities
    followed by generate (replicate) — one shuffle on the compared
    columns, no join; same shape DuckDB uses, and it scales as a
    hash aggregate (no row explosion beyond the surviving multiset).
    """
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    both = c.intersectAll(s).select(F.lit("both_all").alias("tag"), "n")
    cust_only = c.exceptAll(s).select(F.lit("cust_only_all").alias("tag"), "n")
    return both.unionAll(cust_only)


@query(
    "sort_limit_offset",
    category="O3",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 10
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated top-k (O3): global sort + OFFSET + LIMIT. Only
    deterministic with a total order (unique-key tiebreak on
    o_orderkey — a bare ORDER BY o_totalprice would make pages
    engine-dependent under ties).

    Scale: Spark plans offset+limit over a sort as a single
    TakeOrderedAndProject of the first offset+limit rows (heap per
    partition, merge on driver) — no range-partitioned global sort, so
    page depth, not table size, bounds the cost; deep pagination
    (OFFSET 1e9) would be the anti-pattern.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(20)
    )


@query(
    "rank_movers_week_over_week",
    category="W9-movers",
    oracle="""
        WITH wk AS (
            SELECT user_id,
                   CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00'
                        THEN 1 ELSE 2 END AS week,
                   count(*) AS n
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts < TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY user_id, week
        ), ranked AS (
            SELECT user_id, week, n,
                   CAST(row_number() OVER (PARTITION BY week
                        ORDER BY n DESC, user_id) AS BIGINT) AS rk
            FROM wk
        )
        SELECT a.user_id,
               a.rk AS rank_w1, b.rk AS rank_w2,
               a.rk - b.rk AS rank_delta,
               CAST(a.n AS BIGINT) AS n_w1, CAST(b.n AS BIGINT) AS n_w2
        FROM ranked a JOIN ranked b
          ON a.user_id = b.user_id AND a.week = 1 AND b.week = 2
        ORDER BY abs(a.rk - b.rk) DESC, a.user_id
        LIMIT 15
    """,
)
def rank_movers_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard MOVERS: activity rank per user in two consecutive
    weeks, joined to surface the biggest rank swings — the "trending
    up/down" panel (B5 period-over-period applied to ranks instead of
    values).

    Scale: ranks partition BY WEEK (each week's row_number sorts only
    that week's actives — with calendar partitioning this is the safe
    per-partition global rank; for whole-history ranks use
    exact_global_rank); the movers join is keyed on user_id. Exact
    integer ordering throughout — no float rank drift.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    wk = ev.groupBy(
        "user_id",
        F.when(
            F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"), 1
        )
        .otherwise(2)
        .alias("week"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("week").orderBy(F.col("n").desc(), "user_id")
    ranked = wk.withColumn("rk", F.row_number().over(w).cast("long"))
    a = ranked.filter(F.col("week") == 1).select(
        "user_id", F.col("rk").alias("rank_w1"), F.col("n").alias("n1")
    )
    b = ranked.filter(F.col("week") == 2).select(
        "user_id", F.col("rk").alias("rank_w2"), F.col("n").alias("n2")
    )
    return (
        a.join(b, "user_id")
        .select(
            "user_id",
            "rank_w1",
            "rank_w2",
            (F.col("rank_w1") - F.col("rank_w2")).alias("rank_delta"),
            F.col("n1").cast("long").alias("n_w1"),
            F.col("n2").cast("long").alias("n_w2"),
        )
        .orderBy(F.abs(F.col("rank_delta")).desc(), "user_id")
        .limit(15)
    )
