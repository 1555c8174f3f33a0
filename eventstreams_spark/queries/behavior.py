"""Behavioral event analytics: funnel conversion and cohort retention.

The two canonical "product analytics over an event stream" queries an
eventstreams-class engine is used for. Both are pure DataFrame plans:
sequential-min joins for the funnel, a first-touch self-aggregation for
cohorts — no UDFs, no collect, and every join keyed on user_id so the
whole pipeline reuses one hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "funnel_3step_conversion",
    category="B1-funnel",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT * FROM (
            SELECT 1 AS stage_order, 'view' AS stage,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL
            SELECT 2, 'view>click', (SELECT count(*) FROM s2)
            UNION ALL
            SELECT 3, 'view>click>purchase', (SELECT count(*) FROM s3)
        )
    """,
)
def funnel_3step_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first qualifying click
    (sequential-min semantics — each stage anchors on the earliest
    qualifying event of the previous stage).

    Every stage is groupBy(user_id) → the three stage frames stay
    hash-partitioned on the same key, so stages 2/3 join without a
    re-shuffle of the aggregated side; the final counts are 1-row
    aggregates unioned driver-free.
    """
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(order: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        stage(1, "view", s1)
        .unionAll(stage(2, "view>click", s2))
        .unionAll(stage(3, "view>click>purchase", s3))
    )


@query(
    "cohort_daily_retention",
    category="B2-cohort",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ), active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), sizes AS (
            SELECT cohort_day, count(*) AS n_cohort
            FROM first_seen GROUP BY cohort_day
        )
        SELECT f.cohort_day,
               date_diff('day', f.cohort_day, a.d) AS day_offset,
               count(DISTINCT a.user_id) AS n_active,
               any_value(s.n_cohort) AS n_cohort,
               round(count(DISTINCT a.user_id) * 1.0 / any_value(s.n_cohort), 6)
                   AS retention
        FROM active a
        JOIN first_seen f ON a.user_id = f.user_id
        JOIN sizes s ON s.cohort_day = f.cohort_day
        GROUP BY f.cohort_day, day_offset
    """,
)
def cohort_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day;
    for each (cohort_day, day_offset) the share of the cohort active
    that day.

    first_seen and active are both groupBy(user_id)-shaped, so their
    join is co-partitioned; the cohort-size dim is tiny (one row per
    day) and broadcast. At 100 TB the daily `active` dedup is the
    heavy step — it's a partial+final distinct that AQE sizes, and
    everything after operates on per-day aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    sizes = first_seen.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        active.join(first_seen, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_day"))
        .join(F.broadcast(sizes), "cohort_day")
        .groupBy("cohort_day", "day_offset")
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.any_value("n_cohort").alias("n_cohort"),
            F.round(
                F.count_distinct("user_id") * 1.0 / F.any_value("n_cohort"), 6
            ).alias("retention"),
        )
    )


@query(
    "cep_sequence_chain",
    category="B3-cep",
    oracle="""
        WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        vc AS (
            SELECT v.user_id, v.ts AS view_ts, min(c.ts) AS click_ts
            FROM v JOIN c ON c.user_id = v.user_id
                AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '24 hours'
            GROUP BY v.user_id, v.ts
        )
        SELECT vc.user_id, vc.view_ts, vc.click_ts, min(p.ts) AS purchase_ts
        FROM vc JOIN p ON p.user_id = vc.user_id
            AND p.ts > vc.click_ts AND p.ts <= vc.click_ts + INTERVAL '24 hours'
        GROUP BY vc.user_id, vc.view_ts, vc.click_ts
    """,
)
def cep_sequence_1h_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern: view → click within 24h →
    purchase within 24h of that click (MATCH_RECOGNIZE-style timed
    sequence, first-match per anchor). Each stage is an interval-
    bounded as-of join: min qualifying successor per anchor event.

    Scale: both joins are equi-join on user_id + range predicate —
    the hash exchange is on user_id only and the range filters
    evaluate within partitions; with date-bucketed keys this is the
    standard skew-safe interval-join shape (cf. join_range_*).
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("user_id", F.col("ts").alias("view_ts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    vc = (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("view_ts"))
            & (F.col("c_ts") <= F.col("view_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .groupBy("user_id", "view_ts")
        .agg(F.min("c_ts").alias("click_ts"))
    )
    return (
        vc.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .groupBy("user_id", "view_ts", "click_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
