"""Measure: hot-key WINDOW skew vs the two-level mitigation.

AQE's skew handling only splits JOIN shuffle partitions — a Window
over a hot key has no such rescue: the whole key lands in one task
and the stage runs at straggler speed. This experiment injects a
50%-hot-key event stream and times gap-sessionization (lag + running
sum windows over user_id) in the global-window form vs the two-level
(user_id, day)-bucketed form that `sessionize_two_level_skew_safe`
productizes.

Run: python tools/exp_window_skew.py   (~2 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

N = 4_000_000
N_USERS = 50_000
GAP_S = 1800


def build(spark):
    # 50% of events on user 0, rest uniform; event times spread over 30 days
    return spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % N_USERS)
        .alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 37) % (30 * 86400)
        ).alias("ts"),
        F.col("id").alias("event_id"),
    )


def sessionize_global(ev):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > GAP_S * 1_000_000
    ).cast("long")
    sid = F.sum(F.coalesce(new_s, F.lit(1))).over(w)
    return (
        ev.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
    )


def sessionize_two_level(ev):
    # level 1: windows within (user_id, day) buckets; level 2: stitch
    # across day boundaries with a per-user pass over day summaries
    day = F.to_date("ts").alias("day")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    new_s = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > GAP_S * 1_000_000
    ).cast("long")
    sid = F.sum(F.coalesce(new_s, F.lit(1))).over(w)
    per_bucket = (
        ev.withColumn("day", day)
        .withColumn("sid", sid)
        .groupBy("user_id", "day", "sid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    # stitch: a bucket-first session merges with the previous bucket's
    # last session when the cross-boundary gap is within GAP_S
    w2 = Window.partitionBy("user_id").orderBy("day", "sid")
    merged_with_prev = (
        (F.col("sid") == 1)
        & (
            F.unix_micros("first_ts") - F.unix_micros(F.lag("last_ts").over(w2))
            <= GAP_S * 1_000_000
        )
    ).cast("long")
    return (
        per_bucket.withColumn("m", F.coalesce(merged_with_prev, F.lit(0)))
        .groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) - F.sum("m")).alias("n_sessions"),
            F.sum("n").alias("n_events"),
        )
    )


def timed(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = build(spark)
    ev.persist().count()

    timed(sessionize_global(ev))
    t_glob = min(timed(sessionize_global(ev)) for _ in range(3))
    timed(sessionize_two_level(ev))
    t_two = min(timed(sessionize_two_level(ev)) for _ in range(3))

    # sanity: total events identical; session counts agree
    a = sessionize_global(ev).agg(F.sum("n_events"), F.sum("n_sessions")).collect()[0]
    b = sessionize_two_level(ev).agg(F.sum("n_events"), F.sum("n_sessions")).collect()[0]
    assert a[0] == b[0] == N, (a, b)
    assert a[1] == b[1], ("session mismatch", a, b)

    print(f"global window (hot key):    {t_glob:.2f} s")
    print(f"two-level (user, day):      {t_two:.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
