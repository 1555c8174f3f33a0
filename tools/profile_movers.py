"""Round-7 profiling: candidate plans for json_extract_props and
sessionize_gap30m_batch at sf0.1 (VERDICT r6 task #2).

Interleaved reps, median reported, like bench.py.
"""
import sys, time, os, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from eventstreams_spark.session import get_spark
from eventstreams_spark.catalog import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-movers")
ev = load_table(spark, SF, "events")
print("events rows:", ev.count())

def jx_current(ev):
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.select(k.alias("k"), "value").filter(F.col("k") < 20)
            .groupBy("k").agg(F.count(F.lit(1)).alias("n_events"),
                              F.sum("value").alias("sum_value")))

def jx_from_json(ev):
    k = F.from_json("props", "k INT").getField("k")
    return (ev.select(k.alias("k"), "value").filter(F.col("k") < 20)
            .groupBy("k").agg(F.count(F.lit(1)).alias("n_events"),
                              F.sum("value").alias("sum_value")))

def jx_variant(ev):
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (ev.select(k.alias("k"), "value").filter(F.col("k") < 20)
            .groupBy("k").agg(F.count(F.lit(1)).alias("n_events"),
                              F.sum("value").alias("sum_value")))

def sz_current(ev):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.withColumn("new_sess", F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us), 1).otherwise(0))
    sessioned = flagged.withColumn("session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end"))

def sz_session_window(ev):
    # gap 30min + 1us so merge-iff-diff<=30min == oracle's strict '>' split
    sess = (ev.groupBy("user_id", F.session_window("ts", "1800.000001 seconds"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.min("ts").alias("session_start"), F.max("ts").alias("session_end")))
    w = Window.partitionBy("user_id").orderBy("session_start")
    return sess.select("user_id",
                       F.row_number().over(w).cast("long").alias("session_id"),
                       "n_events", "session_start", "session_end")

CANDS = {
    "jx_current": jx_current, "jx_from_json": jx_from_json, "jx_variant": jx_variant,
    "sz_current": sz_current, "sz_session_window": sz_session_window,
}
REPS = 7
times = {k: [] for k in CANDS}
for k, fn in CANDS.items():  # cold pass
    fn(ev).collect()
for r in range(REPS):
    for k, fn in CANDS.items():
        t0 = time.perf_counter(); fn(ev).collect(); times[k].append(time.perf_counter() - t0)
for k, ts in times.items():
    print(f"{k:22s} median {statistics.median(ts):.3f}  min {min(ts):.3f}  max {max(ts):.3f}")
