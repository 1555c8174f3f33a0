"""MERGE-style upsert: inserts + updates land, untouched partitions'
files stay byte-identical on disk."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eventstreams_spark.operators.merge import merge_upsert


def snapshot_files(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_mtime_ns, st.st_size)
    return out


def seed(spark, path):
    rows = [
        (1, "2024-01-01", 10.0, 100),
        (2, "2024-01-01", 20.0, 100),
        (3, "2024-01-02", 30.0, 100),
        (4, "2024-01-03", 40.0, 100),
    ]
    df = spark.createDataFrame(rows, "id int, day string, v double, ver int")
    df.write.mode("overwrite").partitionBy("day").parquet(path)


def read_all(spark, path):
    # partition dirs read back date-typed; normalize for comparison
    return {
        r["id"]: (str(r["day"]), r["v"], r["ver"])
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_updates_inserts_and_preserves_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    seed(spark, path)
    before = snapshot_files(path)

    updates = spark.createDataFrame(
        [
            (2, "2024-01-01", 21.0, 101),   # update in place
            (5, "2024-01-02", 50.0, 101),   # insert into existing partition
            (6, "2024-01-09", 60.0, 101),   # insert into brand-new partition
        ],
        "id int, day string, v double, ver int",
    )
    touched = merge_upsert(spark, path, updates, ["id"], "day", "ver")
    assert sorted(str(t) for t in touched) == ["2024-01-01", "2024-01-02", "2024-01-09"]

    got = read_all(spark, path)
    assert got[1] == ("2024-01-01", 10.0, 100)   # sibling row survives
    assert got[2] == ("2024-01-01", 21.0, 101)   # updated
    assert got[5] == ("2024-01-02", 50.0, 101)   # inserted
    assert got[6] == ("2024-01-09", 60.0, 101)   # new partition
    assert got[4] == ("2024-01-03", 40.0, 100)

    after = snapshot_files(path)
    untouched = [p for p in before if "day=2024-01-03" in p]
    assert untouched and all(before[p] == after[p] for p in untouched)
    rewritten = [p for p in before if "day=2024-01-01" in p]
    assert all(p not in after or before[p] != after[p] for p in rewritten)


def test_upsert_partition_move_deletes_old_row(spark, tmp_path):
    path = str(tmp_path / "t")
    seed(spark, path)
    updates = spark.createDataFrame(
        [(3, "2024-01-05", 31.0, 101)],  # key 3 moves 01-02 -> 01-05
        "id int, day string, v double, ver int",
    )
    touched = merge_upsert(spark, path, updates, ["id"], "day", "ver")
    assert sorted(str(t) for t in touched) == ["2024-01-02", "2024-01-05"]
    got = read_all(spark, path)
    assert got[3] == ("2024-01-05", 31.0, 101)
    assert len(got) == 4  # no duplicate left behind in 01-02


def test_upsert_within_updates_latest_order_col_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    seed(spark, path)
    updates = spark.createDataFrame(
        [(1, "2024-01-01", 11.0, 101), (1, "2024-01-01", 12.0, 102)],
        "id int, day string, v double, ver int",
    )
    merge_upsert(spark, path, updates, ["id"], "day", "ver")
    assert read_all(spark, path)[1] == ("2024-01-01", 12.0, 102)


def test_streaming_cdc_foreachbatch_upsert(spark, tmp_path):
    """Streaming CDC: a changelog stream applied through
    foreachBatch(merge_upsert) converges to keep-latest-per-key,
    exactly like the batch cdc view — the upsert must hold across
    micro-batch boundaries (key 2 updated in batch 2)."""
    from eventstreams_spark.streaming.replay import replay_table

    path = str(tmp_path / "t")
    seed(spark, path)
    changes = spark.createDataFrame(
        [
            (2, "2024-01-01", 99.0, 201, 1),
            (7, "2024-01-04", 70.0, 201, 1),
            (2, "2024-01-01", 22.5, 202, 2),  # later batch re-updates key 2
        ],
        "id int, day string, v double, ver int, seq int",
    )
    stream = replay_table(spark, changes, str(tmp_path / "stage"),
                          chunks=2, order_col="seq")

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        merge_upsert(batch_df.sparkSession, path, batch_df.drop("seq"),
                     ["id"], "day", "ver")

    (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = read_all(spark, path)
    assert got[2] == ("2024-01-01", 22.5, 202)
    assert got[7] == ("2024-01-04", 70.0, 201)
    assert len(got) == 5
