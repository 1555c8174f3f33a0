"""Replay batch tables as streams (S8) — the golden-test bridge.

trigger(availableNow=True) drains a file source to completion and
stops, so a batch oracle can validate a streaming operator on replayed
testdata (SURVEY §3.3/§5.3.4). ``chunks`` > 1 splits the table into
multiple files and caps files-per-trigger so multi-micro-batch
behavior (state carry-over, watermark advancement) is actually
exercised, not collapsed into one batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def replay_table(
    spark: SparkSession,
    df: DataFrame,
    stage_dir: str,
    chunks: int = 1,
    order_col: str | None = None,
) -> DataFrame:
    """Stage ``df`` to parquet files and open it as a file-source stream.

    With ``chunks`` > 1 the stream processes one file per micro-batch,
    in file-modification order; sort by ``order_col`` before staging so
    chunk boundaries follow event time (late-data tests then control
    which rows arrive "late" by reordering the input instead).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    path = os.path.join(stage_dir, "replay")
    if chunks <= 1 or order_col is None:
        stage_files(df.coalesce(1), path, 0)
    else:
        # Chunks must be CONTIGUOUS in event time and arrive in time
        # order — otherwise an early chunk full of late rows advances
        # the watermark and the next chunk gets dropped as late.
        # (repartition(n) would interleave times across files.)
        chunked = df.withColumn(
            "_chunk", F.ntile(chunks).over(Window.orderBy(order_col))
        )
        for i in range(1, chunks + 1):
            stage_files(chunked.filter(F.col("_chunk") == i).drop("_chunk"), path, i)
    reader = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return reader


def stage_files(df: DataFrame, path: str, idx: int) -> None:
    """Land ``df`` as ``<path>/chunk-<idx>.parquet`` with an mtime after
    every earlier chunk. FileStreamSource's intra-batch file ordering is
    not contractual, so deterministic replays pin BOTH the lexicographic
    name order and the mtime order to the intended sequence."""
    import glob
    import shutil
    import time

    staging = path + f".stage{idx}"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
    os.makedirs(path, exist_ok=True)
    dest = os.path.join(path, f"chunk-{idx:04d}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(staging)
    now = time.time()
    os.utime(dest, (now + idx, now + idx))  # strictly increasing mtimes


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append", timeout: int = 120):
    """Drain a streaming DataFrame into an in-memory table (K5) with
    availableNow; returns when the stream has fully processed."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return q
