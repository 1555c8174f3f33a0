"""Compaction tests: fewer files, identical rows (SCALE.md §6)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eventstreams_spark.catalog import load_table
from eventstreams_spark.operators.compaction import compact


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _d, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_compact_unpartitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(24).write.parquet(out)  # simulate per-batch fragments
    assert len(_parquet_files(out)) >= 24
    before = sorted(map(tuple, spark.read.parquet(out).collect()))

    n = compact(spark, out, target_file_bytes=64 * 1024 * 1024)
    files = _parquet_files(out)
    assert len(files) == n <= 4
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert after == before


def test_compact_partitioned_subset(spark, sf_dir, tmp_path):
    out = str(tmp_path / "byday")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.repartition(8).write.partitionBy("event_date").parquet(out)
    target_dir = os.path.join(out, "event_date=2024-01-03")
    n_before = len(_parquet_files(target_dir))
    assert n_before >= 2
    total_before = spark.read.parquet(out).count()

    compact(
        spark,
        out,
        ["event_date"],
        target_file_bytes=64 * 1024 * 1024,
        where="event_date = '2024-01-03'",
    )
    assert len(_parquet_files(target_dir)) < n_before
    assert spark.read.parquet(out).count() == total_before
