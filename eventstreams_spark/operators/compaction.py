"""Small-file compaction (SCALE.md §6 sink maintenance).

Streaming file sinks write one file per partition per micro-batch —
at a 1-minute trigger that is ~1440 × shuffle-partitions files/day,
and at 100 TB the NameNode/object-store listing cost plus tiny-scan
overhead dominate. Compaction rewrites a landed table (or a partition
subset) into target-size files; with dynamic partition overwrite the
rewrite is atomic per partition and safe to run while readers are
active (parquet readers pin the file list at plan time).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .partitioned import write_partitioned

TARGET_FILE_BYTES = 512 * 1024 * 1024  # cluster default; tests pass smaller


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    *,
    target_file_bytes: int = TARGET_FILE_BYTES,
    where: str | None = None,
) -> int:
    """Rewrite ``path`` (optionally only rows matching ``where``, which
    should be a partition predicate) into ≈target-size files.

    Returns the number of output files requested. File count =
    ceil(input_bytes / target) — computed from on-disk size, no
    collect. Local-fs sizing here; on a cluster the same arithmetic
    runs off the FileSystem listing the scan already did.
    """
    df = spark.read.parquet(path)
    if where is not None:
        df = df.filter(where)
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    compacted = df.repartition(n_files)
    if partition_cols:
        write_partitioned(compacted, path, partition_cols, dynamic=where is not None)
    else:
        # unpartitioned: write to a sibling then swap would be the
        # cluster pattern; locally overwrite via a staged temp dir
        tmp = path.rstrip("/") + "._compacting"
        compacted.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return n_files
