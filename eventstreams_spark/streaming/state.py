"""State-store configuration (SURVEY §4.2, SCALE.md §6).

The default HDFS-backed state store keeps every key in executor heap —
fine for demos, fatal for 100 TB/day keyed state (dedup keys, session
windows, throttle counters). Production streams run **RocksDB** with
changelog checkpointing: state lives on local SSD, checkpoints ship
only the per-batch changelog, and recovery replays changelogs instead
of re-downloading full snapshots.

These are session-level SQL confs — settable at runtime, but they only
affect *queries started afterwards*, so call ``enable_rocksdb_state``
before ``writeStream.start()``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

STREAMING_STATE_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    # ship per-batch changelogs, not full snapshots
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    # bound memory RocksDB may take per executor (soft limit)
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
}


def enable_rocksdb_state(spark: SparkSession) -> SparkSession:
    for k, v in STREAMING_STATE_CONFS.items():
        spark.conf.set(k, v)
    return spark


def disable_rocksdb_state(spark: SparkSession) -> SparkSession:
    """Revert to the default provider (tests restore global state)."""
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return spark
