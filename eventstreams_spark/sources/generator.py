"""Deterministic event generator source (SURVEY §2.1 S7).

Domain op: Logstash ``generator`` input / Spark's ``rate`` source — a
load/test event firehose. This version is *deterministic*: row ``i``
is a pure function of ``i`` and the configured seed, so tests (and the
driver's rows-only checks) are reproducible and a replayed micro-batch
regenerates byte-identical rows — which is what makes the source
exactly-once under Spark's offset WAL (SURVEY §3.3).

Batch: ``spark.read.format("event_generator").option("rows", n)``.
Stream: ``spark.readStream.format("event_generator")`` with
``rowsPerBatch`` advancing a monotone row-counter offset.

Scale: the driver only ever sees ``{"offset": int}``; rows are
synthesized executor-side, ``numPartitions`` slices per batch, each
partition generating its own contiguous id range independently — no
shared RNG state, no driver materialization, arbitrarily wide.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

_EVENT_TYPES = ("click", "purchase", "error", "signup", "view")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _row(i: int, seed: int):
    """Row ``i`` as a pure function of (i, seed) — no RNG state."""
    h = int.from_bytes(
        hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest(), "big"
    )
    ts = (_EPOCH + timedelta(seconds=i)).replace(tzinfo=None)
    return (
        i,
        ts,
        h % 1000,
        _EVENT_TYPES[h % len(_EVENT_TYPES)],
        round((h % 100_000) / 100.0, 2),
        '{"k": %d}' % (h % 100),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


def _slices(start: int, end: int, n: int, seed: int) -> Sequence[_RangePartition]:
    total = end - start
    n = max(1, min(n, total)) if total > 0 else 1
    step = -(-total // n) if total else 1
    return [
        _RangePartition(s, min(s + step, end), seed)
        for s in range(start, end, step)
    ] or [_RangePartition(start, start, seed)]


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        return _slices(0, self.rows, self.num_partitions, self.seed)

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.max_rows = int(options.get("maxRows", 0))  # 0 = unbounded
        self._offset = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # Bounded mode is a drain: the target offset is a pure function
        # of config, so a restarted query (which re-creates this reader
        # but keeps the checkpointed start offset) converges instead of
        # replaying from a reset in-memory counter. Unbounded mode
        # advances rowsPerBatch per trigger.
        if self.max_rows:
            return {"offset": self.max_rows}
        self._offset += self.rows_per_batch
        return {"offset": self._offset}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return _slices(start["offset"], end["offset"], self.num_partitions, self.seed)

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)

    def commit(self, end: dict) -> None:  # nothing to clean up: pure function
        pass


class EventGeneratorDataSource(DataSource):
    """``format("event_generator")`` — deterministic synthetic events."""

    @classmethod
    def name(cls) -> str:
        return "event_generator"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def register_generator(spark) -> None:
    spark.dataSource.register(EventGeneratorDataSource)
