"""Webhook/HTTP-delivery spool stream source (SURVEY §2.1 S6).

Domain op: Logstash ``http`` input — a webhook endpoint that accepts
event deliveries. A Spark streaming source cannot *be* the listening
socket (executors come and go); the durable pattern is a **spool
directory**: the receiving tier (any HTTP server, or a cloud bucket
notification) lands each delivery as one immutable file, and this
source tails the spool with exactly-once offset bookkeeping.

Offset contract: files are consumed in (mtime_ns, name) order; the
offset is ``{"committed": [name,...]}`` — the set of filenames already
emitted. A micro-batch's partitions are a pure function of
(start, end) offsets (the newly-arrived file list is embedded in the
*end* offset at ``latestOffset`` time), so replaying a batch re-reads
exactly the same files: exactly-once on top of Spark's offset WAL.

Scale: one ``InputPartition`` per delivery file — reads happen
executor-side and parallelize with arrival rate. The driver holds only
filenames. For 100 TB/day ingest the same design is "S3 + SQS
notification"; the offset would hold opaque receipt ids instead of
names, nothing else changes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA = "value STRING, delivery STRING, line_no BIGINT"


class _FilePartition(InputPartition):
    def __init__(self, path: str, name: str):
        self.path, self.name = path, name


class _SpoolStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("event_spool requires option 'path'")
        self.suffix = options.get("suffix", "")

    def _list(self) -> list[str]:
        try:
            names = [
                n
                for n in os.listdir(self.dir)
                if (not self.suffix or n.endswith(self.suffix))
                and not n.startswith(".")
                and not n.endswith(".tmp")
            ]
        except FileNotFoundError:
            return []
        names.sort(
            key=lambda n: (os.stat(os.path.join(self.dir, n)).st_mtime_ns, n)
        )
        return names

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": self._list()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        prev = set(start.get("seen", []))
        new = [n for n in end.get("seen", []) if n not in prev]
        return [_FilePartition(os.path.join(self.dir, n), n) for n in new] or [
            _FilePartition("", "")
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8", errors="replace") as f:
            for i, line in enumerate(f):
                line = line.rstrip("\n")
                if line:
                    yield (line, partition.name, i)

    def commit(self, end: dict) -> None:
        # Deliveries stay in place (replayable); an operator can archive
        # on a retention schedule. Deleting here would break replay of
        # uncommitted downstream sinks.
        pass


class SpoolDataSource(DataSource):
    """``format("event_spool")`` — exactly-once delivery-spool tail."""

    @classmethod
    def name(cls) -> str:
        return "event_spool"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _SpoolStreamReader(self.options)


def register_spool(spark) -> None:
    spark.dataSource.register(SpoolDataSource)


def read_tar_members(spark, path: str, glob: str = "*.tar"):
    """WebDataset-style tar-shard ingestion (S-series): the standard
    layout for large multimodal training corpora is tar SHARDS whose
    members pair samples by basename ("000123.txt" + "000123.png"
    ...). Shards land via ``binaryFile`` (one row per shard — the
    right parallel grain: shards are sized for one task) and members
    are extracted executor-side with stdlib ``tarfile`` in ONE
    Arrow-batched mapInPandas pass: no temp files, no driver-side
    extraction, nothing but (shard, member, size, content) rows leave
    the scan. Sample pairing is then an equi-join/groupBy on
    (shard, basename) — plain DataFrame ops.
    """
    import io
    import os
    import tarfile

    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, glob) if os.path.isdir(path) else path
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content)), mode="r:"
                ) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        data = tf.extractfile(m).read()
                        rows.append(
                            (shard, m.name, len(data), data)
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "member", "size", "content"]
            )

    return files.select("path", "content").mapInPandas(
        extract, "shard string, member string, size long, content binary"
    )


def read_zip_members(spark, path: str, glob: str = "*.zip"):
    """Zip-archive ingestion, the tar reader's twin for corpora
    delivered as zip bundles: archives land via ``binaryFile`` (one
    row per archive) and members extract executor-side with stdlib
    ``zipfile`` in one Arrow-batched mapInPandas pass — directory
    entries skipped, stored and deflated members both handled by the
    stdlib. Same output contract as read_tar_members:
    (shard, member, size, content)."""
    import io
    import os
    import zipfile

    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, glob) if os.path.isdir(path) else path
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        data = zf.read(info.filename)
                        rows.append(
                            (shard, info.filename, len(data), data)
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "member", "size", "content"]
            )

    return files.select("path", "content").mapInPandas(
        extract, "shard string, member string, size long, content binary"
    )
