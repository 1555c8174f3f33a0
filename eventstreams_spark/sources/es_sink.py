"""Elasticsearch-style bulk sink (SURVEY §2.2 K4).

Domain op: Logstash ``elasticsearch`` output — the reference domain's
canonical sink. Implemented as a Spark 4 Python ``DataSourceStreamWriter``
producing standard ``_bulk`` NDJSON actions.

Delivery semantics: Spark gives at-least-once per micro-batch replay;
we upgrade that to *effectively-once* the same way Logstash does —
**deterministic document ids** (sha1 over configured id fields, or the
whole doc), so a replayed batch overwrites identical docs instead of
duplicating them.

Transports:
- ``dir`` (default, CI-testable): each partition stages its bulk
  payload to ``<path>/.stage-<batch>-<taskid>.ndjson``; ``commit``
  atomically renames all staged files into place and drops a
  ``_batch-<id>.committed`` marker; ``abort`` deletes the stage files.
  This mirrors an object-store landing zone for a downstream indexer.
- ``http`` (real cluster): POSTs the same payload to ``<url>/_bulk``
  via stdlib urllib. No network exists in CI, so this path is
  integration-only; errors raise so Spark retries the task.

Scale: bulk building is executor-side and streams row-by-row — the
driver sees only commit messages (file names / doc counts). Payloads
chunk at ``maxActionsPerFlush`` to bound memory.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import Row
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def doc_id(doc: dict, id_fields: list[str] | None) -> str:
    """Deterministic _id: sha1 of the id fields (or the sorted doc)."""
    if id_fields:
        basis = "\x1f".join(str(doc.get(f)) for f in id_fields)
    else:
        basis = json.dumps(doc, sort_keys=True, default=str)
    return hashlib.sha1(basis.encode()).hexdigest()


def bulk_actions(
    rows: Iterator[dict], index: str, id_fields: list[str] | None
) -> Iterator[str]:
    """Rows → ``_bulk`` action/source NDJSON line pairs."""
    for doc in rows:
        action = {"index": {"_index": index, "_id": doc_id(doc, id_fields)}}
        yield json.dumps(action, default=str)
        yield json.dumps(doc, default=str)


@dataclass
class _Staged(WriterCommitMessage):
    stage_path: str
    final_path: str
    actions: int


class _EsBulkWriter(DataSourceStreamWriter):
    def __init__(self, options, schema: StructType):
        self.transport = options.get("transport", "dir")
        self.path = options.get("path")
        self.url = options.get("url")
        self.index = options.get("index", "events")
        idf = options.get("idFields", "")
        self.id_fields = [f for f in idf.split(",") if f] or None
        self.max_flush = int(options.get("maxActionsPerFlush", 10_000))
        if self.transport == "dir" and not self.path:
            raise ValueError("es_bulk transport=dir requires option 'path'")
        if self.transport == "http" and not self.url:
            raise ValueError("es_bulk transport=http requires option 'url'")

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        docs = (row.asDict(recursive=True) for row in iterator)
        lines = bulk_actions(docs, self.index, self.id_fields)
        if self.transport == "http":
            return self._post(lines)
        return self._stage(lines)

    def _stage(self, lines: Iterator[str]) -> _Staged:
        os.makedirs(self.path, exist_ok=True)
        tid = uuid.uuid4().hex[:12]
        stage = os.path.join(self.path, f".stage-{tid}.ndjson")
        n = 0
        with open(stage, "w", encoding="utf-8") as f:
            for line in lines:
                f.write(line)
                f.write("\n")
                n += 1
        final = os.path.join(self.path, f"bulk-{tid}.ndjson")
        return _Staged(stage_path=stage, final_path=final, actions=n // 2)

    def _post(self, lines: Iterator[str]) -> _Staged:  # pragma: no cover - needs cluster
        import urllib.request

        buf: list[str] = []
        n = 0

        def flush():
            if not buf:
                return
            body = ("\n".join(buf) + "\n").encode()
            req = urllib.request.Request(
                f"{self.url.rstrip('/')}/_bulk",
                data=body,
                headers={"Content-Type": "application/x-ndjson"},
            )
            with urllib.request.urlopen(req) as resp:
                reply = json.loads(resp.read())
            if reply.get("errors"):
                raise RuntimeError(f"bulk indexing errors: {reply}")
            buf.clear()

        for line in lines:
            buf.append(line)
            n += 1
            if n % (2 * self.max_flush) == 0:
                flush()
        flush()
        return _Staged(stage_path="", final_path="", actions=n // 2)

    def commit(self, messages, batchId: int) -> None:
        total = 0
        for m in messages:
            if m is None:
                continue
            if m.stage_path and os.path.exists(m.stage_path):
                os.replace(m.stage_path, m.final_path)  # atomic publish
            total += m.actions
        if self.transport == "dir":
            marker = os.path.join(self.path, f"_batch-{batchId}.committed")
            with open(marker, "w", encoding="utf-8") as f:
                json.dump({"batchId": batchId, "actions": total}, f)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.stage_path and os.path.exists(m.stage_path):
                os.remove(m.stage_path)


class EsBulkDataSource(DataSource):
    """``format("es_bulk")`` — idempotent-id bulk-indexing sink."""

    @classmethod
    def name(cls) -> str:
        return "es_bulk"

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return _EsBulkWriter(self.options, schema)


def register_es_bulk(spark) -> None:
    spark.dataSource.register(EsBulkDataSource)
