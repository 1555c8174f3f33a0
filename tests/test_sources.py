"""Custom source/sink tests (SURVEY §2.1 S4–S7, §2.2 K3/K4).

Python Data Source API sources run end-to-end (no network needed);
Kafka builders are checked on the option maps and unstarted plans they
assemble, per SURVEY S4 ("no broker in CI; wrap + unit-test config
assembly").
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from eventstreams_spark.sources import (
    bulk_actions,
    kafka_reader,
    kafka_sink_options,
    kafka_source_options,
    kafka_writer,
    parse_syslog,
    register_es_bulk,
    register_generator,
    register_spool,
)
from eventstreams_spark.streaming.replay import run_to_memory


# ------------------------------------------------------------ generator

def test_generator_batch_deterministic(spark):
    register_generator(spark)
    df = spark.read.format("event_generator").option("rows", 500).load()
    rows = df.collect()
    assert len(rows) == 500
    assert len({r.event_id for r in rows}) == 500
    again = spark.read.format("event_generator").option("rows", 500).load().collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    types = {r.event_type for r in rows}
    assert types <= {"click", "purchase", "error", "signup", "view"}


def test_generator_stream_offsets(spark, tmp_path):
    register_generator(spark)
    stream = (
        spark.readStream.format("event_generator")
        .option("rowsPerBatch", 40)
        .option("maxRows", 120)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("gen_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM gen_stream")
    assert got.count() == 120
    assert got.select(F.countDistinct("event_id")).collect()[0][0] == 120


# ---------------------------------------------------------------- spool

def _write_delivery(d: str, name: str, lines: list[str]) -> None:
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, os.path.join(d, name))


def test_spool_reads_deliveries_exactly_once(spark, tmp_path):
    register_spool(spark)
    spool = tmp_path / "spool"
    spool.mkdir()
    _write_delivery(str(spool), "d1.json", ['{"a": 1}', '{"a": 2}'])
    time.sleep(0.02)  # distinct mtimes keep the arrival order stable
    _write_delivery(str(spool), "d2.json", ['{"a": 3}'])

    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("event_spool")
            .option("path", str(spool))
            .load()
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r.value, r.delivery, r.line_no) for r in spark.read.json(out).collect()
        )

    assert run_once() == [
        ('{"a": 1}', "d1.json", 0),
        ('{"a": 2}', "d1.json", 1),
        ('{"a": 3}', "d2.json", 0),
    ]

    # second run over the same checkpoint: only the new delivery is
    # emitted — the committed file set is not replayed (exactly-once)
    _write_delivery(str(spool), "d3.json", ['{"a": 4}'])
    assert run_once() == [
        ('{"a": 1}', "d1.json", 0),
        ('{"a": 2}', "d1.json", 1),
        ('{"a": 3}', "d2.json", 0),
        ('{"a": 4}', "d3.json", 0),
    ]


# --------------------------------------------------------------- syslog

def test_parse_syslog_fields(spark):
    lines = [
        "<34>Jan 12 06:30:45 web01 sshd[2451]: Failed password for root",
        "<13>Feb  3 23:59:59 db-7 cron: job started",
        "not a syslog line at all",
    ]
    df = parse_syslog(spark.createDataFrame([(l,) for l in lines], "value string"))
    rows = {r.message_raw: r for r in df.collect()}
    r = rows[lines[0]]
    assert (r.pri, r.facility, r.severity) == (34, 4, 2)
    assert (r.host, r.app, r.proc_id) == ("web01", "sshd", 2451)
    assert r.message == "Failed password for root"
    assert str(r.ts) == "2024-01-12 06:30:45"
    r2 = rows[lines[1]]
    assert (r2.host, r2.app, r2.proc_id) == ("db-7", "cron", None)
    assert str(r2.ts) == "2024-02-03 23:59:59"
    bad = rows[lines[2]]
    assert bad.pri is None and bad.host is None


# ---------------------------------------------------------------- kafka

def test_kafka_option_assembly():
    opts = kafka_source_options(
        "b1:9092,b2:9092",
        subscribe="events,audit",
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
        min_partitions=64,
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "events,audit"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["minPartitions"] == "64"
    assert opts["failOnDataLoss"] == "true"

    assign = kafka_source_options("b:9092", assign={"t": [0, 1]})
    assert json.loads(assign["assign"]) == {"t": [0, 1]}

    with pytest.raises(ValueError):
        kafka_source_options("b:9092")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", subscribe="a", subscribe_pattern="a.*")

    assert kafka_sink_options("b:9092", topic="out")["topic"] == "out"


def test_kafka_reader_writer_configure_without_broker(spark, tmp_path):
    reader = kafka_reader(spark, bootstrap_servers="b:9092", subscribe="t")
    assert reader is not None  # configured, unstarted — no broker contact
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .withColumnRenamed("value", "k")
        .withColumn("payload", F.lit("x"))
    )
    writer = kafka_writer(
        df,
        str(tmp_path / "ck"),
        value_from=["k", "payload"],
        key_from="k",
        bootstrap_servers="b:9092",
        topic="out",
    )
    assert writer is not None  # configured, unstarted — no broker contact


# -------------------------------------------------------------- es sink

def test_bulk_actions_idempotent_ids():
    docs = [{"id": 7, "v": "a"}, {"id": 8, "v": "b"}]
    lines = list(bulk_actions(iter(docs), "idx", ["id"]))
    assert len(lines) == 4
    a0 = json.loads(lines[0])["index"]
    assert a0["_index"] == "idx"
    again = json.loads(next(iter(bulk_actions(iter(docs), "idx", ["id"]))))
    assert again["index"]["_id"] == a0["_id"]  # deterministic


def test_es_bulk_sink_stream(spark, tmp_path):
    register_es_bulk(spark)
    register_generator(spark)
    out = tmp_path / "es"
    stream = (
        spark.readStream.format("event_generator")
        .option("rowsPerBatch", 25)
        .option("maxRows", 50)
        .load()
    )
    q = (
        stream.writeStream.format("es_bulk")
        .option("path", str(out))
        .option("index", "events-2024")
        .option("idFields", "event_id")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = sorted(os.listdir(out))
    payloads = [f for f in files if f.startswith("bulk-")]
    markers = [f for f in files if f.endswith(".committed")]
    assert payloads and markers
    assert not [f for f in files if f.startswith(".stage-")]  # all published
    actions = 0
    ids = set()
    for p in payloads:
        with open(out / p, encoding="utf-8") as f:
            lines = [json.loads(l) for l in f if l.strip()]
        assert len(lines) % 2 == 0
        for i in range(0, len(lines), 2):
            meta = lines[i]["index"]
            assert meta["_index"] == "events-2024"
            ids.add(meta["_id"])
            assert "event_id" in lines[i + 1]
            actions += 1
    assert actions == 50
    assert len(ids) == 50  # unique deterministic ids


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Landed data whose schema grew a column reads as one table with
    mergeSchema: old files surface NULL for the new column (the
    append-only ingest evolution path; S1)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evo")
    spark.range(3).select(F.col("id"), F.lit("a").alias("x")).write.parquet(p + "/f1.parquet")
    spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("x"), F.lit(7.5).alias("score")
    ).write.parquet(p + "/f2.parquet")
    df = spark.read.option("mergeSchema", "true").parquet(p + "/f*.parquet")
    assert set(df.columns) == {"id", "x", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[0] is None and rows[4] == 7.5


def test_read_tar_members_skips_dirs_and_extracts_bytes(spark, tmp_path):
    """Tar-shard reader: file members extract byte-exact, directory
    entries are skipped, multiple shards parallelize per file."""
    import io
    import tarfile

    from eventstreams_spark.sources.spool import read_tar_members

    d = tmp_path / "shards"
    d.mkdir()
    for s, payloads in (
        ("a", {"0.txt": b"hello", "0.cls": b"web"}),
        ("b", {"1.txt": b"\x00\xffbin", "sub/": None, "1.cls": b"x"}),
    ):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, data in payloads.items():
                if data is None:
                    info = tarfile.TarInfo(name=name)
                    info.type = tarfile.DIRTYPE
                    tf.addfile(info)
                    continue
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        (d / f"{s}.tar").write_bytes(buf.getvalue())
    rows = read_tar_members(spark, str(d)).collect()
    got = sorted((r.shard, r.member, r.size, bytes(r.content)) for r in rows)
    assert got == [
        ("a.tar", "0.cls", 3, b"web"),
        ("a.tar", "0.txt", 5, b"hello"),
        ("b.tar", "1.cls", 1, b"x"),
        ("b.tar", "1.txt", 5, b"\x00\xffbin"),
    ]


def test_read_zip_members_stored_and_deflated(spark, tmp_path):
    """Zip reader: stored AND deflated members extract byte-exact,
    directory entries are skipped."""
    import io
    import zipfile

    from eventstreams_spark.sources.spool import read_zip_members

    d = tmp_path / "zips"
    d.mkdir()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("plain.txt", b"hello" * 10,
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("packed.txt", b"world" * 10,
                    compress_type=zipfile.ZIP_DEFLATED)
        zf.writestr("dir/", b"")
    (d / "a.zip").write_bytes(buf.getvalue())
    rows = read_zip_members(spark, str(d)).collect()
    got = sorted((r.shard, r.member, r.size, bytes(r.content)) for r in rows)
    assert got == [
        ("a.zip", "packed.txt", 50, b"world" * 10),
        ("a.zip", "plain.txt", 50, b"hello" * 10),
    ]
