"""S-series: pure-Python Avro object-container reader (no spark-avro
jar in env). Decoder unit tests against a tiny spec-conformant writer
plus a byte-by-byte hand-derived golden, then the Spark read path
(binaryFile -> mapInPandas) on multi-file input."""

from __future__ import annotations

import json
import struct
import zlib

import pytest

from eventstreams_spark.sources.avro import parse_container, read_avro


def _wlong(n: int) -> bytes:
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _wbytes(b: bytes) -> bytes:
    return _wlong(len(b)) + b


def _wstr(s: str) -> bytes:
    return _wbytes(s.encode())


SCHEMA = {
    "type": "record", "name": "ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "ok", "type": "boolean"},
    ],
}
ROWS = [
    (1, "alpha", 1.5, None, True),
    (2, "beta", -2.25, "x", False),
    (-3, "gamma", 0.0, "yz", True),
]
SYNC = bytes(range(16))


def _encode_row(r) -> bytes:
    out = _wlong(r[0]) + _wstr(r[1]) + struct.pack("<d", r[2])
    out += _wlong(0) if r[3] is None else _wlong(1) + _wstr(r[3])
    out += b"\x01" if r[4] else b"\x00"
    return out


def _container(rows, codec="null", schema=SCHEMA) -> bytes:
    meta = _wlong(2)
    meta += _wstr("avro.schema") + _wbytes(json.dumps(schema).encode())
    meta += _wstr("avro.codec") + _wbytes(codec.encode())
    meta += _wlong(0)
    body = b"".join(_encode_row(r) for r in rows)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()
    blk = _wlong(len(rows)) + _wbytes(body) + SYNC
    return b"Obj\x01" + meta + SYNC + blk


def test_avro_decoder_roundtrip_null_and_deflate():
    for codec in ("null", "deflate"):
        schema, rows = parse_container(_container(ROWS, codec))
        assert rows == list(ROWS), codec
        assert schema["name"] == "ev"


def test_avro_decoder_hand_derived_golden():
    """Byte-by-byte golden derived from the Avro 1.11 spec by hand —
    independent of the test writer: schema {id: long, name: string},
    one row (5, "hi"). zigzag(5)=10=0x0a; "hi" = len 2 (zigzag 4 =
    0x04) + 68 69; block body = 0a 04 68 69 (4 bytes, zigzag 8 =
    0x08); one record (zigzag 2 = 0x02)."""
    schema_json = (
        b'{"type":"record","name":"r","fields":'
        b'[{"name":"id","type":"long"},{"name":"name","type":"string"}]}'
    )
    golden = (
        b"Obj\x01"
        + b"\x02"  # meta map: 1 entry
        + b"\x16" + b"avro.schema"  # key len 11 (zigzag 22 = 0x16)
        + _wlong(len(schema_json)) + schema_json
        + b"\x00"  # end of map
        + SYNC
        + b"\x02"  # 1 record in block
        + b"\x08"  # block byte size 4
        + b"\x0a"  # id = 5
        + b"\x04hi"  # name = "hi"
        + SYNC
    )
    schema, rows = parse_container(golden)
    assert rows == [(5, "hi")]
    assert [f["name"] for f in schema["fields"]] == ["id", "name"]


def test_avro_decoder_multi_block_and_negative_count_meta():
    meta = (
        _wlong(-1) + _wlong(99)  # negative-count map form
        + _wstr("avro.schema") + _wbytes(json.dumps(SCHEMA).encode())
        + _wlong(0)
    )
    b1 = _wlong(1) + _wbytes(_encode_row(ROWS[0])) + SYNC
    b2 = _wlong(2) + _wbytes(
        _encode_row(ROWS[1]) + _encode_row(ROWS[2])
    ) + SYNC
    _, rows = parse_container(b"Obj\x01" + meta + SYNC + b1 + b2)
    assert rows == list(ROWS)


def test_avro_decoder_errors_loudly():
    with pytest.raises(ValueError, match="magic"):
        parse_container(b"PAR1" + b"\x00" * 32)
    bad_codec = _container(ROWS).replace(
        _wstr("null"), _wstr("zstd"), 1
    )
    # replace hits the codec VALUE ("null" appears only there: the
    # schema JSON spells it inside a longer string)
    with pytest.raises(NotImplementedError, match="codec"):
        parse_container(bad_codec)
    truncated = _container(ROWS)[:-20]
    with pytest.raises((EOFError, ValueError)):
        parse_container(truncated)


def test_read_avro_spark_multifile(spark, tmp_path):
    """Spark path: two files (one per codec), decoded executor-side;
    rows and dtypes match; nullable union maps to a nullable column."""
    d = tmp_path / "avro_in"
    d.mkdir()
    (d / "a.avro").write_bytes(_container(ROWS[:2], "null"))
    (d / "b.avro").write_bytes(_container(ROWS[2:], "deflate"))
    df = read_avro(spark, str(d))
    assert [f.name for f in df.schema.fields] == [
        "id", "name", "score", "tag", "ok"
    ]
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "id": "bigint", "name": "string", "score": "double",
        "tag": "string", "ok": "boolean",
    }
    got = sorted(
        (r.id, r.name, r.score, r.tag, r.ok) for r in df.collect()
    )
    assert got == sorted(ROWS)


def test_read_avro_rejects_unsupported_schema(spark, tmp_path):
    nested = {
        "type": "record", "name": "ev",
        "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}],
    }
    d = tmp_path / "avro_bad"
    d.mkdir()
    meta = (
        _wlong(1) + _wstr("avro.schema")
        + _wbytes(json.dumps(nested).encode()) + _wlong(0)
    )
    (d / "x.avro").write_bytes(
        b"Obj\x01" + meta + SYNC + _wlong(0) + _wbytes(b"") + SYNC
    )
    with pytest.raises(NotImplementedError):
        read_avro(spark, str(d))


def test_write_avro_roundtrip(spark, tmp_path):
    """K-series write path: df -> write_avro -> read_avro round-trips
    rows and nullability for both codecs; the emitted container also
    satisfies the standalone decoder (sync markers, block framing)."""
    from eventstreams_spark.sources.avro import write_avro

    df = spark.createDataFrame(
        [(1, "a", 1.5, None), (2, "b", -2.0, "t"), (3, "c", 0.25, None)],
        "id bigint, name string, score double, tag string",
    ).repartition(2)
    for codec in ("null", "deflate"):
        out = str(tmp_path / f"out_{codec}")
        write_avro(df, out, codec=codec)
        back = read_avro(spark, out)
        got = sorted(
            (r.id, r.name, r.score, r.tag) for r in back.collect()
        )
        assert got == [
            (1, "a", 1.5, None), (2, "b", -2.0, "t"), (3, "c", 0.25, None)
        ], codec
        import glob
        files = glob.glob(out + "/*.avro")
        assert len(files) == 2  # one container per partition
        for f in files:
            with open(f, "rb") as fh:
                parse_container(fh.read())  # framing must stand alone


def test_write_avro_empty_partitions_roundtrip(spark, tmp_path):
    """An empty partition writes a valid header-only container and the
    read path tolerates it (Arrow conversion of the empty member
    frame included): 2 rows over 8 partitions round-trip intact."""
    from eventstreams_spark.sources.avro import write_avro

    import glob

    out = str(tmp_path / "sparse")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, s string"
    ).repartition(8)
    write_avro(df, out, codec="deflate")
    assert len(glob.glob(out + "/*.avro")) == 8
    back = read_avro(spark, out)
    assert sorted((r.id, r.s) for r in back.collect()) == [
        (1, "a"), (2, "b"),
    ]
