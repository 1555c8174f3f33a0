"""Chunking UDTF vs columnar parity + edge cases (SURVEY §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreams_spark.functions.chunking import ChunkText, chunk_text_columnar


def _chunks(spark, rows, size):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return sorted(
        tuple(r)
        for r in chunk_text_columnar(df, "text", size, ["doc_id"]).collect()
    )


def test_columnar_chunking_basic(spark):
    got = _chunks(spark, [(1, "a b c d e")], 2)
    assert got == [(1, 0, "a b"), (1, 1, "c d"), (1, 2, "e")]


def test_columnar_chunking_exact_multiple(spark):
    got = _chunks(spark, [(1, "a b c d")], 2)
    assert got == [(1, 0, "a b"), (1, 1, "c d")]


def test_udtf_matches_columnar(spark):
    rows = [(1, "a b c d e f g"), (2, "x"), (3, "p q r")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    df.createOrReplaceTempView("_chunk_t")
    spark.udtf.register("chunk_text_udtf_t", ChunkText)
    udtf_out = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_no, c.chunk "
            "FROM _chunk_t d, LATERAL chunk_text_udtf_t(d.text, 3) c"
        ).collect()
    )
    col_out = _chunks(spark, rows, 3)
    assert udtf_out == col_out


def test_chunking_null_text_yields_no_rows(spark):
    df = spark.createDataFrame([(1, None), (2, "a b")], "doc_id int, text string")
    spark.udtf.register("chunk_text_udtf_n", ChunkText)
    df.createOrReplaceTempView("_chunk_n")
    out = spark.sql(
        "SELECT d.doc_id, c.chunk_no FROM _chunk_n d, "
        "LATERAL chunk_text_udtf_n(d.text, 2) c"
    ).collect()
    assert {r.doc_id for r in out} == {2}
