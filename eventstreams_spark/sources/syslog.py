"""Syslog ingestion (SURVEY §2.1 S5).

Domain op: Logstash ``syslog``/``tcp`` input. Two halves:

- ``parse_syslog``: RFC 3164 line → typed columns, as pure Column
  expressions (``regexp_extract`` + integer div/mod for PRI →
  facility/severity). JVM-side, codegen-friendly, pushdown-safe — the
  hot path stays out of Python (SURVEY §4.2).
- ``syslog_socket_stream``: dev-mode line stream via Spark's built-in
  ``socket`` source with the parser applied; production ingest should
  land lines in a spool (``event_spool`` source) or Kafka and apply
  the same parser — the transform is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <PRI>Mmm dd HH:MM:SS host tag[pid]: message   (RFC 3164)
_RX = r"^(?:<(\d{1,3})>)?(\w{3}\s+\d{1,2}\s\d{2}:\d{2}:\d{2})\s+(\S+)\s+([^\s:\[]+)(?:\[(\d+)\])?:\s?(.*)$"

SYSLOG_FIELDS = (
    "pri facility severity ts_raw host app proc_id message".split()
)


def parse_syslog(df: DataFrame, source: str = "value", year: int = 2024) -> DataFrame:
    """Parse an RFC 3164 syslog line column into typed fields.

    RFC 3164 timestamps omit the year; ``year`` pins it (Logstash's
    ``syslog_timestamp`` convention). Unparseable lines keep NULL
    fields plus the original line in ``message_raw`` — the Logstash
    ``_grokparsefailure`` tag analog is ``pri IS NULL AND host IS
    NULL``.
    """
    c = F.col(source)
    pri = F.nullif(F.regexp_extract(c, _RX, 1), F.lit("")).cast("int")
    return (
        df.withColumn("pri", pri)
        .withColumn("facility", F.expr("pri div 8"))
        .withColumn("severity", F.col("pri") % 8)
        .withColumn("ts_raw", F.nullif(F.regexp_extract(c, _RX, 2), F.lit("")))
        .withColumn(
            "ts",
            F.to_timestamp(
                F.concat(F.lit(f"{year} "), F.regexp_replace("ts_raw", r"\s+", " ")),
                "yyyy MMM d HH:mm:ss",
            ),
        )
        .withColumn("host", F.nullif(F.regexp_extract(c, _RX, 3), F.lit("")))
        .withColumn("app", F.nullif(F.regexp_extract(c, _RX, 4), F.lit("")))
        .withColumn("proc_id", F.nullif(F.regexp_extract(c, _RX, 5), F.lit("")).cast("long"))
        .withColumn("message", F.regexp_extract(c, _RX, 6))
        .withColumnRenamed(source, "message_raw")
    )


def syslog_socket_stream(
    spark: SparkSession, host: str = "localhost", port: int = 5514, year: int = 2024
) -> DataFrame:
    """Dev-mode syslog-over-TCP stream (Logstash ``tcp`` input analog)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_syslog(raw, "value", year=year)
