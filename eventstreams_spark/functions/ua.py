"""User-agent parsing (SURVEY §2.3 P15 — Logstash ``useragent``).

A regex family/version/OS extractor covering the dominant browser
families, as pure Column expressions (`regexp_extract` chains inside
codegen — no UDF, no dictionary file). Logstash's useragent filter
wraps the full uap-core database; this is deliberately the
80/20 subset — the extension point for full uap parity is a broadcast
join against a patterns table, same shape as the grok library.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: Edge/OPR/Chrome all contain "Chrome"; check specific first
_FAMILIES = [
    ("Edge", r"Edg(?:e|A|iOS)?/(\d+[\.\d]*)"),
    ("Opera", r"OPR/(\d+[\.\d]*)"),
    ("Chrome", r"Chrome/(\d+[\.\d]*)"),
    ("Firefox", r"Firefox/(\d+[\.\d]*)"),
    ("Safari", r"Version/(\d+[\.\d]*).*Safari"),
    ("MSIE", r"MSIE (\d+[\.\d]*)"),
    ("curl", r"curl/(\d+[\.\d]*)"),
    ("bot", r"(?:bot|Bot|crawler|spider)[/ ]?(\d+[\.\d]*)?"),
]

_OS = [
    ("Windows", r"Windows NT (\d+[\.\d]*)"),
    ("Android", r"Android (\d+[\.\d]*)"),
    ("iOS", r"(?:iPhone|iPad); (?:CPU )?(?:iPhone )?OS (\d+[_\d]*)"),
    ("macOS", r"Mac OS X (\d+[_\.\d]*)"),
    ("Linux", r"(Linux)"),
]


def _first_match(c: Column, table: list[tuple[str, str]], *, with_version: bool) -> tuple[Column, Column]:
    name_expr = F.lit(None).cast("string")
    ver_expr = F.lit(None).cast("string")
    for name, pat in reversed(table):
        hit = c.rlike(pat)
        name_expr = F.when(hit, F.lit(name)).otherwise(name_expr)
        if with_version:
            v = F.nullif(F.regexp_extract(c, pat, 1), F.lit(""))
            ver_expr = F.when(hit, v).otherwise(ver_expr)
    return name_expr, ver_expr


def parse_user_agent(df: DataFrame, source: str = "user_agent") -> DataFrame:
    """Add ua_family / ua_version / ua_os / ua_os_version / ua_is_bot."""
    c = F.col(source)
    fam, ver = _first_match(c, _FAMILIES, with_version=True)
    os_name, os_ver = _first_match(c, _OS, with_version=True)
    return (
        df.withColumn("ua_family", fam)
        .withColumn("ua_version", ver)
        .withColumn("ua_os", os_name)
        .withColumn("ua_os_version", F.translate(os_ver, "_", "."))
        .withColumn("ua_is_bot", F.coalesce(c.rlike("(?i)bot|crawler|spider"), F.lit(False)))
    )
