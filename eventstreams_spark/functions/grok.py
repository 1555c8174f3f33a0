"""Grok pattern support (Logstash `grok` filter equivalent, SURVEY §2.3 P9).

A grok expression like ``src%{NUMBER:num}`` compiles to a Java-regex
with named groups; extraction is then plain ``regexp_extract`` —
JVM-side, codegen'd, no Python in the hot path. Pattern library is the
standard public grok core set (re-expressed, not copied).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Core grok patterns (public Logstash pattern names, regex re-derived).
PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?)*",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(expr: str) -> tuple[str, list[str]]:
    """Compile a grok expression to (regex, captured field names)."""
    fields: list[str] = []

    def repl(m: re.Match) -> str:
        pat_name, field = m.group(1), m.group(2)
        pat = PATTERNS.get(pat_name)
        if pat is None:
            raise KeyError(f"unknown grok pattern %{{{pat_name}}}")
        if field:
            fields.append(field)
            return f"({pat})"
        return f"(?:{pat})"

    return _GROK_REF.sub(repl, expr), fields


def grok_extract(col: Column | str, expr: str) -> dict[str, Column]:
    """Extract grok fields from a string column as {field: Column}."""
    regex, fields = grok_to_regex(expr)
    c = F.col(col) if isinstance(col, str) else col
    return {f: F.regexp_extract(c, regex, i + 1) for i, f in enumerate(fields)}
